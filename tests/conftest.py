from __future__ import annotations

import pytest

from chug_ray.config import CorpusConfig
from chug_ray.synth import write_corpus_inline


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus(tmp_path_factory):
    """Small deterministic corpus (FIXTURES.md t1 smoke scale)."""
    cfg = CorpusConfig(seed=42, n_docs=200, skew="test")
    out = tmp_path_factory.mktemp("corpus_t1")
    docs_path, media_path = write_corpus_inline(cfg, str(out))
    return cfg, docs_path, media_path
