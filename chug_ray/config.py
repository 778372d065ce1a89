"""Job configuration dataclasses (json-round-trippable).

Mirrors the role of the reference's ``DataCfg``/``DataTaskCfg`` merge
semantics (``/root/reference/src/chug/common/config.py:62-83``,
``common/task_config.py:16-23``) with a fixed, declared surface.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class ExtractConfig:
    """Parameters of the extraction pipeline."""

    page_sampling: str = "all_valid"  # random | first | all_valid | all
    line_break: str = "\n"
    seed: int = 0
    error_policy: str = "skip"  # skip (record in err channel) | raise
    # docs whose estimated cost (total media pages + span count) exceeds
    # this are exploded to per-unit rows and reassembled by groupby(doc_id).
    # Exploding pays a shuffle: reserve it for true monsters (100+-page
    # PDFs), not merely span-rich documents.
    heavy_cost_threshold: int = 200
    # pages per work unit when exploding a heavy media span
    pages_per_unit: int = 25
    batch_size: int = 256
    # actor pool size for the extract stages (min, max). Keep min=1: the
    # pipeline runs up to three pools concurrently (light extract, explode,
    # unit extract) and a min-floor × pools exceeding the node's CPUs can
    # deadlock the streaming executor waiting for actors it can't place.
    # max_actors=None sizes each pool to the cluster's CPU count at plan
    # time so one config scales from 8-cpu to multi-node unchanged.
    min_actors: int = 1
    max_actors: int | None = None
    num_cpus_per_actor: float = 1.0
    media_store_path: str | None = None
    # payload store backend: "broadcast" ray.puts the ref-sorted payload
    # table once (small stores); "ranged" prepares a ref-sorted small-
    # row-group copy and actors do ranged row-group reads + LRU — the
    # backend for payload corpora that exceed the object store.
    # "auto" (the CLI default) picks from the media parquet's footer
    # stats at plan time — the auto_join pattern: broadcast below
    # media_broadcast_threshold_bytes of uncompressed payload, ranged
    # above, so a forgotten flag can't ray.put a 100 TB payload table.
    media_store_mode: str = "broadcast"
    media_broadcast_threshold_bytes: int = 256 << 20
    # plan-time internal: the prepared ranged-store dir (set by
    # build_extract_pipeline, shipped to workers inside cfg_json)
    media_store_ranged_path: str | None = None
    # False (default): extract stages run as Ray TASK pools with state
    # cached once per worker process — tasks schedule to full cluster
    # width immediately. True: autoscaling actor pools (same kernels,
    # state in __init__) for deployments that prestart pools.
    use_actor_pools: bool = False
    # execute read+classify once and feed both branches from the
    # materialized blocks (lazy lineage would re-execute per branch).
    # Memory bounded per partition by the run.py driver.
    materialize_classified: bool = True

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ExtractConfig":
        return cls(**json.loads(s))


@dataclass(frozen=True)
class CorpusConfig:
    """Parameters of the deterministic synthetic corpus (FIXTURES.md F1/F2)."""

    seed: int = 42
    n_docs: int = 200
    skew: str = "test"  # test (64-page monsters) | bench (1000-page)
    # span-count multiplier for txt/html/mixed archetypes: >1 gives a
    # heavy-document profile (ms-scale per-doc decode, like real page
    # parses) so benchmarks measure compute, not per-row overhead
    span_scale: int = 1
    # fraction of image frames replaced by "stock" frames drawn from a
    # tiny pool of exact + near-variant frames: models the repeated
    # logos/banners of real web corpora so image near-dup detection
    # (phash_dups) has planted signal at every scale. Replacement uses
    # a SEPARATE keyed rng, so 0.0 (the default) is bit-identical to
    # corpora generated before the knob existed (pinned goldens hold).
    dup_frame_rate: float = 0.0

    @property
    def big_pages(self) -> int:
        return 1000 if self.skew == "bench" else 64

    @property
    def big_every(self) -> int:
        # one pinned skew monster roughly every N docs
        return 499 if self.skew == "bench" else 97
