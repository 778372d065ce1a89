"""greedy_coverage is pinned against an in-process sequential greedy
over the same token sets (greedy max-coverage is deterministic with the
(new desc, doc_id asc) tie order, so distributed == sequential)."""

from __future__ import annotations

import re

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _sequential(sf_dir: str, k: int) -> pd.DataFrame:
    from chug_ray.ops.textstats import TOKEN_RE

    token_re = re.compile(TOKEN_RE)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        int(i): set(token_re.findall(x.lower()))
        for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    covered: set = set()
    picks = []
    for rank in range(1, k + 1):
        best = max(
            docs.items(), key=lambda kv: (len(kv[1] - covered), -kv[0])
        )
        new = len(best[1] - covered)
        if new <= 0:
            break
        covered |= best[1]
        picks.append((rank, best[0], new, len(covered)))
    return pd.DataFrame(
        picks, columns=["rank", "doc_id", "new_tokens", "covered_total"]
    )


def test_greedy_coverage_matches_sequential(ray_session):
    from chug_ray.ops.textstats import greedy_coverage

    got = greedy_coverage(SF_DIR, k=8)
    ref = _sequential(SF_DIR, k=8)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        ref.astype(got.dtypes.to_dict()).reset_index(drop=True),
    )
    # submodularity: marginal gains are non-increasing
    assert (got["new_tokens"].diff().dropna() <= 0).all()


def test_greedy_coverage_early_stop(ray_session, tmp_path):
    """Two docs with identical tokens: round 2 adds nothing, so the
    loop stops after one pick despite k=5."""
    import pyarrow as pa

    from chug_ray.ops.textstats import greedy_coverage

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["alpha beta", "beta alpha"]),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s", "s"]),
                "n_chars": pa.array([10, 10], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = greedy_coverage(str(tmp_path), k=5)
    assert out["doc_id"].tolist() == [1]
    assert out["new_tokens"].tolist() == [2]
