"""Edge semantics for first/last-touch attribution, winsorized stats,
and per-lang Pearson correlation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_first_last_touch_tie_breaks_on_event_id(ray_session, tmp_path):
    """Two events at the identical timestamp: the smaller event_id is
    'first', the larger is 'last'."""
    from chug_ray.ops.window import first_last_touch

    ts = np.array(["2024-01-01T00:00:00"] * 2 + ["2024-01-02T00:00:00"],
                  dtype="datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([7, 3, 9], pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array(["view", "signup", "purchase"]),
                "value": pa.array([0.0] * 3),
                "props": pa.array(["{}"] * 3),
            }
        ),
        str(tmp_path / "events.parquet"),
        row_group_size=1,  # every event in its own batch candidate
    )
    out = first_last_touch(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["first_type"].tolist() == ["signup"]  # event_id 3 wins tie
    assert out["last_type"].tolist() == ["purchase"]
    assert out["n_events"].tolist() == [3]


def test_winsorized_stats_known_cuts(ray_session, tmp_path):
    """20 values 1..20 in one lang: p05 = value at ceil(.05*20)-1 = 1,
    p95 = value at ceil(.95*20)-1 = 19; sum clips only the 20 → 19."""
    from chug_ray.ops.textstats import winsorized_stats

    n = 20
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array(range(1, n + 1), pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
        row_group_size=3,
    )
    out = winsorized_stats(str(tmp_path)).to_pandas()
    assert out["lo"].tolist() == [1]
    assert out["hi"].tolist() == [19]
    assert out["n"].tolist() == [20]
    assert out["sum_clipped"].tolist() == [sum(range(1, 20)) + 19]


def test_pearson_perfect_and_zero_variance(ray_session, tmp_path):
    """A lang where n_tokens is perfectly linear in n_chars scores
    r_e6 = 1_000_000; a zero-variance lang is excluded."""
    from chug_ray.ops.textstats import pearson_by_lang

    texts = ["a b", "a b c", "a b c d", "a b c d e"]  # 2,3,4,5 tokens
    n_chars = [20, 30, 40, 50]  # linear in token count
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(texts + ["z z", "z z"]),
                "lang": pa.array(["en"] * 4 + ["de"] * 2),
                "source": pa.array(["s"] * 6),
                # de: constant n_chars → zero x-variance → excluded
                "n_chars": pa.array(n_chars + [7, 7], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = pearson_by_lang(str(tmp_path)).to_pandas()
    assert out["lang"].tolist() == ["en"]
    assert out["r_e6"].tolist() == [1_000_000]
    assert out["n"].tolist() == [4]
