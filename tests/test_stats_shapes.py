"""Edge cases for the round-4 stats shapes: equal-width histogram
(degenerate domain), per-group mode (tie-break totality), gap-filled
monthly series (explicit zero rows)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def test_value_histogram_degenerate_domain(ray_session, tmp_path):
    """All-equal values: every row lands in bin 0, no div-by-zero."""
    from chug_ray.ops.window import value_histogram

    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    np.array(["2024-01-01"] * 3, dtype="datetime64[us]")
                ),
                "user_id": pa.array([1, 2, 3], pa.int64()),
                "event_type": pa.array(["view"] * 3),
                "value": pa.array([5.0, 5.0, 5.0]),
                "props": pa.array(["{}"] * 3),
            }
        ),
    )
    out = value_histogram(str(tmp_path)).to_pandas()
    assert out["bin"].tolist() == [0]
    assert out["n"].tolist() == [3]
    assert out["sum_cents"].tolist() == [1500]


def test_mode_tie_breaks_to_smallest_value(ray_session, tmp_path):
    """Two n_chars values tied on count: the smaller value wins."""
    from chug_ray.ops.textstats import mode_per_group

    _write(
        tmp_path,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(["x"] * 6),
                "lang": pa.array(["en"] * 4 + ["de"] * 2),
                "source": pa.array(["s"] * 6),
                "n_chars": pa.array([9, 9, 3, 3, 7, 7], pa.int64()),
            }
        ),
    )
    out = (
        mode_per_group(str(tmp_path))
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    assert out["lang"].tolist() == ["de", "en"]
    assert out["mode_n_chars"].tolist() == [7, 3]  # en tie 3-vs-9 → 3
    assert out["n_docs"].tolist() == [2, 2]


def test_monthly_series_fills_gaps_with_zero_rows(ray_session, tmp_path):
    """Orders in Jan and Apr only: Feb and Mar appear as zero rows."""
    from chug_ray.ops.relational import monthly_revenue_series

    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O", "O"]),
                "o_totalprice": pa.array([10.0, 20.5]),
                "o_orderdate": pa.array(
                    np.array(
                        ["2024-01-15", "2024-04-02"], dtype="datetime64[us]"
                    )
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 2),
            }
        ),
    )
    out = monthly_revenue_series(str(tmp_path))
    assert isinstance(out, pd.DataFrame)
    assert out["year"].tolist() == [2024] * 4
    assert out["month"].tolist() == [1, 2, 3, 4]
    assert out["revenue_cents"].tolist() == [1000, 0, 0, 2050]
    assert out["n_orders"].tolist() == [1, 0, 0, 1]


def test_monthly_series_domain_cap(ray_session, tmp_path):
    """A wild timestamp that blows the calendar domain fails loudly."""
    import pytest

    from chug_ray.ops.relational import monthly_revenue_series

    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O", "O"]),
                "o_totalprice": pa.array([10.0, 20.5]),
                "o_orderdate": pa.array(
                    np.array(
                        ["1024-01-15", "2024-04-02"], dtype="datetime64[us]"
                    )
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 2),
            }
        ),
    )
    with pytest.raises(ValueError, match="month domain"):
        monthly_revenue_series(str(tmp_path), max_months=600)


def test_user_entropy_bounds(ray_session):
    """Entropy is 0 for single-type users and ≤ ln(5) for all."""
    from chug_ray.ops.window import user_entropy

    out = user_entropy("/root/testdata/sf0.001").to_pandas()
    assert (out["entropy_e6"] >= 0).all()
    assert (out["entropy_e6"] <= int(np.log(5) * 1e6) + 1).all()
    assert out["n_events"].sum() == 1000  # every event attributed
