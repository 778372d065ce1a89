"""Regression pins for the round-4 ADVICE findings: auto_join empty-dim
short-circuit + shuffle-path key dtype, first_last_touch positional
first/last under nulls, cube_revenue null grouping keys, and the graph
edge-cache keying over ALL input mtimes."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_auto_join_empty_dim_broadcast(ray_session, tmp_path):
    """ADVICE #2: an EMPTY dim table must yield an empty inner join,
    not an IndexError from probing an empty sorted-key array."""
    from chug_ray.ops.relational import auto_join

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2, 3], pa.int64()),
                "o_totalprice": pa.array([1.0, 2.0, 3.0]),
            }
        ),
        f"{sf}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_nationkey": pa.array([], pa.int64()),
            }
        ),
        f"{sf}/customer.parquet",
    )
    out = auto_join(
        sf,
        "orders",
        "customer",
        "o_custkey",
        "c_custkey",
        ["o_totalprice"],
        ["c_nationkey"],
        broadcast_threshold_rows=10**9,  # force the broadcast probe
    )
    assert out.count() == 0
    assert set(out.schema().names) == {
        "o_custkey",
        "o_totalprice",
        "c_nationkey",
    }


def test_auto_join_shuffle_path_preserves_key_dtype(ray_session):
    """ADVICE #3: both paths return the fact key with its ORIGINAL
    arrow type (strict dtype compare — previously hidden by
    check_dtype=False)."""
    from chug_ray.ops.relational import auto_join

    kw = dict(
        fact_table="orders",
        dim_table="customer",
        fact_key="o_custkey",
        dim_key="c_custkey",
        fact_cols=["o_totalprice"],
        dim_cols=["c_nationkey"],
    )
    broadcast = _canon(auto_join(SF_DIR, broadcast_threshold_rows=10**9, **kw))
    shuffle = _canon(auto_join(SF_DIR, broadcast_threshold_rows=0, **kw))
    pd.testing.assert_frame_equal(broadcast, shuffle)  # strict dtypes


def test_first_last_touch_null_rows_positional(ray_session, tmp_path):
    """ADVICE #4: a null event_type on the positionally-first row must
    surface as NULL first_type (ROW_NUMBER semantics), not be skipped
    in favor of the next non-null value."""
    from chug_ray.ops.window import first_last_touch

    sf = str(tmp_path)
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 02:00:00"]
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([7, 7, 7], pa.int64()),
                "ts": pa.array(ts.to_numpy().astype("datetime64[us]")),
                "event_id": pa.array([10, 11, 12], pa.int64()),
                "event_type": pa.array(["", "click", "buy"], pa.string())
                .take(pa.array([None, 1, 2], pa.int8())),
            }
        ),
        f"{sf}/events.parquet",
    )
    out = first_last_touch(sf).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert pd.isna(row["first_type"])  # the first ROW's type, kept null
    assert row["last_type"] == "buy"
    assert row["n_events"] == 3


def test_cube_revenue_null_keys_roll_into_all(ray_session, tmp_path):
    """ADVICE #5 + r5 review: null flag/status rows are retained AND
    stay distinct detail groups under CUBE — the engine must reproduce
    DuckDB's CUBE+COALESCE output EXACTLY, including the duplicate
    ('ALL', ...) display rows a null data value produces (one detail
    group, one rollup group, different aggregates)."""
    from chug_ray.ops.relational import cube_revenue

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A", None, "R"], pa.string()),
                "l_linestatus": pa.array(["F", "O", None], pa.string()),
                "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
                "l_discount": pa.array([0.0, 0.1, 0.2]),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    got = _canon(cube_revenue(sf))
    want = (
        duckdb.sql(
            f"""
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                        * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_lines
            FROM read_parquet('{sf}/lineitem.parquet')
            GROUP BY CUBE (l_returnflag, l_linestatus)
            """
        )
        .df()
    )
    # NO re-aggregation: the driver's oracle compare is row-exact, so
    # the engine must emit the oracle's duplicate display rows as-is
    want = want[sorted(want.columns)].sort_values(
        list(sorted(want.columns)), ignore_index=True
    )
    pd.testing.assert_frame_equal(
        got.astype({"revenue_cents": np.int64, "n_lines": np.int64}),
        want.astype({"revenue_cents": np.int64, "n_lines": np.int64}),
    )


def test_trade_edges_cache_keys_on_orders_mtime(ray_session, tmp_path):
    """ADVICE #1: rewriting orders.parquet must invalidate the
    session-cached edge list (previously keyed on lineitem mtime only)."""
    import os
    import shutil

    from chug_ray.ops.graph import build_trade_edges

    sf = str(tmp_path)
    for t in ("lineitem", "orders"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf}/{t}.parquet")
    first = build_trade_edges(sf).to_pandas()
    # rewrite orders: keep ONE order only → far fewer edges
    full = pq.read_table(f"{sf}/orders.parquet")
    pq.write_table(full.slice(0, 1), f"{sf}/orders.parquet")
    os.utime(f"{sf}/orders.parquet", (1, 1))  # force a distinct mtime
    second = build_trade_edges(sf).to_pandas()
    assert len(second) < len(first)
