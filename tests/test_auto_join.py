"""auto_join picks broadcast vs co-partitioned shuffle from the dim
side's parquet footer; both paths must return identical rows."""

from __future__ import annotations

import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_auto_join_paths_identical(ray_session):
    from chug_ray.ops.relational import auto_join

    kw = dict(
        fact_table="orders",
        dim_table="customer",
        fact_key="o_custkey",
        dim_key="c_custkey",
        fact_cols=["o_totalprice"],
        dim_cols=["c_nationkey", "c_mktsegment"],
    )
    broadcast = _canon(
        auto_join(SF_DIR, broadcast_threshold_rows=10**9, **kw)
    )
    shuffle = _canon(auto_join(SF_DIR, broadcast_threshold_rows=0, **kw))
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, shuffle, check_dtype=False)


def test_auto_join_inner_semantics(ray_session):
    """Fact rows without a dim match are dropped (inner join): joining
    orders against a dim keyed on o_orderkey with customer keys finds
    nothing, so the result is empty rather than null-padded."""
    from chug_ray.ops.relational import auto_join

    out = auto_join(
        SF_DIR,
        "orders",
        "region",
        "o_orderkey",
        "r_regionkey",
        ["o_totalprice"],
        ["r_name"],
        broadcast_threshold_rows=10**9,
    ).to_pandas()
    # region keys are 0..4; orderkeys start far above → near-empty
    assert (out["o_orderkey"] < 5).all()


def test_orders_per_nation_shuffle_matches_broadcast(ray_session):
    from chug_ray.ops.relational import orders_per_nation

    a = _canon(orders_per_nation(SF_DIR))
    b = _canon(orders_per_nation(SF_DIR, broadcast_threshold_rows=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
