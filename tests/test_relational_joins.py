"""Edge-case guards for the co-partitioned shuffle/interval joins in
chug_ray/ops/relational.py (the happy paths are pinned by the DuckDB
parity harness in test_oracle_parity.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from chug_ray.ops.relational import events_after_order, order_priority_revenue


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _mini_tables(tmp_path, order_dates, event_ts):
    """One user (7), orders at the given dates, events at the given
    timestamps — exercises window cuts at/beyond the event range."""
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(len(order_dates)), pa.int64()),
                "o_custkey": pa.array([7] * len(order_dates), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(order_dates)),
                "o_totalprice": pa.array([1.0] * len(order_dates)),
                "o_orderdate": pa.array(
                    np.array(order_dates, dtype="datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(order_dates)),
            }
        ),
    )
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(len(event_ts)), pa.int64()),
                "ts": pa.array(np.array(event_ts, dtype="datetime64[us]")),
                "user_id": pa.array([7] * len(event_ts), pa.int64()),
                "event_type": pa.array(["click"] * len(event_ts)),
                "value": pa.array([1.5] * len(event_ts)),
                "props": pa.array(["{}"] * len(event_ts)),
            }
        ),
    )


def test_interval_join_orders_outside_event_range(ray_session, tmp_path):
    """Orders dated before/after every event must not leak a neighboring
    composite block: counts are exact 0 or the full in-window slice."""
    _mini_tables(
        tmp_path,
        order_dates=[
            "1990-01-01",  # long before any event → 0
            "2024-03-01",  # window covers first two events
            "2024-03-05T12:00:00",  # covers the last event only
            "2030-01-01",  # long after every event → 0
        ],
        event_ts=["2024-03-02", "2024-03-04", "2024-03-09"],
    )
    out = (
        events_after_order(str(tmp_path), days=7)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    assert out["n_events_7d"].tolist() == [0, 2, 1, 0]
    assert out["sum_value_e4"].tolist() == [0, 30000, 15000, 0]


def test_interval_join_multi_user_no_bleed(ray_session, tmp_path):
    """Adjacent user ids with out-of-range order dates: the clipped
    composite cuts must stay inside each user's own block."""
    n_ev = 5
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(2 * n_ev), pa.int64()),
                "ts": pa.array(
                    np.array(
                        [f"2024-03-0{i + 1}" for i in range(n_ev)] * 2,
                        dtype="datetime64[us]",
                    )
                ),
                "user_id": pa.array([7] * n_ev + [8] * n_ev, pa.int64()),
                "event_type": pa.array(["click"] * (2 * n_ev)),
                "value": pa.array([1.0] * (2 * n_ev)),
                "props": pa.array(["{}"] * (2 * n_ev)),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([0, 1], pa.int64()),
                "o_custkey": pa.array([8, 7], pa.int64()),
                "o_orderstatus": pa.array(["O", "O"]),
                "o_totalprice": pa.array([1.0, 1.0]),
                # user 8's order predates everything; a naive unclipped
                # composite would land inside user 7's block
                "o_orderdate": pa.array(
                    np.array(["1990-01-01", "2024-03-01"], dtype="datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"]),
            }
        ),
    )
    out = (
        events_after_order(str(tmp_path), days=7)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    assert out["n_events_7d"].tolist() == [0, n_ev]


def test_shuffle_join_drops_orderless_lineitems(ray_session, tmp_path):
    """Inner-join semantics: lineitem rows whose orderkey has no order
    row contribute nothing (and vice versa for itemless orders)."""
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 99], pa.int64()),
                "o_custkey": pa.array([7, 7, 7], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array(
                    np.array(["2024-01-01"] * 3, dtype="datetime64[us]")
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "2-HIGH", "2-HIGH"]
                ),
            }
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 555], pa.int64()),
                "l_partkey": pa.array([0] * 4, pa.int64()),
                "l_suppkey": pa.array([0] * 4, pa.int64()),
                "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
                "l_quantity": pa.array([1.0] * 4),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
                "l_discount": pa.array([0.0, 0.5, 0.0, 0.0]),
                "l_tax": pa.array([0.0] * 4),
                "l_returnflag": pa.array(["N", "N", "R", "N"]),
                "l_linestatus": pa.array(["O"] * 4),
                "l_shipdate": pa.array(
                    np.array(["2024-01-02"] * 4, dtype="datetime64[us]")
                ),
            }
        ),
    )
    # order_priority_revenue folds its bounded final aggregate onto the
    # driver and returns a pandas DataFrame directly
    out = order_priority_revenue(str(tmp_path)).sort_values(
        ["o_orderpriority", "l_returnflag"], ignore_index=True
    )
    # order 99 has no items, lineitem 555 has no order: both absent
    assert out["o_orderpriority"].tolist() == ["1-URGENT", "2-HIGH"]
    assert out["l_returnflag"].tolist() == ["N", "R"]
    assert out["n_items"].tolist() == [2, 1]
    assert out["revenue_cents"].tolist() == [2000, 3000]


def test_bloom_semi_join_false_positive_pressure(ray_session, tmp_path):
    """A deliberately tiny Bloom filter (high false-positive rate) must
    still produce the exact semi-join thanks to the verify pass."""
    from chug_ray.ops.relational import customers_with_events

    n_cust = 500
    members = list(range(0, n_cust, 7))  # true members
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array([0] * n_cust, pa.int32()),
                "c_acctbal": pa.array([0.0] * n_cust),
                "c_mktsegment": pa.array(["SEG"] * n_cust),
            }
        ),
    )
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(len(members)), pa.int64()),
                "ts": pa.array(
                    np.array(["2024-01-01"] * len(members), "datetime64[us]")
                ),
                "user_id": pa.array(members, pa.int64()),
                "event_type": pa.array(["click"] * len(members)),
                "value": pa.array([1.0] * len(members)),
                "props": pa.array(["{}"] * len(members)),
            }
        ),
    )
    # 64 bits, 2 hashes, 72 members -> filter saturates (most probes hit)
    out = (
        customers_with_events(str(tmp_path), m_bits=64, n_hashes=2)
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    assert out["c_custkey"].tolist() == members


def test_bloom_semi_join_no_events(ray_session, tmp_path):
    from chug_ray.ops.relational import customers_with_events

    _mini_tables(tmp_path, order_dates=["2024-01-01"], event_ts=["2024-01-01"])
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["a", "b"]),
                "c_nationkey": pa.array([0, 0], pa.int32()),
                "c_acctbal": pa.array([0.0, 0.0]),
                "c_mktsegment": pa.array(["S", "S"]),
            }
        ),
    )
    # events exist but belong to user 7 only: no customer matches
    out = customers_with_events(str(tmp_path)).to_pandas()
    assert len(out) == 0


def test_interval_join_huge_user_ids_no_overflow(ray_session, tmp_path):
    """Raw 32-bit-scale user ids times a long time span would overflow a
    naive (id * span) composite; rank compression keeps it bounded."""
    uid = 3_000_000_000  # beyond int32, realistic web-scale id
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "ts": pa.array(
                    np.array(["2024-01-05", "2024-06-20"], "datetime64[us]")
                ),
                "user_id": pa.array([uid, uid], pa.int64()),
                "event_type": pa.array(["click", "click"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([0], pa.int64()),
                "o_custkey": pa.array([uid], pa.int64()),
                "o_orderstatus": pa.array(["O"]),
                "o_totalprice": pa.array([1.0]),
                "o_orderdate": pa.array(
                    np.array(["2024-01-01"], "datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT"]),
            }
        ),
    )
    out = events_after_order(str(tmp_path), days=7).to_pandas()
    assert out["n_events_7d"].tolist() == [1]
    assert out["sum_value_e4"].tolist() == [10000]


def test_large_quantity_orders_threshold_edges(ray_session, tmp_path):
    """HAVING boundary: totals exactly at the threshold are excluded;
    join-back resolves the order header for every qualifying key."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.relational import large_quantity_orders

    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
            "l_quantity": pa.array([100.0, 50.0, 150.0, 60.0, 60.0, 31.0]),
        }
    )
    od = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([11, 12, 13], pa.int64()),
            "o_orderdate": pa.array(
                [np.datetime64("1995-01-01", "us")] * 3, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(od, str(tmp_path / "orders.parquet"))
    out = (
        large_quantity_orders(str(tmp_path), threshold=150)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    # order 1: 150 == threshold -> excluded; order 2: 150 -> excluded;
    # order 3: 151 -> included
    assert out.o_orderkey.tolist() == [3]
    assert out.total_qty.tolist() == [151]
    assert out.o_custkey.tolist() == [13]


def test_cheapest_supplier_argmin_tiebreak(ray_session, tmp_path):
    """Equal unit prices break to the smaller suppkey, across batch
    boundaries (the in-batch combiner must not pre-commit a loser)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.relational import cheapest_supplier_per_part

    # part 1: supp 9 at 2.00/unit then supp 3 at the same price -> 3 wins
    # part 2: strictly cheaper later row wins regardless of suppkey
    li = pa.table(
        {
            "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([9, 3, 1, 8], pa.int64()),
            "l_quantity": pa.array([5.0, 10.0, 1.0, 2.0]),
            "l_extendedprice": pa.array([10.0, 20.0, 9.0, 10.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        }
    )
    sup = pa.table(
        {
            "s_suppkey": pa.array([1, 3, 8, 9], pa.int64()),
            "s_name": pa.array(["s1", "s3", "s8", "s9"]),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(sup, str(tmp_path / "supplier.parquet"))
    out = (
        cheapest_supplier_per_part(str(tmp_path))
        .to_pandas()
        .sort_values("p_partkey", ignore_index=True)
    )
    assert out.p_partkey.tolist() == [1, 2]
    assert out.s_suppkey.tolist() == [3, 8]  # tie->min key; then cheaper
    assert out.unit_cents.tolist() == [200, 500]
    assert out.s_name.tolist() == ["s3", "s8"]
