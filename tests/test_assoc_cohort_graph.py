"""Planted-structure semantics for kcore, pair_lift and
retention_cohorts (oracle parity covers the TPC-H-scale shapes)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_graph_triangles import _write_lineitem


def test_kcore_triangle_with_tail(ray_session, tmp_path):
    """Triangle {1,2,3} plus a pendant 3-4 edge: the 2-core is exactly
    the triangle (node 4 peels, which drops no one else)."""
    from chug_ray.ops.graph import kcore

    _write_lineitem(
        tmp_path,
        orderkeys=[1, 1, 1, 2, 2],
        suppkeys=[1, 2, 3, 3, 4],
    )
    out = kcore(str(tmp_path), k=2, sample_cut=256)
    assert out["suppkey"].tolist() == [1, 2, 3]
    assert out["core_degree"].tolist() == [2, 2, 2]


def test_kcore_cascading_peel(ray_session, tmp_path):
    """A path 1-2-3-4-5 has no 2-core: each endpoint removal exposes
    the next (multiple peel rounds), ending empty."""
    from chug_ray.ops.graph import kcore

    _write_lineitem(
        tmp_path,
        orderkeys=[1, 1, 2, 2, 3, 3, 4, 4],
        suppkeys=[1, 2, 2, 3, 3, 4, 4, 5],
    )
    out = kcore(str(tmp_path), k=2, sample_cut=256)
    assert len(out) == 0


def test_pair_lift_known_values(ray_session, tmp_path):
    """Orders {1,2}, {1,2}, {1,3}: pair (1,2) support 2, conf = 2/3,
    lift = 3·2/(3·2) = 1.0 exactly."""
    from chug_ray.ops.relational import pair_lift

    _write_lineitem(
        tmp_path,
        orderkeys=[1, 1, 2, 2, 3, 3],
        suppkeys=[1] * 6,
        partkeys=[1, 2, 1, 2, 1, 3],
    )
    out = pair_lift(str(tmp_path), min_support=2).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["p1"], row["p2"], row["support"]) == (1, 2, 2)
    assert row["conf_e6"] == 666667  # floor(2/3 · 1e6 + .5)
    assert row["lift_e6"] == 1_000_000


def test_retention_cohorts_planted(ray_session, tmp_path):
    """User 1 active day 0 and day 2; user 2 active day 0 only — cells
    (day0, 0) = 2 users and (day0, 2) = 1 user."""
    from chug_ray.ops.window import retention_cohorts

    ts = np.array(
        [
            "2024-03-01T10:00:00",
            "2024-03-03T09:00:00",
            "2024-03-01T11:00:00",
        ],
        dtype="datetime64[us]",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "event_type": pa.array(["view"] * 3),
                "value": pa.array([0.0] * 3),
                "props": pa.array(["{}"] * 3),
            }
        ),
        str(tmp_path / "events.parquet"),
        row_group_size=1,
    )
    out = (
        retention_cohorts(str(tmp_path))
        .to_pandas()
        .sort_values("day_offset", ignore_index=True)
    )
    assert out["cohort_date"].tolist() == ["2024-03-01"] * 2
    assert out["day_offset"].tolist() == [0, 2]
    assert out["n_users"].tolist() == [2, 1]


def test_hits_matches_sequential_bit_exact(ray_session):
    """Distributed max-normalized integer HITS equals a sequential
    reference over the identical edge set, score for score."""
    import duckdb
    import pandas as pd

    from chug_ray.ops.graph import SCALE, SUPPLIER_OFFSET, hits

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    e = con.execute(
        f"""SELECT o_custkey src, l_suppkey + {SUPPLIER_OFFSET} dst,
                   CAST(count(*) AS BIGINT) w
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY 1, 2"""
    ).fetchdf()
    hubs = sorted(e["src"].unique())
    auths = sorted(e["dst"].unique())
    h = {int(x): SCALE for x in hubs}
    a = {int(x): SCALE for x in auths}
    for _ in range(6):
        # Jacobi: both raws from the PREVIOUS iterate, one edge pass
        raw_a = {int(x): 0 for x in auths}
        raw_h = {int(x): 0 for x in hubs}
        for s, d, w in e.itertuples(index=False):
            raw_a[int(d)] += h[int(s)] * int(w)
            raw_h[int(s)] += a[int(d)] * int(w)
        mx = max(raw_a.values())
        a = {k: (v * SCALE) // mx for k, v in raw_a.items()}
        mx = max(raw_h.values())
        h = {k: (v * SCALE) // mx for k, v in raw_h.items()}
    ref = pd.DataFrame(
        [("customer", int(k), h[int(k)]) for k in hubs]
        + [("supplier", int(k) - SUPPLIER_OFFSET, a[int(k)]) for k in auths],
        columns=["kind", "key", "score_fp"],
    ).sort_values(["kind", "key"], ignore_index=True)
    got = hits(sf).sort_values(["kind", "key"], ignore_index=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False, check_exact=True)
    # max normalization: the best hub and best authority sit at SCALE
    assert (got.groupby("kind")["score_fp"].max() == SCALE).all()
    # forcing the distributed dense reduce (driver cap 0) must agree
    dense = hits(sf, max_driver_edges=0).sort_values(
        ["kind", "key"], ignore_index=True
    )
    pd.testing.assert_frame_equal(
        dense, ref, check_dtype=False, check_exact=True
    )
    # ... and the node-keyed groupby fallback (both caps 0) too
    sparse = hits(
        sf, max_driver_edges=0, dense_reduce_max_bytes=0
    ).sort_values(["kind", "key"], ignore_index=True)
    pd.testing.assert_frame_equal(
        sparse, ref, check_dtype=False, check_exact=True
    )
