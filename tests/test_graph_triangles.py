"""Planted-structure semantics for triangle_count and
part_pair_support (the oracle parity suite covers the sampled/TPC-H
shapes; these pin the algorithm on graphs small enough to verify by
hand)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_lineitem(tmp_path, orderkeys, suppkeys, partkeys=None):
    n = len(orderkeys)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, pa.int64()),
                "l_partkey": pa.array(
                    partkeys if partkeys is not None else [1] * n,
                    pa.int64(),
                ),
                "l_suppkey": pa.array(suppkeys, pa.int64()),
                "l_linenumber": pa.array(range(1, n + 1), pa.int64()),
                "l_quantity": pa.array([1.0] * n),
                "l_extendedprice": pa.array([1.0] * n),
                "l_discount": pa.array([0.0] * n),
                "l_tax": pa.array([0.0] * n),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    np.array(["2024-01-01"] * n, dtype="datetime64[us]")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
        row_group_size=2,  # edges split across batches
    )


def test_triangle_count_planted(ray_session, tmp_path):
    """Order 1 = suppliers {1,2,3} (one triangle); order 2 = {4,5}
    (a lone edge); order 3 = {1,2} (duplicate edge — must not double
    count). sample_cut=256 disables sampling."""
    from chug_ray.ops.graph import triangle_count

    _write_lineitem(
        tmp_path,
        orderkeys=[1, 1, 1, 2, 2, 3, 3],
        suppkeys=[1, 2, 3, 4, 5, 1, 2],
    )
    out = triangle_count(str(tmp_path), sample_cut=256)
    assert out["n_edges"].tolist() == [4]  # (1,2) (1,3) (2,3) (4,5)
    assert out["n_triangles"].tolist() == [1]


def test_triangle_count_two_triangles_shared_edge(ray_session, tmp_path):
    """K4 minus one edge = exactly two triangles sharing an edge."""
    from chug_ray.ops.graph import triangle_count

    # edges: 1-2 1-3 1-4 2-3 2-4 (missing 3-4): triangles 123 and 124
    _write_lineitem(
        tmp_path,
        orderkeys=[1, 1, 2, 2, 3, 3, 4, 4, 5, 5],
        suppkeys=[1, 2, 1, 3, 1, 4, 2, 3, 2, 4],
    )
    out = triangle_count(str(tmp_path), sample_cut=256)
    assert out["n_edges"].tolist() == [5]
    assert out["n_triangles"].tolist() == [2]


def test_triangle_count_empty_graph(ray_session, tmp_path):
    """Single-supplier orders produce no edges; the op returns the
    explicit zero row rather than an empty frame."""
    from chug_ray.ops.graph import triangle_count

    _write_lineitem(tmp_path, orderkeys=[1, 2, 3], suppkeys=[1, 2, 3])
    out = triangle_count(str(tmp_path), sample_cut=256)
    assert out["n_edges"].tolist() == [0]
    assert out["n_triangles"].tolist() == [0]


def test_part_pair_support_threshold(ray_session, tmp_path):
    """Pair (1,2) co-ordered twice survives min_support=2; pair (1,3)
    once does not; duplicate lines within one order count once."""
    from chug_ray.ops.relational import part_pair_support

    _write_lineitem(
        tmp_path,
        orderkeys=[1, 1, 1, 2, 2, 3, 3],
        suppkeys=[1] * 7,
        partkeys=[1, 2, 2, 1, 2, 1, 3],
    )
    out = (
        part_pair_support(str(tmp_path), min_support=2)
        .to_pandas()
        .sort_values(["p1", "p2"], ignore_index=True)
    )
    assert out["p1"].tolist() == [1]
    assert out["p2"].tolist() == [2]
    assert out["support"].tolist() == [2]
