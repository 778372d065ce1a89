"""PageRank pinned against a sequential integer fixed-point reference:
because every step is exact int64 arithmetic, the distributed run must
be BIT-IDENTICAL to the single-process one, under any partitioning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from chug_ray.ops.graph import SCALE, SUPPLIER_OFFSET, pagerank

SF = "/root/testdata/sf0.001"


def _sequential_pagerank(sf_dir: str, n_iter: int = 6, damping_pct: int = 85):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    lines = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    m = lines.merge(
        orders, left_on="l_orderkey", right_on="o_orderkey", how="inner"
    )
    g = (
        pd.DataFrame(
            {
                "src": m["o_custkey"].to_numpy(np.int64),
                "dst": m["l_suppkey"].to_numpy(np.int64) + SUPPLIER_OFFSET,
            }
        )
        .groupby(["src", "dst"], as_index=False)
        .size()
    )
    src = np.concatenate([g["src"].to_numpy(np.int64), g["dst"].to_numpy(np.int64)])
    dst = np.concatenate([g["dst"].to_numpy(np.int64), g["src"].to_numpy(np.int64)])
    w = np.concatenate([g["size"].to_numpy(np.int64)] * 2)
    nodes = np.unique(src)
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    W = np.zeros(n, np.int64)
    np.add.at(W, si, w)
    base = (SCALE * (100 - damping_pct)) // (100 * n)
    score = np.full(n, SCALE // n, np.int64)
    for _ in range(n_iter):
        contrib = score[si] * w // W[si]
        insum = np.zeros(n, np.int64)
        np.add.at(insum, di, contrib)
        score = base + damping_pct * insum // 100
    return {int(v): int(s) for v, s in zip(nodes, score)}


def test_pagerank_matches_sequential_reference(ray_session):
    want = _sequential_pagerank(SF)
    got = pagerank(SF).to_pandas()
    got_map = {
        (int(r["key"]) + (SUPPLIER_OFFSET if r["kind"] == "supplier" else 0)):
            int(r["score_fp"])
        for _, r in got.iterrows()
    }
    assert got_map == want  # bit-identical fixed point
    # sanity: scores are a probability-ish mass at SCALE fixed point
    total = sum(got_map.values())
    assert 0.5 * SCALE < total <= SCALE
    # suppliers aggregate many customers: the max node is a supplier
    top = max(got_map, key=got_map.get)
    assert top >= SUPPLIER_OFFSET


def test_pagerank_driver_dense_sparse_paths_bit_identical(ray_session):
    """The driver fast path (default under max_driver_edges), the
    adaptive dense per-block reduce, and the node-keyed groupby
    fallback are exact int64 formulations of the same sum — forcing
    each distributed path must reproduce every score."""
    driver = pagerank(SF, n_iter=3).to_pandas()
    dense = pagerank(SF, n_iter=3, max_driver_edges=0).to_pandas()
    sparse = pagerank(
        SF, n_iter=3, max_driver_edges=0, dense_reduce_max_bytes=0
    ).to_pandas()
    key = lambda df: sorted(
        (k, s, f) for k, s, f in zip(df["kind"], df["key"], df["score_fp"])
    )
    assert key(driver) == key(dense)
    assert key(dense) == key(sparse)


def test_pagerank_partitioning_invariance(ray_session, tmp_path):
    """Tiny row groups + reversed row order: identical scores."""
    for t in ("orders", "lineitem"):
        src = pq.read_table(f"{SF}/{t}.parquet")
        rev = src.take(list(range(src.num_rows - 1, -1, -1)))
        pq.write_table(
            rev, str(tmp_path / f"{t}.parquet"), row_group_size=41
        )
    a = pagerank(SF, n_iter=3).to_pandas()
    b = pagerank(str(tmp_path), n_iter=3).to_pandas()
    key = lambda df: sorted(
        (k, s, f) for k, s, f in zip(df["kind"], df["key"], df["score_fp"])
    )
    assert key(a) == key(b)
