"""Distributed graph analytics over the TPC-H-ish trade graph.

``pagerank`` runs power iteration over the undirected customer↔supplier
graph induced by orders⋈lineitem (edge weight = number of order lines
between the pair). It is the iterative-graph member of the engine's
algorithm families, next to the connected-components labeler
(``dedup.py``: cluster assignment) and Lloyd k-means (``knn.py``) —
per-iteration state lives in a DATASET, not on the driver, and every
arithmetic step is integer fixed-point so partial sums are
order-invariant and the result is bit-identical under any partitioning
(the ``kmeans_lloyd`` pattern; pinned against a sequential reference in
tests/test_pagerank.py).

Scale shape:

- Edge build: one orderkey-bucket co-partitioned side-tagged union
  (orders rows tag 0, lineitem rows tag 1) merges the two fact tables
  without a broadcast; per-group pandas merge + count partials feed one
  ``groupby(src, dst)`` sum. No driver-resident key map.
- Out-weights attach to edges through a second src-bucket union — the
  edge table with (w, W) is then STATIC across iterations and
  materialized once.
- Each iteration is (a) one src-bucket union of the score table with
  the static edge table (scores are small rows; edges never reshuffle
  their payload — the bucket column is precomputed), and (b) one
  ``groupby(dst)`` sum of per-group contribution partials. Nothing is
  ever pulled to the driver except the node count.

Integer fixed point: scores are int64 scaled by ``SCALE``; a node's
contribution along an edge is ``score * w // W`` (exact), the damping
step is ``base + damping_pct * insum // 100``. All operands are bounded
by ``SCALE * max_w < 2**63`` (asserted loudly — the no-silent-caps
rule).

Reference anchor: no chug counterpart (chug has no graph ops); the
composition pattern (bucketed side-tagged unions, materialized
combiner partials) follows this repo's relational ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000_000_000  # 1e12 fixed point
SUPPLIER_OFFSET = 1 << 32  # supplier node id = s_suppkey + OFFSET


def _bucket_union(parts, key_col: str, num_buckets: int):
    """Union datasets that each carry an int64 ``key_col``; adds the
    shuffle bucket column."""
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((k % num_buckets).astype(np.int64))
        )

    out = None
    for ds in parts:
        ds = ds.map_batches(add_bucket, batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out


def build_trade_edges(sf_dir: str, num_buckets: int = 64):
    """Undirected (doubled) customer↔supplier edge list with weights:
    one row per (src, dst) with w = order-line count between the pair.
    Customer node ids are c_custkey; supplier ids are offset."""
    import ray.data
    from ray.data.aggregate import Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "key": b["o_orderkey"],
                "other": b["o_custkey"],
                "tag": pa.array(np.zeros(len(b), np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "key": b["l_orderkey"],
                "other": b["l_suppkey"],
                "tag": pa.array(np.ones(len(b), np.int8)),
            }
        ),
        batch_format="pyarrow",
    )

    def merge(group: pd.DataFrame) -> pa.Table:
        o = group[group["tag"] == 0]
        l = group[group["tag"] == 1]
        m = l.merge(
            o[["key", "other"]].rename(columns={"other": "cust"}),
            on="key",
            how="inner",
        )
        if not len(m):
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        c = m["cust"].to_numpy(np.int64)
        s = m["other"].to_numpy(np.int64) + SUPPLIER_OFFSET
        g = (
            pd.DataFrame({"src": c, "dst": s})
            .groupby(["src", "dst"], as_index=False)
            .size()
        )
        # doubled: emit both directions so the graph is undirected and
        # no node dangles
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate(
                        [g["src"].to_numpy(np.int64), g["dst"].to_numpy(np.int64)]
                    )
                ),
                "dst": pa.array(
                    np.concatenate(
                        [g["dst"].to_numpy(np.int64), g["src"].to_numpy(np.int64)]
                    )
                ),
                "w": pa.array(
                    np.concatenate(
                        [g["size"].to_numpy(np.int64), g["size"].to_numpy(np.int64)]
                    )
                ),
            }
        )

    return (
        _bucket_union([orders, lines], "key", num_buckets)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .materialize()
        .groupby(["src", "dst"])
        .aggregate(Sum("w", alias_name="w"))
        .materialize()
    )


def pagerank(
    sf_dir: str,
    n_iter: int = 6,
    num_buckets: int = 64,
    damping_pct: int = 85,
):
    """Integer fixed-point PageRank over the trade graph. Returns one
    row per node: (kind, key, score_fp) with ``score_fp`` the final
    int64 score at ``SCALE`` fixed point — bit-identical under any
    partitioning or row order."""
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    edges = build_trade_edges(sf_dir, num_buckets)

    # out-weight per src; doubling guarantees every node appears
    outw = (
        edges.groupby("src")
        .aggregate(Sum("w", alias_name="W"))
        .materialize()
    )
    # NOTE: a bare Count() aggregate (no `on`) returns 0 in Ray 2.49 when
    # it is the only aggregate in the call — pass the column explicitly
    stats = outw.aggregate(Count(on="src", alias_name="n"))
    n_nodes = int(stats["n"] or 0)
    if n_nodes == 0:
        return pd.DataFrame(
            {
                "kind": pd.Series([], dtype=object),
                "key": pd.Series([], dtype=np.int64),
                "score_fp": pd.Series([], dtype=np.int64),
            }
        )
    wmax = int(edges.aggregate(Max("w"))["max(w)"])
    # score * w must stay inside int64 (Python-int compare — the
    # ADVICE-r3 overflow-guard lesson: never multiply in np.int64)
    assert int(SCALE) * wmax < 2**63, (
        f"edge weight {wmax} would overflow the fixed-point contribution"
    )
    base = (SCALE * (100 - damping_pct)) // (100 * n_nodes)
    init = SCALE // n_nodes

    # static per-edge table with W attached, bucketed by src once
    def attach(group: pd.DataFrame) -> pa.Table:
        e = group[group["tag"] == 1]
        wmap = group[group["tag"] == 0]
        m = e.merge(
            wmap[["key", "other"]].rename(columns={"other": "W"}),
            on="key",
            how="inner",
        )
        return pa.table(
            {
                "src": pa.array(m["key"].to_numpy(np.int64)),
                "dst": pa.array(m["dst"].to_numpy(np.int64)),
                "w": pa.array(m["w"].to_numpy(np.int64)),
                "W": pa.array(m["W"].to_numpy(np.int64)),
            }
        )

    e_tag = edges.map_batches(
        lambda b: pa.table(
            {
                "key": b["src"],
                "dst": b["dst"],
                "w": b["w"],
                "other": b["w"],  # unused payload slot for schema parity
                "tag": pa.array(np.ones(len(b), np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    w_tag = outw.map_batches(
        lambda b: pa.table(
            {
                "key": b["src"],
                "dst": pa.array(np.zeros(len(b), np.int64)),
                "w": pa.array(np.zeros(len(b), np.int64)),
                "other": b["W"],
                "tag": pa.array(np.zeros(len(b), np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    edges_w = (
        _bucket_union([e_tag, w_tag], "key", num_buckets)
        .materialize()
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
        .materialize()  # static across iterations
    )

    scores = outw.map_batches(
        lambda b: pa.table(
            {
                "node": b["src"],
                "score": pa.array(np.full(len(b), init, np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iter):
        ew_tag = edges_w.map_batches(
            lambda b: pa.table(
                {
                    "key": b["src"],
                    "dst": b["dst"],
                    "w": b["w"],
                    "other": b["W"],
                    "tag": pa.array(np.ones(len(b), np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        # rename other→score inside contribs; recompute W column name
        s_tag = scores.map_batches(
            lambda b: pa.table(
                {
                    "key": b["node"],
                    "dst": pa.array(np.zeros(len(b), np.int64)),
                    "w": pa.array(np.zeros(len(b), np.int64)),
                    "other": b["score"],
                    "tag": pa.array(np.zeros(len(b), np.int8)),
                }
            ),
            batch_format="pyarrow",
        )

        def contribs_w(group: pd.DataFrame) -> pa.Table:
            e = group[group["tag"] == 1]
            s = group[group["tag"] == 0]
            if not len(e) or not len(s):
                return pa.table(
                    {
                        "dst": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            m = e.merge(
                s[["key", "other"]].rename(columns={"other": "score"}),
                on="key",
                how="inner",
            )
            c = (
                m["score"].to_numpy(np.int64)
                * m["w"].to_numpy(np.int64)
                // m["other"].to_numpy(np.int64)  # other carries W on tag-1
            )
            g = (
                pd.DataFrame({"dst": m["dst"].to_numpy(np.int64), "c": c})
                .groupby("dst", as_index=False)["c"]
                .sum()
            )
            return pa.table(
                {
                    "dst": pa.array(g["dst"].to_numpy(np.int64)),
                    "c": pa.array(g["c"].to_numpy(np.int64)),
                }
            )

        from ray.data.aggregate import Sum as _Sum

        insum = (
            _bucket_union([ew_tag, s_tag], "key", num_buckets)
            .materialize()
            .groupby("bucket")
            .map_groups(contribs_w, batch_format="pandas")
            .materialize()
            .groupby("dst")
            .aggregate(_Sum("c", alias_name="c"))
        )

        def damp(batch: pa.Table) -> pa.Table:
            c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            score = base + damping_pct * c // 100
            return pa.table(
                {
                    "node": pa.array(
                        batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
                    ),
                    "score": pa.array(score),
                }
            )

        scores = insum.map_batches(damp, batch_format="pyarrow").materialize()

    def label(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        is_sup = node >= SUPPLIER_OFFSET
        return pa.table(
            {
                "kind": pa.array(
                    np.where(is_sup, "supplier", "customer"), pa.string()
                ),
                "key": pa.array(
                    np.where(is_sup, node - SUPPLIER_OFFSET, node)
                ),
                "score_fp": batch["score"],
            }
        )

    return scores.map_batches(label, batch_format="pyarrow")
