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
- Iterations: the score/out-weight vectors are bounded by the NODE set
  (the dimension tables — customers + suppliers — not the facts), so
  they ride as one ``ray.put`` broadcast of three sorted int64 arrays
  (the repo's promo_revenue sorted-int-map pattern); each iteration is
  then ONE streaming pass over the static materialized edge table —
  searchsorted score lookup, per-batch dst-sum combiner — into one
  ``groupby(dst)`` sum. When ``num_blocks · n_nodes · 8`` fits under
  ``DENSE_REDUCE_MAX_BYTES`` the groupby sort-shuffle is replaced by a
  dense per-block int64 vector reduce on the driver (the kmeans_lloyd
  shape; order-invariant integer adds ⇒ bit-identical either way,
  pinned by the forced-fallback tests). ``max_nodes`` guards the
  broadcast loudly (the
  no-silent-caps rule); an edge-shuffle formulation would lift the
  bound at ~10× the per-iteration cost (measured 34 s vs ~2 s per
  iteration at sf0.1) and is the documented fallback if the node set
  ever outgrows a worker heap.

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

# dense per-block reduce cap: the driver sums ONE n_nodes int64 vector
# per edge block, so total bytes pulled = num_blocks * n_nodes * 8.
# Under this cap the per-iteration groupby sort-shuffle is replaced by
# a plain vector add (order-invariant, bit-identical); above it the
# node-keyed groupby path keeps driver memory bounded by the node set.
DENSE_REDUCE_MAX_BYTES = 128 * 2**20


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


_DATASET_CACHE: dict = {}  # (job_id, tag) → materialized Dataset


def _session_cache_key(tag: str) -> tuple:
    """Cache key scoped to the live Ray session: a materialized Dataset
    holds object-store refs that die with the session, so a fresh
    ``ray.init`` (new job id) must never see an old entry."""
    import ray

    return (ray.get_runtime_context().get_job_id(), tag)


def _cache_insert(key: tuple, ds) -> None:
    """Insert with stale-entry eviction: entries keyed by a previous
    job id hold unusable object-store refs, and same-session entries
    for the same logical build (tag prefix up to the trailing
    ``:{mtime}``) are stale after an input rewrite — both would
    accumulate forever in a long-lived driver process."""
    prefix = key[1].rsplit(":", 1)[0] + ":"
    for k in [
        k
        for k in _DATASET_CACHE
        if k[0] != key[0] or (k[1].startswith(prefix) and k != key)
    ]:
        del _DATASET_CACHE[k]
    _DATASET_CACHE[key] = ds


def build_trade_edges(sf_dir: str, num_buckets: int = 64):
    """Undirected (doubled) customer↔supplier edge list with weights:
    one row per (src, dst) with w = order-line count between the pair.
    Customer node ids are c_custkey; supplier ids are offset.
    Session-cached: pagerank and hits share one build per session."""
    import ray.data
    from ray.data.aggregate import Sum

    import os

    # key over ALL input mtimes so a rewrite of either table invalidates
    mt = tuple(
        os.path.getmtime(f"{sf_dir}/{t}.parquet")
        for t in ("lineitem", "orders")
    )
    key = _session_cache_key(f"trade_edges:{sf_dir}:{num_buckets}:{mt}")
    cached = _DATASET_CACHE.get(key)
    if cached is not None:
        return cached

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
        # one direction only here: the consolidation groupby then moves
        # half the rows; doubling happens after it (exact same edge set)
        return pa.table(
            {
                "src": pa.array(g["src"].to_numpy(np.int64)),
                "dst": pa.array(g["dst"].to_numpy(np.int64)),
                "w": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def double(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([src, dst])),
                "dst": pa.array(np.concatenate([dst, src])),
                "w": pa.array(np.concatenate([w, w]).astype(np.int64)),
            }
        )

    out = (
        _bucket_union([orders, lines], "key", num_buckets)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .materialize()
        .groupby(["src", "dst"])
        .aggregate(Sum("w", alias_name="w"))
        .map_batches(double, batch_format="pyarrow")
        .materialize()
    )
    _cache_insert(key, out)
    return out


def pagerank(
    sf_dir: str,
    n_iter: int = 6,
    num_buckets: int = 64,
    damping_pct: int = 85,
    max_nodes: int = 50_000_000,
    dense_reduce_max_bytes: int = DENSE_REDUCE_MAX_BYTES,
    max_driver_edges: int = 4_000_000,
):
    """Integer fixed-point PageRank over the trade graph. Returns one
    row per node: (kind, key, score_fp) with ``score_fp`` the final
    int64 score at ``SCALE`` fixed point — bit-identical under any
    partitioning or row order.

    Size-adaptive like the CC engine (``dedup._cc_labels``): when the
    aggregated edge table fits under ``max_driver_edges`` rows it is
    pulled ONCE and all iterations run locally — the same exact int64
    ``np.add.at`` contribution sum, so scores are bit-identical to the
    distributed paths (pinned in tests/test_pagerank.py) while the
    per-iteration Dataset-execution latency drops to zero. Larger
    graphs keep the broadcast-score streaming iterations with the
    adaptive dense/groupby reduce."""
    import ray
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
    if not int(SCALE) * wmax < 2**63:
        raise ValueError(
            f"edge weight {wmax} would overflow the fixed-point "
            "contribution"
        )
    base = (SCALE * (100 - damping_pct)) // (100 * n_nodes)
    init = SCALE // n_nodes

    # node + out-weight vectors: bounded by the dimension-table node
    # set, pulled once (guarded) and broadcast via ray.put — each
    # iteration is then ONE streaming pass over the static edge table
    wrows = outw.take_all()
    if len(wrows) > max_nodes:
        raise ValueError(
            f"node set {len(wrows)} exceeds max_nodes={max_nodes}; the "
            "broadcast-score formulation no longer holds — raise the cap "
            "or switch to the per-iteration edge-shuffle variant"
        )
    order = np.argsort([r["src"] for r in wrows], kind="stable")
    nodes_arr = np.array([r["src"] for r in wrows], np.int64)[order]
    w_arr = np.array([r["W"] for r in wrows], np.int64)[order]
    score_arr = np.full(n_nodes, init, np.int64)

    from ray.data.aggregate import Sum as _Sum

    # driver fast path: edge table under the cap → one pull, local
    # iterations (identical exact-int arithmetic; see docstring)
    if edges.count() <= max_driver_edges:
        tabs = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        if tabs:
            et = pa.concat_tables(tabs)
            src = et["src"].to_numpy(zero_copy_only=False)
            dst = et["dst"].to_numpy(zero_copy_only=False)
            ew = et["w"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(nodes_arr, src)
            di = np.searchsorted(nodes_arr, dst)
            for _ in range(n_iter):
                c = score_arr[si] * ew // w_arr[si]
                insum = np.zeros(n_nodes, np.int64)
                np.add.at(insum, di, c)
                score_arr = base + damping_pct * insum // 100
        return _pagerank_output(nodes_arr, score_arr)

    # adaptive reduce (the auto_join plan-time switch, kmeans_lloyd's
    # dense shape): when every block can ship ONE dense n_nodes int64
    # vector to the driver without the total exceeding the cap, skip
    # the per-iteration groupby sort-shuffle entirely — integer vector
    # adds are order-invariant, so results stay bit-identical either
    # way. Large graphs keep the node-keyed groupby (node-bounded).
    use_dense = (
        edges.num_blocks() * n_nodes * 8 <= dense_reduce_max_bytes
    )

    for _ in range(n_iter):
        state_ref = ray.put((nodes_arr, w_arr, score_arr))

        if use_dense:

            def contrib_dense(batch: pa.Table, _ref=state_ref) -> pa.Table:
                nodes_b, W_b, score_b = ray.get(_ref)
                src = batch["src"].to_numpy(zero_copy_only=False)
                dst = batch["dst"].to_numpy(zero_copy_only=False)
                w = batch["w"].to_numpy(zero_copy_only=False)
                si = np.searchsorted(nodes_b, src)
                c = score_b[si] * w // W_b[si]
                v = np.zeros(len(nodes_b), np.int64)
                np.add.at(v, np.searchsorted(nodes_b, dst), c)
                return pa.table(
                    {
                        "v": pa.ListArray.from_arrays(
                            pa.array([0, len(v)], pa.int32()), pa.array(v)
                        )
                    }
                )

            vrows = edges.map_batches(
                contrib_dense, batch_format="pyarrow", batch_size=None
            ).take_all()  # one dense row per block (cap checked above)
            insum = np.zeros(n_nodes, np.int64)
            for r in vrows:
                insum += np.asarray(r["v"], np.int64)
            score_arr = base + damping_pct * insum // 100
            continue

        def contrib_partial(batch: pa.Table, _ref=state_ref) -> pa.Table:
            nodes_b, W_b, score_b = ray.get(_ref)  # zero-copy, per-task
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(nodes_b, src)
            c = score_b[si] * w // W_b[si]
            g = (
                pd.DataFrame({"dst": dst, "c": c})
                .groupby("dst", as_index=False)["c"]
                .sum()
            )
            return pa.table(
                {
                    "dst": pa.array(g["dst"].to_numpy(np.int64)),
                    "c": pa.array(g["c"].to_numpy(np.int64)),
                }
            )

        insum_rows = (
            edges.map_batches(
                contrib_partial, batch_format="pyarrow", batch_size=131072
            )
            .materialize()  # partials: the sort shuffle re-executes lazy inputs
            .groupby("dst")
            .aggregate(_Sum("c", alias_name="c"))
            .take_all()  # bounded by the node set (guarded above)
        )
        insum = np.zeros(n_nodes, np.int64)
        di = np.searchsorted(
            nodes_arr, np.array([r["dst"] for r in insum_rows], np.int64)
        )
        insum[di] = np.array([r["c"] for r in insum_rows], np.int64)
        score_arr = base + damping_pct * insum // 100

    return _pagerank_output(nodes_arr, score_arr)


def _pagerank_output(nodes_arr: np.ndarray, score_arr: np.ndarray):
    """(kind, key, score_fp) Dataset from the node/score vectors —
    shared by the driver fast path and the distributed iterations."""
    import ray.data as rd

    is_sup = nodes_arr >= SUPPLIER_OFFSET
    out = pa.table(
        {
            "kind": pa.array(
                np.where(is_sup, "supplier", "customer"), pa.string()
            ),
            "key": pa.array(
                np.where(is_sup, nodes_arr - SUPPLIER_OFFSET, nodes_arr)
            ),
            "score_fp": pa.array(score_arr),
        }
    )
    return rd.from_arrow(out)


# --- DOULION-sparsified exact triangle counting ------------------------

EDGE_HASH_SPACE = 256  # md5 first byte; cut/256 = edge keep rate


def _edge_keep_mask(u: np.ndarray, v: np.ndarray, cut: int) -> np.ndarray:
    """Deterministic DOULION edge sampling: keep (u, v) iff the first
    byte of md5(f"{u}-{v}") < ``cut``. Pure function of the edge key —
    every task, every retry, and the DuckDB oracle (lexicographic
    compare of the first two md5 hex chars) agree on the same set."""
    import hashlib

    if cut >= EDGE_HASH_SPACE:
        return np.ones(len(u), bool)
    keep = np.empty(len(u), bool)
    for i in range(len(u)):
        keep[i] = (
            hashlib.md5(f"{u[i]}-{v[i]}".encode()).digest()[0] < cut
        )
    return keep


def cosupplier_edges(
    sf_dir: str, sample_cut: int = 32, num_buckets: int = 64
):
    """Distinct (u < v) supplier pairs sharing an order, DOULION-sampled
    by :func:`_edge_keep_mask` — the shared edge build for
    triangle_count and kcore. Per-batch (order, supp) distinct partials
    → ONE orderkey-bucket shuffle (in-group self-merge; the sampling
    prunes BEFORE the global distinct) → ONE packed-key hash-bucket
    distinct. Returns a materialized (u, v) dataset. Session-cached:
    triangle_count and kcore share one build per session."""
    import ray.data

    import os

    mt = os.path.getmtime(f"{sf_dir}/lineitem.parquet")  # stale on rewrite
    key = _session_cache_key(
        f"cosupplier_edges:{sf_dir}:{sample_cut}:{num_buckets}:{mt}"
    )
    cached = _DATASET_CACHE.get(key)
    if cached is not None:
        return cached

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o": b["l_orderkey"],
                "s": b["l_suppkey"],
                "bucket": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)
                    % num_buckets
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def order_pairs(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group(
            "cosupplier_edges(order bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        g = group.drop_duplicates(["o", "s"])
        m = g.merge(g, on="o")
        m = m[m["s_x"] < m["s_y"]].drop_duplicates(["s_x", "s_y"])
        u = m["s_x"].to_numpy(np.int64)
        v = m["s_y"].to_numpy(np.int64)
        keep = _edge_keep_mask(u, v, sample_cut)
        u, v = u[keep], v[keep]
        if not (len(u) == 0 or int(v.max()) < 1 << 31):
            raise ValueError(
                "cosupplier_edges: suppkey exceeds the 32-bit pack width"
            )
        key = u * (1 << 32) + v
        return pa.table(
            {
                "u": pa.array(u),
                "v": pa.array(v),
                "kbucket": pa.array((key % num_buckets).astype(np.int64)),
            }
        )

    def edge_distinct(group: pd.DataFrame) -> pa.Table:
        g = group.drop_duplicates(["u", "v"])
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy(np.int64)),
                "v": pa.array(g["v"].to_numpy(np.int64)),
            }
        )

    out = (
        lines.materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(order_pairs, batch_format="pandas")
        .materialize()
        .groupby("kbucket")
        .map_groups(edge_distinct, batch_format="pandas")
        .materialize()
    )
    _cache_insert(key, out)
    return out


def triangle_count(
    sf_dir: str,
    sample_cut: int = 32,
    num_buckets: int = 64,
    max_nodes: int = 50_000_000,
):
    """Exact triangle count of the (DOULION-sampled) co-supplier graph:
    suppliers are adjacent iff they supply the same order; each distinct
    edge is kept iff its md5 byte < ``sample_cut`` (of 256). DOULION
    (Tsourakakis et al., KDD'09) estimates the full-graph count as
    T_sampled / p**3; this op returns the exact count on the sampled
    graph (oracle-checkable) plus n_edges — the estimator is one
    driver-side division away.

    Scale shape (the standard degree-orientation wedge-join, e.g.
    Suri & Vassilvitskii WWW'11):

    - edge build: per-batch (order, supp) distinct partials → ONE
      orderkey-bucket shuffle → in-group self-merge (order sizes are
      small) with the hash sampling applied BEFORE the global distinct,
      shrinking that shuffle by the sample rate;
    - global distinct: packed (u,v) int64 key, ONE hash-bucket shuffle;
    - orientation: degrees ride a ray.put broadcast bounded by the NODE
      set (suppliers — a dimension table; ``max_nodes`` loud guard);
      each edge orients low→high (degree, id) rank, so out-degrees are
      O(sqrt(m)) and the wedge set stays near-linear;
    - wedges: ONE src-bucket shuffle, in-group self-merge emits
      (v, w) wedge keys with per-key multiplicity partials;
    - close: side-tagged union of wedge partials (tag 1) and oriented
      edges (tag 0) under ONE key-bucket shuffle; a wedge key's
      multiplicity counts iff an edge row shares the key. No driver
      state beyond the node-degree vector and the final two integers.

    Reference anchor: no chug counterpart (chug has no graph ops).
    """
    import ray
    from ray.data.aggregate import Sum

    edges = cosupplier_edges(sf_dir, sample_cut, num_buckets)

    def degree_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            ]
        )
        node, cnt = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(node.astype(np.int64)),
                "d": pa.array(cnt.astype(np.int64)),
            }
        )

    deg_rows = (
        edges.map_batches(degree_partial, batch_format="pyarrow")
        .materialize()
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .take_all()  # bounded by the supplier dimension (guarded below)
    )
    n_nodes = len(deg_rows)
    if n_nodes > max_nodes:
        raise ValueError(
            f"triangle_count: {n_nodes} nodes exceed max_nodes="
            f"{max_nodes}; switch the orientation rank to an "
            "edge-shuffle join"
        )
    zero = pd.DataFrame(
        {
            "n_edges": pd.Series([0], dtype=np.int64),
            "n_triangles": pd.Series([0], dtype=np.int64),
        }
    )
    if n_nodes == 0:
        return zero

    nodes_arr = np.array(sorted(r["node"] for r in deg_rows), np.int64)
    deg_map = {r["node"]: r["d"] for r in deg_rows}
    deg_arr = np.array([deg_map[n] for n in nodes_arr], np.int64)
    # total orientation rank: position in the (degree, node) sort
    order = np.lexsort((nodes_arr, deg_arr))
    rank_arr = np.empty(n_nodes, np.int64)
    rank_arr[order] = np.arange(n_nodes, dtype=np.int64)
    rank_ref = ray.put((nodes_arr, rank_arr))

    def orient(batch: pa.Table) -> pa.Table:
        nodes, rank = ray.get(rank_ref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        ru = rank[np.searchsorted(nodes, u)]
        rv = rank[np.searchsorted(nodes, v)]
        a = np.where(ru < rv, u, v)
        b = np.where(ru < rv, v, u)
        ra = np.minimum(ru, rv)
        rb = np.maximum(ru, rv)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "ra": pa.array(ra),
                "rb": pa.array(rb),
                "abucket": pa.array((a % num_buckets).astype(np.int64)),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow").materialize()
    n_edges = oriented.count()

    def wedge_partial(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group(
            "triangle_count(src bucket)",
            int(group["abucket"].iloc[0]),
            len(group),
        )
        m = group.merge(group[["a", "b", "rb"]], on="a")
        m = m[m["rb_x"] < m["rb_y"]]
        if not len(m):
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "tag": pa.array([], pa.int8()),
                    "c": pa.array([], pa.int64()),
                }
            )
        key = (
            m["b_x"].to_numpy(np.int64) * (1 << 32)
            + m["b_y"].to_numpy(np.int64)
        )
        k, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(k),
                "tag": pa.array(np.ones(len(k), np.int8)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    wedges = (
        oriented.groupby("abucket")
        .map_groups(wedge_partial, batch_format="pandas")
    )
    edge_keys = oriented.map_batches(
        lambda b: pa.table(
            {
                "key": pa.array(
                    b["a"].to_numpy(zero_copy_only=False) * (1 << 32)
                    + b["b"].to_numpy(zero_copy_only=False)
                ),
                "tag": pa.array(np.zeros(len(b), np.int8)),
                "c": pa.array(np.zeros(len(b), np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def add_kbucket(batch: pa.Table) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "kb", pa.array((k % num_buckets).astype(np.int64))
        )

    def close_partial(group: pd.DataFrame) -> pa.Table:
        has_edge = group[group["tag"] == 0]["key"].unique()
        w = group[group["tag"] == 1]
        t = int(w[w["key"].isin(has_edge)]["c"].sum())
        return pa.table({"t": pa.array([t], pa.int64())})

    tri_rows = (
        wedges.union(edge_keys)
        .map_batches(add_kbucket, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("kb")
        .map_groups(close_partial, batch_format="pandas")
        .take_all()  # ≤ num_buckets one-int rows
    )
    n_tri = sum(r["t"] for r in tri_rows)
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype=np.int64),
            "n_triangles": pd.Series([int(n_tri)], dtype=np.int64),
        }
    )


def kcore(
    sf_dir: str,
    k: int = 8,
    sample_cut: int = 32,
    num_buckets: int = 64,
    max_nodes: int = 50_000_000,
    max_iters: int = 200,
):
    """k-core decomposition of the (DOULION-sampled) co-supplier graph:
    the maximal subgraph where every node keeps degree ≥ k. Returns one
    row per surviving supplier with its within-core degree. The k-core
    is unique (peel order never matters), so the result is
    deterministic under any partitioning; pinned against a sequential
    peeling reference in tests/test_graph_triangles.py.

    Scale shape: the iterative-peel member of the graph family (the
    pagerank pattern): per round, degrees come from one streaming edge
    pass into a node-bounded groupby; the sub-k removal set — bounded
    by the NODE dimension (``max_nodes`` loud guard) — rides a ray.put
    broadcast into one edge filter pass. Edges shrink monotonically;
    ``max_iters`` raises loudly rather than spinning."""
    import ray
    from ray.data.aggregate import Sum

    edges = cosupplier_edges(sf_dir, sample_cut, num_buckets)

    def degree_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            ]
        )
        node, cnt = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(node.astype(np.int64)),
                "d": pa.array(cnt.astype(np.int64)),
            }
        )

    def degrees(ds):
        rows = (
            ds.map_batches(degree_partial, batch_format="pyarrow")
            .materialize()
            .groupby("node")
            .aggregate(Sum("d", alias_name="d"))
            .take_all()  # bounded by the supplier dimension
        )
        if len(rows) > max_nodes:
            raise ValueError(
                f"kcore: {len(rows)} nodes exceed max_nodes={max_nodes}"
            )
        return rows

    empty = pd.DataFrame(
        {
            "suppkey": pd.Series([], dtype=np.int64),
            "core_degree": pd.Series([], dtype=np.int64),
        }
    )
    for _ in range(max_iters):
        deg_rows = degrees(edges)
        if not deg_rows:
            return empty
        drop = np.array(
            sorted(r["node"] for r in deg_rows if r["d"] < k), np.int64
        )
        if len(drop) == 0:
            out = pd.DataFrame(
                {
                    "suppkey": [r["node"] for r in deg_rows],
                    "core_degree": [r["d"] for r in deg_rows],
                }
            ).astype(np.int64)
            return out.sort_values("suppkey", ignore_index=True)
        drop_ref = ray.put(drop)

        def peel(batch: pa.Table) -> pa.Table:
            d = ray.get(drop_ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            keep = ~(np.isin(u, d) | np.isin(v, d))
            return batch.filter(pa.array(keep))

        edges = edges.map_batches(peel, batch_format="pyarrow").materialize()
    raise RuntimeError(
        f"kcore: did not converge within max_iters={max_iters} rounds"
    )


def hits(
    sf_dir: str,
    n_iter: int = 6,
    num_buckets: int = 64,
    max_nodes: int = 50_000_000,
    dense_reduce_max_bytes: int = DENSE_REDUCE_MAX_BYTES,
    max_driver_edges: int = 4_000_000,
):
    """HITS hubs-and-authorities over the bipartite customer→supplier
    trade graph (customers are hubs, suppliers authorities; edge weight
    = order-line count). Jacobi (simultaneous) update — a' = norm(Aᵀh),
    h' = norm(Aa) from the PREVIOUS iterate — which is power iteration
    on the symmetric [0 A; Aᵀ 0] operator, so both vectors converge to
    the principal singular directions while each iteration needs only
    ONE streaming edge pass (the sequential Gauss-Seidel form costs
    two). Wall time at sf0.1 is dominated by the shared
    build_trade_edges stage (same as pagerank), not the iterations.

    Integer fixed point with MAX normalization: power iteration
    converges under any positive rescaling, so ``s·SCALE // max`` in
    exact int64 keeps every iterate an integer and the result
    bit-identical under any partitioning or row order (the
    pagerank/kmeans_lloyd rule; pinned against a sequential reference
    in tests/test_assoc_cohort_graph.py).

    Scale shape: the pagerank broadcast-vector shape — score vectors
    are bounded by the NODE dimensions (``max_nodes`` loud guard) and
    ride ray.put; per iteration ONE pass over the static edge table
    emits both side-tagged contribution partials into a node-bounded
    groupby."""
    import ray
    from ray.data.aggregate import Sum

    all_edges = build_trade_edges(sf_dir, num_buckets)
    # keep the customer→supplier direction of the doubled table
    edges = all_edges.map_batches(
        lambda b: b.filter(
            pa.array(
                b["src"].to_numpy(zero_copy_only=False) < SUPPLIER_OFFSET
            )
        ),
        batch_format="pyarrow",
    ).materialize()

    def node_partial(batch: pa.Table) -> pa.Table:
        out = []
        for side, col in ((0, "src"), (1, "dst")):
            n = batch[col].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            g = (
                pd.DataFrame({"n": n, "W": w})
                .groupby("n", as_index=False)["W"]
                .sum()
            )
            out.append(
                pa.table(
                    {
                        "side": pa.array(
                            np.full(len(g), side, np.int8)
                        ),
                        "n": pa.array(g["n"].to_numpy(np.int64)),
                        "W": pa.array(g["W"].to_numpy(np.int64)),
                    }
                )
            )
        return pa.concat_tables(out)

    rows = (
        edges.map_batches(node_partial, batch_format="pyarrow")
        .materialize()
        .groupby(["side", "n"])
        .aggregate(Sum("W", alias_name="W"))
        .take_all()  # bounded by the two dimension tables (guarded below)
    )
    if len(rows) > max_nodes:
        raise ValueError(
            f"hits: {len(rows)} nodes exceed max_nodes={max_nodes}"
        )
    hubs = np.array(sorted(r["n"] for r in rows if r["side"] == 0), np.int64)
    auths = np.array(sorted(r["n"] for r in rows if r["side"] == 1), np.int64)
    if len(hubs) == 0:
        return pd.DataFrame(
            {
                "kind": pd.Series([], dtype=object),
                "key": pd.Series([], dtype=np.int64),
                "score_fp": pd.Series([], dtype=np.int64),
            }
        )
    wd_max = max(r["W"] for r in rows)
    # score·w sums are bounded by SCALE · (max weighted degree)
    if not int(SCALE) * int(wd_max) < 2**63:
        raise ValueError(
            f"hits: weighted degree {wd_max} would overflow the int64 "
            "fixed-point accumulation; lower SCALE"
        )

    h = np.full(len(hubs), SCALE, np.int64)
    a = np.full(len(auths), SCALE, np.int64)

    def norm_max(raw: np.ndarray) -> np.ndarray:
        mx = int(raw.max(initial=0))
        if mx == 0:
            return raw
        # max normalization in exact ints (Python-int scaled divide)
        return np.array([int(v) * SCALE // mx for v in raw], np.int64)

    # driver fast path (pagerank's max_driver_edges shape): edge table
    # under the cap → one pull, local Jacobi iterations — identical
    # exact-int np.add.at sums and the same norm_max, so scores are
    # bit-identical to the distributed paths (pinned in
    # tests/test_assoc_cohort_graph.py)
    if edges.count() <= max_driver_edges:
        tabs = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        if tabs:
            et = pa.concat_tables(tabs)
            s = et["src"].to_numpy(zero_copy_only=False)
            d = et["dst"].to_numpy(zero_copy_only=False)
            ew = et["w"].to_numpy(zero_copy_only=False)
            hi = np.searchsorted(hubs, s)
            ai = np.searchsorted(auths, d)
            for _ in range(n_iter):
                raw_a = np.zeros(len(auths), np.int64)
                np.add.at(raw_a, ai, h[hi] * ew)
                raw_h = np.zeros(len(hubs), np.int64)
                np.add.at(raw_h, hi, a[ai] * ew)
                a = norm_max(raw_a)
                h = norm_max(raw_h)
        return _hits_output(hubs, auths, h, a)

    # same adaptive reduce as pagerank: under the cap each block ships
    # ONE dense [auth_raw ++ hub_raw] int64 vector and the driver adds
    # them (order-invariant), skipping the per-iteration sort-shuffle
    n_all = len(hubs) + len(auths)
    use_dense = edges.num_blocks() * n_all * 8 <= dense_reduce_max_bytes

    for _ in range(n_iter):
        state = ray.put((hubs, h, auths, a))

        if use_dense:

            def contrib_dense(batch: pa.Table, _ref=state) -> pa.Table:
                hubs_b, h_b, auths_b, a_b = ray.get(_ref)
                s = batch["src"].to_numpy(zero_copy_only=False)
                d = batch["dst"].to_numpy(zero_copy_only=False)
                w = batch["w"].to_numpy(zero_copy_only=False)
                v = np.zeros(len(auths_b) + len(hubs_b), np.int64)
                np.add.at(
                    v[: len(auths_b)],
                    np.searchsorted(auths_b, d),
                    h_b[np.searchsorted(hubs_b, s)] * w,
                )
                np.add.at(
                    v[len(auths_b) :],
                    np.searchsorted(hubs_b, s),
                    a_b[np.searchsorted(auths_b, d)] * w,
                )
                return pa.table(
                    {
                        "v": pa.ListArray.from_arrays(
                            pa.array([0, len(v)], pa.int32()), pa.array(v)
                        )
                    }
                )

            vrows = edges.map_batches(
                contrib_dense, batch_format="pyarrow", batch_size=None
            ).take_all()  # one dense row per block (cap checked above)
            acc = np.zeros(n_all, np.int64)
            for r in vrows:
                acc += np.asarray(r["v"], np.int64)

            a = norm_max(acc[: len(auths)])
            h = norm_max(acc[len(auths) :])
            continue

        def contrib(batch: pa.Table, _ref=state) -> pa.Table:
            hubs_b, h_b, auths_b, a_b = ray.get(_ref)
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            # side 0: authority raw = Σ h[src]·w keyed by dst;
            # side 1: hub raw = Σ a[dst]·w keyed by src — one pass
            ca = h_b[np.searchsorted(hubs_b, s)] * w
            ch = a_b[np.searchsorted(auths_b, d)] * w
            g = (
                pd.DataFrame(
                    {
                        "side": np.concatenate(
                            [
                                np.zeros(len(d), np.int8),
                                np.ones(len(s), np.int8),
                            ]
                        ),
                        "n": np.concatenate([d, s]),
                        "c": np.concatenate([ca, ch]),
                    }
                )
                .groupby(["side", "n"], as_index=False)["c"]
                .sum()
            )
            return pa.table(
                {
                    "side": pa.array(g["side"].to_numpy(np.int8)),
                    "n": pa.array(g["n"].to_numpy(np.int64)),
                    "c": pa.array(g["c"].to_numpy(np.int64)),
                }
            )

        crows = (
            edges.map_batches(
                contrib, batch_format="pyarrow", batch_size=131072
            )
            .materialize()  # partials: sort shuffle re-executes lazy inputs
            .groupby(["side", "n"])
            .aggregate(Sum("c", alias_name="c"))
            .take_all()  # bounded by the node set (guarded above)
        )

        def fold(side, nodes):
            raw = np.zeros(len(nodes), np.int64)
            sel = [(r["n"], r["c"]) for r in crows if r["side"] == side]
            if sel:
                idx = np.searchsorted(
                    nodes, np.array([n for n, _ in sel], np.int64)
                )
                raw[idx] = np.array([c for _, c in sel], np.int64)
            # one shared normalization: cross-path bit-equality depends
            # on all three paths using the identical scaled divide
            return norm_max(raw)

        a = fold(0, auths)
        h = fold(1, hubs)

    return _hits_output(hubs, auths, h, a)


def _hits_output(
    hubs: np.ndarray, auths: np.ndarray, h: np.ndarray, a: np.ndarray
) -> pd.DataFrame:
    """(kind, key, score_fp) frame from the hub/authority vectors —
    shared by the driver fast path and the distributed iterations."""
    return pd.DataFrame(
        {
            "kind": ["customer"] * len(hubs) + ["supplier"] * len(auths),
            "key": np.concatenate(
                [hubs, auths - SUPPLIER_OFFSET]
            ).astype(np.int64),
            "score_fp": np.concatenate([h, a]).astype(np.int64),
        }
    )


def _edge_nodes(edges, max_nodes: int):
    """Sorted unique node ids of a (u, v) edge Dataset — per-block
    unique partials into ONE node-bounded groupby distinct, pulled to
    the driver under the family's loud ``max_nodes`` guard."""
    from ray.data.aggregate import Count

    def part(batch: pa.Table) -> pa.Table:
        both = np.unique(
            np.concatenate(
                [
                    batch["u"].to_numpy(zero_copy_only=False),
                    batch["v"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"n": pa.array(both.astype(np.int64))})

    rows = (
        edges.map_batches(part, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("n")
        .aggregate(Count(on="n", alias_name="c"))
        .take_all()  # bounded by the supplier dimension (guarded below)
    )
    if len(rows) > max_nodes:
        raise ValueError(
            f"graph node set {len(rows)} exceeds max_nodes={max_nodes}"
        )
    return np.array(sorted(r["n"] for r in rows), np.int64)


def connected_components(
    sf_dir: str,
    sample_cut: int = 32,
    num_buckets: int = 64,
    max_nodes: int = 50_000_000,
    max_rounds: int = 16,
    max_driver_edges: int = 4_000_000,
):
    """Connected components of the DOULION-sampled co-supplier graph:
    one row per node appearing in at least one sampled edge, with
    ``component`` = the MINIMUM supplier id in its component (the
    min-label fixpoint, so a DuckDB recursive CTE reproduces it
    exactly) and ``comp_size`` = the component's node count.

    Scale shape: reuses the session-cached edge build shared with
    triangle_count/kcore (:func:`cosupplier_edges`) and the
    size-adaptive CC engine from the dedup family
    (``dedup._cc_labels``: exact driver union-find under
    ``max_driver_edges`` symmetric rows, iterative two-shuffle
    min-label propagation above — both paths produce identical labels
    when the propagation converges; ``max_rounds`` bounds it at the
    graph diameter and raises LOUDLY past it rather than emitting
    unconverged labels — raise it for deep chain-like graphs). The
    label set is bounded by the NODE dimension, so sizes are one
    numpy pass over the guarded ``take_all`` (the pagerank
    broadcast-vector pattern). Deterministic under any partitioning.

    Reference anchor: no chug counterpart (chug has no graph ops);
    SQL-oracled via WITH RECURSIVE min-label closure."""
    import ray.data as rd

    from chug_ray.ops.dedup import _cc_labels, _symmetric_edges

    edges = cosupplier_edges(sf_dir, sample_cut, num_buckets)

    # (u, v) → both-direction (node, val) rows for the CC engine;
    # reuse the dedup helper by aliasing the column names it expects
    sym = edges.map_batches(
        lambda b: pa.table({"doc_a": b["u"], "doc_b": b["v"]}),
        batch_format="pyarrow",
    )
    labels = _cc_labels(
        _symmetric_edges(sym),
        num_buckets,
        max_rounds=max_rounds,
        max_driver_edges=max_driver_edges,
    )

    empty = pa.table(
        {
            "supp": pa.array([], pa.int64()),
            "component": pa.array([], pa.int64()),
            "comp_size": pa.array([], pa.int64()),
        }
    )
    if labels is None:  # no sampled edges at this scale
        return rd.from_arrow(empty)

    rows = labels.take_all()  # bounded by the supplier dimension
    if len(rows) > max_nodes:
        raise ValueError(
            f"connected_components: {len(rows)} nodes exceed "
            f"max_nodes={max_nodes}"
        )
    node = np.array([r["node"] for r in rows], np.int64)
    lab = np.array([r["val"] for r in rows], np.int64)
    order = np.argsort(node, kind="stable")
    node, lab = node[order], lab[order]
    uniq, inv, cnt = np.unique(lab, return_inverse=True, return_counts=True)
    return rd.from_arrow(
        pa.table(
            {
                "supp": pa.array(node),
                "component": pa.array(lab),
                "comp_size": pa.array(cnt[inv].astype(np.int64)),
            }
        )
    )


def bfs_hops(
    sf_dir: str,
    sample_cut: int = 32,
    num_buckets: int = 64,
    max_hops: int = 64,
    max_nodes: int = 50_000_000,
    dense_reduce_max_bytes: int = DENSE_REDUCE_MAX_BYTES,
):
    """Minimum hop count from the smallest supplier id in the sampled
    co-supplier graph to every node it can reach (the single-source
    BFS / unweighted shortest-path member of the graph family).
    Returns (supp, hops) for REACHED nodes only; hops are exact, so
    the result is deterministic under any partitioning and a DuckDB
    recursive CTE (hop-capped walk + MIN) is the driver oracle.

    Scale shape (the pagerank adaptive-reduce pattern): the distance
    vector is bounded by the NODE dimension (loud ``max_nodes``
    guard) and rides a ``ray.put`` broadcast; each round is ONE
    streaming min-plus relaxation pass over the static materialized
    edge table. When ``num_blocks · n · 8`` fits under
    ``dense_reduce_max_bytes`` every block ships one dense candidate
    vector and the driver element-wise mins them (order-invariant);
    above the cap each batch emits (node, cand) partials into a
    node-bounded ``groupby().min()``. Rounds stop at the fixpoint
    (≤ graph eccentricity + 1); when the eccentricity exceeds
    ``max_hops`` the result is the exact HOP-CAPPED distance set —
    after round k every node within k hops carries its final
    distance, so filtering to ``hops <= max_hops`` matches the SQL
    oracle's ``d < max_hops`` walk cap exactly (no raise: the cap is
    part of the op's contract, mirrored in the oracle).

    Reference anchor: no chug counterpart (chug has no graph ops)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = cosupplier_edges(sf_dir, sample_cut, num_buckets)
    empty = pa.table(
        {
            "supp": pa.array([], pa.int64()),
            "hops": pa.array([], pa.int64()),
        }
    )
    nodes_arr = _edge_nodes(edges, max_nodes)
    n = len(nodes_arr)
    if n == 0:
        return rd.from_arrow(empty)

    SENT = np.int64(max_hops + 1)  # small sentinel: +1 can never overflow
    dist = np.full(n, SENT, np.int64)
    dist[0] = 0  # source = smallest node id (nodes_arr is sorted)

    use_dense = edges.num_blocks() * n * 8 <= dense_reduce_max_bytes

    # the node-id vector is static: broadcast it ONCE; only the
    # distance vector rides a fresh put per round
    nodes_ref = ray.put(nodes_arr)

    # max_hops + 1 rounds: round k finalizes the k-hop layer, so the
    # layer at exactly max_hops needs round max_hops plus one more
    # chance to detect the fixpoint (or be cut by the cap filter below)
    for _ in range(max_hops + 1):
        dist_ref = ray.put(dist)

        if use_dense:

            def relax_dense(
                batch: pa.Table, _nref=nodes_ref, _dref=dist_ref
            ) -> pa.Table:
                nodes_b, dist_b = ray.get(_nref), ray.get(_dref)
                ui = np.searchsorted(
                    nodes_b, batch["u"].to_numpy(zero_copy_only=False)
                )
                vi = np.searchsorted(
                    nodes_b, batch["v"].to_numpy(zero_copy_only=False)
                )
                cand = np.full(len(nodes_b), SENT, np.int64)
                np.minimum.at(cand, vi, dist_b[ui] + 1)
                np.minimum.at(cand, ui, dist_b[vi] + 1)
                return pa.table(
                    {
                        "v": pa.ListArray.from_arrays(
                            pa.array([0, len(cand)], pa.int32()),
                            pa.array(cand),
                        )
                    }
                )

            vrows = edges.map_batches(
                relax_dense, batch_format="pyarrow", batch_size=None
            ).take_all()  # one dense row per block (cap checked above)
            cand = np.full(n, SENT, np.int64)
            for r in vrows:
                cand = np.minimum(cand, np.asarray(r["v"], np.int64))
        else:

            def relax_partial(
                batch: pa.Table, _nref=nodes_ref, _dref=dist_ref
            ) -> pa.Table:
                nodes_b, dist_b = ray.get(_nref), ray.get(_dref)
                u = batch["u"].to_numpy(zero_copy_only=False)
                v = batch["v"].to_numpy(zero_copy_only=False)
                ui = np.searchsorted(nodes_b, u)
                vi = np.searchsorted(nodes_b, v)
                g = (
                    pd.DataFrame(
                        {
                            "node": np.concatenate([v, u]),
                            "c": np.concatenate(
                                [dist_b[ui] + 1, dist_b[vi] + 1]
                            ),
                        }
                    )
                    .groupby("node", as_index=False)["c"]
                    .min()
                )
                return pa.table(
                    {
                        "node": pa.array(g["node"].to_numpy(np.int64)),
                        "c": pa.array(g["c"].to_numpy(np.int64)),
                    }
                )

            rows = (
                edges.map_batches(
                    relax_partial, batch_format="pyarrow", batch_size=131072
                )
                .materialize()  # partials before the sort shuffle
                .groupby("node")
                .aggregate(Min("c", alias_name="c"))
                .take_all()  # bounded by the node set (guarded above)
            )
            cand = np.full(n, SENT, np.int64)
            ni = np.searchsorted(
                nodes_arr, np.array([r["node"] for r in rows], np.int64)
            )
            cand[ni] = np.minimum(
                cand[ni], np.array([r["c"] for r in rows], np.int64)
            )

        new = np.minimum(dist, cand)
        if np.array_equal(new, dist):
            break  # fixpoint: frontier exhausted
        dist = new
    # no fixpoint within max_hops + 1 rounds ⇒ eccentricity > max_hops;
    # dist is still EXACT for every node within max_hops (BFS layer k is
    # final after round k), and the cap filter below matches the oracle

    reached = dist <= max_hops
    return rd.from_arrow(
        pa.table(
            {
                "supp": pa.array(nodes_arr[reached]),
                "hops": pa.array(dist[reached]),
            }
        )
    )
