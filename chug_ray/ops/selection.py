"""Distributed exact order statistics + global rank bucketing.

``select_ranks`` computes exact k-th-smallest values of an int64 column
without a global sort and without ever materializing the column on the
driver: iterative histogram refinement (the classic distributed
selection algorithm). Each pass streams the dataset once, counting
values into ``num_hist_buckets`` sub-ranges per still-unresolved rank;
the rank's interval narrows ~1000× per pass (≤7 passes for full int64,
1–3 in practice), and an interval is finalized either when it collapses
to a single integer or when its population is small enough to pull.
Driver state is O(ranks × buckets); the pulled tail is ≤ ``cap`` values
per rank.

``decile_bucket`` uses it for the NTILE shape: exact global decile
assignment over (n_chars, doc_id) with two streaming passes + a
broadcast of 9 cutoff values — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _composite_z(batch: pa.Table) -> tuple:
    """(n_chars << 32) | doc_id — the tie-broken NTILE ordering key.
    One definition so the range guards hold on every code path."""
    nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if not ((nc >= 0).all() and (nc < (1 << 31)).all()):
        raise ValueError("n_chars outside [0, 2^31): key pack would wrap")
    if not ((d >= 0).all() and (d < (1 << 32)).all()):
        raise ValueError("doc_id outside [0, 2^32): key pack would wrap")
    return nc, d, (nc << 32) | d


def select_ranks(
    make_ds,
    ranks: list[int],
    num_hist_buckets: int = 1024,
    cap: int = 65536,
    max_passes: int = 80,
) -> list[int]:
    """Exact k-th smallest values (0-based global ranks, duplicates
    counted) of the int64 column ``z`` of ``make_ds()``.

    ``make_ds`` is called once per pass — hand it a cheap pruned read
    (re-reading beats materializing at 100 TB). Returns one value per
    rank, in the order given."""
    from ray.data.aggregate import Count, Max, Min, Sum

    if not ranks:
        return []
    B = num_hist_buckets
    bounds = make_ds().aggregate(Min("z"), Max("z"), Count())
    zmin, zmax = bounds["min(z)"], bounds["max(z)"]
    if zmin is None:
        raise ValueError("select_ranks on an empty dataset")
    n_rows = bounds["count()"]
    bad = [r for r in ranks if not 0 <= r < n_rows]
    if bad:
        raise ValueError(f"ranks {bad} out of range for {n_rows} rows")
    if n_rows <= cap:
        # the whole column fits the pull budget: one pass, no refinement
        rows = (
            make_ds()
            .map_batches(
                lambda b: pa.table({"z": b["z"]}), batch_format="pyarrow"
            )
            .take_all()
        )
        z_sorted = np.sort(np.array([r["z"] for r in rows], np.int64))
        return [int(z_sorted[r]) for r in ranks]
    # per-rank state: value is the k-th smallest inside [lo, hi)
    states = [
        {"lo": int(zmin), "hi": int(zmax) + 1, "k": int(r), "val": None}
        for r in ranks
    ]

    def _width(st) -> int:
        return max(1, -((st["lo"] - st["hi"]) // B))  # ceil((hi-lo)/B)

    for _ in range(max_passes):
        active = [
            i
            for i, st in enumerate(states)
            if st["val"] is None and st["hi"] - st["lo"] > 1
        ]
        for i, st in enumerate(states):
            if st["val"] is None and st["hi"] - st["lo"] <= 1:
                st["val"] = st["lo"]  # single-integer interval: done
        if not active:
            break
        spec = [(i, states[i]["lo"], states[i]["hi"], _width(states[i]))
                for i in active]

        def hist(batch: pa.Table, spec=spec) -> pa.Table:
            z = batch["z"].to_numpy(zero_copy_only=False)
            ri_out, b_out, n_out = [], [], []
            for i, lo, hi, w in spec:
                zz = z[(z >= lo) & (z < hi)]
                if not len(zz):
                    continue
                b = np.minimum((zz - lo) // w, B - 1)
                counts = np.bincount(b, minlength=0)
                nz = np.nonzero(counts)[0]
                ri_out.append(np.full(len(nz), i, np.int64))
                b_out.append(nz.astype(np.int64))
                n_out.append(counts[nz].astype(np.int64))
            if not ri_out:
                return pa.table(
                    {
                        "ri": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "ri": pa.array(np.concatenate(ri_out)),
                    "b": pa.array(np.concatenate(b_out)),
                    "n": pa.array(np.concatenate(n_out)),
                }
            )

        rows = (
            make_ds()
            .map_batches(hist, batch_format="pyarrow")
            .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
            .groupby(["ri", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )  # ≤ len(active) × B tiny rows on the driver
        per_rank: dict[int, np.ndarray] = {}
        for r in rows:
            per_rank.setdefault(int(r["ri"]), np.zeros(B, np.int64))[
                int(r["b"])
            ] = int(r["n"])
        for i, lo, hi, w in spec:
            if i not in per_rank:
                raise ValueError(
                    f"rank {ranks[i]} exceeds the dataset's row count"
                )
            counts = per_rank[i]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, states[i]["k"], side="right"))
            states[i]["k"] -= int(cum[b - 1]) if b else 0
            states[i]["lo"] = lo + b * w
            if b < B - 1:
                states[i]["hi"] = min(hi, lo + (b + 1) * w)
            # else: last bucket keeps hi (absorbs the ceil-width tail)
            if counts[b] <= cap:
                states[i]["val"] = "pull"  # small enough: exact pull next
    pulls = [
        (i, states[i]["lo"], states[i]["hi"])
        for i in range(len(states))
        if states[i]["val"] == "pull"
    ]
    if pulls:

        def collect(batch: pa.Table, pulls=pulls) -> pa.Table:
            z = batch["z"].to_numpy(zero_copy_only=False)
            ri_out, z_out = [], []
            for i, lo, hi in pulls:
                zz = z[(z >= lo) & (z < hi)]
                ri_out.append(np.full(len(zz), i, np.int64))
                z_out.append(zz.astype(np.int64))
            return pa.table(
                {
                    "ri": pa.array(np.concatenate(ri_out)),
                    "z": pa.array(np.concatenate(z_out)),
                }
            )

        rows = make_ds().map_batches(collect, batch_format="pyarrow").take_all()
        vals: dict[int, list[int]] = {i: [] for i, _, _ in pulls}
        for r in rows:
            vals[int(r["ri"])].append(int(r["z"]))
        for i, _, _ in pulls:
            states[i]["val"] = int(np.sort(np.array(vals[i]))[states[i]["k"]])
    unresolved = [i for i, st in enumerate(states) if st["val"] is None]
    if unresolved:
        raise RuntimeError(f"select_ranks did not converge for {unresolved}")
    return [int(st["val"]) for st in states]


def ntile_cutoff_ranks(n: int, tiles: int) -> list[int]:
    """0-based global ranks of the LAST row of tiles 1..tiles-1 under
    SQL NTILE semantics (first n % tiles tiles get the extra row).
    Empty trailing tiles repeat the previous cutoff rank."""
    base, extra = divmod(n, tiles)
    out, s = [], 0
    for j in range(1, tiles):
        s += base + (1 if j <= extra else 0)
        out.append(max(s - 1, 0))
    return out


def decile_bucket(sf_dir: str, tiles: int = 10):
    """Exact global NTILE bucketing of documents by (n_chars, doc_id):
    ``NTILE(tiles) OVER (ORDER BY n_chars, doc_id)`` without a global
    sort. The tie-broken composite key makes every row's global rank
    unique, so the tiles-1 exact cutoff values (from ``select_ranks``)
    turn assignment into a per-row ``searchsorted`` against a
    broadcast 9-element array — the fact table streams through one
    vectorized map, no shuffle."""
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    make_ds = _composite_ds_factory(path)
    # footer-metadata count — no data pages are read
    n = ray.data.read_parquet(path, columns=["doc_id"]).count()
    cutoffs = np.array(
        select_ranks(make_ds, ntile_cutoff_ranks(n, tiles)), np.int64
    )

    def assign(batch: pa.Table) -> pa.Table:
        nc, d, z = _composite_z(batch)
        tile = np.searchsorted(cutoffs, z, side="left") + 1
        return pa.table(
            {
                "doc_id": pa.array(d),
                "n_chars": pa.array(nc),
                "decile": pa.array(tile.astype(np.int64)),
            }
        )

    return ray.data.read_parquet(
        path, columns=["doc_id", "n_chars"]
    ).map_batches(assign, batch_format="pyarrow")


def export_range_partitioned(
    sf_dir: str, out_dir: str, tiles: int = 8
) -> dict:
    """Range-partitioned export sink: write the documents table as
    hive-partitioned parquet, one directory per global key range
    (``tile=1/ … tile=N/`` over the (n_chars, doc_id) order), plus a
    manifest recording the cutoffs and per-export identity — the
    "resumable output, one directory per key range" contract.

    The tile boundaries are exact global ranks (``select_ranks``), so
    the export is a single streaming pass: assign tile via broadcast
    cutoffs, ``write_parquet(partition_cols=["tile"])``. A re-run with
    an unchanged input (row count + cutoffs) and complete manifest is a
    no-op — the resume semantics ``run.py`` applies per input partition,
    here applied per output key range. Returns the manifest dict."""
    import json
    import os
    import shutil

    import ray.data

    path = f"{sf_dir}/documents.parquet"
    n = ray.data.read_parquet(path, columns=["doc_id"]).count()
    cutoffs = select_ranks(
        _composite_ds_factory(path), ntile_cutoff_ranks(n, tiles)
    )
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    ident = {"n_docs": n, "tiles": tiles, "cutoffs": cutoffs}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if {k: prev.get(k) for k in ident} == ident and prev.get("complete"):
            return prev  # checkpoint hit: identical input, nothing to do
        shutil.rmtree(out_dir)  # stale export: rebuild
    elif os.path.exists(out_dir):
        # No manifest: either a crashed prior export (only tile=*/
        # partition dirs present — safe to rebuild) or a mis-pointed
        # out_dir holding unrelated data (refuse; deleting it silently
        # would destroy user files).
        entries = os.listdir(out_dir)
        # export artifacts: tile=*/ dirs, the manifest, and a leftover
        # .tmp from a crash between json.dump and os.replace — the
        # exact case this branch exists to auto-recover
        own = ("_MANIFEST.json", "_MANIFEST.json.tmp")
        if entries and not all(
            e.startswith("tile=") or e in own for e in entries
        ):
            raise ValueError(
                f"refusing to overwrite {out_dir}: it contains entries "
                "that are not export artifacts (tile=*/ dirs or "
                "_MANIFEST.json); clear it explicitly and rerun"
            )
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cut = np.array(cutoffs, np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        _, _, z = _composite_z(batch)
        tile = (np.searchsorted(cut, z, side="left") + 1).astype(np.int64)
        return batch.append_column("tile", pa.array(tile))

    ray.data.read_parquet(path).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["tile"])
    manifest = {**ident, "complete": True}
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(manifest_path + ".tmp", manifest_path)  # atomic publish
    return manifest


def _composite_ds_factory(path: str):
    import ray.data

    def composite(batch: pa.Table) -> pa.Table:
        return pa.table({"z": pa.array(_composite_z(batch)[2])})

    def make_ds():
        return ray.data.read_parquet(
            path, columns=["doc_id", "n_chars"]
        ).map_batches(composite, batch_format="pyarrow")

    return make_ds


def export_tile_stats(sf_dir: str, tiles: int = 8):
    """Driver-checkable view of the range-partitioned sink: export (or
    checkpoint-hit), then read the WRITTEN files back and aggregate per
    tile — proving the sink's directory layout holds exactly the NTILE
    ranges the oracle computes from the source table."""
    import os

    import ray.data
    from ray.data.aggregate import Count, Max, Min

    out_dir = os.path.join(
        "/tmp/chug_ray_export",
        os.path.basename(os.path.normpath(sf_dir)) + f"_t{tiles}",
    )
    export_range_partitioned(sf_dir, out_dir, tiles)

    def norm(batch: pa.Table) -> pa.Table:
        # hive partition values come back as strings
        return pa.table(
            {
                "tile": pc.cast(pc.cast(batch["tile"], pa.string()), pa.int64()),
                "n_chars": pc.cast(batch["n_chars"], pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(out_dir, columns=["tile", "n_chars"])
        .map_batches(norm, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("tile")
        .aggregate(
            Count(alias_name="n_rows"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
    )


def pareto_frontier(sf_dir: str, max_prices: int = 4_000_000):
    """Skyline / Pareto-frontier selection over ``part``: the parts no
    other part dominates (dominate = price ≤ AND size ≥ with at least
    one strict) — the "cheapest for its size class" multi-objective
    query; ``NOT EXISTS`` dominance in SQL, quadratic there, two
    streaming passes here.

    Scale shape: pass 1 is a (price → max size) combiner + groupby —
    the shuffle is bounded by the DISTINCT PRICE domain, not the table.
    The driver pulls that table (``max_prices`` guards the pull loudly
    — the repo's no-silent-caps rule), sorts it once, and derives the
    exclusive prefix-max M(p) = best size strictly cheaper than p.
    Pass 2 re-streams the facts and keeps a row iff its size equals its
    own price's group max AND beats M(p) — a vectorized searchsorted
    against two broadcast arrays. No all-pairs comparison anywhere.

    Ties: equal (price, size) rows don't dominate each other (no strict
    coordinate), so whole duplicate groups survive together — same
    semantics as the NOT EXISTS oracle."""
    import ray.data
    from ray.data.aggregate import Max

    src = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )

    def gmax_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "p_retailprice": batch["p_retailprice"].to_numpy(
                    zero_copy_only=False
                ),
                "p_size": batch["p_size"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("p_retailprice", as_index=False)["p_size"].max()
        return pa.table(
            {
                "p_retailprice": pa.array(
                    g["p_retailprice"].to_numpy(np.float64)
                ),
                "p_size": pa.array(g["p_size"].to_numpy(np.int64)),
            }
        )

    per_price = (
        src.map_batches(gmax_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("p_retailprice")
        .aggregate(Max("p_size", alias_name="gmax"))
        .take_all()  # bounded by the distinct-price domain (guarded below)
    )
    if len(per_price) > max_prices:
        raise ValueError(
            f"distinct price domain {len(per_price)} exceeds "
            f"max_prices={max_prices}; the broadcast cum-table assumption "
            "no longer holds — raise the cap or switch to the sorted-"
            "partition variant"
        )
    prices = np.array([r["p_retailprice"] for r in per_price], np.float64)
    gmax = np.array([r["gmax"] for r in per_price], np.int64)
    order = np.argsort(prices, kind="stable")
    prices, gmax = prices[order], gmax[order]
    # M[i] = max size among strictly cheaper prices (exclusive cummax)
    run = np.maximum.accumulate(gmax)
    m_excl = np.empty_like(run)
    m_excl[0] = np.iinfo(np.int64).min
    m_excl[1:] = run[:-1]

    def keep(batch: pa.Table) -> pa.Table:
        p = batch["p_retailprice"].to_numpy(zero_copy_only=False)
        s = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(prices, p)
        mask = (s == gmax[idx]) & (s > m_excl[idx])
        batch = batch.filter(pa.array(mask))
        return pa.table(
            {
                "p_partkey": pc.cast(batch["p_partkey"], pa.int64()),
                "p_retailprice": batch["p_retailprice"],
                "p_size": pc.cast(batch["p_size"], pa.int64()),
            }
        )

    return src.map_batches(keep, batch_format="pyarrow", batch_size=65536)


def systematic_sample(sf_dir: str, k: int = 10, num_buckets: int = 64):
    """Systematic (every k-th) sample under the total order
    (n_chars, doc_id) — the equal-spacing sampler that preserves the
    marginal distribution, next to uniform/weighted/stratified bottom-k.

    Scale shape: global ranks WITHOUT a global sort — one value-count
    combiner groupby (bounded by the n_chars domain, same cap story as
    chars_quantiles) builds the exclusive-cumsum offset table, which
    broadcasts into ONE value-bucket shuffle where each value group
    sorts only its own doc_ids: global_rank = offset[value] +
    local_rank. The keep mask (rank % k == 0) prunes inside the
    groups, so only ~1/k of rows leave the shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from chug_ray.ops.textstats import VALUE_DOMAIN_CAP
    from chug_ray.telemetry import record_group

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(
            batch["n_chars"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "v": pa.array(v.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    rows = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded by the value domain (guarded below)
    )
    if not rows:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "n_chars": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
            }
        )
    if len(rows) > VALUE_DOMAIN_CAP:
        raise ValueError(
            f"systematic_sample: {len(rows)} distinct values exceed the "
            f"domain cap {VALUE_DOMAIN_CAP}; bucketize first"
        )
    rows.sort(key=lambda r: r["v"])
    values = np.array([r["v"] for r in rows], np.int64)
    counts = np.array([r["c"] for r in rows], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    state = ray.put((values, offsets))

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((v % num_buckets).astype(np.int64))
        )

    def rank_group(group: pd.DataFrame) -> pa.Table:
        record_group(
            "systematic_sample(value bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        from chug_ray.ops.relational import _bcast

        vals, offs = _bcast(state)  # per-process cache (repo convention)
        g = group.sort_values(["n_chars", "doc_id"], kind="stable")
        local = g.groupby("n_chars").cumcount().to_numpy(np.int64)
        v = g["n_chars"].to_numpy(np.int64)
        rank = offs[np.searchsorted(vals, v)] + local
        keep = rank % k == 0
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)[keep]),
                "n_chars": pa.array(v[keep]),
                "rank": pa.array(rank[keep]),
            }
        )

    return (
        docs.map_batches(add_bucket, batch_format="pyarrow")
        .materialize()
        .groupby("bucket")
        .map_groups(rank_group, batch_format="pandas")
    )


def balanced_shards(sf_dir: str, n_shards: int = 16, num_buckets: int = 64):
    """Cost-balanced shard planning: rank documents by estimated cost
    (n_chars desc, doc_id tie-break) and deal them serpentine
    (boustrophedon) across ``n_shards`` — block b assigns left-to-right
    when even, right-to-left when odd — so each shard's cost sum is
    near-equal even under heavy-tailed costs. The planner behind
    skew-aware extraction partitioning, exposed as a first-class op.

    Scale shape: the systematic_sample rank machinery with a DESCENDING
    value order (value-count cum-table broadcast + ONE value-bucket
    shuffle computing offset[value]+local_rank); the shard assignment
    is a pure function of the rank, and only per-shard (docs, cost)
    partials leave the groups."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from chug_ray.ops.textstats import VALUE_DOMAIN_CAP
    from chug_ray.telemetry import record_group

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(
            batch["n_chars"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "v": pa.array(v.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    rows = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded by the value domain (guarded below)
    )
    if not rows:
        return pd.DataFrame(
            {
                "shard": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
                "cost_sum": pd.Series([], dtype=np.int64),
            }
        )
    if len(rows) > VALUE_DOMAIN_CAP:
        raise ValueError(
            f"balanced_shards: {len(rows)} distinct costs exceed the "
            f"domain cap {VALUE_DOMAIN_CAP}; bucketize first"
        )
    rows.sort(key=lambda r: -r["v"])  # descending cost order
    values_desc = np.array([r["v"] for r in rows], np.int64)
    counts = np.array([r["c"] for r in rows], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    # searchsorted needs ascending: store ascending values with the
    # matching descending-rank offsets
    asc = np.argsort(values_desc, kind="stable")
    state = ray.put((values_desc[asc], offsets[asc]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((v % num_buckets).astype(np.int64))
        )

    def assign_group(group: pd.DataFrame) -> pa.Table:
        record_group(
            "balanced_shards(value bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        from chug_ray.ops.relational import _bcast

        vals, offs = _bcast(state)  # per-process cache (repo convention)
        g = group.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="stable"
        )
        local = g.groupby("n_chars").cumcount().to_numpy(np.int64)
        v = g["n_chars"].to_numpy(np.int64)
        rank = offs[np.searchsorted(vals, v)] + local
        block, pos = rank // n_shards, rank % n_shards
        shard = np.where(block % 2 == 0, pos, n_shards - 1 - pos)
        part = (
            pd.DataFrame({"shard": shard, "cost": v})
            .groupby("shard", as_index=False)
            .agg(n_docs=("cost", "size"), cost_sum=("cost", "sum"))
        )
        return pa.table(
            {
                "shard": pa.array(part["shard"].to_numpy(np.int64)),
                "n_docs": pa.array(part["n_docs"].to_numpy(np.int64)),
                "cost_sum": pa.array(part["cost_sum"].to_numpy(np.int64)),
            }
        )

    return (
        docs.map_batches(add_bucket, batch_format="pyarrow")
        .materialize()
        .groupby("bucket")
        .map_groups(assign_group, batch_format="pandas")
        .materialize()
        .groupby("shard")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("cost_sum", alias_name="cost_sum"),
        )
    )


def _part1by1(n: "np.ndarray") -> "np.ndarray":
    """Spread the low 16 bits of each value across even bit positions
    (the classic Morton magic-number sequence)."""
    n = n.astype(np.uint64) & np.uint64(0xFFFF)
    n = (n | (n << np.uint64(8))) & np.uint64(0x00FF00FF)
    n = (n | (n << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    n = (n | (n << np.uint64(2))) & np.uint64(0x33333333)
    n = (n | (n << np.uint64(1))) & np.uint64(0x55555555)
    return n


def zorder_layout(sf_dir: str, n_files: int = 16):
    """Z-order (Morton-curve) layout assignment over
    (n_chars, doc_id): quantize both keys to the full 16-bit range
    with exact integer scaling ((v − min)·2¹⁶ // (max − min + 1)),
    interleave into a 32-bit space-filling code, and split its range
    into ``n_files`` target files — the lakehouse OPTIMIZE ZORDER
    clustering primitive (range scans on EITHER key touch few files).
    Returns per-file row counts plus each file's code range.

    Scale shape: one tree-reduced Min/Max pass (the value_histogram
    pattern), then map-only code assignment (magic-number bit
    spreading, fully vectorized) + one file-domain combiner groupby;
    no shuffle of the fact table — the actual file write would reuse
    the export_range_partitioned sink keyed by zfile."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    shift = 32 - int(np.log2(n_files))
    if 1 << (32 - shift) != n_files:
        raise ValueError("n_files must be a power of two")

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    b = docs.aggregate(
        Min("n_chars", alias_name="xmin"),
        Max("n_chars", alias_name="xmax"),
        Min("doc_id", alias_name="ymin"),
        Max("doc_id", alias_name="ymax"),
    )
    xmin, xspan = int(b["xmin"]), int(b["xmax"]) - int(b["xmin"]) + 1
    ymin, yspan = int(b["ymin"]), int(b["ymax"]) - int(b["ymin"]) + 1

    def assign(batch: pa.Table) -> pa.Table:
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x16 = (x - xmin) * 65536 // xspan
        y16 = (y - ymin) * 65536 // yspan
        code = (
            (_part1by1(x16) << np.uint64(1)) | _part1by1(y16)
        ).astype(np.int64)
        zfile = code >> shift
        df = pd.DataFrame({"zfile": zfile, "code": code})
        g = df.groupby("zfile", as_index=False).agg(
            n_docs=("code", "size"),
            code_min=("code", "min"),
            code_max=("code", "max"),
        )
        return pa.table(
            {
                "zfile": pa.array(g["zfile"].to_numpy(np.int64)),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "code_min": pa.array(g["code_min"].to_numpy(np.int64)),
                "code_max": pa.array(g["code_max"].to_numpy(np.int64)),
            }
        )

    return (
        docs.map_batches(assign, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("zfile")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("code_min", alias_name="code_min"),
            Max("code_max", alias_name="code_max"),
        )
    )
