"""Relational demonstrations over the TPC-H-ish tables: vectorized
filter/project, partial-aggregate groupby, top-k, and a broadcast join
(small side via ``ray.put``, no shuffle — SURVEY.md §2.5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from chug_ray.util import from_pandas_typed
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped: filter on ship date, group by flag+status."""
    from ray.data.aggregate import Count, Sum

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        # money → integer cents per row (round-half-away, matching SQL
        # round(x*100, 0)); integer sums are exact and order-invariant, so
        # the parallel aggregate is bit-deterministic vs the DuckDB oracle.
        def cents(arr):
            return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0)),
                                    round_mode="half_towards_infinity"), pa.int64())
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(batch["l_quantity"], pa.int64()),
                "base_price_cents": cents(batch["l_extendedprice"]),
                "disc_price_cents": cents(disc_price),
            }
        )

    agg = (
        _read(
            sf_dir,
            "lineitem",
            [
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        .map_batches(prep, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_price_cents", alias_name="sum_base_price_cents"),
            Sum("disc_price_cents", alias_name="sum_disc_price_cents"),
            Count(alias_name="count_order"),
        )
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        for col in ("sum_qty", "sum_base_price_cents", "sum_disc_price_cents",
                    "count_order"):
            batch[col] = batch[col].astype(np.int64)
        return batch

    return agg.map_batches(finalize, batch_format="pandas")


def top_revenue_orders(sf_dir: str, k: int = 10, num_buckets: int = 32):
    """Exact top-k orders by revenue via hash bucketing.

    A ``groupby(l_orderkey)`` would sort-shuffle one row per distinct
    order; instead partials carry a ``key % num_buckets`` bucket, the
    shuffle groups ``num_buckets`` coarse buckets (each key wholly in
    one bucket → exact per-key sums), every bucket emits its local
    top-k, and the global sort runs over ``num_buckets × k`` rows."""

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        rev_cents = pc.cast(pc.round(pc.multiply(rev, pa.scalar(100.0)),
                                     round_mode="half_towards_infinity"), pa.int64())
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "revenue_cents": rev_cents.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        g["bucket"] = (g["l_orderkey"] % num_buckets).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        g["revenue_cents"] = g["revenue_cents"].astype(np.int64)
        return g.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True]
        ).head(k)[["l_orderkey", "revenue_cents"]]

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .materialize()  # the sort also samples its lazy input: pin the
        # per-bucket top-k so the bucket shuffle runs once (window.py NOTE)
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def orders_by_segment(sf_dir: str):
    """Broadcast hash join + partial aggregation.

    The customer side (small) is ``ray.put`` once as sorted numpy arrays;
    each batch joins via vectorized ``searchsorted`` and pre-aggregates to
    one row per segment, so the all-to-all exchange carries ~5 rows per
    batch instead of every order row — the combiner pattern the 100 TB
    path depends on."""
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = np.asarray(cust["c_custkey"])
    order = np.argsort(keys)
    seg_ref = ray.put(
        (keys[order], np.asarray(cust["c_mktsegment"], dtype=object)[order])
    )

    def join_partial(batch: pa.Table) -> pa.Table:
        # per-process cache: segs_ is an object string array that
        # ray.get would fully re-unpickle on every batch
        keys_, segs_ = _bcast(seg_ref)
        cust_ids = batch["o_custkey"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(price) * np.floor(np.abs(price) * 100.0 + 0.5)).astype(
            np.int64
        )
        idx = np.searchsorted(keys_, cust_ids)
        idx_c = np.clip(idx, 0, len(keys_) - 1)
        hit = keys_[idx_c] == cust_ids
        seg = np.where(hit, segs_[idx_c], "UNKNOWN")
        df = pd.DataFrame({"c_mktsegment": seg, "cents": cents})
        part = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("cents", "size"), total_price_cents=("cents", "sum")
        )
        return from_pandas_typed(part, ("c_mktsegment",))

    agg = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(join_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_price_cents", alias_name="total_price_cents"),
        )
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_orders"] = batch["n_orders"].astype(np.int64)
        batch["total_price_cents"] = batch["total_price_cents"].astype(np.int64)
        return batch

    return agg.map_batches(finalize, batch_format="pandas")


def filter_project(sf_dir: str):
    """Vectorized filter + projection (reference M6/M7 filter analog)."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["n_chars"], pa.scalar(200)),
            pc.is_in(batch["lang"], value_set=pa.array(["en", "fr"])),
        )
        t = batch.filter(keep)
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "n_chars": t["n_chars"]}
        )

    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).map_batches(fn, batch_format="pyarrow")


def explode_tokens(sf_dir: str):
    """Row explosion (reference M2/M3 map_expand analog): one row per
    token with its position."""
    import re

    token_re = re.compile("[a-z0-9]+")

    def fn(batch: pa.Table) -> pa.Table:
        toks = [token_re.findall(t.lower()) for t in batch["text"].to_pylist()]
        counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        ends = np.cumsum(counts)
        total = int(ends[-1]) if len(ends) else 0
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), counts
        )
        positions = np.arange(total) - np.repeat(ends - counts, counts)
        flat = [tok for doc in toks for tok in doc]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(positions, pa.int64()),
                "token": pa.array(flat, pa.string()),
            }
        )

    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow")


def docs_by_lang_source(sf_dir: str):
    """Grouped aggregate with combiner semantics over documents."""
    from ray.data.aggregate import Count, Sum

    import ray.data

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
        )
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["lang", "source"])
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
    )


def asof_last_order(sf_dir: str, num_buckets: int = 64):
    """As-of join (a §2.5 custom operator Ray Data lacks natively): for
    each event, the customer's most recent order at-or-before the event
    time (ties on date broken by max orderkey).

    Shape: both sides carry a ``side`` tag and a ``bucket = key %
    num_buckets`` column, union, ONE hash shuffle on the bucket, then
    ``pandas.merge_asof(by=key)`` (vectorized C path) matches every
    event against its customer's order timeline inside the bucket.
    Bucketing keeps group count fixed and per-group work fat — the
    per-group pandas overhead of key-per-group map_groups dominated at
    thousands of keys. The partitioning assumption: one bucket's rows
    fit one group; num_buckets scales with the cluster, not the data.
    Events whose customer has no prior order are dropped (inner)."""

    def prep_events(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch["user_id"], pa.int64())
        return pa.table(
            {
                "bucket": pc.cast(
                    pa.array(key.to_numpy(zero_copy_only=False) % num_buckets),
                    pa.int32(),
                ),
                "key": key,
                "side": pa.array(["e"] * len(batch)),
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "ts": batch["ts"],
                "o_orderkey": pa.array([0] * len(batch), pa.int64()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch["o_custkey"], pa.int64())
        return pa.table(
            {
                "bucket": pc.cast(
                    pa.array(key.to_numpy(zero_copy_only=False) % num_buckets),
                    pa.int32(),
                ),
                "key": key,
                "side": pa.array(["o"] * len(batch)),
                "event_id": pa.array([0] * len(batch), pa.int64()),
                "ts": batch["o_orderdate"],
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            }
        )

    def match(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        sub = group.groupby("key", sort=False).size()
        if len(sub):  # skew visibility: largest per-customer timeline
            record_group(
                "asof_last_order(key)", int(sub.idxmax()), int(sub.max())
            )
        ev = group[group["side"] == "e"].sort_values("ts", kind="stable")
        # secondary sort: among equal (key, ts) orders merge_asof picks
        # the LAST row, so ascending o_orderkey ⇒ max orderkey wins
        od = group[group["side"] == "o"].sort_values(
            ["ts", "o_orderkey"], kind="stable"
        )
        if not len(ev) or not len(od):
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "last_orderkey": pd.Series([], dtype=np.int64),
                    "last_orderdate": pd.Series([], dtype="datetime64[us]"),
                }
            )
        od = od.assign(od_date=od["ts"])  # keep the matched date (merge_asof
        # returns the LEFT frame's on-column, the right's is dropped)
        m = pd.merge_asof(
            ev[["event_id", "key", "ts"]],
            od[["key", "ts", "o_orderkey", "od_date"]],
            on="ts",
            by="key",
            direction="backward",
        )
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].to_numpy(),
                "user_id": m["key"].to_numpy(),
                "last_orderkey": m["o_orderkey"].to_numpy(np.int64),
                "last_orderdate": m["od_date"].to_numpy(),
            }
        )

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"]).map_batches(
        prep_events, batch_format="pyarrow"
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        events.union(orders)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(match, batch_format="pandas")
    )


def region_customer_stats(sf_dir: str):
    """Multi-hop broadcast join: customer → nation → region, grouped.

    nation × region are tiny dimension tables: composed driver-side into
    one nationkey → region-name array, ``ray.put`` once, resolved per
    worker — the fact table streams through a vectorized take with NO
    shuffle until the final small groupby (SURVEY.md §2.5's broadcast
    pattern, two hops deep)."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rnames = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    nk = np.asarray(nation["n_nationkey"])
    dense = np.empty(int(nk.max()) + 1, dtype=object)
    for k, rk in zip(nk, np.asarray(nation["n_regionkey"])):
        dense[k] = rnames[rk]
    lookup_ref = ray.put(dense)

    def add_region(batch: pa.Table) -> pa.Table:
        lut = _bcast(lookup_ref)
        keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "r_name": pa.array(lut[keys], pa.string()),
                "c_mktsegment": batch["c_mktsegment"],
            }
        )

    return (
        _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
        .map_batches(add_region, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["r_name", "c_mktsegment"])
        .aggregate(Count(alias_name="n_customers"))
    )


# per-worker-process broadcast cache (same pattern as pipeline._resolve_bcast)
_BCAST: dict = {}


def _bcast(ref):
    import ray

    key = ref.hex()
    if key not in _BCAST:
        _BCAST[key] = ray.get(ref)
    return _BCAST[key]


def customers_without_events(sf_dir: str):
    """Broadcast anti-join (§2.5 beyond-reference): customers that never
    produced an event.

    The distinct event-user key set is computed distributed (groupby →
    one row per user), pulled once (bounded by distinct-user count, not
    event count), sorted, and broadcast; the customer table then streams
    through a vectorized ``searchsorted`` membership filter — no
    shuffle touches the fact side. For key sets too big to broadcast,
    the same semantics fall back to the native hash join + null filter
    (the dedup_survivors_join pattern)."""
    import ray
    from ray.data.aggregate import Count

    users = (
        _read(sf_dir, "events", ["user_id"])
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("user_id")
        .aggregate(Count(alias_name="n"))
        .select_columns(["user_id"])
        .take_all()
    )
    keys = np.sort(np.array([r["user_id"] for r in users], dtype=np.int64))
    keys_ref = ray.put(keys)

    def anti(batch: pa.Table) -> pa.Table:
        ks = _bcast(keys_ref)
        cust = batch["c_custkey"].to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            # no events at all: every customer passes (and indexing an
            # empty ks below would raise before any length guard)
            hit = np.zeros(len(cust), dtype=bool)
        else:
            idx = np.searchsorted(ks, cust)
            idx_c = np.clip(idx, 0, len(ks) - 1)
            hit = ks[idx_c] == cust
        out = batch.filter(pa.array(~hit))
        return pa.table(
            {
                "c_custkey": pc.cast(out["c_custkey"], pa.int64()),
                "c_mktsegment": out["c_mktsegment"],
            }
        )

    return _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        anti, batch_format="pyarrow"
    )


def order_priority_revenue(sf_dir: str, num_buckets: int = 64):
    """Large×large co-partitioned shuffle join (§2.5): lineitem ⋈ orders
    on orderkey, aggregated to revenue per (o_orderpriority,
    l_returnflag).

    Neither side fits a broadcast at scale, so this is the real
    shuffle-join shape: both sides carry ``bucket = orderkey %
    num_buckets``, union side-tagged, ONE hash shuffle co-locates every
    orderkey's rows, and the probe is a vectorized in-group pandas merge.
    The lineitem side pre-aggregates per (orderkey, returnflag) inside
    each batch (combiner), so the shuffle carries per-order partials —
    never raw lineitem rows — and the in-group output is reduced again
    to (priority, returnflag) partials before the tiny final groupby.
    Partitioning assumption: one bucket's rows form one group;
    num_buckets scales with the cluster, not the data."""

    def prep_lineitem(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        rev_cents = pc.cast(
            pc.round(pc.multiply(rev, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_returnflag": batch["l_returnflag"].to_pylist(),
                "revenue_cents": rev_cents.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["key", "l_returnflag"], as_index=False).agg(
            n_items=("revenue_cents", "size"),
            revenue_cents=("revenue_cents", "sum"),
        )
        return pa.table(
            {
                "bucket": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int32)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "side": pa.array(["l"] * len(g)),
                "l_returnflag": pa.array(g["l_returnflag"], pa.string()),
                "o_orderpriority": pa.array([""] * len(g), pa.string()),
                "n_items": pa.array(g["n_items"].to_numpy(np.int64)),
                "revenue_cents": pa.array(g["revenue_cents"].to_numpy(np.int64)),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "bucket": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "side": pa.array(["o"] * n),
                "l_returnflag": pa.array([""] * n, pa.string()),
                "o_orderpriority": batch["o_orderpriority"],
                "n_items": pa.array(np.zeros(n, np.int64)),
                "revenue_cents": pa.array(np.zeros(n, np.int64)),
            }
        )

    def probe(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        li = group[group["side"] == "l"]
        od = group[group["side"] == "o"]
        sub = group.groupby("key", sort=False).size()
        if len(sub):  # skew visibility: hottest orderkey in the bucket
            record_group(
                "order_priority_revenue(key)", int(sub.idxmax()), int(sub.max())
            )
        m = li[["key", "l_returnflag", "n_items", "revenue_cents"]].merge(
            od[["key", "o_orderpriority"]], on="key"
        )
        g = m.groupby(["o_orderpriority", "l_returnflag"], as_index=False).agg(
            n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(prep_lineitem, batch_format="pyarrow", batch_size=65536)
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        prep_orders, batch_format="pyarrow"
    )
    # the probe output is bounded by buckets × |priority × returnflag|
    # partial rows, so the final combine is a driver-side pandas groupby
    # over a few hundred rows — cheaper than a second distributed
    # shuffle whose quantile sampling would re-execute the join
    partials = (
        li.union(od)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(probe, batch_format="pandas")
        .to_pandas()
    )
    out = partials.groupby(
        ["o_orderpriority", "l_returnflag"], as_index=False
    ).agg(n_items=("n_items", "sum"), revenue_cents=("revenue_cents", "sum"))
    out["n_items"] = out["n_items"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out


def events_after_order(sf_dir: str, days: int = 7, num_buckets: int = 64):
    """Interval (range) join (§2.5 custom operator): for every order,
    the count and value-sum of the customer's events inside
    ``[o_orderdate, o_orderdate + days)``.

    Same co-partitioned shape as the as-of join: both sides bucket on
    the user key, union, one hash shuffle, then the in-group probe is
    fully vectorized — events sort once by (user, ts) into a composite
    int64 key and a prefix-sum of value, and every order's window
    resolves to two ``searchsorted`` cuts (count = hi−lo, sum =
    pref[hi]−pref[lo]). No per-user Python loop; a hot user costs two
    binary searches per order, not a scan."""

    def prep_events(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch["user_id"], pa.int64())
        val_e4 = pc.cast(
            pc.round(pc.multiply(batch["value"], pa.scalar(10000.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {
                "bucket": pa.array(
                    (key.to_numpy(zero_copy_only=False) % num_buckets).astype(np.int32)
                ),
                "key": key,
                "side": pa.array(["e"] * len(batch)),
                "ts": batch["ts"],
                "o_orderkey": pa.array(np.zeros(len(batch), np.int64)),
                "value_e4": val_e4,
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch["o_custkey"], pa.int64())
        return pa.table(
            {
                "bucket": pa.array(
                    (key.to_numpy(zero_copy_only=False) % num_buckets).astype(np.int32)
                ),
                "key": key,
                "side": pa.array(["o"] * len(batch)),
                "ts": batch["o_orderdate"],
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "value_e4": pa.array(np.zeros(len(batch), np.int64)),
            }
        )

    window_us = np.int64(days) * 86_400_000_000

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        od = group[group["side"] == "o"]
        out = pd.DataFrame(
            {
                "o_orderkey": od["o_orderkey"].to_numpy(np.int64),
                "user_id": od["key"].to_numpy(np.int64),
            }
        )
        ev = group[group["side"] == "e"]
        ev_key = ev["key"].to_numpy(np.int64)
        ev_ts = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
        o_key = out["user_id"].to_numpy()
        o_ts = od["ts"].to_numpy("datetime64[us]").astype(np.int64)
        if len(ev):
            # composite (key, ts) → one sortable int64: shift timestamps
            # to a non-negative offset so key strictly dominates. Keys
            # are rank-compressed per bucket (dense codes over the union
            # of both sides) so the composite is bounded by
            # users-per-bucket × time-span, not by the raw id space —
            # raw 32-bit ids × a month of microseconds would overflow.
            uniq = np.unique(np.concatenate([ev_key, o_key]))
            ev_code = np.searchsorted(uniq, ev_key)
            o_code = np.searchsorted(uniq, o_key)
            t0 = ev_ts.min() - 1  # -1 keeps lo-edge searches in range
            span = np.int64(ev_ts.max() - t0 + window_us + 2)
            # guard in Python ints: the np.int64 product would itself
            # wrap negative at the very scale being guarded against
            if not int(len(uniq)) * int(span) < np.iinfo(np.int64).max:
                raise ValueError(
                    "users-per-bucket x time-span overflows int64; "
                    "raise num_buckets or chunk the time axis"
                )
            comp = ev_code * span + (ev_ts - t0)
            order = np.argsort(comp, kind="stable")
            comp = comp[order]
            pref = np.concatenate(
                ([0], np.cumsum(ev["value_e4"].to_numpy(np.int64)[order]))
            )
            # clip query offsets into [0, span-1]: event offsets live in
            # [1, span-window-2], so clipped cuts stay inside the order's
            # OWN user range — an order dated outside the event range
            # must not spill into a neighboring user's composite block
            lo_off = np.clip(o_ts - t0, 0, span - 1)
            hi_off = np.clip(o_ts - t0 + window_us, 0, span - 1)
            lo = np.searchsorted(comp, o_code * span + lo_off, side="left")
            hi = np.searchsorted(comp, o_code * span + hi_off, side="left")
            out["n_events_7d"] = (hi - lo).astype(np.int64)
            out["sum_value_e4"] = pref[hi] - pref[lo]
        else:
            out["n_events_7d"] = np.zeros(len(out), np.int64)
            out["sum_value_e4"] = np.zeros(len(out), np.int64)
        return out

    events = _read(sf_dir, "events", ["ts", "user_id", "value"]).map_batches(
        prep_events, batch_format="pyarrow"
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        events.union(orders)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(probe, batch_format="pandas")
    )


def top_docs_per_group(sf_dir: str, k: int = 5):
    """Per-group top-k (the windowed ``ROW_NUMBER() OVER (PARTITION BY
    lang ORDER BY n_chars DESC, doc_id)`` shape): the k longest
    documents of every language.

    Combiner-shaped: each batch keeps only its local top-k per lang
    (vectorized pandas sort + group-head), so the ``groupby(lang)``
    shuffle carries ≤ k rows per (lang, batch) — never the corpus. The
    handful of language groups makes per-key ``map_groups`` overhead
    irrelevant here (contrast the bucketed ops, whose key counts are
    unbounded)."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        top = (
            df.sort_values(["lang", "n_chars", "doc_id"],
                           ascending=[True, False, True])
            .groupby("lang", group_keys=False)
            .head(k)
        )
        return from_pandas_typed(top, ("lang",))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "rank", "doc_id", "n_chars"]].astype(
            {"doc_id": np.int64, "n_chars": np.int64}
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


def _bloom_hashes(keys: np.ndarray, m: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit indices via double hashing of a
    splitmix64-style mix — pure numpy uint64, no Python loop."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        w = (x ^ np.uint64(0xC2B2AE3D27D4EB4F)) * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (w ^ (w >> np.uint64(33))) | np.uint64(1)  # odd stride
        i = np.arange(n_hashes, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
            np.int64
        )


def customers_with_events(
    sf_dir: str, m_bits: int = 1 << 17, n_hashes: int = 4
):
    """Bloom-filter semi-join (§2.5 scale pattern): customers with ≥1
    event, where the big probe side is pre-filtered by a Bloom filter
    built DISTRIBUTED over the events — the shape that precedes every
    expensive join at 100 TB.

    1. **build**: each events batch emits ONE row — its 16 KiB packed
       Bloom bitmap; a shuffle-free tree OR (``map_batches`` over 1024
       bitmaps at a time) collapses the partials, so the driver pulls a
       few filter-sized rows. No all-to-all exchange anywhere in the
       build: communication is O(#batches × filter size), tree-compressed.
    2. **probe**: the filter broadcasts once (``ray.put``); customers
       stream through a vectorized k-probe membership test. Survivors
       are the true members plus Bloom false positives.
    3. **verify**: the (small) candidate set broadcasts back over the
       events; each batch emits a packed membership bitmap over the
       candidate array (same tree OR), so exact semantics cost one more
       shuffle-free pass over ``user_id`` only (pruned read) and the
       result matches the SQL semi-join bit-for-bit."""
    import ray

    def _or_rows(batch: pa.Table) -> pa.Table:
        arrs = [
            np.frombuffer(b, np.uint8)
            for b in batch["bm"].to_pylist()
        ]
        return pa.table(
            {"bm": pa.array([np.bitwise_or.reduce(arrs).tobytes()],
                            pa.binary())}
        )

    def _tree_or(ds) -> np.ndarray:
        rows = (
            ds.map_batches(_or_rows, batch_format="pyarrow",
                           batch_size=1024)
            .take_all()
        )
        return np.bitwise_or.reduce(
            [np.frombuffer(r["bm"], np.uint8) for r in rows]
        )

    def bits_partial(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        idx = np.unique(_bloom_hashes(keys, m_bits, n_hashes))
        bm = np.zeros(m_bits // 8, np.uint8)
        np.bitwise_or.at(
            bm, idx >> 3, np.left_shift(1, idx & 7).astype(np.uint8)
        )
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    packed = _tree_or(
        _read(sf_dir, "events", ["user_id"]).map_batches(
            bits_partial, batch_format="pyarrow"
        )
    )
    bloom = np.unpackbits(packed, bitorder="little").astype(bool)
    bloom_ref = ray.put(bloom)

    def probe(batch: pa.Table) -> pa.Table:
        bl = _bcast(bloom_ref)
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        idx = _bloom_hashes(keys, m_bits, n_hashes)
        hit = bl[idx].all(axis=1)
        out = batch.filter(pa.array(hit))
        return pa.table(
            {
                "c_custkey": pc.cast(out["c_custkey"], pa.int64()),
                "c_mktsegment": out["c_mktsegment"],
            }
        )

    candidates = _read(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"]
    ).map_batches(probe, batch_format="pyarrow")

    # exact verify: confirm candidates against the events (drops Bloom
    # false positives). The confirm set is bounded by the candidates.
    cand_rows = candidates.take_all()
    cand_keys = np.sort(
        np.array([r["c_custkey"] for r in cand_rows], np.int64)
    )
    cand_ref = ray.put(cand_keys)

    n_cand_bytes = max(1, (len(cand_keys) + 7) // 8)

    def confirm_partial(batch: pa.Table) -> pa.Table:
        ck = _bcast(cand_ref)
        keys = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        bm = np.zeros(n_cand_bytes, np.uint8)
        if len(ck):
            pos = np.clip(np.searchsorted(ck, keys), 0, len(ck) - 1)
            hit = np.unique(pos[ck[pos] == keys])
            np.bitwise_or.at(
                bm, hit >> 3, np.left_shift(1, hit & 7).astype(np.uint8)
            )
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    member = np.unpackbits(
        _tree_or(
            _read(sf_dir, "events", ["user_id"]).map_batches(
                confirm_partial, batch_format="pyarrow"
            )
        ),
        bitorder="little",
    )[: len(cand_keys)].astype(bool)
    confirmed = set(cand_keys[member].tolist())
    # both sets are already bounded and driver-resident — the final
    # semi-join result is their intersection, no fourth table pass
    import ray.data

    final = pa.table(
        {
            "c_custkey": pa.array(
                [int(r["c_custkey"]) for r in cand_rows
                 if int(r["c_custkey"]) in confirmed],
                pa.int64(),
            ),
            "c_mktsegment": pa.array(
                [r["c_mktsegment"] for r in cand_rows
                 if int(r["c_custkey"]) in confirmed],
                pa.string(),
            ),
        }
    )
    return ray.data.from_arrow(final)


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    k: int = 10,
    num_buckets: int = 64,
):
    """TPC-H Q3-shaped composite: top-k unshipped-revenue orders for one
    market segment — broadcast semi-join (customer segment keys →
    orders), then the co-partitioned shuffle join against lineitem with
    per-order combiner partials, per-bucket local top-k, and a global
    sort over num_buckets × k rows. Composes the repo's three join
    shapes in one pipeline the way a real report would."""
    import ray

    import pyarrow.parquet as pq

    cut = pa.scalar(np.datetime64(cutoff, "us"))

    # dimension side: segment customers are a small filtered key set
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = np.asarray(cust["c_custkey"])[
        np.asarray(cust["c_mktsegment"]) == segment
    ]
    keys_ref = ray.put(np.sort(keys.astype(np.int64)))

    def prep_orders(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["o_orderdate"], cut))
        ks = _bcast(keys_ref)
        ckeys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        if len(ks):
            pos = np.clip(np.searchsorted(ks, ckeys), 0, len(ks) - 1)
            batch = batch.filter(pa.array(ks[pos] == ckeys))
        else:
            batch = batch.slice(0, 0)
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "bucket": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "side": pa.array(["o"] * n),
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
                "revenue_cents": pa.array(np.zeros(n, np.int64)),
            }
        )

    def prep_lineitem(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cut))
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        rev_cents = pc.cast(
            pc.round(pc.multiply(rev, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "revenue_cents": rev_cents.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("key", as_index=False)["revenue_cents"].sum()  # combiner
        n = len(g)
        return pa.table(
            {
                "bucket": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int32)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "side": pa.array(["l"] * n),
                "o_orderdate": pa.array(
                    np.zeros(n, "datetime64[us]"), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([""] * n, pa.string()),
                "revenue_cents": pa.array(
                    g["revenue_cents"].to_numpy(np.int64)
                ),
            }
        )

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        li = group[group["side"] == "l"]
        od = group[group["side"] == "o"]
        rev = li.groupby("key", as_index=False)["revenue_cents"].sum()
        m = rev.merge(
            od[["key", "o_orderdate", "o_orderpriority"]], on="key"
        )
        m = m.sort_values(
            ["revenue_cents", "key"], ascending=[False, True]
        ).head(k)  # local top-k: the global sort sees ≤ buckets × k rows
        return pd.DataFrame(
            {
                "l_orderkey": m["key"].to_numpy(np.int64),
                "revenue_cents": m["revenue_cents"].to_numpy(np.int64),
                "o_orderdate": m["o_orderdate"].to_numpy(),
                "o_orderpriority": m["o_orderpriority"].to_numpy(object),
            }
        )

    orders = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(prep_orders, batch_format="pyarrow")
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(prep_lineitem, batch_format="pyarrow", batch_size=65536)
    return (
        li.union(orders)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(probe, batch_format="pandas")
        .materialize()  # pin before sort: quantile sampling re-executes lazy inputs
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def regional_supplier_revenue(
    sf_dir: str,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    num_buckets: int = 64,
):
    """TPC-H Q5-shaped composite: revenue per supplier nation for one
    region and order-date year, counting only lineitems whose supplier
    sits in the *customer's* nation — the join whose filter compares
    dimension attributes of BOTH fact sides, so neither side can be
    resolved alone.

    Shape: region→nation is driver-side tiny; supplier→nationkey and
    customer→nationkey are one ``ray.put`` each (sorted key arrays +
    aligned values, the :func:`orders_by_segment` bound — at true web
    scale the customer map graduates to the co-partitioned join,
    documented there). Both fact sides resolve their own nation inside
    ``map_batches`` and PRUNE to the region's nations before the
    shuffle; lineitem pre-aggregates per (orderkey, supp_nation)
    combiner partials. One hash shuffle on ``orderkey % num_buckets``
    co-locates each order's partials with its single order row; the
    in-group probe is a vectorized merge + nation-equality mask. The
    final groupby is ≤25 nation rows."""
    import pyarrow.parquet as pq
    import ray

    lo = pa.scalar(np.datetime64(date_from, "us"))
    hi = pa.scalar(np.datetime64(date_to, "us"))

    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkeys = np.asarray(reg["r_regionkey"])[np.asarray(reg["r_name"]) == region]
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    in_region = np.isin(np.asarray(nat["n_regionkey"]), rkeys)
    region_nations = np.sort(
        np.asarray(nat["n_nationkey"])[in_region].astype(np.int64)
    )
    nation_names = dict(
        zip(
            np.asarray(nat["n_nationkey"])[in_region].tolist(),
            np.asarray(nat["n_name"])[in_region].tolist(),
        )
    )

    def _sorted_map(table: str, key: str, val: str):
        t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, val])
        k = np.asarray(t[key]).astype(np.int64)
        v = np.asarray(t[val]).astype(np.int64)
        order = np.argsort(k, kind="stable")
        return ray.put((k[order], v[order]))

    supp_ref = _sorted_map("supplier", "s_suppkey", "s_nationkey")
    cust_ref = _sorted_map("customer", "c_custkey", "c_nationkey")

    def _lookup(ref, keys: np.ndarray) -> np.ndarray:
        ks, vs = _bcast(ref)
        if len(ks) == 0:
            return np.full(len(keys), -1, np.int64)
        pos = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
        out = vs[pos].copy()
        out[ks[pos] != keys] = -1
        return out

    def prep_orders(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["o_orderdate"], lo),
                pc.less(batch["o_orderdate"], hi),
            )
        )
        cnat = _lookup(cust_ref, batch["o_custkey"].to_numpy(zero_copy_only=False))
        keep = np.isin(cnat, region_nations)
        batch = batch.filter(pa.array(keep))
        cnat = cnat[keep]
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((key % num_buckets).astype(np.int32)),
                "key": pa.array(key.astype(np.int64)),
                "side": pa.array(["o"] * len(batch)),
                "nationkey": pa.array(cnat),
                "revenue_cents": pa.array(np.zeros(len(batch), np.int64)),
            }
        )

    def prep_lineitem(batch: pa.Table) -> pa.Table:
        snat = _lookup(supp_ref, batch["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = np.isin(snat, region_nations)  # prune before the shuffle
        batch = batch.filter(pa.array(keep))
        snat = snat[keep]
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        rev_cents = pc.cast(
            pc.round(
                pc.multiply(rev, pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "nationkey": snat,
                "revenue_cents": rev_cents.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["key", "nationkey"], as_index=False)[
            "revenue_cents"
        ].sum()  # combiner: per-(order, supp-nation) partials
        return pa.table(
            {
                "bucket": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int32)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "side": pa.array(["l"] * len(g)),
                "nationkey": pa.array(g["nationkey"].to_numpy(np.int64)),
                "revenue_cents": pa.array(
                    g["revenue_cents"].to_numpy(np.int64)
                ),
            }
        )

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        li = group[group["side"] == "l"]
        od = group[group["side"] == "o"]
        m = li[["key", "nationkey", "revenue_cents"]].merge(
            od[["key", "nationkey"]], on="key", suffixes=("", "_cust")
        )
        m = m[m["nationkey"] == m["nationkey_cust"]]
        return m.groupby("nationkey", as_index=False)["revenue_cents"].sum()

    from ray.data.aggregate import Sum

    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        prep_orders, batch_format="pyarrow"
    )
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_lineitem, batch_format="pyarrow", batch_size=65536)
    agg = (
        li.union(od)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(probe, batch_format="pandas")
        .materialize()  # pin the probe output before the final shuffle
        .groupby("nationkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": [
                    nation_names[int(k)] for k in batch["nationkey"]
                ],
                "revenue_cents": batch["revenue_cents"].to_numpy(np.int64),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def large_quantity_orders(sf_dir: str, threshold: int = 150, num_buckets: int = 64):
    """TPC-H Q18-shaped composite (large-volume customers): orders whose
    total lineitem quantity exceeds ``threshold``, joined back to the
    order header — the GROUP BY → HAVING → join-back-to-detail shape.

    Scale shape: ONE fused bucket shuffle. Per-batch per-orderkey
    quantity partials (one row per (orderkey, batch)) and the order
    header rows are side-tagged and co-shuffled by ``orderkey %
    num_buckets``; each group sums its partials, applies the HAVING cut,
    and joins the survivors to the headers in-place. A
    ``groupby(o_orderkey)`` would sort-shuffle one row per distinct
    order (~150k keys at sf0.1 — measured 10.4 s vs ~1 s bucketed);
    a key wholly inside one bucket makes the in-group sum exact.
    Output: (o_orderkey, o_custkey, o_orderdate, total_qty),
    integer-exact."""

    def qty_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(
                    zero_copy_only=False
                ),
                "total_qty": pc.cast(batch["l_quantity"], pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("o_orderkey", as_index=False)["total_qty"].sum()
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
                "total_qty": pa.array(g["total_qty"].to_numpy(np.int64)),
                "o_custkey": pa.array(np.zeros(len(g), np.int64)),
                "o_orderdate": pa.array([None] * len(g), pa.timestamp("us")),
                "side": pa.array(["q"] * len(g), pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "total_qty": pa.array([0] * len(batch), pa.int64()),
                "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "side": pa.array(["o"] * len(batch), pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bkt", pa.array((k % num_buckets).astype(np.int64))
        )

    def sum_having_join(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("large_quantity_orders(bucket)", None, len(group))
        q = (
            group[group["side"] == "q"]
            .groupby("o_orderkey", as_index=False)["total_qty"]
            .sum()
        )
        q = q[q["total_qty"] > threshold]
        o = group[group["side"] == "o"][
            ["o_orderkey", "o_custkey", "o_orderdate"]
        ]
        j = q.merge(o, on="o_orderkey", how="inner")
        return pa.table(
            {
                "o_orderkey": pa.array(j["o_orderkey"].to_numpy(np.int64)),
                "o_custkey": pa.array(j["o_custkey"].to_numpy(np.int64)),
                "o_orderdate": pa.Array.from_pandas(
                    j["o_orderdate"], type=pa.timestamp("us")
                ),
                "total_qty": pa.array(j["total_qty"].to_numpy(np.int64)),
            }
        )

    qty = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        qty_partial, batch_format="pyarrow", batch_size=65536
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    return (
        qty.union(orders)
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(sum_having_join, batch_format="pandas")
    )


def cheapest_supplier_per_part(sf_dir: str, num_buckets: int = 64):
    """TPC-H Q2-core-shaped ARGMIN join (this corpus has no partsupp
    table, so the fact side is lineitem): for every part, the supplier
    offering the minimum effective unit price
    ``round(extendedprice·(1−discount)/quantity · 100)`` cents, ties
    broken by the smaller suppkey — the distributed argmin-per-group
    shape (SQL: ROW_NUMBER() OVER (PARTITION BY part ORDER BY price,
    supp) = 1).

    Scale shape: a per-batch per-part argmin combiner (one row per
    (partkey, batch), the hottest part costs one row per batch) → one
    ``groupby(partkey % num_buckets)`` bucket shuffle → in-group
    vectorized argmin via lexsort. The supplier name resolves from a
    broadcast (supplier is a dimension table: one ``ray.put`` of sorted
    keys, searchsorted probe per batch)."""
    import ray

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).take_all()
    s_keys = np.array([r["s_suppkey"] for r in sup], np.int64)
    s_names = np.array([r["s_name"] for r in sup], object)
    order = np.argsort(s_keys)
    sup_ref = ray.put((s_keys[order], s_names[order]))

    def argmin_partial(batch: pa.Table) -> pa.Table:
        # same op order as the SQL oracle's expression, and pc.round's
        # half_towards_infinity == DuckDB round() (np.round would
        # banker's-round the exact .5 boundaries differently)
        unit = pc.multiply(
            pc.divide(
                pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                ),
                batch["l_quantity"],
            ),
            pa.scalar(100.0),
        )
        unit_cents = pc.cast(
            pc.round(unit, round_mode="half_towards_infinity"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "p_partkey": batch["l_partkey"].to_numpy(
                    zero_copy_only=False
                ),
                "s_suppkey": batch["l_suppkey"].to_numpy(
                    zero_copy_only=False
                ),
                "unit_cents": unit_cents,
            }
        )
        # in-batch argmin with the (price, suppkey) tie-break
        df = df.sort_values(
            ["p_partkey", "unit_cents", "s_suppkey"], kind="stable"
        ).drop_duplicates("p_partkey")
        df["bkt"] = df["p_partkey"].to_numpy(np.int64) % num_buckets
        return pa.Table.from_pandas(df, preserve_index=False)

    def argmin_final(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("cheapest_supplier(bucket)", None, len(group))
        g = group.sort_values(
            ["p_partkey", "unit_cents", "s_suppkey"], kind="stable"
        ).drop_duplicates("p_partkey")
        keys, names = _bcast(sup_ref)
        sk = g["s_suppkey"].to_numpy(np.int64)
        idx = np.searchsorted(keys, sk)
        idx = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx] == sk
        resolved = np.where(hit, names[idx], None)
        return pa.table(
            {
                "p_partkey": pa.array(g["p_partkey"].to_numpy(np.int64)),
                "s_suppkey": pa.array(sk),
                "s_name": pa.array(resolved, pa.string()),
                "unit_cents": pa.array(g["unit_cents"].to_numpy(np.int64)),
            }
        )

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
        )
        .map_batches(argmin_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(argmin_final, batch_format="pandas")
    )


def rollup_revenue(sf_dir: str):
    """Multi-granularity ROLLUP aggregate — GROUP BY ROLLUP(l_returnflag,
    l_linestatus) over lineitem: finest cells, per-flag subtotals and the
    grand total in one result, with a ``lvl`` column (0 finest, 1
    subtotal, 2 grand) and 'ALL' standing in for rolled-up keys.

    Reference anchor: no reference counterpart (chug has no relational
    layer); extends the aggregation family (pricing_summary) with the
    grouping-sets shape every reporting pipeline needs.

    Scale shape: ONE distributed combiner groupby at the finest
    granularity (integer-cents partials, exactly pricing_summary's
    machinery); the coarser levels are derived from the finest *result*,
    which is bounded by the attribute domain (|returnflag| × |linestatus|
    enum cells — a few rows at any corpus size), so the trailing
    ``repartition(1)`` touches a constant-size table, never the facts.
    """
    from ray.data.aggregate import Count, Sum

    def prep(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        revenue_cents = pc.cast(
            pc.round(pc.multiply(disc_price, pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(batch["l_quantity"], pa.int64()),
                "revenue_cents": revenue_cents,
            }
        )

    finest = (
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="revenue_cents"),
            Count(alias_name="count_order"),
        )
    )

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        # single block: the finest table is attribute-domain-sized
        df = df.copy()
        for col in ("sum_qty", "revenue_cents", "count_order"):
            df[col] = df[col].astype(np.int64)
        df["lvl"] = np.int64(0)
        sub = df.groupby("l_returnflag", as_index=False)[
            ["sum_qty", "revenue_cents", "count_order"]
        ].sum()
        sub["l_linestatus"] = "ALL"
        sub["lvl"] = np.int64(1)
        grand = pd.DataFrame(
            {
                "l_returnflag": ["ALL"],
                "l_linestatus": ["ALL"],
                "sum_qty": [df["sum_qty"].sum()],
                "revenue_cents": [df["revenue_cents"].sum()],
                "count_order": [df["count_order"].sum()],
                "lvl": [np.int64(2)],
            }
        )
        cols = ["l_returnflag", "l_linestatus", "lvl",
                "sum_qty", "revenue_cents", "count_order"]
        out = pd.concat([df[cols], sub[cols], grand[cols]], ignore_index=True)
        for col in ("lvl", "sum_qty", "revenue_cents", "count_order"):
            out[col] = out[col].astype(np.int64)
        return out

    return finest.repartition(1).map_batches(
        roll, batch_format="pandas", batch_size=None
    )


def late_shipment_orders(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    lag_days: int = 90,
    num_buckets: int = 64,
):
    """TPC-H Q4-shaped composite: orders in a date window having at
    least one lineitem shipped more than ``lag_days`` after the order
    date, counted per priority — an EXISTS semi-join whose predicate
    compares columns ACROSS the two tables (l_shipdate vs o_orderdate),
    so neither side can resolve it alone.

    Scale shape: EXISTS(ship > odate + lag) ⇔ max(ship) > odate + lag,
    so the lineitem side reduces to a per-batch per-orderkey MAX
    combiner (one row per (orderkey, batch)); partials and the filtered
    order headers co-shuffle in ONE ``orderkey % num_buckets`` bucket
    pass (large_quantity_orders' fused shape), each group resolves the
    cross-table inequality in-place and emits per-priority partial
    counts; a final priority-key groupby sums ≤ |priorities| rows per
    bucket. Timestamps ride as int64 microseconds — integer-exact."""

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)
    lag_us = np.int64(lag_days) * 86_400_000_000

    def ship_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship_us": pc.cast(batch["l_shipdate"], pa.int64()).to_numpy(),
            }
        )
        g = df.groupby("o_orderkey", as_index=False)["ship_us"].max()
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
                "ship_us": pa.array(g["ship_us"].to_numpy(np.int64)),
                "odate_us": pa.array(np.zeros(len(g), np.int64)),
                "o_orderpriority": pa.array([""] * len(g), pa.string()),
                "side": pa.array(["l"] * len(g), pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        od = pc.cast(batch["o_orderdate"], pa.int64())
        keep = pc.and_(
            pc.greater_equal(od, pa.scalar(int(lo))),
            pc.less(od, pa.scalar(int(hi))),
        )
        batch = batch.filter(keep)
        od = pc.cast(batch["o_orderdate"], pa.int64())
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "ship_us": pa.array(np.zeros(len(batch), np.int64)),
                "odate_us": od,
                "o_orderpriority": batch["o_orderpriority"],
                "side": pa.array(["o"] * len(batch), pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bkt", pa.array((k % num_buckets).astype(np.int64))
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("late_shipment_orders(bucket)", None, len(group))
        l = (
            group[group["side"] == "l"]
            .groupby("o_orderkey", as_index=False)["ship_us"]
            .max()
        )
        o = group[group["side"] == "o"][
            ["o_orderkey", "odate_us", "o_orderpriority"]
        ]
        j = o.merge(l, on="o_orderkey", how="inner")
        late = j[j["ship_us"].to_numpy(np.int64)
                 > j["odate_us"].to_numpy(np.int64) + lag_us]
        g = late.groupby("o_orderpriority", as_index=False).size()
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    g["o_orderpriority"].tolist(), pa.string()
                ),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    partials = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        ship_partial, batch_format="pyarrow", batch_size=65536
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    agg = (
        partials.union(orders)
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_late_orders"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["n_late_orders"] = df["n_late_orders"].astype(np.int64)
        return df

    return agg.map_batches(finalize, batch_format="pandas")


def cust_order_distribution(sf_dir: str, num_buckets: int = 64):
    """TPC-H Q13-shaped composite: the distribution of per-customer
    order counts (excluding urgent orders) INCLUDING the zero bucket —
    the aggregate-of-an-aggregate shape with a LEFT JOIN's absent-side
    semantics.

    Scale shape: per-batch per-custkey count partials → one
    ``custkey % num_buckets`` bucket shuffle → in-group per-custkey
    totals collapse immediately to an in-group histogram (c_count,
    n_custs) — the custkey dimension never leaves its bucket; a final
    c_count-key groupby sums histograms (bounded by max orders per
    customer). The zero bucket is total customers (one scalar
    ``count()`` on the customer table) minus the customers seen with
    orders — no customer-table shuffle at all. Driver pulls only the
    final histogram (bounded by the count domain)."""
    from ray.data.aggregate import Sum

    def cnt_partial(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["o_orderpriority"], pa.scalar("1-URGENT"))
        batch = batch.filter(keep)
        df = pd.DataFrame(
            {"c_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("c_custkey", as_index=False).size()
        bkt = g["c_custkey"].to_numpy(np.int64) % num_buckets
        return pa.table(
            {
                "c_custkey": pa.array(g["c_custkey"].to_numpy(np.int64)),
                "n": pa.array(g["size"].to_numpy(np.int64)),
                "bkt": pa.array(bkt.astype(np.int64)),
            }
        )

    def hist_partial(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("cust_order_distribution(bucket)", None, len(group))
        totals = group.groupby("c_custkey")["n"].sum()
        h = totals.value_counts()
        return pa.table(
            {
                "c_count": pa.array(h.index.to_numpy(np.int64)),
                "custdist": pa.array(h.to_numpy(np.int64)),
            }
        )

    hist = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(cnt_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(hist_partial, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .take_all()  # bounded: distinct per-customer order counts
    )
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    seen = sum(r["custdist"] for r in hist)
    rows = [(int(r["c_count"]), int(r["custdist"])) for r in hist]
    if n_customers - seen > 0:
        rows.append((0, int(n_customers - seen)))
    rows.sort()
    return pa.table(
        {
            "c_count": pa.array([r[0] for r in rows], pa.int64()),
            "custdist": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def priority_line_counts(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    num_buckets: int = 64,
):
    """TPC-H Q12-shaped composite: per lineitem return flag, how many
    lines in a ship-date window belong to high-priority vs low-priority
    orders — the CONDITIONAL-aggregation-after-join shape (SUM(CASE
    WHEN ...)), which neither a plain groupby nor a semi-join covers.

    Scale shape: the lineitem side collapses to per-(orderkey,
    returnflag) COUNT combiner partials inside each batch; order
    headers carry only (orderkey, is_high int8). Both co-shuffle in ONE
    ``orderkey % num_buckets`` bucket pass (the fused
    large_quantity_orders shape); each group resolves the join and
    reduces straight to per-returnflag (high, low) partials, so the
    final groupby sums ≤ |returnflags| rows per bucket. All counts are
    int64 — exact and order-invariant."""
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def line_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi),
        )
        batch = batch.filter(keep)
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_returnflag": batch["l_returnflag"].to_pandas(),
            }
        )
        g = df.groupby(["o_orderkey", "l_returnflag"], as_index=False).size()
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
                "l_returnflag": pa.array(g["l_returnflag"].tolist(), pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64)),
                "is_high": pa.array(np.zeros(len(g), np.int8)),
                "side": pa.array(["l"] * len(g), pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        high = pc.is_in(
            batch["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "l_returnflag": pa.array([""] * len(batch), pa.string()),
                "n": pa.array(np.zeros(len(batch), np.int64)),
                "is_high": pc.cast(high, pa.int8()),
                "side": pa.array(["o"] * len(batch), pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bkt", pa.array((k % num_buckets).astype(np.int64))
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("priority_line_counts(bucket)", None, len(group))
        l = group[group["side"] == "l"][["o_orderkey", "l_returnflag", "n"]]
        o = group[group["side"] == "o"][["o_orderkey", "is_high"]]
        j = l.merge(o, on="o_orderkey", how="inner")
        hi_mask = j["is_high"].to_numpy(np.int8) == 1
        n = j["n"].to_numpy(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": j["l_returnflag"],
                "high_line_count": np.where(hi_mask, n, 0),
                "low_line_count": np.where(hi_mask, 0, n),
            }
        )
        g = df.groupby("l_returnflag", as_index=False).sum()
        return pa.table(
            {
                "l_returnflag": pa.array(g["l_returnflag"].tolist(), pa.string()),
                "high_line_count": pa.array(
                    g["high_line_count"].to_numpy(np.int64)
                ),
                "low_line_count": pa.array(
                    g["low_line_count"].to_numpy(np.int64)
                ),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])
        .map_batches(line_partial, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
                prep_orders, batch_format="pyarrow"
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("l_returnflag")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
    )


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#1"):
    """TPC-H Q17-shaped composite: total revenue from lineitems of one
    brand's parts whose quantity is below 20% of that part's average
    quantity — the CORRELATED-scalar-subquery shape: the predicate
    compares each row against an aggregate of its own key group.

    Scale shape: the brand's partkeys are a pruned dimension read
    broadcast once (sorted int64 keys; ~|part|/|brands| entries — the
    orders_by_segment broadcast bound, documented there). Pass 1
    streams lineitem through a membership filter and per-partkey
    (sum_qty, cnt) combiner partials; the reduced per-part table
    (bounded by the brand's part count) broadcasts back. Pass 2
    re-streams lineitem and resolves the correlated predicate
    VECTORIZED AND INTEGER-EXACT: qty < 0.2·(sum/cnt) ⇔
    5·qty·cnt < sum with int64 quantities — no float division, so the
    parallel result is bit-deterministic. Nothing but the two bounded
    per-part tables ever leaves the workers."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = np.asarray(pt["p_partkey"]).astype(np.int64)
    keys = np.sort(pk[np.asarray(pt["p_brand"]) == brand])
    keys_ref = ray.put(keys)

    def _member(arr: np.ndarray, ks: np.ndarray) -> np.ndarray:
        if len(ks) == 0:
            return np.zeros(len(arr), bool)
        pos = np.clip(np.searchsorted(ks, arr), 0, len(ks) - 1)
        return ks[pos] == arr

    def qty_partial(batch: pa.Table) -> pa.Table:
        ks = _bcast(keys_ref)
        part = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m = _member(part, ks)
        df = pd.DataFrame(
            {
                "p_partkey": part[m],
                "qty": pc.cast(batch["l_quantity"], pa.int64()).to_numpy()[m],
            }
        )
        g = df.groupby("p_partkey", as_index=False).agg(
            sum_qty=("qty", "sum"), cnt=("qty", "size")
        )
        return pa.table(
            {
                "p_partkey": pa.array(g["p_partkey"].to_numpy(np.int64)),
                "sum_qty": pa.array(g["sum_qty"].to_numpy(np.int64)),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
            }
        )

    stats = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("p_partkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("cnt", alias_name="cnt"))
        .take_all()  # bounded: one row per part of the brand
    )
    sk = np.array([r["p_partkey"] for r in stats], np.int64)
    order = np.argsort(sk, kind="stable")
    stats_ref = ray.put(
        (
            sk[order],
            np.array([r["sum_qty"] for r in stats], np.int64)[order],
            np.array([r["cnt"] for r in stats], np.int64)[order],
        )
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        ks, sums, cnts = _bcast(stats_ref)
        part = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m = _member(part, ks)
        qty = pc.cast(batch["l_quantity"], pa.int64()).to_numpy()[m]
        part = part[m]
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()[m]
        pos = np.clip(np.searchsorted(ks, part), 0, max(len(ks) - 1, 0))
        if len(ks) == 0:
            keep = np.zeros(len(part), bool)
        else:
            keep = (ks[pos] == part) & (5 * qty * cnts[pos] < sums[pos])
        return pa.table(
            {
                "revenue_cents": pa.array([int(cents[keep].sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(rev_partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(Sum("revenue_cents", alias_name="r"), Sum("n_lines", alias_name="n"))
    )
    return pa.table(
        {
            "revenue_cents": pa.array([int(agg["r"] or 0)], pa.int64()),
            "n_lines": pa.array([int(agg["n"] or 0)], pa.int64()),
        }
    )


def important_parts(sf_dir: str, mult_permille: int = 1300):
    """TPC-H Q11-shaped composite: parts whose total lineitem value
    exceeds ``mult_permille``/1000 times the AVERAGE per-part value — a
    GROUP BY whose HAVING predicate depends on whole-table scalar
    aggregates (Q11's fraction-of-total threshold, made scale-free so
    the cut discriminates at every scale factor).

    Scale shape: one per-batch per-partkey cents combiner feeds one
    partkey groupby; the global total and part count are then
    aggregated FROM THE PER-PART TABLE (already materialized, bounded
    by |part|) — the fact table streams exactly once. The threshold
    compares integer cross-products (value·n_parts·1000 >
    total·mult_permille), so there is no float division and the cut is
    bit-deterministic."""
    from ray.data.aggregate import Sum

    def value_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                    ),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        df = pd.DataFrame(
            {
                "p_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "v": cents,
            }
        )
        g = df.groupby("p_partkey", as_index=False)["v"].sum()
        return pa.table(
            {
                "p_partkey": pa.array(g["p_partkey"].to_numpy(np.int64)),
                "v": pa.array(g["v"].to_numpy(np.int64)),
            }
        )

    per_part = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(value_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("p_partkey")
        .aggregate(Sum("v", alias_name="value_cents"))
        .materialize()  # reused twice: global total + threshold filter
    )
    from ray.data.aggregate import Count

    tot = per_part.aggregate(
        Sum("value_cents", alias_name="t"), Count(alias_name="n")
    )
    total, n_parts = int(tot["t"] or 0), int(tot["n"] or 0)
    # value·n·1000 > total·mult  ⇔  value > floor(total·mult / (n·1000))
    # for integers — one exact Python-int threshold, no wide multiply in
    # the workers and no int64 overflow at any scale
    thresh = (
        (total * mult_permille) // (n_parts * 1000) if n_parts else -1
    )

    def cut(batch: pa.Table) -> pa.Table:
        keep = batch["value_cents"].to_numpy(zero_copy_only=False) > thresh
        batch = batch.filter(pa.array(keep))
        return pa.table(
            {
                "p_partkey": pc.cast(batch["p_partkey"], pa.int64()),
                "value_cents": pc.cast(batch["value_cents"], pa.int64()),
            }
        )

    return per_part.map_batches(cut, batch_format="pyarrow")


def top_supplier(
    sf_dir: str, date_lo: str = "1996-01-01", date_hi: str = "1996-04-01"
):
    """TPC-H Q15-shaped composite: the supplier(s) with the MAXIMUM
    revenue in a ship-date quarter — an argmax over an aggregate view,
    keeping ALL ties (the classic max-of-aggregate join-back).

    Scale shape: the fact table reduces to per-batch per-suppkey cents
    partials and one suppkey groupby; the global max is aggregated from
    the per-supplier table (bounded by |supplier|), and the tie filter
    re-reads that same materialized table — one fact pass total. Names
    resolve from the supplier dimension for the ≤|ties| result rows
    only (pushdown-pruned columns, the cheapest_supplier_per_part
    bound). Integer cents make max and ties exact."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Sum

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def rev_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi),
        )
        batch = batch.filter(keep)
        cents = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                    ),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        df = pd.DataFrame(
            {
                "s_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "r": cents,
            }
        )
        g = df.groupby("s_suppkey", as_index=False)["r"].sum()
        return pa.table(
            {
                "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64)),
                "r": pa.array(g["r"].to_numpy(np.int64)),
            }
        )

    per_supp = (
        _read(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(rev_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("s_suppkey")
        .aggregate(Sum("r", alias_name="total_revenue_cents"))
        .materialize()  # reused: global max + tie filter
    )
    best = per_supp.aggregate(Max("total_revenue_cents", alias_name="m"))["m"]
    if best is None:  # empty window
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue_cents": pa.array([], pa.int64()),
            }
        )
    def tie_cut(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["total_revenue_cents"], pa.scalar(int(best)))
        )

    winners = per_supp.map_batches(tie_cut, batch_format="pyarrow").to_pandas()

    # pushdown: only the <=|ties| winner rows leave the dimension file
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", winners["s_suppkey"].tolist())],
    )
    nk = np.asarray(names["s_suppkey"]).astype(np.int64)
    order = np.argsort(nk, kind="stable")
    nk = nk[order]
    nv = np.asarray(names["s_name"]).astype(object)[order]
    pos = np.searchsorted(nk, winners["s_suppkey"].to_numpy(np.int64))
    return pa.table(
        {
            "s_suppkey": pa.array(winners["s_suppkey"].to_numpy(np.int64)),
            "s_name": pa.array([str(nv[p]) for p in pos], pa.string()),
            "total_revenue_cents": pa.array(
                winners["total_revenue_cents"].to_numpy(np.int64)
            ),
        }
    )


def supplier_count_by_class(sf_dir: str, num_buckets: int = 64):
    """TPC-H Q16-shaped composite: per (p_brand, p_type), how many
    DISTINCT suppliers shipped such parts — excluding blocklisted
    suppliers (negative account balance stands in for Q16's complaint
    predicate). COUNT(DISTINCT) under an anti-filter.

    Scale shape: the part attributes and the blocklist broadcast once
    (dimension-bounded). Each (brand, type) is dictionary-coded ON THE
    DRIVER from the dimension read (attribute-domain-bounded) and the
    fact triple packs into ONE int64 ``attr_code·2³³ + suppkey``, so
    the distinct step is a batch-level ``np.unique`` combiner feeding a
    single ``packed % num_buckets`` int bucket shuffle — a packed value
    lands wholly in one bucket, so the in-group unique IS the global
    distinct. No string ever rides the shuffle (the string-keyed
    three-column sort-groupby this replaces was 8× slower at sf0.1);
    names decode from the driver-side code table on the tiny final."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type"]
    )
    pk = np.asarray(pt["p_partkey"]).astype(np.int64)
    brands = np.asarray(pt["p_brand"]).astype(object)
    types = np.asarray(pt["p_type"]).astype(object)
    # dictionary-code (brand, type) on the driver — attribute-domain-
    # bounded (|brands|·|types|), never fact-sized
    b_vocab, b_idx = np.unique(brands.astype(str), return_inverse=True)
    t_vocab, t_idx = np.unique(types.astype(str), return_inverse=True)
    attr_code = (b_idx.astype(np.int64) * len(t_vocab) + t_idx).astype(np.int64)
    order = np.argsort(pk, kind="stable")

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    bad = np.sort(
        np.asarray(sup["s_suppkey"]).astype(np.int64)[
            np.asarray(sup["s_acctbal"]) < 0
        ]
    )
    dim_ref = ray.put((pk[order], attr_code[order], bad))

    _SUPP_BITS = 33  # suppkey < 2^33; attr codes fit the remaining 30

    def packed_partial(batch: pa.Table) -> pa.Table:
        keys, codes, blocked = _bcast(dim_ref)
        part = batch["l_partkey"].to_numpy(zero_copy_only=False)
        supp = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(blocked):
            bpos = np.clip(np.searchsorted(blocked, supp), 0, len(blocked) - 1)
            m = blocked[bpos] != supp
            part, supp = part[m], supp[m]
        if not ((supp >= 0).all() and (supp < (1 << _SUPP_BITS)).all()):
            raise ValueError(
                "suppkey overflows the packed (attr, supp) key"
            )
        pos = np.searchsorted(keys, part)
        packed = np.unique((codes[pos] << _SUPP_BITS) | supp)  # combiner
        return pa.table(
            {
                "packed": pa.array(packed),
                "bkt": pa.array(packed % num_buckets),
            }
        )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("supplier_count_by_class(bucket)", None, len(group))
        u = np.unique(group["packed"].to_numpy(np.int64))  # global distinct
        code, cnt = np.unique(u >> _SUPP_BITS, return_counts=True)
        return pd.DataFrame(
            {"attr_code": code, "supplier_cnt": cnt.astype(np.int64)}
        )

    rows = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(packed_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(per_bucket, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("attr_code")
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        code = batch["attr_code"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "p_brand": b_vocab[code // len(t_vocab)],
                "p_type": t_vocab[code % len(t_vocab)],
                "supplier_cnt": batch["supplier_cnt"].to_numpy(np.int64),
            }
        )

    return rows.map_batches(finalize, batch_format="pandas")


def sole_late_supplier(
    sf_dir: str, lag_days: int = 90, num_buckets: int = 64
):
    """TPC-H Q21-shaped composite: per supplier, the number of
    multi-supplier orders where THIS supplier was the ONLY one to ship
    more than ``lag_days`` after the order date — an EXISTS plus a
    NOT-EXISTS, both correlated to the same order group.

    Scale shape: the fact side reduces to per-batch per-(orderkey,
    suppkey) MAX-shipdate partials; those co-shuffle with the order
    headers in ONE orderkey-bucket pass (the late_shipment_orders
    shape). Each group finishes the (orderkey, suppkey) max, counts
    suppliers and late suppliers per order vectorized, credits the sole
    late supplier, and emits per-suppkey partial counts — the final
    groupby sums ≤|supplier| rows per bucket. Names resolve for the
    result rows from the pruned dimension. Timestamps ride as int64
    microseconds; everything is integer-exact."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lag_us = np.int64(lag_days) * 86_400_000_000

    def ship_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "s_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "ship_us": pc.cast(batch["l_shipdate"], pa.int64()).to_numpy(),
            }
        )
        g = df.groupby(["o_orderkey", "s_suppkey"], as_index=False)[
            "ship_us"
        ].max()
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].to_numpy(np.int64)),
                "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64)),
                "ship_us": pa.array(g["ship_us"].to_numpy(np.int64)),
                "odate_us": pa.array(np.zeros(len(g), np.int64)),
                "side": pa.array(["l"] * len(g), pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "s_suppkey": pa.array(np.zeros(len(batch), np.int64)),
                "ship_us": pa.array(np.zeros(len(batch), np.int64)),
                "odate_us": pc.cast(batch["o_orderdate"], pa.int64()),
                "side": pa.array(["o"] * len(batch), pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bkt", pa.array((k % num_buckets).astype(np.int64))
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("sole_late_supplier(bucket)", None, len(group))
        l = (
            group[group["side"] == "l"]
            .groupby(["o_orderkey", "s_suppkey"], as_index=False)["ship_us"]
            .max()
        )
        o = group[group["side"] == "o"][["o_orderkey", "odate_us"]]
        j = l.merge(o, on="o_orderkey", how="inner")
        late = (
            j["ship_us"].to_numpy(np.int64)
            > j["odate_us"].to_numpy(np.int64) + lag_us
        )
        j = j.assign(late=late.astype(np.int64))
        per_order = j.groupby("o_orderkey")
        n_supp = per_order["s_suppkey"].transform("size").to_numpy(np.int64)
        n_late = per_order["late"].transform("sum").to_numpy(np.int64)
        credit = j[(j["late"].to_numpy() == 1) & (n_supp >= 2) & (n_late == 1)]
        g = credit.groupby("s_suppkey", as_index=False).size()
        return pa.table(
            {
                "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64)),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(ship_partial, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                prep_orders, batch_format="pyarrow"
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("s_suppkey")
        .aggregate(Sum("n", alias_name="numwait"))
        .to_pandas()
    )

    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    nk = np.asarray(names["s_suppkey"]).astype(np.int64)
    order = np.argsort(nk, kind="stable")
    nk = nk[order]
    nv = np.asarray(names["s_name"]).astype(object)[order]
    pos = np.searchsorted(nk, agg["s_suppkey"].to_numpy(np.int64))
    return pa.table(
        {
            "s_suppkey": pa.array(agg["s_suppkey"].to_numpy(np.int64)),
            "s_name": pa.array([str(nv[p]) for p in pos], pa.string()),
            "numwait": pa.array(agg["numwait"].to_numpy(np.int64)),
        }
    )


def idle_rich_customers(
    sf_dir: str, since: str = "2001-01-01", num_buckets: int = 64
):
    """TPC-H Q22-shaped composite: per market segment, count and total
    balance of customers whose balance exceeds the GLOBAL average of
    positive balances and who have placed NO order since ``since`` — a
    whole-table scalar threshold plus an anti-join (the recency window
    keeps the anti side non-degenerate on corpora where every customer
    has SOME order).

    Scale shape: pass 1 reduces customer to two integers (sum of
    positive balances in cents, their count) — the threshold then
    resolves per row as cents·n > sum (integer cross-product, no float
    average). Pass 2 co-shuffles the thresholded customers with
    BATCH-DISTINCT order custkeys in one custkey-bucket pass; each
    group drops customers seen on the order side and emits per-segment
    (count, balance) partials — the final groupby sums ≤|segments| rows
    per bucket. No broadcast of the customers-with-orders set."""
    from ray.data.aggregate import Sum

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["c_acctbal"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        pos = cents[cents > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    tot = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    s_total, n_total = int(tot["s"] or 0), int(tot["n"] or 0)

    def prep_cust(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["c_acctbal"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        keep = cents * np.int64(n_total) > np.int64(s_total)
        batch = batch.filter(pa.array(keep))
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "c_mktsegment": batch["c_mktsegment"],
                "bal_cents": pa.array(cents[keep]),
                "side": pa.array(["c"] * int(keep.sum()), pa.string()),
            }
        )

    since_us = pa.scalar(np.datetime64(since, "us"))

    def prep_orders(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater_equal(batch["o_orderdate"], since_us)
        )
        ck = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "c_custkey": pa.array(ck.astype(np.int64)),
                "c_mktsegment": pa.array([""] * len(ck), pa.string()),
                "bal_cents": pa.array(np.zeros(len(ck), np.int64)),
                "side": pa.array(["o"] * len(ck), pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bkt", pa.array((k % num_buckets).astype(np.int64))
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("idle_rich_customers(bucket)", None, len(group))
        seen = group.loc[group["side"] == "o", "c_custkey"].unique()
        c = group[group["side"] == "c"]
        c = c[~c["c_custkey"].isin(seen)]
        g = c.groupby("c_mktsegment", as_index=False).agg(
            numcust=("c_custkey", "size"), tot=("bal_cents", "sum")
        )
        return pa.table(
            {
                "c_mktsegment": pa.array(g["c_mktsegment"].tolist(), pa.string()),
                "numcust": pa.array(g["numcust"].to_numpy(np.int64)),
                "tot": pa.array(g["tot"].to_numpy(np.int64)),
            }
        )

    rows = (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
        .map_batches(prep_cust, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
                prep_orders, batch_format="pyarrow", batch_size=65536
            )
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("c_mktsegment")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("tot", alias_name="totacctbal_cents"),
        )
        .take_all()  # bounded: one row per market segment
    )
    # typed driver-side table so an empty result keeps its schema
    return pa.table(
        {
            "c_mktsegment": pa.array(
                [r["c_mktsegment"] for r in rows], pa.string()
            ),
            "numcust": pa.array(
                [int(r["numcust"]) for r in rows], pa.int64()
            ),
            "totacctbal_cents": pa.array(
                [int(r["totacctbal_cents"]) for r in rows], pa.int64()
            ),
        }
    )


def _sorted_int_map(sf_dir: str, table: str, key: str, val: str):
    """Broadcast-ready (sorted keys, aligned int64 values) dimension map
    — the :func:`regional_supplier_revenue` bound: one ``ray.put`` per
    dimension, read once per worker process via :func:`_bcast`. At true
    web scale the customer-sized maps graduate to the co-partitioned
    join (see :func:`order_priority_revenue`)."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, val])
    k = np.asarray(t[key]).astype(np.int64)
    v = np.asarray(t[val]).astype(np.int64)
    order = np.argsort(k, kind="stable")
    return ray.put((k[order], v[order]))


def _map_lookup(ref, keys: np.ndarray) -> np.ndarray:
    """Vectorized sorted-map probe; unknown keys resolve to -1."""
    ks, vs = _bcast(ref)
    if len(ks) == 0:
        return np.full(len(keys), -1, np.int64)
    pos = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
    out = vs[pos].copy()
    out[ks[pos] != keys] = -1
    return out


def _rev_cents(batch: pa.Table) -> np.ndarray:
    """Per-line revenue l_extendedprice·(1−l_discount) in integer cents
    (round-half-away), matching the SQL oracle's
    ``round(l_extendedprice*(1-l_discount)*100, 0)`` exactly."""
    rev = pc.multiply(
        batch["l_extendedprice"],
        pc.subtract(pa.scalar(1.0), batch["l_discount"]),
    )
    return pc.cast(
        pc.round(
            pc.multiply(rev, pa.scalar(100.0)),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)


def promo_revenue(
    sf_dir: str,
    date_lo: str = "1996-09-01",
    date_hi: str = "1996-10-01",
):
    """TPC-H Q14-shaped composite: promotion effect — revenue from
    PROMO-type parts vs all revenue in one ship-date month. The
    CONDITIONAL-aggregate-over-dimension-attribute shape.

    Scale shape: the part dimension reduces to a broadcast sorted
    (partkey → is_promo) int map (one ``ray.put``); lineitem streams
    through a single ``map_batches`` pass that resolves the flag with a
    vectorized searchsorted probe and collapses each batch to ONE
    (promo_cents, total_cents) partial row — no shuffle at all, the
    final aggregate sums |batches| rows. Ratio is left to the consumer:
    both sides emit the exact integer-cent numerator and denominator so
    the hash compare is float-free."""
    from ray.data.aggregate import Sum

    promo_ref = None
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    import pyarrow.parquet as pq
    import ray

    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    k = np.asarray(pt["p_partkey"]).astype(np.int64)
    v = (np.asarray(pt["p_type"]) == "PROMO").astype(np.int64)
    order = np.argsort(k, kind="stable")
    promo_ref = ray.put((k[order], v[order]))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            )
        )
        cents = _rev_cents(batch)
        is_promo = _map_lookup(
            promo_ref, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        # total counts only lines whose partkey resolves (-1 = unknown),
        # matching the oracle's INNER join exactly
        return pa.table(
            {
                "promo_cents": pa.array(
                    [int(cents[is_promo == 1].sum())], pa.int64()
                ),
                "total_cents": pa.array(
                    [int(cents[is_promo >= 0].sum())], pa.int64()
                ),
            }
        )

    agg = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(
            Sum("promo_cents", alias_name="p"),
            Sum("total_cents", alias_name="t"),
        )
    )
    return pa.table(
        {
            "promo_cents": pa.array([int(agg["p"] or 0)], pa.int64()),
            "total_cents": pa.array([int(agg["t"] or 0)], pa.int64()),
        }
    )


def discounted_revenue(sf_dir: str):
    """TPC-H Q19-shaped composite: revenue from three DISJUNCTIVE
    (brand, quantity-range, size-range) predicate tiers — the
    multi-clause OR filter that defeats naive predicate pushdown.

    Scale shape: the common bound of all tiers (``l_quantity <= 30``)
    IS pushed into the parquet scan (row-group pruning at the read —
    the prune-at-the-read rule); the per-tier residue needs part
    attributes, so the part dimension broadcasts once as sorted
    (partkey → brand_id·1000 + size) packed ints and each lineitem
    batch resolves all three tiers in one vectorized pass, collapsing
    to a single (revenue_cents, n_lines) partial row. No shuffle."""
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq
    import ray

    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    k = np.asarray(pt["p_partkey"]).astype(np.int64)
    brand_id = np.array(
        [int(b.split("#", 1)[1]) for b in np.asarray(pt["p_brand"])],
        np.int64,
    )
    packed = brand_id * 1000 + np.asarray(pt["p_size"]).astype(np.int64)
    order = np.argsort(k, kind="stable")
    part_ref = ray.put((k[order], packed[order]))

    # (brand_id, qty_lo, qty_hi, size_lo, size_hi) inclusive tiers
    TIERS = ((1, 1, 11, 1, 5), (2, 10, 20, 1, 10), (3, 20, 30, 1, 15))

    def partial(batch: pa.Table) -> pa.Table:
        pk = _map_lookup(
            part_ref, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        brand = pk // 1000
        size = pk % 1000
        qty = pc.cast(batch["l_quantity"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.zeros(len(batch), bool)
        for b, qlo, qhi, slo, shi in TIERS:
            keep |= (
                (brand == b)
                & (qty >= qlo)
                & (qty <= qhi)
                & (size >= slo)
                & (size <= shi)
            )
        cents = _rev_cents(batch)
        return pa.table(
            {
                "revenue_cents": pa.array([int(cents[keep].sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    import ray.data

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_quantity") <= 30),  # pushdown: union bound of tiers
    )
    agg = li.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).aggregate(
        Sum("revenue_cents", alias_name="r"), Sum("n_lines", alias_name="n")
    )
    return pa.table(
        {
            "revenue_cents": pa.array([int(agg["r"] or 0)], pa.int64()),
            "n_lines": pa.array([int(agg["n"] or 0)], pa.int64()),
        }
    )


def returned_item_customers(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    k: int = 20,
    num_buckets: int = 64,
):
    """TPC-H Q10-shaped composite: the top-k customers by revenue lost
    to returned items (``l_returnflag = 'R'``) for one order-date
    quarter, reported with name / balance / nation — the
    fact-fact-join → re-key → global-top-k shape.

    Scale shape: lineitem collapses to per-orderkey returned-revenue
    combiner partials; the date-filtered order headers carry only
    (orderkey, custkey). ONE ``orderkey % num_buckets`` co-shuffle
    resolves the join; each group re-keys to per-custkey partials, so
    the follow-up custkey groupby moves at most one row per (bucket,
    customer). The global top-k then runs the
    :func:`top_revenue_orders` bucket machinery (per-bucket top-k →
    k·num_buckets-row sort), ties broken by custkey so the selection
    is deterministic. Customer names/balances and nation names join
    LAST, as a ≤k-row pushdown dimension read — the winners never ride
    a shuffle."""
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def line_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        cents = _rev_cents(batch)
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "revenue_cents": cents,
            }
        )
        g = df.groupby("key", as_index=False)["revenue_cents"].sum()
        n = len(g)
        return pa.table(
            {
                "bkt": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int64)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "c_custkey": pa.array(np.full(n, -1, np.int64)),
                "revenue_cents": pa.array(
                    g["revenue_cents"].to_numpy(np.int64)
                ),
                "side": pa.array(["l"] * n, pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["o_orderdate"], lo),
                pc.less(batch["o_orderdate"], hi),
            )
        )
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array((key % num_buckets).astype(np.int64)),
                "key": pa.array(key.astype(np.int64)),
                "c_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                "revenue_cents": pa.array(np.zeros(len(batch), np.int64)),
                "side": pa.array(["o"] * len(batch), pa.string()),
            }
        )

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("returned_item_customers(bucket)", None, len(group))
        li = group[group["side"] == "l"][["key", "revenue_cents"]]
        od = group[group["side"] == "o"][["key", "c_custkey"]]
        j = li.merge(od, on="key")
        g = j.groupby("c_custkey", as_index=False)["revenue_cents"].sum()
        g["revenue_cents"] = g["revenue_cents"].astype(np.int64)
        g["cbkt"] = (g["c_custkey"] % num_buckets).astype(np.int64)
        return g[["cbkt", "c_custkey", "revenue_cents"]]

    def per_bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("c_custkey", as_index=False)["revenue_cents"].sum()
        g["revenue_cents"] = g["revenue_cents"].astype(np.int64)
        return g.sort_values(
            ["revenue_cents", "c_custkey"], ascending=[False, True]
        ).head(k)[["c_custkey", "revenue_cents"]]

    winners = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )
        .map_batches(line_partial, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
            ).map_batches(prep_orders, batch_format="pyarrow")
        )
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(probe, batch_format="pandas")
        .materialize()  # pin before the custkey bucket shuffle
        .groupby("cbkt")
        .map_groups(per_bucket_topk, batch_format="pandas")
        .materialize()  # pin the per-bucket top-k before the global sort
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )

    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", winners["c_custkey"].tolist())],
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = winners.merge(cust, on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["acctbal_cents"] = (
        np.floor(np.abs(out["c_acctbal"].to_numpy()) * 100.0 + 0.5)
        * np.sign(out["c_acctbal"].to_numpy())
    ).astype(np.int64)
    return pa.table(
        {
            "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64)),
            "c_name": pa.array(out["c_name"].tolist(), pa.string()),
            "revenue_cents": pa.array(out["revenue_cents"].to_numpy(np.int64)),
            "acctbal_cents": pa.array(out["acctbal_cents"].to_numpy(np.int64)),
            "n_name": pa.array(out["n_name"].tolist(), pa.string()),
        }
    )


def nation_volume_shipping(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    num_buckets: int = 64,
):
    """TPC-H Q7-shaped composite: shipping volume between two nations
    by (supplier nation, customer nation, ship year) — the
    TWO-ROLE-dimension shape: the same nation dimension constrains
    both fact sides, in opposite directions.

    Scale shape: supplier→nationkey and customer→nationkey broadcast
    once as sorted int maps (the :func:`_sorted_int_map` bound); BOTH
    fact sides prune to the two nations before the shuffle. Lineitem
    pre-aggregates per (orderkey, supp_nation, year) revenue-cent
    combiner partials; order headers carry (orderkey, cust_nation).
    One ``orderkey % num_buckets`` co-shuffle resolves the join; the
    cross-nation direction mask (supp ≠ cust) applies in-group, and
    the final groupby sums ≤ 2·|years| rows per bucket."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    names = np.asarray(nat["n_name"])
    nkeys = np.asarray(nat["n_nationkey"]).astype(np.int64)
    try:
        key_a = int(nkeys[names == nation_a][0])
        key_b = int(nkeys[names == nation_b][0])
    except IndexError:
        raise ValueError(f"unknown nation: {nation_a!r} / {nation_b!r}")
    pair = np.sort(np.array([key_a, key_b], np.int64))
    name_of = {key_a: nation_a, key_b: nation_b}

    supp_ref = _sorted_int_map(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    cust_ref = _sorted_int_map(sf_dir, "customer", "c_custkey", "c_nationkey")

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def line_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            )
        )
        snat = _map_lookup(
            supp_ref, batch["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        keep = np.isin(snat, pair)  # prune before the shuffle
        batch = batch.filter(pa.array(keep))
        snat = snat[keep]
        year = (
            batch["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "snat": snat,
                "l_year": year,
                "revenue_cents": _rev_cents(batch),
            }
        )
        g = df.groupby(["key", "snat", "l_year"], as_index=False)[
            "revenue_cents"
        ].sum()
        n = len(g)
        return pa.table(
            {
                "bkt": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int64)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "snat": pa.array(g["snat"].to_numpy(np.int64)),
                "cnat": pa.array(np.full(n, -1, np.int64)),
                "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
                "revenue_cents": pa.array(
                    g["revenue_cents"].to_numpy(np.int64)
                ),
                "side": pa.array(["l"] * n, pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        cnat = _map_lookup(
            cust_ref, batch["o_custkey"].to_numpy(zero_copy_only=False)
        )
        keep = np.isin(cnat, pair)
        batch = batch.filter(pa.array(keep))
        cnat = cnat[keep]
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "bkt": pa.array((key % num_buckets).astype(np.int64)),
                "key": pa.array(key.astype(np.int64)),
                "snat": pa.array(np.full(n, -1, np.int64)),
                "cnat": pa.array(cnat),
                "l_year": pa.array(np.zeros(n, np.int64)),
                "revenue_cents": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(["o"] * n, pa.string()),
            }
        )

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("nation_volume_shipping(bucket)", None, len(group))
        li = group[group["side"] == "l"][
            ["key", "snat", "l_year", "revenue_cents"]
        ]
        od = group[group["side"] == "o"][["key", "cnat"]]
        j = li.merge(od, on="key")
        j = j[j["snat"] != j["cnat"]]  # the two cross directions only
        g = j.groupby(["snat", "cnat", "l_year"], as_index=False)[
            "revenue_cents"
        ].sum()
        g["revenue_cents"] = g["revenue_cents"].astype(np.int64)
        return g

    rows = (
        _read(
            sf_dir,
            "lineitem",
            [
                "l_orderkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        .map_batches(line_partial, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                prep_orders, batch_format="pyarrow"
            )
        )
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(probe, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby(["snat", "cnat", "l_year"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .take_all()  # bounded: ≤ 2 directions × |years|
    )
    rows.sort(key=lambda r: (r["snat"], r["cnat"], r["l_year"]))
    return pa.table(
        {
            "supp_nation": pa.array(
                [name_of[int(r["snat"])] for r in rows], pa.string()
            ),
            "cust_nation": pa.array(
                [name_of[int(r["cnat"])] for r in rows], pa.string()
            ),
            "l_year": pa.array([int(r["l_year"]) for r in rows], pa.int64()),
            "revenue_cents": pa.array(
                [int(r["revenue_cents"]) for r in rows], pa.int64()
            ),
        }
    )


def profit_by_nation_year(
    sf_dir: str,
    name_like: str = "rod",
    cost_permille_of_retail: int = 100,
    num_buckets: int = 64,
):
    """TPC-H Q9-shaped composite: profit per (supplier nation, order
    year) over parts whose name contains ``name_like`` — the
    many-dimension PROFIT-EXPRESSION shape where each line's measure
    mixes fact columns with attributes of two different dimensions.

    The reference schema's partsupp.ps_supplycost has no counterpart in
    this corpus, so unit cost is defined as
    ``round(p_retailprice · cost_permille_of_retail / 10)`` cents —
    the SHAPE (revenue − qty·per-part-cost, grouped by two derived
    dimensions) is what's exercised; the constant is a knob.

    Scale shape: the name-filtered part map (partkey → unit-cost
    cents) and the supplier map broadcast once; lineitem prunes to
    matching parts BEFORE the shuffle and pre-aggregates
    (orderkey, supp-nation) profit-cents combiner partials; order
    headers carry (orderkey, year). ONE orderkey co-shuffle resolves
    the year; the final groupby sums ≤ |nations|·|years| rows per
    bucket."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    names = np.asarray(pt["p_name"])
    m = np.char.find(names.astype(str), name_like) >= 0
    k = np.asarray(pt["p_partkey"]).astype(np.int64)[m]
    # unit cost in cents: round-half-away(p_retailprice · permille / 10)
    retail = np.asarray(pt["p_retailprice"], dtype=np.float64)[m]
    cost = retail * (cost_permille_of_retail / 10.0)
    cost_cents = (np.floor(np.abs(cost) + 0.5) * np.sign(cost)).astype(np.int64)
    order = np.argsort(k, kind="stable")
    part_ref = ray.put((k[order], cost_cents[order]))
    supp_ref = _sorted_int_map(sf_dir, "supplier", "s_suppkey", "s_nationkey")

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nation_names = dict(
        zip(
            np.asarray(nat["n_nationkey"]).astype(np.int64).tolist(),
            np.asarray(nat["n_name"]).tolist(),
        )
    )

    def line_partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        unit_cost = _map_lookup(part_ref, pk)
        keep = unit_cost >= 0  # prune to name-matched parts pre-shuffle
        batch = batch.filter(pa.array(keep))
        unit_cost = unit_cost[keep]
        snat = _map_lookup(
            supp_ref, batch["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        ok = snat >= 0  # unknown suppkey = inner-join drop, like the oracle
        batch = batch.filter(pa.array(ok))
        snat, unit_cost = snat[ok], unit_cost[ok]
        qty = pc.cast(batch["l_quantity"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        profit = _rev_cents(batch) - qty * unit_cost
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "snat": snat,
                "profit_cents": profit,
            }
        )
        g = df.groupby(["key", "snat"], as_index=False)["profit_cents"].sum()
        n = len(g)
        return pa.table(
            {
                "bkt": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int64)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "snat": pa.array(g["snat"].to_numpy(np.int64)),
                "o_year": pa.array(np.zeros(n, np.int64)),
                "profit_cents": pa.array(g["profit_cents"].to_numpy(np.int64)),
                "side": pa.array(["l"] * n, pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        year = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        n = len(batch)
        return pa.table(
            {
                "bkt": pa.array((key % num_buckets).astype(np.int64)),
                "key": pa.array(key.astype(np.int64)),
                "snat": pa.array(np.full(n, -1, np.int64)),
                "o_year": pa.array(year),
                "profit_cents": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(["o"] * n, pa.string()),
            }
        )

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("profit_by_nation_year(bucket)", None, len(group))
        li = group[group["side"] == "l"][["key", "snat", "profit_cents"]]
        od = group[group["side"] == "o"][["key", "o_year"]]
        j = li.merge(od, on="key")
        g = j.groupby(["snat", "o_year"], as_index=False)["profit_cents"].sum()
        g["profit_cents"] = g["profit_cents"].astype(np.int64)
        return g

    agg = (
        _read(
            sf_dir,
            "lineitem",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .map_batches(line_partial, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                prep_orders, batch_format="pyarrow"
            )
        )
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(probe, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby(["snat", "o_year"])
        .aggregate(Sum("profit_cents", alias_name="profit_cents"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": [nation_names[int(s)] for s in batch["snat"]],
                "o_year": batch["o_year"].to_numpy(np.int64),
                "profit_cents": batch["profit_cents"].to_numpy(np.int64),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def market_share(
    sf_dir: str,
    target_nation: str = "NATION_5",
    region: str = "ASIA",
    part_type: str = "STANDARD",
    num_buckets: int = 64,
):
    """TPC-H Q8-shaped composite: the target nation's supplier share of
    one region's customer revenue, by order year, restricted to one
    part type — the NUMERATOR/DENOMINATOR-from-one-pass shape (both
    aggregates must come from the same joined row set or the share is
    inconsistent). Emits exact int (nation_cents, total_cents) per
    year; the float share is the consumer's division, mirroring
    :func:`promo_revenue`.

    Scale shape: three broadcast maps (part-type partkeys, supplier →
    nationkey, customer → nationkey); lineitem prunes to the part
    type, orders prune to in-region customers — both BEFORE the single
    orderkey co-shuffle. Lineitem partials carry per-(orderkey,
    is_target) cents; in-group resolve attaches the year and the final
    groupby sums ≤ 2·|years| rows per bucket."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nnames = np.asarray(nat["n_name"])
    nkeys = np.asarray(nat["n_nationkey"]).astype(np.int64)
    tmask = nnames == target_nation
    if not tmask.any():
        raise ValueError(f"unknown nation: {target_nation!r}")
    target_key = int(nkeys[tmask][0])

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = np.asarray(reg["r_regionkey"])[np.asarray(reg["r_name"]) == region]
    region_nations = np.sort(
        nkeys[np.isin(np.asarray(nat["n_regionkey"]), rkeys)]
    )

    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    type_parts = np.sort(
        np.asarray(pt["p_partkey"]).astype(np.int64)[
            np.asarray(pt["p_type"]) == part_type
        ]
    )
    parts_ref = ray.put(type_parts)
    supp_ref = _sorted_int_map(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    cust_ref = _sorted_int_map(sf_dir, "customer", "c_custkey", "c_nationkey")

    def _member(arr: np.ndarray, ks: np.ndarray) -> np.ndarray:
        if len(ks) == 0:
            return np.zeros(len(arr), bool)
        pos = np.clip(np.searchsorted(ks, arr), 0, len(ks) - 1)
        return ks[pos] == arr

    def line_partial(batch: pa.Table) -> pa.Table:
        ks = _bcast(parts_ref)
        keep = _member(
            batch["l_partkey"].to_numpy(zero_copy_only=False), ks
        )
        batch = batch.filter(pa.array(keep))
        snat = _map_lookup(
            supp_ref, batch["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        ok = snat >= 0  # unknown suppkey = inner-join drop, like the oracle
        batch = batch.filter(pa.array(ok))
        snat = snat[ok]
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "is_target": (snat == target_key).astype(np.int64),
                "cents": _rev_cents(batch),
            }
        )
        g = df.groupby(["key", "is_target"], as_index=False)["cents"].sum()
        n = len(g)
        return pa.table(
            {
                "bkt": pa.array(
                    (g["key"].to_numpy() % num_buckets).astype(np.int64)
                ),
                "key": pa.array(g["key"].to_numpy(np.int64)),
                "is_target": pa.array(g["is_target"].to_numpy(np.int64)),
                "o_year": pa.array(np.zeros(n, np.int64)),
                "cents": pa.array(g["cents"].to_numpy(np.int64)),
                "side": pa.array(["l"] * n, pa.string()),
            }
        )

    def prep_orders(batch: pa.Table) -> pa.Table:
        cnat = _map_lookup(
            cust_ref, batch["o_custkey"].to_numpy(zero_copy_only=False)
        )
        keep = np.isin(cnat, region_nations)  # prune pre-shuffle
        batch = batch.filter(pa.array(keep))
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        year = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        n = len(batch)
        return pa.table(
            {
                "bkt": pa.array((key % num_buckets).astype(np.int64)),
                "key": pa.array(key.astype(np.int64)),
                "is_target": pa.array(np.full(n, -1, np.int64)),
                "o_year": pa.array(year),
                "cents": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(["o"] * n, pa.string()),
            }
        )

    def probe(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("market_share(bucket)", None, len(group))
        li = group[group["side"] == "l"][["key", "is_target", "cents"]]
        od = group[group["side"] == "o"][["key", "o_year"]]
        j = li.merge(od, on="key")  # inner: non-region orders drop here
        tgt = j["is_target"].to_numpy(np.int64)
        c = j["cents"].to_numpy(np.int64)
        df = pd.DataFrame(
            {
                "o_year": j["o_year"],
                "nation_cents": np.where(tgt == 1, c, 0),
                "total_cents": c,
            }
        )
        g = df.groupby("o_year", as_index=False).sum()
        g["nation_cents"] = g["nation_cents"].astype(np.int64)
        g["total_cents"] = g["total_cents"].astype(np.int64)
        return g

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(line_partial, batch_format="pyarrow", batch_size=65536)
        .union(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
            ).map_batches(prep_orders, batch_format="pyarrow")
        )
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(probe, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby("o_year")
        .aggregate(
            Sum("nation_cents", alias_name="nation_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


def dominant_suppliers(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    num_buckets: int = 64,
):
    """TPC-H Q20-shaped composite: (part, supplier) pairs where one
    supplier shipped MORE THAN HALF of the part's total quantity in a
    ship-date window — the correlated GROUP-vs-SUBGROUP threshold shape
    (per-(part,supp) aggregate compared against the enclosing per-part
    aggregate; the reference query's partsupp availability check has no
    counterpart table here, so the share predicate carries the shape).

    Scale shape: lineitem collapses to per-(partkey, suppkey) quantity
    combiner partials; ONE ``partkey % num_buckets`` shuffle co-locates
    each part's partials, the in-group transform computes the part
    total and the ``2·supp_qty > part_qty`` cut INTEGER-EXACT (no
    float share), and only qualifying pairs leave the group. Part and
    supplier names join last via ≤|winners| pushdown dimension reads."""
    import pyarrow.parquet as pq

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            )
        )
        df = pd.DataFrame(
            {
                "p_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False),
                "s_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "qty": pc.cast(batch["l_quantity"], pa.int64()).to_numpy(),
            }
        )
        g = df.groupby(["p_partkey", "s_suppkey"], as_index=False)["qty"].sum()
        return pa.table(
            {
                "bkt": pa.array(
                    (g["p_partkey"].to_numpy() % num_buckets).astype(np.int64)
                ),
                "p_partkey": pa.array(g["p_partkey"].to_numpy(np.int64)),
                "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64)),
                "qty": pa.array(g["qty"].to_numpy(np.int64)),
            }
        )

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("dominant_suppliers(bucket)", None, len(group))
        ps = group.groupby(["p_partkey", "s_suppkey"], as_index=False)[
            "qty"
        ].sum()
        pt = ps.groupby("p_partkey")["qty"].transform("sum")
        ps["part_qty"] = pt.astype(np.int64)
        ps["supp_qty"] = ps["qty"].astype(np.int64)
        win = ps[2 * ps["supp_qty"] > ps["part_qty"]]
        return win[["p_partkey", "s_suppkey", "supp_qty", "part_qty"]]

    winners = (
        _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()  # bounded: ≤ one row per part
    )

    pt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name"],
        filters=[("p_partkey", "in", winners["p_partkey"].tolist())],
    ).to_pandas()
    st = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = winners.merge(pt, on="p_partkey").merge(st, on="s_suppkey")
    out = out.sort_values(
        ["p_partkey", "s_suppkey"], ignore_index=True
    )
    return pa.table(
        {
            "p_partkey": pa.array(out["p_partkey"].to_numpy(np.int64)),
            "p_name": pa.array(out["p_name"].tolist(), pa.string()),
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
            "s_name": pa.array(out["s_name"].tolist(), pa.string()),
            "supp_qty": pa.array(out["supp_qty"].to_numpy(np.int64)),
            "part_qty": pa.array(out["part_qty"].to_numpy(np.int64)),
        }
    )


def forecast_revenue_change(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo_e2: int = 5,
    disc_hi_e2: int = 7,
    max_qty: int = 24,
):
    """TPC-H Q6-shaped scan: revenue delta from hypothetically dropping
    discounts in a band — ``sum(extendedprice · discount)`` over one
    ship year, a discount band and a quantity cap. The PURE
    scan-filter-aggregate shape: with Q6 in place every one of the 22
    TPC-H query shapes has a composite in this repo.

    Scale shape: the quantity cap and ship window are PUSHED INTO the
    parquet scan (row-group pruning; the discount band stays a residue
    because floats in statistics round); each batch collapses to one
    int64-cents partial row; no shuffle. The discount band compares on
    integer e2 units (round(discount·100)) so the cut can't sit on a
    float boundary."""
    import ray.data
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def partial(batch: pa.Table) -> pa.Table:
        disc_e2 = pc.cast(
            pc.round(
                pc.multiply(batch["l_discount"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        keep = (disc_e2 >= disc_lo_e2) & (disc_e2 <= disc_hi_e2)
        batch = batch.filter(pa.array(keep))
        # revenue = extendedprice · discount, in e4 units (cents × e2
        # discount) — integer-exact on both sides
        price_cents = pc.cast(
            pc.round(
                pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rev_e4 = price_cents * disc_e2[keep]
        return pa.table(
            {
                "revenue_e4": pa.array([int(rev_e4.sum())], pa.int64()),
                "n_lines": pa.array([len(rev_e4)], pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(
            (pc.field("l_quantity") < max_qty)
            & (pc.field("l_shipdate") >= lo)
            & (pc.field("l_shipdate") < hi)
        ),
    )
    agg = li.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).aggregate(
        Sum("revenue_e4", alias_name="r"), Sum("n_lines", alias_name="n")
    )
    return pa.table(
        {
            "revenue_e4": pa.array([int(agg["r"] or 0)], pa.int64()),
            "n_lines": pa.array([int(agg["n"] or 0)], pa.int64()),
        }
    )


def monthly_revenue_series(sf_dir: str, max_months: int = 12_000):
    """Gap-filled monthly revenue time series — the calendar-dimension
    join: every month between the first and last order appears in the
    output, months with no orders as explicit zero rows (the shape a
    forecasting/reporting consumer needs; a plain GROUP BY silently
    drops empty months).

    Scale shape: one per-batch (month → cents, n) combiner feeds one
    ``groupby(ym)`` whose output is bounded by the CALENDAR, not the
    data (80 months at any scale factor; ``max_months`` guards the
    driver pull loudly if a wild timestamp blows the domain — the
    repo's no-silent-caps rule). Gap filling is a driver-side arange
    over that bounded table; the fact table streams exactly once."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        ym = (ts.astype("datetime64[M]").astype(np.int64)) + 1970 * 12
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["o_totalprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        g = pd.DataFrame({"ym": ym, "cents": cents}).groupby(
            "ym", as_index=False
        ).agg(revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
        return pa.table(
            {
                "ym": pa.array(g["ym"].to_numpy(np.int64)),
                "revenue_cents": pa.array(g["revenue_cents"].to_numpy(np.int64)),
                "n_orders": pa.array(g["n_orders"].to_numpy(np.int64)),
            }
        )

    rows = (
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("ym")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .take_all()  # bounded by the calendar domain (guarded below)
    )
    if not rows:
        return pd.DataFrame(
            {
                "year": pd.Series([], dtype=np.int64),
                "month": pd.Series([], dtype=np.int64),
                "revenue_cents": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
            }
        )
    yms = np.array([r["ym"] for r in rows], np.int64)
    lo, hi = int(yms.min()), int(yms.max())
    if hi - lo + 1 > max_months:
        raise ValueError(
            f"month domain {hi - lo + 1} exceeds max_months={max_months}; "
            "check o_orderdate for wild timestamps or raise the cap"
        )
    full = np.arange(lo, hi + 1, dtype=np.int64)
    rev = np.zeros(len(full), np.int64)
    cnt = np.zeros(len(full), np.int64)
    rev[yms - lo] = [r["revenue_cents"] for r in rows]
    cnt[yms - lo] = [r["n_orders"] for r in rows]
    return pd.DataFrame(
        {
            "year": full // 12,
            "month": full % 12 + 1,
            "revenue_cents": rev,
            "n_orders": cnt,
        }
    )


def part_pair_support(
    sf_dir: str, min_support: int = 2, num_buckets: int = 64
):
    """Market-basket co-occurrence: every part pair ordered together in
    ``min_support`` or more distinct orders, with its support count —
    the candidate-pair half of A-priori / frequent-itemset mining.

    Scale shape: per-order pair expansion happens INSIDE the orderkey
    bucket groups (order sizes are small — the per-order fanout is
    C(lines, 2), bounded by the order-size cap), and each group emits
    per-pair COUNT partials, so the second shuffle moves one row per
    distinct pair per bucket, not one per occurrence. The packed-key
    hash bucket keeps that groupby off Ray's global sort path. No
    driver state; output is bounded by the support threshold.

    Reference anchor: no chug counterpart; composition follows the
    repo's bucketed-combiner relational ops."""
    import ray.data

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o": b["l_orderkey"],
                "p": b["l_partkey"],
                "bucket": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)
                    % num_buckets
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def pair_partial(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group(
            "part_pair_support(order bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        g = group.drop_duplicates(["o", "p"])
        m = g.merge(g, on="o")
        m = m[m["p_x"] < m["p_y"]]
        if not len(m):
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "kbucket": pa.array([], pa.int64()),
                }
            )
        p1 = m["p_x"].to_numpy(np.int64)
        p2 = m["p_y"].to_numpy(np.int64)
        if not int(p2.max()) < 1 << 31:
            raise ValueError(
                "part_pair_support: partkey exceeds the 32-bit pack width"
            )
        key, c = np.unique(p1 * (1 << 32) + p2, return_counts=True)
        return pa.table(
            {
                "key": pa.array(key.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
                "kbucket": pa.array((key % num_buckets).astype(np.int64)),
            }
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        agg = group.groupby("key", as_index=False)["c"].sum()
        agg = agg[agg["c"] >= min_support]
        key = agg["key"].to_numpy(np.int64)
        return pa.table(
            {
                "p1": pa.array(key >> 32),
                "p2": pa.array(key & ((1 << 32) - 1)),
                "support": pa.array(agg["c"].to_numpy(np.int64)),
            }
        )

    return (
        lines.materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(pair_partial, batch_format="pandas")
        .materialize()
        .groupby("kbucket")
        .map_groups(resolve, batch_format="pandas")
    )


def pair_lift(sf_dir: str, min_support: int = 2, num_buckets: int = 64):
    """Association-rule metrics over the frequent part pairs: support,
    confidence(p1→p2) and lift as e6 fixed point — the scoring half of
    A-priori on top of the part_pair_support shape.

    Scale shape: ONE orderkey-bucket shuffle emits BOTH the per-pair
    count partials and (from the same in-group distinct) the per-part /
    order-count partials, so lineitem is scanned and deduped once; the
    pair partials resolve under the packed-key hash bucket, the
    part-support vector — bounded by the PART dimension — rides a
    ray.put broadcast (sorted-int-map pattern) into a map-only scoring
    pass. Float parity: lift = (N·sup)/(s₁·s₂) and conf = sup/s₁
    evaluate the same double tree both sides."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o": b["l_orderkey"],
                "p": b["l_partkey"],
                "bucket": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)
                    % num_buckets
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def fused_partial(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group(
            "pair_lift(order bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        g = group.drop_duplicates(["o", "p"])
        m = g.merge(g, on="o")
        m = m[m["p_x"] < m["p_y"]]
        if len(m):
            p1 = m["p_x"].to_numpy(np.int64)
            p2 = m["p_y"].to_numpy(np.int64)
            if not int(p2.max()) < 1 << 31:
                raise ValueError(
                    "pair_lift: partkey exceeds the 32-bit pack width"
                )
            pkey, pc = np.unique(p1 * (1 << 32) + p2, return_counts=True)
        else:
            pkey = pc = np.array([], np.int64)
        per_part = g.groupby("p", as_index=False).size()
        key = np.concatenate(
            [
                pkey,
                per_part["p"].to_numpy(np.int64),
                np.array([-1], np.int64),
            ]
        )
        c = np.concatenate(
            [
                pc.astype(np.int64),
                per_part["size"].to_numpy(np.int64),
                np.array([g["o"].nunique()], np.int64),
            ]
        )
        kind = np.concatenate(
            [
                np.zeros(len(pkey), np.int8),
                np.ones(len(per_part) + 1, np.int8),
            ]
        )
        return pa.table(
            {
                "key": pa.array(key),
                "c": pa.array(c),
                "kind": pa.array(kind),
                "kbucket": pa.array((key % num_buckets).astype(np.int64)),
            }
        )

    partials = (
        lines.materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(fused_partial, batch_format="pandas")
        .materialize()
    )

    def resolve_pairs(group: pd.DataFrame) -> pa.Table:
        g = group[group["kind"] == 0]
        agg = g.groupby("key", as_index=False)["c"].sum()
        agg = agg[agg["c"] >= min_support]
        key = agg["key"].to_numpy(np.int64)
        return pa.table(
            {
                "p1": pa.array(key >> 32),
                "p2": pa.array(key & ((1 << 32) - 1)),
                "support": pa.array(agg["c"].to_numpy(np.int64)),
            }
        )

    pairs = (
        partials.groupby("kbucket")
        .map_groups(resolve_pairs, batch_format="pandas")
        .materialize()
    )
    rows = (
        partials.map_batches(
            lambda b: b.filter(
                pa.array(b["kind"].to_numpy(zero_copy_only=False) == 1)
            ).select(["key", "c"]),
            batch_format="pyarrow",
        )
        .materialize()
        .groupby("key")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded by the part dimension (+1 order-count row)
    )
    n_orders = next(r["c"] for r in rows if r["key"] == -1)
    part_rows = sorted((r["key"], r["c"]) for r in rows if r["key"] >= 0)
    parts_arr = np.array([p for p, _ in part_rows], np.int64)
    sup_arr = np.array([c for _, c in part_rows], np.int64)
    state = ray.put((parts_arr, sup_arr, int(n_orders)))

    def score(batch: pa.Table) -> pa.Table:
        parts, sup, n = ray.get(state)
        p1 = batch["p1"].to_numpy(zero_copy_only=False)
        p2 = batch["p2"].to_numpy(zero_copy_only=False)
        s = batch["support"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s1 = sup[np.searchsorted(parts, p1)].astype(np.float64)
        s2 = sup[np.searchsorted(parts, p2)].astype(np.float64)
        lift = float(n) * s / (s1 * s2)
        conf = s / s1

        def e6(x: np.ndarray) -> np.ndarray:
            return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(
                np.int64
            )

        return pa.table(
            {
                "p1": batch["p1"],
                "p2": batch["p2"],
                "support": batch["support"],
                "conf_e6": pa.array(e6(conf)),
                "lift_e6": pa.array(e6(lift)),
            }
        )

    return pairs.map_batches(score, batch_format="pyarrow")


_CUBE_NULL = "\x00"  # in-flight sentinel for null CUBE keys (see below)


def cube_revenue(sf_dir: str):
    """Revenue + line counts by CUBE(l_returnflag, l_linestatus) — all
    four grouping sets, with 'ALL' as the rolled-up marker (no literal
    'ALL' exists in either column). Completes the grouping-set family
    next to rollup_revenue.

    Scale shape: one combiner pass emits the four grouping-set partials
    per batch (4× the per-batch group rows, still bounded by the tiny
    flag×status domain), one domain-bounded groupby. Integer cents."""
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        cents = pc.cast(
            pc.round(
                pc.multiply(disc, pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        # a null DATA value is its own detail group under CUBE — it must
        # NOT merge with the grouping rollup rows that share the 'ALL'
        # display label. Nulls ride through both groupbys as a NUL-char
        # sentinel (pandas drops null keys; no real flag/status value
        # contains NUL) and are relabeled 'ALL' only at display time
        # below, exactly like the oracle's CUBE + COALESCE — which emits
        # duplicate ('ALL', ...) display rows with distinct aggregates.
        df = pd.DataFrame(
            {
                "flag": pc.coalesce(
                    batch["l_returnflag"], pa.scalar(_CUBE_NULL)
                ).to_pylist(),
                "status": pc.coalesce(
                    batch["l_linestatus"], pa.scalar(_CUBE_NULL)
                ).to_pylist(),
                "cents": cents,
            }
        )
        outs = []
        for fcol, scol in (
            (df["flag"], df["status"]),
            (df["flag"], "ALL"),
            ("ALL", df["status"]),
            ("ALL", "ALL"),
        ):
            g = (
                pd.DataFrame(
                    {"flag": fcol, "status": scol, "cents": df["cents"]}
                )
                .groupby(["flag", "status"], as_index=False)
                .agg(revenue_cents=("cents", "sum"), n_lines=("cents", "size"))
            )
            outs.append(g)
        out = pd.concat(outs, ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(out["flag"].tolist(), pa.string()),
                "l_linestatus": pa.array(out["status"].tolist(), pa.string()),
                "revenue_cents": pa.array(
                    out["revenue_cents"].to_numpy(np.int64)
                ),
                "n_lines": pa.array(out["n_lines"].to_numpy(np.int64)),
            }
        )

    def relabel(batch: pa.Table) -> pa.Table:
        # display-time: the null-sentinel detail groups take the 'ALL'
        # label (possibly duplicating a rollup row's display key, with
        # distinct aggregates — the oracle's CUBE + COALESCE shape)
        return pa.table(
            {
                "l_returnflag": pc.replace_substring(
                    batch["l_returnflag"], _CUBE_NULL, "ALL"
                ),
                "l_linestatus": pc.replace_substring(
                    batch["l_linestatus"], _CUBE_NULL, "ALL"
                ),
                "revenue_cents": batch["revenue_cents"],
                "n_lines": batch["n_lines"],
            }
        )

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_lines", alias_name="n_lines"),
        )
        .map_batches(relabel, batch_format="pyarrow")
    )


BROADCAST_JOIN_THRESHOLD = 5_000_000  # dim rows; ~80 MB of int64 keys


def auto_join(
    sf_dir: str,
    fact_table: str,
    dim_table: str,
    fact_key: str,
    dim_key: str,
    fact_cols: list,
    dim_cols: list,
    broadcast_threshold_rows: int = BROADCAST_JOIN_THRESHOLD,
    num_buckets: int = 64,
):
    """Adaptive inner equi-join: pick broadcast vs co-partitioned
    shuffle from the dimension side's parquet FOOTER row count (no data
    read) — the engine's two hand-written join strategies behind one
    plan-time switch.

    - dim rows ≤ threshold → ray.put the sorted key + payload arrays
      (the promo_revenue sorted-int-map pattern); the fact side never
      shuffles.
    - dim rows > threshold → side-tagged union under ONE key-bucket
      shuffle, in-group pandas merge (the order_priority_revenue
      co-partition pattern).

    Both paths return identical rows (asserted in
    tests/test_auto_join.py, which forces each). Returns the joined
    dataset with ``fact_cols + dim_cols``."""
    import os

    import pyarrow.parquet as pq_mod
    import ray
    import ray.data

    dim_path = f"{sf_dir}/{dim_table}.parquet"
    if os.path.isdir(dim_path):
        n_dim = sum(
            pq_mod.ParquetFile(os.path.join(dim_path, f)).metadata.num_rows
            for f in os.listdir(dim_path)
            if f.endswith(".parquet")
        )
    else:
        n_dim = pq_mod.ParquetFile(dim_path).metadata.num_rows

    fact = ray.data.read_parquet(
        f"{sf_dir}/{fact_table}.parquet",
        columns=list(dict.fromkeys([fact_key, *fact_cols])),
    )

    if n_dim <= broadcast_threshold_rows:
        dim_tbl = pq_mod.read_table(
            dim_path, columns=list(dict.fromkeys([dim_key, *dim_cols]))
        )
        keys = dim_tbl[dim_key].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(keys, kind="stable")
        payload = {
            c: dim_tbl[c].to_numpy(zero_copy_only=False)[order]
            for c in dim_cols
        }
        # explicit arrow types: inference over a numpy OBJECT slice
        # (string dims, or any all-miss/empty selection) would yield a
        # null-typed column and diverge block schemas within one dataset
        dim_types = {c: dim_tbl.schema.field(c).type for c in dim_cols}
        state = ray.put((keys[order], payload))

        def probe(batch: pa.Table) -> pa.Table:
            skeys, pay = _bcast(state)  # per-process cache (string dims)
            if len(skeys) == 0:
                # empty dim table: inner join yields nothing; short-circuit
                # before skeys[pos_c] indexes into an empty array
                out = {c: batch[c].slice(0, 0) for c in [fact_key, *fact_cols]}
                for c in dim_cols:
                    out[c] = pa.array(pay[c][:0], type=dim_types[c])
                return pa.table(out)
            fk = batch[fact_key].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(skeys, fk)
            pos_c = np.clip(pos, 0, len(skeys) - 1)
            hit = skeys[pos_c] == fk
            batch = batch.filter(pa.array(hit))
            cols = {c: batch[c] for c in [fact_key, *fact_cols]}
            for c in dim_cols:
                cols[c] = pa.array(pay[c][pos_c[hit]], type=dim_types[c])
            return pa.table(cols)

        return fact.map_batches(probe, batch_format="pyarrow")

    dim = ray.data.read_parquet(
        dim_path, columns=list(dict.fromkeys([dim_key, *dim_cols]))
    )
    # one unified schema for the side-tagged union: each side pads the
    # other side's payload columns with typed nulls
    fact_schema = pq_mod.read_schema(
        f"{sf_dir}/{fact_table}.parquet"
        if not os.path.isdir(f"{sf_dir}/{fact_table}.parquet")
        else os.path.join(
            f"{sf_dir}/{fact_table}.parquet",
            next(
                f
                for f in os.listdir(f"{sf_dir}/{fact_table}.parquet")
                if f.endswith(".parquet")
            ),
        )
    )
    dim_schema = pq_mod.read_schema(
        dim_path
        if not os.path.isdir(dim_path)
        else os.path.join(
            dim_path,
            next(f for f in os.listdir(dim_path) if f.endswith(".parquet")),
        )
    )
    types = {
        **{c: fact_schema.field(c).type for c in fact_cols},
        **{c: dim_schema.field(c).type for c in dim_cols},
        # fact key too, so the shuffle path rebuilds it with the same
        # arrow type the broadcast path preserves
        fact_key: fact_schema.field(fact_key).type,
    }

    def tag(side: int, key_col: str, own_cols: list, other_cols: list):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {"jkey": pa.array(k)}
            for c in own_cols:
                cols[c] = batch[c]
            for c in other_cols:
                cols[c] = pa.nulls(len(batch), types[c])
            cols["side"] = pa.array(np.full(len(batch), side, np.int8))
            cols["bucket"] = pa.array(k % num_buckets)
            return pa.table(cols)

        return fn

    tagged = fact.map_batches(
        tag(0, fact_key, fact_cols, dim_cols), batch_format="pyarrow"
    ).union(
        dim.map_batches(
            tag(1, dim_key, dim_cols, fact_cols), batch_format="pyarrow"
        )
    )

    def merge(group: pd.DataFrame) -> pa.Table:
        f = group[group["side"] == 0]
        d = group[group["side"] == 1]
        m = f.merge(
            d[["jkey", *dim_cols]],
            on="jkey",
            how="inner",
            suffixes=("_drop", ""),
        )
        cols = {}
        for c in [fact_key, *fact_cols]:
            src = "jkey" if c == fact_key else c
            cols[c] = pa.array(m[src].to_numpy(), types.get(c))
        for c in dim_cols:
            cols[c] = pa.array(m[c].to_numpy(), types[c])
        return pa.table(cols)

    return (
        tagged.materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def orders_per_nation(sf_dir: str, broadcast_threshold_rows: int = None):
    """Orders count + total price per customer nation — the auto_join
    demo composite: orders⋈customer through the adaptive join (footer
    row count picks broadcast here; the shuffle path returns the same
    rows — tests force both), then the usual combiner groupby over the
    nation-bounded domain."""
    from ray.data.aggregate import Sum

    kwargs = {}
    if broadcast_threshold_rows is not None:
        kwargs["broadcast_threshold_rows"] = broadcast_threshold_rows
    joined = auto_join(
        sf_dir,
        "orders",
        "customer",
        "o_custkey",
        "c_custkey",
        ["o_totalprice"],
        ["c_nationkey"],
        **kwargs,
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["o_totalprice"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "c_nationkey": batch["c_nationkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "cents": cents,
            }
        )
        g = df.groupby("c_nationkey", as_index=False).agg(
            total_price_cents=("cents", "sum"), n_orders=("cents", "size")
        )
        return pa.table(
            {
                "c_nationkey": pa.array(g["c_nationkey"].to_numpy(np.int64)),
                "total_price_cents": pa.array(
                    g["total_price_cents"].to_numpy(np.int64)
                ),
                "n_orders": pa.array(g["n_orders"].to_numpy(np.int64)),
            }
        )

    return (
        joined.map_batches(prep, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("c_nationkey")
        .aggregate(
            Sum("total_price_cents", alias_name="total_price_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


def order_cadence(sf_dir: str):
    """Per-customer ordering cadence: for customers with ≥ 2 orders,
    the day span between first and last order and the average gap —
    exploiting that consecutive gaps telescope (Σ gaps = last − first),
    so ONE (min, max, count) combiner answers it with no per-customer
    sort. avg_gap_e6 mirrors the oracle's double tree.

    Scale shape: map-only per-batch per-customer partials into a
    customer-bounded groupby; nothing order-sorted anywhere."""
    from ray.data.aggregate import Count, Max, Min

    def partial(batch: pa.Table) -> pa.Table:
        day = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "day": day,
            }
        )
        g = df.groupby("custkey", as_index=False).agg(
            dmin=("day", "min"), dmax=("day", "max"), n=("day", "size")
        )
        return pa.table(
            {
                "custkey": pa.array(g["custkey"].to_numpy(np.int64)),
                "dmin": pa.array(g["dmin"].to_numpy(np.int64)),
                "dmax": pa.array(g["dmax"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        keep = n >= 2
        batch = batch.filter(pa.array(keep))
        n = n[keep].astype(np.float64)
        span = (
            batch["dmax"].to_numpy(zero_copy_only=False)
            - batch["dmin"].to_numpy(zero_copy_only=False)
        )
        gap = span.astype(np.float64) / (n - 1.0)
        return pa.table(
            {
                "custkey": batch["custkey"],
                "n_orders": pa.array(n.astype(np.int64)),
                "span_days": pa.array(span.astype(np.int64)),
                "avg_gap_e6": pa.array(
                    np.floor(gap * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("custkey")
        .aggregate(
            Min("dmin", alias_name="dmin"),
            Max("dmax", alias_name="dmax"),
            Sum("n", alias_name="n"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
