"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (guide: treat the input as an
ordered, partitioned log). Tumbling windows = compute the window key in
a vectorized ``map_batches``, pre-aggregate *within each batch*
(combiner), then a small ``groupby`` over partials — the shuffle moves
one row per (window, key, batch), not per event. Sessionization =
``groupby(user_id).map_groups`` over ts-sorted groups (the partitioning
assumption: one user's events fit one group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from chug_ray.util import from_pandas_typed


def _events(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _user_chunk_bucket(uid, chunk, num_buckets: int) -> np.ndarray:
    """THE (user, chunk) shuffle-bucket hash, in one place.

    Events meet their per-chunk offsets/carries downstream only because
    every stage hashes identically — running_user_totals,
    rolling_user_sum and event_transitions each compute this in their
    keyed() AND their to_offsets()/to_carries() sides. A drifted copy
    would silently mis-join offsets to events, so the expression lives
    here once."""
    with np.errstate(over="ignore"):
        b = (
            np.asarray(uid).astype(np.uint64) * np.uint64(1000003)
            ^ np.asarray(chunk).astype(np.uint64)
        ) % num_buckets
    return b.astype(np.int64)


def _value_e4(values) -> np.ndarray:
    """value → integer 1e-4 units (matches SQL ``round(value * 10000)``);
    integer sums are exact and order-invariant under parallelism."""
    v = np.asarray(values, dtype=np.float64)
    return (np.sign(v) * np.floor(np.abs(v) * 1e4 + 0.5)).astype(np.int64)



# NOTE (measured): Ray's sort-based Aggregate runs ~10× slower on
# pandas-format blocks than on Arrow blocks (18.6 s vs 1.8 s for a 20k-row
# partial table with ~17k groups). Every partial/combiner stage in this
# package therefore emits **Arrow tables**, even when the combining math
# itself runs in pandas.
#
# NOTE (measured, round 3): Ray's sort shuffle samples its boundary
# quantiles by executing its *lazy* input, so an unmaterialized combiner
# chain runs (at least) twice — whole-query 2–5× at small scale
# (tumbling_window 6.5 s → 1.4 s, top-k combiner 7.2 s → 3.2 s cold at
# sf0.01/8 cpus). Combiner outputs are therefore materialized right
# before every groupby, repo-wide: the partials are the shuffle's input
# either way, so pinning them adds no asymptotic memory — it just stops
# the re-execution.


def tumbling_window(sf_dir: str):
    """Per-hour tumbling window per event_type: count + sum(value)."""

    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pa.Table:
        # value → integer 1e-4 units per row (matches SQL round(value*10000));
        # integer sums are exact and order-invariant under parallelism.
        value_e4 = _value_e4(batch["value"].to_numpy())
        # shuffle key = epoch seconds (int64; cheaper sort key than a
        # timestamp column)
        ws = (
            batch["ts"].dt.floor("h").astype("datetime64[s]").astype(np.int64)
        )
        batch = batch.assign(ws=ws, value_e4=value_e4)
        out = batch.groupby(["ws", "event_type"], as_index=False).agg(
            n_events=("value_e4", "size"), sum_value_e4=("value_e4", "sum")
        )
        return from_pandas_typed(out, ("event_type",))

    partials = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pandas", batch_size=16384
    )
    # partials: sort shuffle re-executes lazy inputs (see NOTE above)
    agg = partials.materialize().groupby(["ws", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_e4", alias_name="sum_value_e4"),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch.insert(
            0, "window_start", batch.pop("ws").astype("datetime64[s]")
        )
        batch["n_events"] = batch["n_events"].astype(np.int64)
        batch["sum_value_e4"] = batch["sum_value_e4"].astype(np.int64)
        return batch

    return agg.map_batches(finalize, batch_format="pandas")


def hopping_window(sf_dir: str, size_minutes: int = 60, hop_minutes: int = 30):
    """Hopping (sliding) window per event_type: 1-hour windows every 30
    minutes, so each event lands in ``size/hop`` overlapping windows.

    Same combiner shape as the tumbling window — the window keys are
    *computed* per event inside ``map_batches`` (explode to one row per
    covering window, pre-aggregate within the batch), so the shuffle
    carries one row per (window, type, batch), never per event-copy."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if hop_minutes <= 0 or size_minutes % hop_minutes != 0:
        raise ValueError(
            f"size_minutes={size_minutes} must be a positive multiple of "
            f"hop_minutes={hop_minutes}: the explode emits size//hop "
            "covering windows per event, so a non-multiple would "
            "silently shrink every window's extent"
        )
    copies = size_minutes // hop_minutes
    hop_s = hop_minutes * 60

    def partial(batch: pd.DataFrame) -> pa.Table:
        value_e4 = _value_e4(batch["value"].to_numpy())
        base = (
            batch["ts"]
            .dt.floor(f"{hop_minutes}min")
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        frames = []
        for c in range(copies):
            frames.append(
                pd.DataFrame(
                    {
                        "ws": base - c * hop_s,
                        "event_type": batch["event_type"].to_numpy(),
                        "value_e4": value_e4,
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out = out.groupby(["ws", "event_type"], as_index=False).agg(
            n_events=("value_e4", "size"), sum_value_e4=("value_e4", "sum")
        )
        return from_pandas_typed(out, ("event_type",))

    agg = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas", batch_size=16384)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["ws", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_e4", alias_name="sum_value_e4"),
        )
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch.insert(
            0, "window_start", batch.pop("ws").astype("datetime64[s]")
        )
        batch["n_events"] = batch["n_events"].astype(np.int64)
        batch["sum_value_e4"] = batch["sum_value_e4"].astype(np.int64)
        return batch

    return agg.map_batches(finalize, batch_format="pandas")


def sessionize(sf_dir: str, gap_minutes: int = 30, chunk_hours: int = 24):
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Output one row per
    session (user_id, session_id, n_events, start/end ts).

    Two-level design so no group ever holds a whole user's raw events:

    1. **local**: ``groupby((user, time-chunk))`` computes sessions
       within each chunk — the heavy phase is bounded by events per
       (user, chunk), not per user.
    2. **stitch**: ``groupby(user)`` over the per-session *summaries*
       (n_events, start, end — a compressed stream, one row per local
       session) merges boundary-adjacent sessions with the same gap
       rule and renumbers. Exact, because chunk-internal sessions
       already satisfy the gap rule and only consecutive summaries can
       merge (``chunk_hours·60 ≥ gap_minutes`` guarantees an empty
       chunk implies the gap is exceeded).

    Both phases shuffle on a *bucket* of their key (hash % num_buckets),
    not the key itself: per-key ``map_groups`` overhead dominates at
    thousands of (user, chunk) pairs, while a bucket call handles all
    its keys in one vectorized pandas pass. Group count is fixed by
    ``num_buckets`` — scale-wise the partitioning unit stays (user,
    chunk)."""
    gap = pd.Timedelta(minutes=gap_minutes)
    if chunk_hours * 60 < gap_minutes:
        raise ValueError("chunk must be at least as long as the gap")
    import pyarrow as pa

    num_buckets = 64

    def add_chunk(batch: pd.DataFrame) -> pa.Table:
        chunk = (
            batch["ts"]
            .dt.floor(f"{chunk_hours}h")
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        uid = batch["user_id"].to_numpy()
        bucket = _user_chunk_bucket(uid, chunk.to_numpy(), num_buckets)
        return pa.Table.from_pandas(
            batch.assign(chunk=chunk, bucket=bucket.astype(np.int64)),
            preserve_index=False,
        )

    def local_sessions(group: pd.DataFrame) -> pa.Table:
        """All (user, chunk) pairs of one bucket, one vectorized pass."""
        from chug_ray.telemetry import record_group

        g = group.sort_values(["user_id", "chunk", "ts", "event_id"])
        sub = g.groupby(["user_id", "chunk"], sort=False).size()
        if len(sub):  # skew visibility: largest (user, chunk) group
            record_group(
                "sessionize.local(user,chunk)", sub.idxmax(), int(sub.max())
            )
        boundary = (
            g["user_id"].ne(g["user_id"].shift())
            | g["chunk"].ne(g["chunk"].shift())
        )
        new_session = boundary | (g["ts"].diff() > gap)
        g = g.assign(sid=new_session.cumsum().astype(np.int64))
        out = g.groupby("sid", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        )
        out = out.assign(ubucket=out["user_id"].to_numpy() % num_buckets)
        return pa.Table.from_pandas(
            out[["ubucket", "user_id", "n_events", "start_ts", "end_ts"]],
            preserve_index=False,
        )

    def stitch(group: pd.DataFrame) -> pd.DataFrame:
        """All users of one bucket: merge boundary-adjacent summaries."""
        from chug_ray.telemetry import record_group

        g = group.sort_values(["user_id", "start_ts", "end_ts"])
        sub = g.groupby("user_id", sort=False).size()
        if len(sub):  # skew visibility: most summaries for one user
            record_group(
                "sessionize.stitch(user)", int(sub.idxmax()), int(sub.max())
            )
        boundary = g["user_id"].ne(g["user_id"].shift())
        new_session = boundary | ((g["start_ts"] - g["end_ts"].shift()) > gap)
        g = g.assign(sid=new_session.cumsum().astype(np.int64))
        out = g.groupby("sid", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("n_events", "sum"),
            start_ts=("start_ts", "min"),
            end_ts=("end_ts", "max"),
        )
        # per-user 1-based renumbering in time order (sid is time-ordered
        # within user after the sort)
        out = out.sort_values("sid")
        out["session_id"] = out.groupby("user_id").cumcount() + 1
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["user_id", "session_id", "n_events", "start_ts", "end_ts"]]

    return (
        _events(sf_dir, ["event_id", "ts", "user_id"])
        .map_batches(add_chunk, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bucket")
        .map_groups(local_sessions, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("ubucket")
        .map_groups(stitch, batch_format="pandas")
    )


def event_type_stats(sf_dir: str):
    """Global per-type stats with exact (hashable) aggregates."""
    from ray.data.aggregate import Count, Max, Min

    return (
        _events(sf_dir, ["event_type", "value"])
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )


def running_user_totals(
    sf_dir: str, chunk_hours: int = 24, num_buckets: int = 64
):
    """Per-user running totals — the ``SUM(value) OVER (PARTITION BY
    user_id ORDER BY ts, event_id)`` window — as a **distributed prefix
    sum**. Values are integer 1e-4 units (exact, order-invariant).

    Like :func:`sessionize`, no phase ever holds a whole user:

    1. **offsets**: per-batch partial sums per (user, time-chunk)
       shuffle once on a user-hash bucket; each bucket finishes the
       (user, chunk) sums AND the per-user *exclusive* prefix in one
       vectorized pass. (A native 2-key Aggregate here measured ~22 s
       at 40k groups vs ~2 s for the 64-bucket pass — the repo-wide
       map_groups/bucket finding applies to Aggregate keys too.)
    2. **apply**: events and their chunk offsets co-shuffle on the same
       (user, chunk) hash bucket; each bucket sorts events within
       (user, chunk), adds the in-chunk cumulative sum to the chunk's
       offset, all keys in one vectorized pass.

    Shuffle cost: one combiner-sized (partial chunk sums), one over the
    events (inevitable — every event needs its ordered position). The
    partitioning unit is (user, chunk): a user with years of events
    splits across chunks, and only the tiny per-chunk summary stream is
    ever per-user."""
    import pyarrow as pa

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        value_e4 = _value_e4(batch["value"].to_numpy())
        chunk = (
            batch["ts"]
            .dt.floor(f"{chunk_hours}h")
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        uid = batch["user_id"].to_numpy()
        bkt = _user_chunk_bucket(uid, chunk.to_numpy(), num_buckets)
        return batch.assign(
            value_e4=value_e4, chunk=chunk, bkt=bkt.astype(np.int64)
        )

    events = (
        _events(sf_dir, ["event_id", "ts", "user_id", "value"])
        .map_batches(keyed, batch_format="pandas", batch_size=16384)
        .materialize()  # consumed by the summary pass AND the apply pass
    )

    def chunk_partial(batch: pd.DataFrame) -> pa.Table:
        out = batch.groupby(["user_id", "chunk"], as_index=False).agg(
            chunk_sum=("value_e4", "sum")
        )
        out["ubkt"] = (out["user_id"].to_numpy() % num_buckets).astype(
            np.int64
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def to_offsets(group: pd.DataFrame) -> pa.Table:
        """One user-bucket: finish the (user, chunk) sums over the
        partials, then the exclusive per-user prefix."""
        g = group.groupby(["user_id", "chunk"], as_index=False).agg(
            chunk_sum=("chunk_sum", "sum")
        )
        g = g.sort_values(["user_id", "chunk"])
        csum = g.groupby("user_id")["chunk_sum"].cumsum()
        offset = (csum - g["chunk_sum"]).astype(np.int64)
        uid = g["user_id"].to_numpy()
        chunk = g["chunk"].to_numpy()
        bkt = _user_chunk_bucket(uid, chunk, num_buckets)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "chunk": pa.array(chunk, pa.int64()),
                "bkt": pa.array(bkt.astype(np.int64)),
                "offset": pa.array(offset.to_numpy(), pa.int64()),
            }
        )

    offsets = (
        events.map_batches(chunk_partial, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("ubkt")
        .map_groups(to_offsets, batch_format="pandas")
    )

    def project_events(batch: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            batch[
                ["bkt", "user_id", "chunk", "event_id", "ts", "value_e4"]
            ].assign(offset=np.int64(0), is_off=np.int8(0)),
            preserve_index=False,
        )

    def project_offsets(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "bkt": t["bkt"],
                "user_id": t["user_id"],
                "chunk": t["chunk"],
                "event_id": pa.array(np.full(n, -1, np.int64)),
                "ts": pa.array(
                    np.zeros(n, "datetime64[us]"), pa.timestamp("us")
                ),
                "value_e4": pa.array(np.zeros(n, np.int64)),
                "offset": t["offset"],
                "is_off": pa.array(np.ones(n, np.int8)),
            }
        )

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("running_user_totals(bucket)", None, len(group))
        off = group[group["is_off"] == 1]
        ev = group[group["is_off"] == 0]
        if not len(ev):
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "running_e4"]
            ).astype(
                {
                    "event_id": np.int64,
                    "user_id": np.int64,
                    "ts": "datetime64[us]",
                    "running_e4": np.int64,
                }
            )
        ev = (
            ev.sort_values(["user_id", "chunk", "ts", "event_id"])
            .drop(columns=["offset", "is_off", "bkt"])
            .merge(  # exact (user, chunk) offset lookup, C hash join,
                off[["user_id", "chunk", "offset"]],  # left order kept
                on=["user_id", "chunk"],
                how="left",
            )
        )
        running = ev.groupby(["user_id", "chunk"])["value_e4"].cumsum()
        return pd.DataFrame(
            {
                "event_id": ev["event_id"].to_numpy(np.int64),
                "user_id": ev["user_id"].to_numpy(np.int64),
                "ts": ev["ts"].to_numpy(),
                "running_e4": (
                    running.to_numpy() + ev["offset"].to_numpy(np.int64)
                ).astype(np.int64),
            }
        )

    both = events.map_batches(project_events, batch_format="pandas").union(
        offsets.map_batches(project_offsets, batch_format="pyarrow")
    )
    # offsets' lazy chain contains its own shuffle — pin it so the
    # final sort's sampling doesn't run that shuffle twice (events
    # are materialized above already)
    return both.materialize().groupby("bkt").map_groups(
        apply, batch_format="pandas"
    )


def rolling_user_sum(
    sf_dir: str, k: int = 3, chunk_hours: int = 24, num_buckets: int = 64
):
    """Bounded rolling window — ``SUM(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``
    — as a two-level chunked pass with **carry-in rows** instead of
    whole-user groups.

    The lookback is bounded (k-1 rows), so unlike the prefix sum no
    running offset is needed — only the last k-1 events *before* each
    (user, time-chunk). Three stages, all bounded:

    1. **tails** (combiner): each batch keeps its last k-1 rows per
       (user, chunk) — tail(k-1) composes under union, so the shuffle
       carries ≤ k-1 rows per (user, chunk, batch).
    2. **carries**: one user-hash shuffle over the tails; per user the
       chunks chain in order, each chunk's carry-in = tail(k-1) of
       everything before it (a Python walk, but over ≤ k-1 rows per
       chunk of *summaries* — the sessionize stitch pattern). Sparse
       chunks are free: the carry chains across gaps.
    3. **apply**: events ∪ carry-ins co-shuffle on the (user, chunk)
       hash bucket; in-group sort + pandas grouped ``rolling(k)`` (C
       path) computes the window over the carry-prefixed sequence;
       carry rows are dropped from the output.

    Chunk size trades shuffle fan-out for group width; results are
    chunk-invariant (tested)."""
    import pyarrow as pa

    tail = k - 1

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        value_e4 = _value_e4(batch["value"].to_numpy())
        chunk = (
            batch["ts"]
            .dt.floor(f"{chunk_hours}h")
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        uid = batch["user_id"].to_numpy()
        bkt = _user_chunk_bucket(uid, chunk.to_numpy(), num_buckets)
        return batch.assign(
            value_e4=value_e4, chunk=chunk, bkt=bkt.astype(np.int64)
        )

    events = (
        _events(sf_dir, ["event_id", "ts", "user_id", "value"])
        .map_batches(keyed, batch_format="pandas", batch_size=16384)
        .materialize()  # consumed by the tails pass AND the apply pass
    )

    def tail_partial(batch: pd.DataFrame) -> pa.Table:
        g = (
            batch.sort_values(["user_id", "chunk", "ts", "event_id"])
            .groupby(["user_id", "chunk"], group_keys=False)
            .tail(tail)
        )
        out = g[["user_id", "chunk", "ts", "event_id", "value_e4"]].assign(
            ubkt=(g["user_id"].to_numpy() % num_buckets).astype(np.int64)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def to_carries(group: pd.DataFrame) -> pa.Table:
        """One user-bucket of chunk tails → carry-in rows keyed to the
        NEXT nonempty chunk they precede."""
        g = group.sort_values(["user_id", "chunk", "ts", "event_id"])
        g = g.groupby(["user_id", "chunk"], group_keys=False).tail(tail)
        out_user, out_chunk, out_ts, out_eid, out_val = [], [], [], [], []
        for uid, u in g.groupby("user_id", sort=False):
            chunks = u["chunk"].unique()  # sorted ascending already
            ts_a = u["ts"].to_numpy()
            eid_a = u["event_id"].to_numpy()
            val_a = u["value_e4"].to_numpy()
            chunk_a = u["chunk"].to_numpy()
            carry_idx: list[int] = []  # indices into u of the running tail
            for c in chunks:
                cur = np.nonzero(chunk_a == c)[0]
                if carry_idx:
                    take = carry_idx[-tail:] if tail > 0 else []
                    out_user.extend([uid] * len(take))
                    out_chunk.extend([c] * len(take))
                    out_ts.extend(ts_a[take])
                    out_eid.extend(eid_a[take])
                    out_val.extend(val_a[take])
                carry_idx = (carry_idx + list(cur))[-tail:] if tail else []
        uid_arr = np.array(out_user, np.int64)
        chunk_arr = np.array(out_chunk, np.int64)
        bkt = _user_chunk_bucket(uid_arr, chunk_arr, num_buckets)
        return pa.table(
            {
                "bkt": pa.array(bkt.astype(np.int64)),
                "user_id": pa.array(uid_arr),
                "chunk": pa.array(chunk_arr),
                "event_id": pa.array(np.array(out_eid, np.int64)),
                "ts": pa.array(
                    np.array(out_ts, dtype="datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "value_e4": pa.array(np.array(out_val, np.int64)),
                "is_carry": pa.array(np.ones(len(uid_arr), np.int8)),
            }
        )

    carries = (
        events.map_batches(tail_partial, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see NOTE)
        .groupby("ubkt")
        .map_groups(to_carries, batch_format="pandas")
    )

    def project_events(batch: pd.DataFrame) -> pa.Table:
        out = batch[
            ["bkt", "user_id", "chunk", "event_id", "ts", "value_e4"]
        ].assign(is_carry=np.int8(0))
        return pa.Table.from_pandas(out, preserve_index=False)

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("rolling_user_sum(bucket)", None, len(group))
        g = group.sort_values(
            ["user_id", "chunk", "ts", "event_id", "is_carry"]
        )
        # carry rows carry ts from EARLIER chunks, so within a
        # (user, chunk) group the plain (ts, event_id) order already
        # places them first; rolling treats them as ordinary lookback
        roll = (
            g.groupby(["user_id", "chunk"], group_keys=False)["value_e4"]
            .rolling(k, min_periods=1)
            .sum()
            .reset_index(level=[0, 1], drop=True)
        )
        g = g.assign(rolling_e4=roll.astype(np.int64))
        g = g[g["is_carry"] == 0]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": g["user_id"].to_numpy(np.int64),
                "ts": g["ts"].to_numpy(),
                "rolling_e4": g["rolling_e4"].to_numpy(np.int64),
            }
        )

    both = events.map_batches(project_events, batch_format="pandas").union(
        carries
    )
    return both.materialize().groupby("bkt").map_groups(
        apply, batch_format="pandas"
    )


def hourly_active_users(sf_dir: str, num_buckets: int = 64):
    """Exact distinct-count per tumbling window (``COUNT(DISTINCT
    user_id)`` per hour — the DAU/WAU shape) without ever grouping a
    whole window:

    1. per-batch combiner: unique (window, user) pairs;
    2. ``groupby(hash(window, user) % num_buckets)``: each bucket
       owns a disjoint slice of the (window, user) key space, dedups
       it exactly, and emits per-window partial counts;
    3. tiny ``groupby(window)`` sums the disjoint partials — exact.

    A hot window spreads over all buckets (the bucket key includes the
    user), so no group ever holds a window's full audience."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def pair_partial(batch: pd.DataFrame) -> pa.Table:
        w = (
            batch["ts"]
            .dt.floor("1h")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {"window": w, "user_id": batch["user_id"].to_numpy()}
        ).drop_duplicates()
        uid = df["user_id"].to_numpy()
        win = df["window"].to_numpy()
        bkt = _user_chunk_bucket(uid, win, num_buckets)
        return pa.table(
            {
                "bkt": pa.array(bkt.astype(np.int64)),
                "window": pa.array(win),
                "user_id": pa.array(uid.astype(np.int64)),
            }
        )

    def count_partial(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("hourly_active_users(bucket)", None, len(group))
        g = (
            group.drop_duplicates(["window", "user_id"])
            .groupby("window", as_index=False)
            .size()
        )
        return pa.table(
            {
                "window": pa.array(g["window"].to_numpy(np.int64)),
                "n_users": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "window_start": batch["window"].cast(pa.timestamp("us")),
                "n_users": pc.cast(batch["n_users"], pa.int64()),
            }
        )

    return (
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(pair_partial, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see NOTE)
        .groupby("bkt")
        .map_groups(count_partial, batch_format="pandas")
        .materialize()  # partials (same reason: shuffle re-executes lazy inputs)
        .groupby("window")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def user_event_pivot(sf_dir: str, num_buckets: int = 64):
    """Wide (pivot) aggregation: one row per user with per-event-type
    counts as columns plus the value total — the feature-table shape a
    per-entity ML pipeline materializes. Per-batch crosstab combiner →
    one user-hash bucket shuffle over partial rows → in-bucket sum per
    user; no group ever holds more than its bucket's partials."""
    import pyarrow as pa

    TYPES = ("click", "error", "purchase", "signup", "view")

    def partial(batch: pd.DataFrame) -> pa.Table:
        value_e4 = _value_e4(batch["value"].to_numpy())
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "event_type": batch["event_type"].to_numpy(object),
                "value_e4": value_e4,
            }
        )
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("value_e4", "size"), v=("value_e4", "sum")
        )
        wide = g.pivot_table(
            index="user_id", columns="event_type", values="n",
            aggfunc="first", fill_value=0,
        )
        out = {"user_id": wide.index.to_numpy(np.int64)}
        for t in TYPES:
            out[f"n_{t}"] = (
                wide[t].to_numpy(np.int64) if t in wide
                else np.zeros(len(wide), np.int64)
            )
        tot = g.groupby("user_id")["v"].sum()
        out["sum_value_e4"] = tot.reindex(wide.index).to_numpy(np.int64)
        out["bkt"] = (out["user_id"] % num_buckets).astype(np.int64)
        return pa.table({k: pa.array(v) for k, v in out.items()})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("user_event_pivot(bucket)", None, len(group))
        cols = [f"n_{t}" for t in TYPES] + ["sum_value_e4"]
        g = group.groupby("user_id", as_index=False)[cols].sum()
        return g.astype({c: np.int64 for c in cols + ["user_id"]})

    return (
        _events(sf_dir, ["user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see NOTE)
        .groupby("bkt")
        .map_groups(merge, batch_format="pandas")
    )


def signup_conversion(sf_dir: str, num_buckets: int = 64):
    """Funnel analysis: per signed-up user, the first purchase at-or-
    after their first signup (conversion flag + both timestamps). The
    funnel event types are a small fraction of the log, so the filter
    runs at the read (column-pruned, predicate in ``map_batches``) and
    only (user, ts, kind) triples of signups/purchases shuffle once on
    the user-hash bucket; the in-group resolution is a vectorized
    two-cummin pass, no per-user loop."""
    import pyarrow as pa

    def prep(batch: pd.DataFrame) -> pa.Table:
        m = batch["event_type"].isin(("signup", "purchase"))
        df = batch.loc[m, ["user_id", "ts", "event_type"]]
        return pa.table(
            {
                "bkt": pa.array(
                    (df["user_id"].to_numpy() % num_buckets).astype(np.int64)
                ),
                "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
                "ts": pa.array(df["ts"].to_numpy("datetime64[us]")),
                "is_signup": pa.array(
                    (df["event_type"] == "signup").to_numpy()
                ),
            }
        )

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("signup_conversion(bucket)", None, len(group))
        s = (
            group[group["is_signup"]]
            .groupby("user_id")["ts"]
            .min()
            .rename("signup_ts")
        )
        p = group[~group["is_signup"]].merge(
            s, left_on="user_id", right_index=True
        )
        p = p[p["ts"] >= p["signup_ts"]]
        first_p = p.groupby("user_id")["ts"].min()
        out = s.to_frame()
        out["first_purchase_ts"] = first_p.reindex(s.index)
        out["converted"] = out["first_purchase_ts"].notna().astype(np.int64)
        return out.reset_index().astype({"user_id": np.int64})

    return (
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see NOTE)
        .groupby("bkt")
        .map_groups(resolve, batch_format="pandas")
    )


def event_transitions(sf_dir: str, chunk_hours: int = 24, num_buckets: int = 64):
    """Sequence analytics — global (prev_type → type) transition counts
    over each user's time-ordered event stream (the ``LAG() OVER
    (PARTITION BY user ORDER BY ts)`` shape). Same two-level plan as the
    rolling window with lookback 1: per-(user, chunk) tails carry each
    chunk's LAST event to the next nonempty chunk, so cross-chunk
    transitions are exact without ever grouping a whole user; in-chunk
    transitions are a vectorized shift inside the bucket; per-batch
    (prev, type) count partials reduce in a tiny final groupby."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        chunk = (
            batch["ts"]
            .dt.floor(f"{chunk_hours}h")
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        uid = batch["user_id"].to_numpy()
        bkt = _user_chunk_bucket(uid, chunk.to_numpy(), num_buckets)
        return batch.assign(chunk=chunk, bkt=bkt.astype(np.int64))

    events = (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(keyed, batch_format="pandas", batch_size=16384)
        .materialize()  # consumed by the tails pass AND the apply pass
    )

    def tail_partial(batch: pd.DataFrame) -> pa.Table:
        g = (
            batch.sort_values(["user_id", "chunk", "ts", "event_id"])
            .groupby(["user_id", "chunk"], group_keys=False)
            .tail(1)
        )
        out = g[["user_id", "chunk", "ts", "event_id", "event_type"]].assign(
            ubkt=(g["user_id"].to_numpy() % num_buckets).astype(np.int64)
        )
        return from_pandas_typed(out, ("event_type",))

    def to_carries(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["user_id", "chunk", "ts", "event_id"])
        g = g.groupby(["user_id", "chunk"], group_keys=False).tail(1)
        # the chunk's true last row precedes the NEXT nonempty chunk
        nxt = g.groupby("user_id")["chunk"].shift(-1)
        keep = nxt.notna()
        out = g[keep].assign(chunk=nxt[keep].astype(np.int64))
        uid = out["user_id"].to_numpy()
        bkt = _user_chunk_bucket(uid, out["chunk"].to_numpy(), num_buckets)
        return pa.table(
            {
                "bkt": pa.array(bkt.astype(np.int64)),
                "user_id": pa.array(uid.astype(np.int64)),
                "chunk": pa.array(out["chunk"].to_numpy(np.int64)),
                "event_id": pa.array(out["event_id"].to_numpy(np.int64)),
                "ts": pa.array(
                    out["ts"].to_numpy("datetime64[us]"), pa.timestamp("us")
                ),
                "event_type": pa.array(out["event_type"].to_numpy(object),
                                       pa.string()),
                "is_carry": pa.array(np.ones(len(out), np.int8)),
            }
        )

    carries = (
        events.map_batches(tail_partial, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see NOTE)
        .groupby("ubkt")
        .map_groups(to_carries, batch_format="pandas")
    )

    def project_events(batch: pd.DataFrame) -> pa.Table:
        out = batch[
            ["bkt", "user_id", "chunk", "event_id", "ts", "event_type"]
        ].assign(is_carry=np.int8(0))
        return from_pandas_typed(out, ("event_type",))

    def count_pairs(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("event_transitions(bucket)", None, len(group))
        g = group.sort_values(
            ["user_id", "chunk", "ts", "event_id", "is_carry"]
        )
        same = (
            (g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1])
            & (g["chunk"].to_numpy()[1:] == g["chunk"].to_numpy()[:-1])
        )
        cur_real = g["is_carry"].to_numpy()[1:] == 0
        et = g["event_type"].to_numpy(object)
        df = pd.DataFrame(
            {
                "prev_type": et[:-1][same & cur_real],
                "event_type": et[1:][same & cur_real],
            }
        )
        c = df.groupby(["prev_type", "event_type"], as_index=False).size()
        return pa.table(
            {
                "prev_type": pa.array(c["prev_type"].to_numpy(object),
                                      pa.string()),
                "event_type": pa.array(c["event_type"].to_numpy(object),
                                       pa.string()),
                "n": pa.array(c["size"].to_numpy(np.int64)),
            }
        )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n"] = batch["n"].astype(np.int64)
        return batch

    both = events.map_batches(project_events, batch_format="pandas").union(
        carries
    )
    return (
        both.materialize()
        .groupby("bkt")
        .map_groups(count_pairs, batch_format="pandas")
        .materialize()  # pin before the trailing groupby's sort shuffle
        .groupby(["prev_type", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(finalize, batch_format="pandas")
    )


def pack_sequences(
    sf_dir: str, cap: int = 512, chunk_docs: int = 4096, num_buckets: int = 64
):
    """GPT-style sequence packing index: concatenate every document's
    tokens in doc_id order and cut the stream into ``cap``-token
    training sequences; each doc is assigned the sequence its first
    token lands in (``seq_id = floor(exclusive_running / cap)``) — the
    packed-dataset index map every pretraining pipeline materializes.

    This is a **global** distributed prefix sum (contrast
    :func:`running_user_totals`, which is per-key): three bounded
    levels, never a global sort —

    1. per-batch combiner: token-count partial sums per doc-id chunk
       (``doc_id // chunk_docs``);
    2. range-partitioned buckets (each owns a contiguous chunk range)
       finish their chunks' sums and in-bucket exclusive offsets; the
       driver scans only the ``num_buckets`` bucket totals into bucket
       offsets (the one driver-side step, 64 ints);
    3. docs co-shuffle with their chunk offsets; the in-group cumsum +
       chunk offset + bucket offset is the exact global running total.

    Partitioning assumption: doc_ids are dense-ish so ``chunk_docs``
    bounds per-chunk rows; skew only widens a chunk's group, never a
    whole-corpus one."""
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Max

    from chug_ray.ops.tokenize import TOKEN_RE as _TRE
    import re as _re

    token_re = _re.compile(_TRE)
    path = f"{sf_dir}/documents.parquet"
    max_doc = ray.data.read_parquet(path, columns=["doc_id"]).aggregate(
        Max("doc_id")
    )["max(doc_id)"]
    n_chunks = int(max_doc) // chunk_docs + 1

    def rbucket(chunk: np.ndarray) -> np.ndarray:
        # contiguous chunk ranges per bucket (ordered, for the scan)
        return np.minimum(
            chunk * num_buckets // n_chunks, num_buckets - 1
        ).astype(np.int64)

    def counted(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.array(
            [len(token_re.findall(t.lower())) for t in batch["text"].to_pylist()],
            np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(n),
                "chunk": pa.array(ids // chunk_docs),
            }
        )

    docs = (
        ray.data.read_parquet(path, columns=["doc_id", "text"])
        .map_batches(counted, batch_format="pyarrow")
        .materialize()  # consumed by the offsets pass AND the apply pass
    )

    def chunk_partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("chunk", as_index=False)["n_tokens"].sum()
        chunk = g["chunk"].to_numpy(np.int64)
        return pa.table(
            {
                "chunk": pa.array(chunk),
                "sum_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
                "rbkt": pa.array(rbucket(chunk)),
            }
        )

    def to_offsets(group: pd.DataFrame) -> pa.Table:
        g = group.groupby("chunk", as_index=False)["sum_tokens"].sum()
        g = g.sort_values("chunk")
        csum = g["sum_tokens"].cumsum()
        return pa.table(
            {
                "chunk": pa.array(g["chunk"].to_numpy(np.int64)),
                # in-bucket EXCLUSIVE offset per chunk
                "offset": pa.array(
                    (csum - g["sum_tokens"]).to_numpy().astype(np.int64)
                ),
                "rbkt": pa.array(
                    rbucket(g["chunk"].to_numpy(np.int64))
                ),
                "bucket_total": pa.array(
                    np.full(len(g), int(csum.iloc[-1]) if len(g) else 0,
                            np.int64)
                ),
            }
        )

    offsets = (
        docs.map_batches(chunk_partial, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see NOTE)
        .groupby("rbkt")
        .map_groups(to_offsets, batch_format="pandas")
        .materialize()  # consumed twice: bucket totals + the apply union
    )
    # the one driver-side step: exclusive scan over num_buckets totals
    # (per-batch distinct — a block may hold several bucket groups)
    def bucket_totals(batch: pd.DataFrame) -> pa.Table:
        g = batch.drop_duplicates("rbkt")[["rbkt", "bucket_total"]]
        return pa.table(
            {
                "rbkt": pa.array(g["rbkt"].to_numpy(np.int64)),
                "bucket_total": pa.array(
                    g["bucket_total"].to_numpy(np.int64)
                ),
            }
        )

    totals_rows = offsets.map_batches(
        bucket_totals, batch_format="pandas"
    ).take_all()
    btot = {}
    for r in totals_rows:
        btot[int(r["rbkt"])] = int(r["bucket_total"])
    bucket_offsets = np.zeros(num_buckets, np.int64)
    acc = 0
    for b in range(num_buckets):
        bucket_offsets[b] = acc
        acc += btot.get(b, 0)
    boff_ref = ray.put(bucket_offsets)

    def project_offsets(batch: pa.Table) -> pa.Table:
        from chug_ray.ops.relational import _bcast

        boff = _bcast(boff_ref)
        rb = batch["rbkt"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "chunk": batch["chunk"],
                "doc_id": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "n_tokens": pa.array(np.zeros(batch.num_rows, np.int64)),
                "offset": pa.array(
                    batch["offset"].to_numpy(zero_copy_only=False) + boff[rb]
                ),
                "is_off": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )

    def project_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "chunk": batch["chunk"],
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "offset": pa.array(np.zeros(batch.num_rows, np.int64)),
                "is_off": pa.array(np.zeros(batch.num_rows, np.int8)),
            }
        )

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("pack_sequences(chunk)", None, len(group))
        off = group[group["is_off"] == 1].set_index("chunk")["offset"]
        ev = group[group["is_off"] == 0].sort_values(["chunk", "doc_id"])
        if not len(ev):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "seq_id": pd.Series([], dtype=np.int64),
                }
            )
        run = ev.groupby("chunk")["n_tokens"].cumsum()
        excl = run - ev["n_tokens"] + ev["chunk"].map(off).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ev["doc_id"].to_numpy(np.int64),
                "n_tokens": ev["n_tokens"].to_numpy(np.int64),
                "seq_id": (excl.to_numpy(np.int64) // cap).astype(np.int64),
            }
        )

    both = docs.map_batches(project_docs, batch_format="pyarrow").union(
        offsets.map_batches(project_offsets, batch_format="pyarrow")
    )
    return both.materialize().groupby("chunk").map_groups(
        apply, batch_format="pandas"
    )


def user_journey(sf_dir: str, k: int = 12, num_buckets: int = 64):
    """Per-user ordered journey — the first-``k`` event types joined in
    time order (``STRING_AGG(... ORDER BY ts)`` shape) plus the user's
    full event count.

    Reference anchor: no chug counterpart; covers the order-sensitive
    string aggregation shape (user paths / clickstreams) the rest of the
    window family lacks.

    Scale shape: journeys are unbounded at corpus scale, so ``k`` is the
    operator's contract (mirrored by the oracle's ``row_number()``
    filter). Per-batch pruning ships at most ``k`` earliest event rows
    plus ONE count partial per (user, batch) into the bucket shuffle —
    no stage ever holds a whole user's history, and the union of
    per-batch k-earliest rows is a superset of the global k-earliest,
    so the assembled prefix is exact.
    """
    import pyarrow as pa

    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.sort_values(["user_id", "ts", "event_id"])
        pruned = g.groupby("user_id", group_keys=False).head(k)
        counts = batch.groupby("user_id", as_index=False).size()
        uid_e = pruned["user_id"].to_numpy(np.int64)
        uid_c = counts["user_id"].to_numpy(np.int64)
        return pa.table(
            {
                "bkt": pa.array(
                    np.concatenate([uid_e, uid_c]) % num_buckets, pa.int64()
                ),
                "user_id": pa.array(np.concatenate([uid_e, uid_c])),
                "ts": pa.array(
                    np.concatenate(
                        [
                            pruned["ts"].to_numpy("datetime64[us]"),
                            np.zeros(len(uid_c), "datetime64[us]"),
                        ]
                    ),
                    pa.timestamp("us"),
                ),
                "event_id": pa.array(
                    np.concatenate(
                        [
                            pruned["event_id"].to_numpy(np.int64),
                            np.full(len(uid_c), -1, np.int64),
                        ]
                    )
                ),
                "event_type": pa.array(
                    np.concatenate(
                        [
                            pruned["event_type"].to_numpy(object),
                            np.full(len(uid_c), "", object),
                        ]
                    ),
                    pa.string(),
                ),
                "cnt": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(uid_e), np.int64),
                            counts["size"].to_numpy(np.int64),
                        ]
                    )
                ),
            }
        )

    def assemble(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("user_journey(bucket)", None, len(group))
        ev = group[group["cnt"] == 0].sort_values(
            ["user_id", "ts", "event_id"]
        )
        top = ev.groupby("user_id", group_keys=False).head(k)
        journey = top.groupby("user_id")["event_type"].agg(">".join)
        n = group[group["cnt"] > 0].groupby("user_id")["cnt"].sum()
        uid = journey.index.to_numpy(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "n_events": pa.array(n.reindex(journey.index).to_numpy(np.int64)),
                "journey": pa.array(journey.to_numpy(object), pa.string()),
            }
        )

    return (
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(partial, batch_format="pandas", batch_size=16384)
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("bkt")
        .map_groups(assemble, batch_format="pandas")
    )


def sliding_distinct_users(
    sf_dir: str, window_hours: int = 24, num_buckets: int = 64
):
    """Trailing-window COUNT(DISTINCT): for every hour with events, the
    number of distinct users active in the last ``window_hours`` hours.

    Reference anchor: no chug counterpart; the sliding-distinct shape
    (DAU-style retention metrics) is the one window aggregate
    ``hourly_active_users`` (per-hour distinct) doesn't cover.

    Scale shape — dedup BEFORE the window expansion, never after the
    fact over raw events:

    1. per-batch distinct (hour, user) pairs → user-bucket shuffle →
       exact distinct pairs (the only pass over raw events);
    2. the observed-hour set (bounded by the time span, ~10^6 rows for
       a century of hours — a driver-safe pull) broadcasts via
       ``ray.put``;
    3. each pair expands to its ≤``window_hours`` target hours (a 24×
       blowup of the *deduped* pairs, not of the event log), re-dedups
       per user bucket, and per-batch count partials reduce in a tiny
       final ``groupby(hour)``.
    """
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    span = np.int64(3600)

    def pair_partial(batch: pd.DataFrame) -> pa.Table:
        h = (
            batch["ts"].dt.floor("h").astype("datetime64[s]").astype(np.int64)
        ).to_numpy()
        u = batch["user_id"].to_numpy(np.int64)
        df = pd.DataFrame({"h": h, "u": u}).drop_duplicates()
        return pa.table(
            {
                "bkt": pa.array(df["u"].to_numpy(np.int64) % num_buckets),
                "h": pa.array(df["h"].to_numpy(np.int64)),
                "u": pa.array(df["u"].to_numpy(np.int64)),
            }
        )

    def dedup_pairs(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("sliding_distinct_users(bucket)", None, len(group))
        df = group[["h", "u"]].drop_duplicates()
        return pa.table(
            {
                "h": pa.array(df["h"].to_numpy(np.int64)),
                "u": pa.array(df["u"].to_numpy(np.int64)),
            }
        )

    pairs = (
        _events(sf_dir, ["ts", "user_id"])
        .map_batches(pair_partial, batch_format="pandas", batch_size=16384)
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("bkt")
        .map_groups(dedup_pairs, batch_format="pandas")
        .materialize()  # consumed twice: observed-hour scan + expansion
    )

    def hour_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"h": pa.array(np.unique(batch["h"].to_numpy()), pa.int64())}
        )

    hours = np.unique(
        pairs.map_batches(hour_partial, batch_format="pyarrow")
        .to_pandas()["h"]
        .to_numpy(np.int64)
    )
    hours_ref = ray.put(hours)

    def expand(batch: pa.Table) -> pa.Table:
        from chug_ray.ops.relational import _bcast

        hset = _bcast(hours_ref)  # per-process cache (repo convention)
        h = batch["h"].to_numpy()
        u = batch["u"].to_numpy()
        outs_h, outs_u = [], []
        for off in range(window_hours):
            th = h + span * off
            # np.searchsorted membership against the sorted hour set
            idx = np.searchsorted(hset, th)
            ok = (idx < len(hset)) & (hset[np.minimum(idx, len(hset) - 1)] == th)
            outs_h.append(th[ok])
            outs_u.append(u[ok])
        th = np.concatenate(outs_h)
        tu = np.concatenate(outs_u)
        return pa.table(
            {
                "bkt": pa.array(tu % num_buckets, pa.int64()),
                "h": pa.array(th),
                "u": pa.array(tu),
            }
        )

    def count_partial(group: pd.DataFrame) -> pa.Table:
        df = group[["h", "u"]].drop_duplicates()
        c = df.groupby("h", as_index=False).size()
        return pa.table(
            {
                "h": pa.array(c["h"].to_numpy(np.int64)),
                "n": pa.array(c["size"].to_numpy(np.int64)),
            }
        )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour": batch["h"]
                .to_numpy(np.int64)
                .astype("datetime64[s]")
                .astype("datetime64[us]"),
                "users_24h": batch["n"].to_numpy(np.int64),
            }
        )

    return (
        pairs.map_batches(expand, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("bkt")
        .map_groups(count_partial, batch_format="pandas")
        .materialize()  # pin before the trailing groupby's sort shuffle
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(finalize, batch_format="pandas")
    )


# --- mergeable quantile sketch (KLL-style) -------------------------------

_KLL_K = 256


def _kll_caps(n_levels: int, k: int = _KLL_K) -> list[int]:
    # geometric capacities (KLL): the top level holds k items, each
    # level below holds (2/3) of the one above, floored at 8
    return [
        max(8, int(np.ceil(k * (2.0 / 3.0) ** (n_levels - 1 - i))))
        for i in range(n_levels)
    ]


def _kll_compact(levels: list[np.ndarray]) -> list[np.ndarray]:
    while True:
        caps = _kll_caps(len(levels))
        for i, arr in enumerate(levels):
            if len(arr) <= caps[i]:
                continue
            arr = np.sort(arr)
            # deterministic-by-content parity replaces the coin flip:
            # reruns of the same plan reproduce the same sketch
            parity = (len(arr) + i) % 2
            promoted = arr[parity::2]
            levels[i] = arr[1 - parity :: 2][:0]  # emptied (typed)
            if i + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
            break
        else:
            return levels


def _kll_serialize(levels: list[np.ndarray], n: int) -> bytes:
    import struct

    out = [struct.pack("<qi", n, len(levels))]
    for arr in levels:
        out.append(struct.pack("<q", len(arr)))
        out.append(np.ascontiguousarray(arr, np.float64).tobytes())
    return b"".join(out)


def _kll_deserialize(blob: bytes) -> tuple[list[np.ndarray], int]:
    import struct

    n, n_levels = struct.unpack_from("<qi", blob, 0)
    off = 12
    levels = []
    for _ in range(n_levels):
        (cnt,) = struct.unpack_from("<q", blob, off)
        off += 8
        levels.append(np.frombuffer(blob, np.float64, cnt, off).copy())
        off += 8 * cnt
    return levels, n


def _kll_merge(blobs: list[bytes]) -> bytes:
    levels: list[np.ndarray] = []
    total = 0
    for blob in blobs:
        lv, n = _kll_deserialize(blob)
        total += n
        for i, arr in enumerate(lv):
            if i == len(levels):
                levels.append(arr)
            else:
                levels[i] = np.concatenate([levels[i], arr])
    return _kll_serialize(_kll_compact(levels), total)


def approx_quantiles(sf_dir: str, ps=(1, 5, 25, 50, 75, 95, 99)):
    """Approximate quantiles of ``events.value`` via a mergeable
    KLL-style sketch — the third member of the sketch family (HLL
    distinct counts, CMS heavy hitters, KLL quantiles), for the scales
    where the exact sort behind ``chars_quantiles`` is unaffordable.

    Scale shape: one pass builds a ≤ few-KB sketch per batch; a
    shuffle-free tree merge (``map_batches`` over 64 sketches at a
    time, the customers_with_events pattern) collapses them; the driver
    merges a handful of survivors and reads the quantiles off the final
    sketch. No shuffle, no sort, communication O(#batches × sketch).

    Compaction parity is content-derived rather than random, so a rerun
    of the same plan reproduces the same sketch; rank error is the
    standard KLL O(1/k) (k=256), pinned against exact quantiles by
    pytest. Approximate by design → rows-only driver check.
    """
    import pyarrow as pa

    def build(batch: pa.Table) -> pa.Table:
        vals = batch["value"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        levels = _kll_compact([vals])
        return pa.table(
            {"sk": pa.array([_kll_serialize(levels, len(vals))],
                            pa.binary())}
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        blob = _kll_merge([bytes(b) for b in batch["sk"].to_pylist()])
        return pa.table({"sk": pa.array([blob], pa.binary())})

    rows = (
        _events(sf_dir, ["value"])
        .map_batches(build, batch_format="pyarrow", batch_size=16384)
        .map_batches(merge_rows, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    levels, n = _kll_deserialize(
        _kll_merge([bytes(r["sk"]) for r in rows])
    )
    if n == 0:
        return pd.DataFrame(
            {
                "p_pct": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64),
                "n": pd.Series([], dtype=np.int64),
            }
        )
    vals = np.concatenate([arr for arr in levels if len(arr)] or [[]])
    wts = np.concatenate(
        [np.full(len(arr), 1 << i, np.int64) for i, arr in enumerate(levels)
         if len(arr)]
        or [[]]
    )
    order = np.argsort(vals, kind="stable")
    vals, cum = vals[order], np.cumsum(wts[order])
    out_p, out_v = [], []
    for p in ps:
        target = max(1, int(np.ceil(p / 100.0 * n)))
        idx = int(np.searchsorted(cum, target))
        out_p.append(p)
        out_v.append(float(vals[min(idx, len(vals) - 1)]))
    return pd.DataFrame(
        {
            "p_pct": np.array(out_p, np.int64),
            "value": np.array(out_v, np.float64),
            "n": np.full(len(out_p), n, np.int64),
        }
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def value_histogram(sf_dir: str, bins: int = 20):
    """Equal-width histogram over ``events.value`` — the fixed-bin
    companion to the equal-frequency :func:`chug_ray.ops.selection.
    decile_bucket` and the exact-quantile ops.

    Scale shape: pass 1 is a tree-reduced global Min/Max (no shuffle);
    pass 2 assigns bins vectorized and pre-aggregates per batch, so the
    final ``groupby(bin)`` moves ≤ ``bins`` rows per batch. Nothing
    driver-side grows with the data — only the ``bins``-row result.

    Float parity with the oracle: the bin index is computed with the
    exact expression tree ``floor((value - lo) * bins / (hi - lo))``
    (left-assoc, doubles), and per-bin sums are integer cents, so the
    result is bit-deterministic under any partitioning."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    src = _events(sf_dir, ["value"])
    mm = src.aggregate(Min("value"), Max("value"))
    if mm["min(value)"] is None:  # empty events table: typed empty result
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "bin": pa.array([], pa.int64()),
                    "lo_edge": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        )
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    nb = float(bins)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        if hi == lo:
            idx = np.zeros(len(v), np.int64)
        else:
            idx = np.minimum(
                np.floor((v - lo) * nb / (hi - lo)), bins - 1
            ).astype(np.int64)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(
            np.int64
        )
        g = pd.DataFrame({"bin": idx, "sum_cents": cents}).groupby(
            "bin", as_index=False
        ).agg(n=("sum_cents", "size"), sum_cents=("sum_cents", "sum"))
        return pa.table(
            {
                "bin": pa.array(g["bin"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "sum_cents": pa.array(g["sum_cents"].to_numpy(np.int64)),
            }
        )

    agg = (
        src.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )

    def edges(batch: pa.Table) -> pa.Table:
        b = batch["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        # lo + bin * (hi - lo) / bins — same tree as the oracle
        lo_edge = lo + b * (hi - lo) / nb
        return pa.table(
            {
                "bin": pc.cast(batch["bin"], pa.int64()),
                "lo_edge": pa.array(lo_edge),
                "n": pc.cast(batch["n"], pa.int64()),
                "sum_cents": pc.cast(batch["sum_cents"], pa.int64()),
            }
        )

    return agg.map_batches(edges, batch_format="pyarrow")


def user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity score (a bot with one event type scores 0; a
    uniform user scores ln(5)).

    Scale shape: ONE wide combiner — each batch emits one row per user
    with a fixed column per event type (the type domain is the 5-value
    ``EVENT_TYPES``), so the single ``groupby(user_id)`` sums integer
    columns and no per-(user,type) row set is ever shuffled. Entropy is
    then a vectorized map over the summed counts.

    Float parity: entropy = ln(N) - s/N with s accumulated LEFT-
    ASSOCIATIVELY over the sorted type list (click+error+...), the same
    explicit expression tree as the DuckDB oracle, with libm ln on both
    sides; rounded half-away to e6 fixed point only at the edge."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    types = sorted(EVENT_TYPES)

    def partial(batch: pd.DataFrame) -> pa.Table:
        pv = batch.pivot_table(
            index="user_id",
            columns="event_type",
            values="ts",
            aggfunc="size",
            fill_value=0,
        )
        cols = {"user_id": pa.array(pv.index.to_numpy(np.int64))}
        for t in types:
            arr = (
                pv[t].to_numpy(np.int64)
                if t in pv.columns
                else np.zeros(len(pv), np.int64)
            )
            cols[f"n_{t}"] = pa.array(arr)
        return pa.table(cols)

    agg = (
        _events(sf_dir, ["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])
    )

    def score(batch: pa.Table) -> pa.Table:
        counts = [
            batch[f"n_{t}"].to_numpy(zero_copy_only=False).astype(np.float64)
            for t in types
        ]
        total = np.zeros(len(batch), np.float64)
        for c in counts:  # left-assoc, sorted-type order == oracle
            total = total + c
        s = np.zeros(len(batch), np.float64)
        for c in counts:
            s = s + np.where(c > 0, c * np.log(np.maximum(c, 1.0)), 0.0)
        ent = np.log(total) - s / total
        ent_e6 = (np.sign(ent) * np.floor(np.abs(ent) * 1e6 + 0.5)).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "n_events": pa.array(total.astype(np.int64)),
                "entropy_e6": pa.array(ent_e6),
            }
        )

    return agg.map_batches(score, batch_format="pyarrow")


def first_last_touch(sf_dir: str):
    """First/last-touch attribution: per user, the event type of the
    FIRST and LAST event (time order, event_id tie-break — a total
    order) plus the full event count — the FIRST_VALUE/LAST_VALUE
    window shape.

    Scale shape: per-batch combiner keeps ONE candidate row per user
    per batch (its local first + last + count); the single
    ``groupby(user_id)`` then resolves over ≤ n_batches tiny summary
    rows per user, never the raw events — same two-level design as the
    other window ops (no whole-user group materializes)."""
    import pyarrow as pa

    def partial(batch: pd.DataFrame) -> pa.Table:
        # the (ts, event_id) total-order contract requires both columns
        # non-null (the events schema guarantees it): a null ts would
        # order differently at the batch level (pandas NaT-last) vs the
        # resolve level (int64-min-first) — batching-dependent output —
        # and a null event_id breaks the int64 cast. Fail loudly instead.
        if batch["ts"].isna().any() or batch["event_id"].isna().any():
            raise ValueError(
                "first_last_touch: null ts/event_id breaks the "
                "(ts, event_id) total order; clean or filter them first"
            )
        batch = batch.sort_values(["ts", "event_id"], kind="stable")
        g = batch.groupby("user_id", as_index=False)
        # nth() is positional: the whole first/last ROW in (ts, event_id)
        # order. first()/last() would skip nulls per column independently,
        # mixing fields from different rows when ts/event_id/type is null.
        first = g.nth(0).sort_values("user_id", kind="stable")
        last = g.nth(-1).sort_values("user_id", kind="stable")
        cnt = batch.groupby("user_id", as_index=False).size()

        def _types(s: pd.Series) -> pa.Array:
            # positional rows can carry a null type — keep it null
            return pa.array(
                s.where(s.notna(), None).to_numpy(object), pa.string()
            )

        return pa.table(
            {
                "user_id": pa.array(first["user_id"].to_numpy(np.int64)),
                "first_ts": pa.array(
                    first["ts"].to_numpy("datetime64[us]").astype(np.int64)
                ),
                "first_eid": pa.array(first["event_id"].to_numpy(np.int64)),
                "first_type": _types(first["event_type"]),
                "last_ts": pa.array(
                    last["ts"].to_numpy("datetime64[us]").astype(np.int64)
                ),
                "last_eid": pa.array(last["event_id"].to_numpy(np.int64)),
                "last_type": _types(last["event_type"]),
                "n_events": pa.array(cnt["size"].to_numpy(np.int64)),
            }
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        fi = group.sort_values(
            ["first_ts", "first_eid"], kind="stable"
        ).iloc[0]
        la = group.sort_values(
            ["last_ts", "last_eid"], ascending=False, kind="stable"
        ).iloc[0]
        return pa.table(
            {
                "user_id": pa.array(
                    [int(group["user_id"].iloc[0])], pa.int64()
                ),
                "first_type": pa.array(
                    [None if pd.isna(fi["first_type"]) else fi["first_type"]],
                    pa.string(),
                ),
                "last_type": pa.array(
                    [None if pd.isna(la["last_type"]) else la["last_type"]],
                    pa.string(),
                ),
                "n_events": pa.array(
                    [int(group["n_events"].sum())], pa.int64()
                ),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
        .map_batches(partial, batch_format="pandas", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("user_id")
        .map_groups(resolve, batch_format="pandas")
    )


def retention_cohorts(sf_dir: str, num_buckets: int = 64):
    """Classic retention-cohort matrix at DAY granularity (the corpus
    spans ~one month): users are cohorted by the calendar day of their
    FIRST event; each cell counts the cohort's distinct users active
    ``day_offset`` days later.

    Scale shape: ONE user-bucket shuffle (a user's whole history lands
    in one group — group sizes bounded by per-user event counts,
    telemetry via record_group); in-group work is vectorized distinct
    (user, day) + per-user min; the final groupby runs over
    (cohort, offset) partials bounded by the day-domain square."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from chug_ray.telemetry import record_group

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((u % num_buckets).astype(np.int64))
        )

    def cohort_partial(group: pd.DataFrame) -> pa.Table:
        record_group(
            "retention_cohorts(user bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        day = (
            group["ts"]
            .to_numpy("datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        um = pd.DataFrame(
            {"u": group["user_id"].to_numpy(np.int64), "d": day}
        ).drop_duplicates()
        first = um.groupby("u", as_index=False)["d"].min().rename(
            columns={"d": "f"}
        )
        m = um.merge(first, on="u")
        cell = (
            pd.DataFrame(
                {
                    "cohort_day": m["f"].to_numpy(np.int64),
                    "day_offset": (m["d"] - m["f"]).to_numpy(np.int64),
                }
            )
            .groupby(["cohort_day", "day_offset"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "cohort_day": pa.array(cell["cohort_day"].to_numpy(np.int64)),
                "day_offset": pa.array(
                    cell["day_offset"].to_numpy(np.int64)
                ),
                "n_users": pa.array(cell["size"].to_numpy(np.int64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["cohort_day"].to_numpy(zero_copy_only=False)
        iso = (
            d.astype("datetime64[D]").astype("datetime64[us]").astype(object)
        )
        return pa.table(
            {
                "cohort_date": pa.array(
                    [x.strftime("%Y-%m-%d") for x in iso], pa.string()
                ),
                "day_offset": batch["day_offset"],
                "n_users": batch["n_users"],
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(cohort_partial, batch_format="pandas")
        .materialize()
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(finish, batch_format="pyarrow")
    )


def bounce_rate(sf_dir: str, gap_minutes: int = 30):
    """Daily bounce rate: of the sessions STARTING each day, the share
    with exactly one event — the product-analytics composite on top of
    :func:`sessionize` (which already guarantees no whole-user group
    materializes). bounce_e6 mirrors the oracle's double tree.

    Scale shape: sessionize's two bucket shuffles + one day-domain
    groupby over per-batch (day, sessions, bounces) partials."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    sessions = sessionize(sf_dir, gap_minutes=gap_minutes)

    def partial(batch: pd.DataFrame) -> pa.Table:
        day = (
            batch["start_ts"]
            .to_numpy("datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "day": day,
                "one": np.ones(len(batch), np.int64),
                "bounce": (batch["n_events"].to_numpy(np.int64) == 1).astype(
                    np.int64
                ),
            }
        )
        g = df.groupby("day", as_index=False).sum()
        return pa.table(
            {
                "day": pa.array(g["day"].to_numpy(np.int64)),
                "n_sessions": pa.array(g["one"].to_numpy(np.int64)),
                "n_bounces": pa.array(g["bounce"].to_numpy(np.int64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["day"].to_numpy(zero_copy_only=False)
        iso = d.astype("datetime64[D]").astype("datetime64[us]").astype(object)
        s = batch["n_sessions"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        b = batch["n_bounces"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        rate = b / s
        return pa.table(
            {
                "day": pa.array(
                    [x.strftime("%Y-%m-%d") for x in iso], pa.string()
                ),
                "n_sessions": batch["n_sessions"],
                "n_bounces": batch["n_bounces"],
                "bounce_e6": pa.array(
                    np.floor(rate * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return (
        sessions.map_batches(partial, batch_format="pandas", batch_size=65536)
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("day")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_bounces", alias_name="n_bounces"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def hourly_anomalies(sf_dir: str, z_threshold_e6: int = 2_000_000):
    """Hours whose event volume deviates anomalously from the mean
    hourly volume: per-hour z-scores from exact integer moments, with
    |z| > threshold flagged — the volume-anomaly-detection composite.

    Scale shape: one hour-domain combiner groupby (≤ observed-hours
    rows); the population moments (k, Σn, Σn²) come from ONE aggregate
    over that bounded table and broadcast into a map-only scorer.
    Float parity: mean = S/k, var = (k·Σn² − S²)/k², z = (n − mean)/sd
    evaluate the same double tree both sides; zero-variance domains
    return no rows (den > 0)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        hour = (
            batch["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[h]")
            .astype(np.int64)
        )
        h, c = np.unique(hour, return_counts=True)
        return pa.table(
            {"hour": pa.array(h), "n": pa.array(c.astype(np.int64))}
        )

    hourly = (
        _events(sf_dir, ["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def mom_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([len(n)], pa.int64()),
                "s": pa.array([int(n.sum())], pa.int64()),
                "ss": pa.array([int((n * n).sum())], pa.int64()),
            }
        )

    mom = (
        hourly.map_batches(mom_partial, batch_format="pyarrow")
        .materialize()
        .aggregate(
            Sum("k", alias_name="k"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )
    # empty events: the aggregate returns Nones — take the k==0 branch
    # BEFORE int() so the typed-empty path is actually reachable
    if mom["k"] is None:
        k, s, ss = 0, 0, 0
    else:
        k, s, ss = int(mom["k"]), int(mom["s"]), int(mom["ss"])
    den = k * ss - s * s  # Python ints: no wraparound
    if k == 0 or den <= 0:
        return pd.DataFrame(
            {
                "hour_ts": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "z_e6": pd.Series([], dtype=np.int64),
                "is_anomaly": pd.Series([], dtype=bool),
            }
        )

    def score(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        mean = float(s) / float(k)
        sd = np.sqrt(float(den) / (float(k) * float(k)))
        z = (n - mean) / sd
        z_e6 = (np.sign(z) * np.floor(np.abs(z) * 1e6 + 0.5)).astype(
            np.int64
        )
        hour = batch["hour"].to_numpy(zero_copy_only=False)
        iso = hour.astype("datetime64[h]").astype("datetime64[us]").astype(
            object
        )
        return pa.table(
            {
                "hour_ts": pa.array(
                    [x.strftime("%Y-%m-%d %H:00:00") for x in iso],
                    pa.string(),
                ),
                "n_events": batch["n"],
                "z_e6": pa.array(z_e6),
                "is_anomaly": pa.array(
                    np.abs(z_e6) > z_threshold_e6
                ),
            }
        )

    return hourly.map_batches(score, batch_format="pyarrow")


def max_streak(sf_dir: str, num_buckets: int = 64):
    """Longest run of CONSECUTIVE active days per user — the
    gaps-and-islands engagement metric. A user's distinct active days
    d sorted ascending form islands where d − rank(d) is constant; the
    longest island is the answer.

    Scale shape: ONE user-bucket shuffle (whole-user history per
    group, record_group telemetry); in-group work is the vectorized
    island trick over distinct (user, day) rows."""
    import pyarrow as pa

    from chug_ray.telemetry import record_group

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((u % num_buckets).astype(np.int64))
        )

    def streaks(group: pd.DataFrame) -> pa.Table:
        record_group(
            "max_streak(user bucket)",
            int(group["bucket"].iloc[0]),
            len(group),
        )
        day = (
            group["ts"]
            .to_numpy("datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        um = (
            pd.DataFrame(
                {"u": group["user_id"].to_numpy(np.int64), "d": day}
            )
            .drop_duplicates()
            .sort_values(["u", "d"], kind="stable")
        )
        rank = um.groupby("u").cumcount().to_numpy(np.int64)
        island = um["d"].to_numpy(np.int64) - rank
        runs = (
            pd.DataFrame({"u": um["u"].to_numpy(np.int64), "i": island})
            .groupby(["u", "i"], as_index=False)
            .size()
        )
        best = runs.groupby("u", as_index=False)["size"].max()
        active = um.groupby("u", as_index=False).size()
        out = best.merge(active, on="u", suffixes=("_streak", "_days"))
        return pa.table(
            {
                "user_id": pa.array(out["u"].to_numpy(np.int64)),
                "max_streak_days": pa.array(
                    out["size_streak"].to_numpy(np.int64)
                ),
                "n_active_days": pa.array(
                    out["size_days"].to_numpy(np.int64)
                ),
            }
        )

    return (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(streaks, batch_format="pandas")
    )


def churned_users(sf_dir: str, inactive_days: int = 1):
    """Churn label builder: users whose LAST event is more than
    ``inactive_days`` before the corpus's latest event — the standard
    supervised-churn target next to retention_cohorts.

    Scale shape: one per-user Max combiner groupby (user-bounded) plus
    a tree-reduced global max broadcast into the flagging map; exact
    integer microsecond arithmetic throughout."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Max

    def partial(batch: pa.Table) -> pa.Table:
        ts = (
            batch["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(zero_copy_only=False),
             "ts": ts}
        )
        g = df.groupby("user_id", as_index=False).agg(
            last=("ts", "max"), n=("ts", "size")
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "last": pa.array(g["last"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    per_user = (
        _events(sf_dir, ["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("user_id")
        .aggregate(
            Max("last", alias_name="last"), Sum("n", alias_name="n")
        )
        .materialize()
    )
    global_max = int(per_user.aggregate(Max("last"))["max(last)"])
    cutoff_us = inactive_days * 86_400_000_000

    def flag(batch: pa.Table) -> pa.Table:
        last = batch["last"].to_numpy(zero_copy_only=False)
        days = (global_max - last) // 86_400_000_000
        return pa.table(
            {
                "user_id": batch["user_id"],
                "n_events": batch["n"],
                "days_inactive": pa.array(days.astype(np.int64)),
                "churned": pa.array(global_max - last > cutoff_us),
            }
        )

    return per_user.map_batches(flag, batch_format="pyarrow")
