"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard,
embedding-cosine near-dup.

Scale patterns (per the Ray guide / SURVEY.md §2.6):
* exact: content-hash in a vectorized ``map_batches`` →
  ``groupby(hash).aggregate(Min(doc_id))`` — one shuffle over (hash, id)
  pairs, never the texts.
* MinHash-LSH: per-batch numpy signatures → explode to
  (band, band_hash, doc_id) rows → ``groupby`` band buckets → candidate
  pairs → Jaccard verify. Only the tiny signature rows shuffle.
* blocked pairwise ops use an explicit blocking key (lang/source or
  label) so the quadratic part stays inside small groups.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from chug_ray.util import from_pandas_typed

from chug_ray.ops.textstats import TOKEN_RE
from chug_ray.util import round_away

_TOKEN_RE = re.compile(TOKEN_RE)

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS


def _docs(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str):
    """One surviving doc_id (the minimum) per distinct text.

    Batch combiner (per-batch min/count per fingerprint, emitted as an
    Arrow table — Ray's sort-aggregate is ~10× slower on pandas blocks)
    → native Min/Sum aggregate: the shuffle carries one row per
    (fingerprint, batch)."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "fp_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in batch["text"].to_pylist()
                ],
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby("fp_md5", as_index=False).agg(
            doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )
        return from_pandas_typed(out, ("fp_md5",))

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("fp_md5")
        .aggregate(
            Min("doc_id", alias_name="doc_id"), Sum("n_dups", alias_name="n_dups")
        )
    )


def dedup_survivors(sf_dir: str):
    """The deduplicated document set: one surviving row (min doc_id) per
    distinct text. The payload columns ride *through* the
    ``groupby(fp_md5)`` packed into one sortable string (doc_id
    zero-padded so lexicographic Min == numeric min), so the whole op is
    a single Min-aggregate shuffle carrying one short row per
    (fingerprint, batch) — no join, no second pass over the table."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def add_packed(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        ids = pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 19, "0")
        packed = pc.binary_join_element_wise(
            ids,
            batch["lang"],
            batch["source"],
            pc.cast(batch["n_chars"], pa.string()),
            "\x00",
        )
        df = pd.DataFrame(
            {"fp_md5": fps, "packed": packed.to_numpy(zero_copy_only=False)}
        )
        # batch combiner: one candidate row per fingerprint per batch;
        # emitted as Arrow (pandas blocks cripple the downstream sort agg)
        out = df.groupby("fp_md5", as_index=False).agg(packed=("packed", "min"))
        return from_pandas_typed(out, ("fp_md5", "packed"))

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["packed"], "\x00")
        return pa.table(
            {
                "doc_id": pc.cast(pc.list_element(parts, 0), pa.int64()),
                "lang": pc.list_element(parts, 1),
                "source": pc.list_element(parts, 2),
                "n_chars": pc.cast(pc.list_element(parts, 3), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
        .map_batches(add_packed, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("fp_md5")
        .aggregate(Min("packed", alias_name="packed"))
        .map_batches(unpack, batch_format="pyarrow")
    )


def dedup_survivors_join(sf_dir: str, num_partitions: int = 32):
    """Join-based variant of :func:`dedup_survivors`, kept as the demo of
    Ray Data's native hash join (SURVEY.md §2.5's scale escape hatch for
    when the carried payload is too wide to pack). ``num_partitions``
    should be ≈ cluster CPUs; the packed-Min groupby above is the
    production path."""
    from ray.data.aggregate import Min

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"fp_md5": pa.array(fps, pa.string()), "doc_id": batch["doc_id"]}
        )

    survivors = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_fp, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("fp_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .drop_columns(["fp_md5"])
    )
    full = _docs(sf_dir, ["doc_id", "lang", "source", "n_chars"])
    joined = full.join(
        survivors,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    import pyarrow.compute as pc

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "source": batch["source"],
                "n_chars": pc.cast(batch["n_chars"], pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift hash family over uint64 with natural wraparound
    (a odd): fully vectorizable, deterministic (fixed seed)."""
    rng = np.random.default_rng(0xC0FFEE)  # fixed: signatures are stable
    a = rng.integers(1, np.iinfo(np.uint64).max, size=N_PERM, dtype=np.uint64)
    a |= np.uint64(1)  # odd multipliers
    b = rng.integers(0, np.iinfo(np.uint64).max, size=N_PERM, dtype=np.uint64)
    return a, b


# shingle hash = wraparound-combine of the k token hashes with fixed odd
# multipliers — lets one blake2b per *unique token* cover every shingle.
_SHINGLE_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9], dtype=np.uint64
)


def _token_hash(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
    )


def _shingle_hashes_from_tokens(th: np.ndarray, k: int = 3) -> np.ndarray:
    """Shingle hashes from the per-token hash array."""
    if not len(th):
        return np.empty(0, dtype=np.uint64)
    if len(th) < k:
        h = np.zeros(1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(th):
                h = h * _SHINGLE_MULT[i % k] + t
        return h
    with np.errstate(over="ignore"):
        windows = np.lib.stride_tricks.sliding_window_view(th, k)
        return (windows * _SHINGLE_MULT[None, :]).sum(axis=1, dtype=np.uint64)


# bottom-k cap on the per-band token-hash sketch: a doc with more
# unique tokens than this ships only its k smallest hashes, bounding
# the banding-shuffle bytes at k·8B × N_BANDS per doc regardless of doc
# length. Bottom-k sketches still give the standard Jaccard estimator
# (see band_pairs); below the cap the sketch IS the full set → exact.
SKETCH_K = 256


class MinHasher:
    """Actor: permutation params + token-hash cache built once; per doc
    one vectorized (N_PERM × n_shingles) min.

    Each band row also carries the doc's sorted-unique *token-hash
    sketch*, capped at the ``sketch_k`` smallest hashes (uint64, much
    smaller than the text and bounded per doc). That is what lets the
    downstream verify run inside the band-bucket groups — no second
    lookup of the texts anywhere (the scale requirement: nothing ever
    materializes the corpus outside the streaming pipeline)."""

    def __init__(self, num_buckets: int = 1, sketch_k: int = SKETCH_K):
        self.a, self.b = _perm_params()
        self.num_buckets = num_buckets
        self.sketch_k = sketch_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        # tokenize + hash per doc (cache amortizes blake2b per unique token)
        tok_arrays: list[np.ndarray] = []
        tok_sets: list[np.ndarray] = []
        for text in batch["text"].to_pylist():
            th = _hashed_tokens(text)
            tok_arrays.append(th)
            # np.unique is sorted, so [:k] is exactly the bottom-k sketch
            tok_sets.append(np.unique(th)[: self.sketch_k])
        shingles = [_shingle_hashes_from_tokens(th) for th in tok_arrays]
        counts = np.fromiter(
            (len(s) for s in shingles), dtype=np.int64, count=n
        )
        sigs = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
        nz = np.nonzero(counts)[0]
        if len(nz):
            # one (N_PERM × total_shingles) multiply for the whole batch,
            # then a per-doc segment-min (minimum.reduceat) — replaces the
            # per-doc python loop of small matmuls
            flat = np.concatenate([shingles[i] for i in nz])
            offsets = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(counts[nz][:-1], out=offsets[1:])
            with np.errstate(over="ignore"):
                prod = self.a[:, None] * flat[None, :] + self.b[:, None]
                sigs[nz] = np.minimum.reduceat(prod, offsets, axis=1).T
        # token-FREE docs all share the identical all-max signature: at
        # web scale they would funnel into ONE band bucket and blow the
        # quadratic self-merge — and every pair they form has union 0
        # (jac 0, always discarded), so they emit no band rows at all
        keep = np.array([t.size > 0 for t in tok_sets], bool)
        if not keep.all():
            idx = np.nonzero(keep)[0]
            sigs = sigs[idx]
            tok_sets = [tok_sets[i] for i in idx]
            batch = batch.take(pa.array(idx))
            n = len(idx)
        bandsig = sigs.reshape(n, N_BANDS, ROWS_PER_BAND)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, N_BANDS), dtype=np.uint64)
            for c in range(ROWS_PER_BAND):
                bh = bh * np.uint64(0x100000001B3) + bandsig[:, :, c]
        band_hashes = bh.ravel()
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), N_BANDS
        )
        bands = np.tile(np.arange(N_BANDS, dtype=np.int32), n)
        tok_list = pa.array(
            [t.tolist() for t in tok_sets], pa.list_(pa.uint64())
        ).take(pa.array(np.repeat(np.arange(n), N_BANDS)))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes.astype(np.int64)),
                "bucket": pa.array(
                    (band_hashes % np.uint64(self.num_buckets)).astype(np.int32)
                ),
                "tok_hashes": tok_list,
            }
        )


def _token_set(text: str) -> set:
    return set(_TOKEN_RE.findall(text.lower()))


def _jaccard(a: set, b: set) -> float:
    # union == 0 (two token-free docs) is no-pair, matching the SQL
    # oracle's 0/0 -> NULL (excluded by WHERE jac >= threshold)
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def minhash_lsh_pairs(
    sf_dir: str,
    threshold: float = 0.6,
    num_buckets: int = 32,
    sketch_k: int = SKETCH_K,
):
    """Near-dup pairs via MinHash banding, Jaccard-verified in-group.

    Fully streaming: the band rows carry each doc's uint64 token-hash
    bottom-``sketch_k`` sketch, so verification happens inside the
    ``(band, bucket)`` groups — Jaccard from the carried sketches
    (exact below the cap, the standard bottom-k estimator
    |bottom_k(A∪B) ∩ A ∩ B| / |bottom_k(A∪B)| above it), never a
    second lookup of the texts and never a driver-side materialization.
    ``bucket = band_hash % num_buckets`` keeps every group bounded
    (shuffle parallelism = N_BANDS × num_buckets, and a group only
    holds rows whose band_hash collides mod num_buckets). The final
    ``groupby(doc_a, doc_b)`` dedups pairs surfaced by multiple bands;
    all copies carry the same score, so ``Min`` is the identity.
    """
    from ray.data.aggregate import Min

    def band_pairs(group: pd.DataFrame) -> pa.Table:
        """All pairs sharing a band_hash within one band-bucket — a
        vectorized self-merge, then Jaccard from the carried bottom-k
        token-hash sketches. Emitted as Arrow (pandas blocks cripple
        the downstream sort aggregate)."""
        from chug_ray.telemetry import record_group

        g = group.loc[
            ~group.duplicated(["band_hash", "doc_id"]),
            ["band_hash", "doc_id", "tok_hashes"],
        ]
        sub = g.groupby("band_hash", sort=False).size()
        if len(sub):  # skew visibility: the self-merge is quadratic in
            # the largest band_hash collision set
            record_group(
                "minhash_lsh_pairs(band_hash)",
                int(sub.idxmax()),
                int(sub.max()),
            )
        m = g.merge(g, on="band_hash", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        jac = []
        for ta, tb in zip(m["tok_hashes_a"], m["tok_hashes_b"]):
            ta = np.asarray(ta, dtype=np.uint64)
            tb = np.asarray(tb, dtype=np.uint64)
            # the estimator is for TRUNCATED sketches only: a sketch
            # under the cap is the doc's complete token set, and two
            # complete sets always admit exact Jaccard — regardless of
            # their union size (a union > sketch_k of two complete
            # sub-cap sets must NOT trigger estimation: measured 0.8594
            # estimated vs 0.7857 exact on a 250∪250-token pair)
            if ta.size >= sketch_k or tb.size >= sketch_k:
                # bottom-k estimator over bottom_k(A∪B): the union of
                # two bottom-k sketches contains bottom-k of the full
                # union (mergeability), and membership of any
                # bottom_k(A∪B) element in A is decidable from
                # bottom_k(A) alone
                u = np.union1d(ta, tb)[:sketch_k]
                inter = (
                    np.isin(u, ta, assume_unique=True)
                    & np.isin(u, tb, assume_unique=True)
                ).sum()
                jac.append(inter / u.size)
            else:
                inter = np.intersect1d(ta, tb, assume_unique=True).size
                union = ta.size + tb.size - inter
                jac.append(0.0 if union == 0 else inter / union)
        # filter on the RAW score, round only at the output edge — the
        # sibling exact/banded paths and the SQL oracles do the same, so
        # a 0.79996 pair cannot round up past the threshold
        m = m.assign(jaccard_raw=jac if jac else [])
        m = m[m["jaccard_raw"] >= threshold]
        m = m.assign(jaccard=round_away(m["jaccard_raw"].to_numpy(), 4))
        return pa.table(
            {
                "doc_a": pa.array(m["doc_id_a"].to_numpy(np.int64)),
                "doc_b": pa.array(m["doc_id_b"].to_numpy(np.int64)),
                "jaccard": pa.array(m["jaccard"].to_numpy(np.float64)),
            }
        )

    # task pool: the hasher's token cache is the per-worker-process
    # module dict (not pickled state), and the driver-built instance
    # ships only the tiny permutation params — no actor ramp
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(MinHasher(num_buckets, sketch_k), batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["band", "bucket"])
        .map_groups(band_pairs, batch_format="pandas")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("jaccard", alias_name="jaccard"))
    )


# per-worker-process token-hash cache (task pools: state survives across
# batches in the same worker process — the round-1 execution finding)
_SKETCH_CACHE: dict[str, int] = {}


def _hashed_tokens(text: str) -> np.ndarray:
    """uint64 hash per token OCCURRENCE (order preserved); blake2b runs
    once per unique token via the per-process ``_SKETCH_CACHE``. The
    single tokenize+hash seam for every sketch/scan in this module —
    one place to change the token universe or the cache policy."""
    toks = _TOKEN_RE.findall(text.lower())
    return np.array(
        [_SKETCH_CACHE.setdefault(t, _token_hash(t)) for t in toks],
        dtype=np.uint64,
    )


def _sketch_tokens(batch: pa.Table) -> pa.Table:
    """Reduce each doc to its sorted-unique uint64 token-hash set
    *before* the blocking shuffle, so the groups carry small sketches
    instead of texts."""
    sets = []
    for text in batch["text"].to_pylist():
        sets.append(np.unique(_hashed_tokens(text)).tolist())
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "source": batch["source"],
            "tok_hashes": pa.array(sets, pa.list_(pa.uint64())),
        }
    )


def _exact_jaccard_pairs(
    ids: np.ndarray, sets: list[np.ndarray], threshold: float
) -> list[tuple]:
    """Exact all-pairs Jaccard with size-window pruning: |A∩B|/|A∪B| ≥ t
    requires min(|A|,|B|)/max(|A|,|B|) ≥ t, so after sorting by set size
    each doc only compares against the docs inside its size window —
    near-linear when near-dups are rare, and no quadratic frame is ever
    materialized (results stream out pair by pair)."""
    sizes = np.array([s.size for s in sets], dtype=np.int64)
    order = np.argsort(sizes, kind="stable")
    sizes_sorted = sizes[order]
    rows = []
    for oi in range(len(order)):
        i = order[oi]
        hi_size = sizes_sorted[oi] / threshold if threshold > 0 else np.inf
        oj = oi + 1
        while oj < len(order) and sizes_sorted[oj] <= hi_size:
            j = order[oj]
            inter = np.intersect1d(sets[i], sets[j], assume_unique=True).size
            union = sets[i].size + sets[j].size - inter
            jac = 0.0 if union == 0 else inter / union
            if jac >= threshold:
                a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                rows.append((a, b, float(round_away(jac, 4))))
            oj += 1
    return rows


def _banded_jaccard_pairs(
    ids: np.ndarray, sets: list[np.ndarray], threshold: float
) -> list[tuple]:
    """Oversize-block path: MinHash banding over the token sets prunes
    candidates to same-bucket pairs, each exact-verified — O(n·bands)
    instead of O(n²). Approximate only in recall (banding can miss pairs
    near the threshold); every emitted score is exact."""
    a_p, b_p = _perm_params()
    buckets: dict[tuple, list[int]] = {}
    for i, s in enumerate(sets):
        if not s.size:
            # empty sets would ALL share one signature → one quadratic
            # bucket, and every pair they form has union 0 (jac 0,
            # always discarded) — skip them entirely
            continue
        with np.errstate(over="ignore"):
            sig = (a_p[:, None] * s[None, :] + b_p[:, None]).min(axis=1)
        bandsig = sig.reshape(N_BANDS, ROWS_PER_BAND)
        for band in range(N_BANDS):
            buckets.setdefault((band, bandsig[band].tobytes()), []).append(i)
    seen: set[tuple] = set()
    rows = []
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                key = (i, j) if i < j else (j, i)
                if key in seen:
                    continue
                seen.add(key)
                inter = np.intersect1d(
                    sets[i], sets[j], assume_unique=True
                ).size
                union = sets[i].size + sets[j].size - inter
                jac = 0.0 if union == 0 else inter / union
                if jac >= threshold:
                    a, b = (
                        (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                    )
                    rows.append((a, b, float(round_away(jac, 4))))
    return rows


def ngram_jaccard_pairs(
    sf_dir: str, threshold: float = 0.8, max_group_rows: int = 20_000
):
    """Blocked pairwise token-set Jaccard: pairs within the same
    (lang, source) block with similarity ≥ threshold. SQL-oracle-able.

    Scale guards: texts are sketched to uint64 token-hash sets before
    the shuffle (the groups never hold text); groups under
    ``max_group_rows`` run the exact size-window-pruned pair scan, and
    an oversize (skewed) block falls back to in-group MinHash banding +
    exact verify so a dominant block stays near-linear instead of
    quadratic. At oracle scales every block is under the cap, so the
    result is the exact SQL answer."""

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        g = group.sort_values("doc_id")
        record_group(
            "ngram_jaccard_pairs(lang,source)",
            (str(g["lang"].iloc[0]), str(g["source"].iloc[0]))
            if len(g)
            else None,
            len(g),
        )
        ids = g["doc_id"].to_numpy()
        sets = [np.asarray(s, dtype=np.uint64) for s in g["tok_hashes"]]
        fn = (
            _exact_jaccard_pairs
            if len(g) <= max_group_rows
            else _banded_jaccard_pairs
        )
        rows = sorted(fn(ids, sets, threshold))
        return pd.DataFrame(
            rows or None, columns=["doc_a", "doc_b", "jaccard"]
        ).astype({"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64})

    return (
        _docs(sf_dir, ["doc_id", "text", "lang", "source"])
        .map_batches(_sketch_tokens, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["lang", "source"])
        .map_groups(block_pairs, batch_format="pandas")
    )


# the engine-parity rounding rule lives in ONE place (knn.py) so the
# sign/floor convention cannot drift between the dedup and ANN families
from chug_ray.ops.knn import _sim_e4  # noqa: E402


def _cos_strip_pairs(
    ids: np.ndarray, unit: np.ndarray, threshold: float, tile: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact all-pairs cosine ≥ threshold, computed one (tile × n)
    strip at a time so peak memory is O(tile · n), never n × n."""
    n = len(ids)
    va, vb, se4 = [], [], []
    for i0 in range(0, n, tile):
        i1 = min(i0 + tile, n)
        sims = unit[i0:i1] @ unit[i0:].T  # strip: rows i0..i1 × cols i0..n
        ii, jj = np.nonzero(sims >= threshold)
        # strip cols start at i0, so strictly-upper (global j > global
        # i) is simply local jj > local ii
        keep = jj > ii
        ii, jj = ii[keep], jj[keep]
        va.append(ids[ii + i0])
        vb.append(ids[jj + i0])
        se4.append(_sim_e4(sims[ii, jj]))
    empty = np.array([], np.int64)
    return (
        np.concatenate(va) if va else empty,
        np.concatenate(vb) if vb else empty,
        np.concatenate(se4) if se4 else empty,
    )


def _banded_cos_pairs(
    ids: np.ndarray,
    unit: np.ndarray,
    threshold: float,
    tile: int,
    n_tables: int = 8,
    n_bits: int = 12,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Oversize-block path: ``n_tables`` independent random-hyperplane
    (SimHash) bucketings prune candidates to same-bucket pairs, each
    exact-verified — O(n · tables · bucket) instead of O(n²).
    Approximate only in recall (a pair hashing apart in every table is
    missed; miss prob ≈ (1 − (1 − θ/π)^bits)^tables); every emitted
    score is exact. Deterministic: fixed-seed hyperplanes."""
    rng = np.random.default_rng(0xC0541)
    d = unit.shape[1]
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    seen: set[tuple] = set()
    va, vb, se4 = [], [], []
    for _ in range(n_tables):
        planes = rng.standard_normal((d, n_bits))
        codes = ((unit @ planes) >= 0) @ weights
        order = np.argsort(codes, kind="stable")
        bounds = np.nonzero(np.diff(codes[order]))[0] + 1
        for members in np.split(order, bounds):
            if len(members) < 2:
                continue
            a, b, s = _cos_strip_pairs(
                ids[members], unit[members], threshold, tile
            )
            for x, y, v in zip(a, b, s):
                key = (x, y) if x < y else (y, x)
                if key not in seen:
                    seen.add(key)
                    va.append(key[0])
                    vb.append(key[1])
                    se4.append(v)
    return (
        np.array(va, np.int64),
        np.array(vb, np.int64),
        np.array(se4, np.int64),
    )


def embedding_near_dup(
    sf_dir: str,
    threshold: float = 0.3,
    tile: int = 4096,
    max_group_rows: int = 20_000,
):
    """Embedding-cosine near-dup pairs, blocked by label (same-label
    pairs only — the explicit blocking key keeps the quadratic part
    inside groups).

    Scale guards mirror ``ngram_jaccard_pairs``: a block under
    ``max_group_rows`` runs the exact tiled strip scan (peak memory
    O(tile · n), never the full n × n frame); an oversize (skewed)
    block falls back to random-hyperplane bucketing + exact verify so a
    dominant label stays near-linear instead of quadratic. Every
    emitted score is exact on both paths; the banded path is
    approximate only in recall. At oracle scales every block is under
    the cap, so the result is the exact SQL answer."""
    import ray.data

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        g = group.sort_values("vec_id")
        record_group(
            "embedding_near_dup(label)",
            str(g["label"].iloc[0]) if len(g) else None,
            len(g),
        )
        from chug_ray.ops.knn import _unit_rows

        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        unit = _unit_rows(mat)  # shared zero-norm convention with semdedup
        if len(ids) <= max_group_rows:
            va, vb, se4 = _cos_strip_pairs(ids, unit, threshold, tile)
        else:
            va, vb, se4 = _banded_cos_pairs(ids, unit, threshold, tile)
        return pd.DataFrame(
            {
                "vec_a": va.astype(np.int64),
                "vec_b": vb.astype(np.int64),
                "cos_sim_e4": se4.astype(np.int64),
            },
            columns=["vec_a", "vec_b", "cos_sim_e4"],
        )

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return (
        emb.materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("label")
        .map_groups(block_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the pair graph
# ---------------------------------------------------------------------------


def _symmetric_edges(pairs):
    """(doc_a, doc_b) pairs → both-direction (node, nbr) edge rows."""

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "val": pa.array(np.concatenate([b, a])),
            }
        )

    return pairs.map_batches(sym, batch_format="pyarrow")


def _union_find_labels(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact driver-side connected components: union by min root with
    path halving (near-linear). Returns (sorted unique nodes, label per
    node); because unions always point the larger root at the smaller
    and node ids are sorted, every root index is its component's
    minimum node id."""
    ids = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(ids, a)
    ib = np.searchsorted(ids, b)
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for x, y in zip(ia.tolist(), ib.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(ids))])
    return ids, ids[roots]


def _cc_labels(
    edges,
    num_buckets: int = 64,
    max_rounds: int = 16,
    max_driver_edges: int = 4_000_000,
):
    """Distributed connected components by iterative min-label
    propagation over an edge Dataset (node, val=nbr) — the join-free
    map-reduce formulation: each round is two hash-bucket ``groupby``
    shuffles over (pair-graph) rows, never a driver-side graph.

    * round 0: label(x) = min(x, min of x's neighbors) — a plain
      Min aggregate.
    * round k: spread — every edge group forwards its node's current
      label to each neighbor; shrink — every node takes the min of its
      old label and the forwarded candidates, emitting a ``changed``
      flag whose Sum is the driver's convergence test.

    Rounds needed = graph diameter; near-dup components are shallow
    (dups of a common original), so this converges in a handful of
    rounds. For adversarially deep graphs the published fix is
    large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond"), which this loop's row shape
    admits; ``max_rounds`` caps the work and raises rather than
    silently emitting unconverged labels. Both phases shuffle on
    ``hash(node) % num_buckets`` and process all keys of a bucket in
    one vectorized pass (the repo-wide map_groups finding).

    Returns a (node, label) Dataset over pair-graph nodes only —
    singleton documents never enter the iteration.

    **Size-adaptive**: a near-dup pair graph is usually minuscule next
    to the corpus (pairs already passed a 0.8-Jaccard filter), and the
    iterative loop pays ~4 shuffle executions of fixed overhead per
    round. When the edge list is under ``max_driver_edges`` rows
    (16 B/row → ≤ ~64 MB), it is pulled once to the driver and solved
    with an exact numpy union-find — the same broadcast-small-side
    rule every lookup in this repo follows. Above the threshold the
    distributed loop runs; both paths produce identical labels (tested)
    and the threshold is an explicit, logged knob — no silent cap."""
    from ray.data.aggregate import Min

    edges = edges.materialize()  # reused every round
    n_edges = edges.count()
    if n_edges == 0:
        return None  # no pairs: every document is a singleton
    if n_edges <= max_driver_edges:
        import ray.data

        df = edges.to_pandas()
        nodes, labels_np = _union_find_labels(
            df["node"].to_numpy(np.int64), df["val"].to_numpy(np.int64)
        )
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes), "val": pa.array(labels_np)})
        )

    labels = (
        edges.groupby("node")
        .aggregate(Min("val", alias_name="label"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "val": pa.compute.min_element_wise(t["node"], t["label"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def with_bkt(t: pa.Table) -> pa.Table:
        nodes = t["node"].to_numpy(zero_copy_only=False)
        bkt = (nodes.astype(np.uint64) * np.uint64(1000003)) % num_buckets
        return t.append_column("bkt", pa.array(bkt.astype(np.int64)))

    def tagged(t: pa.Table, is_lab: int) -> pa.Table:
        flag = np.full(t.num_rows, is_lab, np.int8)
        return with_bkt(t.append_column("is_lab", pa.array(flag)))

    def spread(group: pd.DataFrame) -> pd.DataFrame:
        """One bucket: forward each node's label along its edges."""
        from chug_ray.telemetry import record_group

        node = group["node"].to_numpy()
        val = group["val"].to_numpy()
        is_lab = group["is_lab"].to_numpy().astype(bool)
        record_group("dedup_clusters.spread(bucket)", None, len(group))
        ln, lv = node[is_lab], val[is_lab]
        order = np.argsort(ln, kind="stable")
        ln, lv = ln[order], lv[order]
        en, ev = node[~is_lab], val[~is_lab]
        lab_of_edge = lv[np.searchsorted(ln, en)]
        return pd.DataFrame(
            {
                "node": np.concatenate([ev, ln]),
                "val": np.concatenate([lab_of_edge, lv]),
                "is_lab": np.concatenate(
                    [
                        np.zeros(len(ev), np.int8),
                        np.ones(len(ln), np.int8),
                    ]
                ),
            }
        )

    def shrink(group: pd.DataFrame) -> pd.DataFrame:
        """One bucket: per node, min(old label, candidates) + changed."""
        node = group["node"].to_numpy()
        val = group["val"].to_numpy()
        is_lab = group["is_lab"].to_numpy().astype(bool)
        order = np.lexsort((val, node))
        n_s, v_s = node[order], val[order]
        first = np.ones(len(n_s), dtype=bool)
        first[1:] = n_s[1:] != n_s[:-1]
        new_nodes, new_vals = n_s[first], v_s[first]
        ln, lv = node[is_lab], val[is_lab]
        lorder = np.argsort(ln, kind="stable")
        old = lv[lorder][np.searchsorted(ln[lorder], new_nodes)]
        return pd.DataFrame(
            {
                "node": new_nodes,
                "val": new_vals,
                "changed": (new_vals < old).astype(np.int64),
            }
        )

    for _ in range(max_rounds):
        both = edges.map_batches(
            lambda t: tagged(t, 0), batch_format="pyarrow"
        ).union(
            labels.map_batches(lambda t: tagged(t, 1), batch_format="pyarrow")
        )
        cand = both.groupby("bkt").map_groups(spread, batch_format="pandas")
        new = (
            cand.map_batches(with_bkt, batch_format="pyarrow")
            .groupby("bkt")
            .map_groups(shrink, batch_format="pandas")
            .materialize()
        )
        # convergence probe: one column sum over the materialized labels
        changed = new.sum("changed")
        labels = new.drop_columns(["changed"])
        if not changed:
            return labels
    raise RuntimeError(
        f"connected components did not converge in {max_rounds} rounds — "
        "graph diameter exceeds the cap; use star-contraction for this input"
    )


def dedup_clusters(
    sf_dir: str,
    threshold: float = 0.8,
    max_rounds: int = 16,
    max_driver_edges: int = 4_000_000,
):
    """Near-dup cluster assignment for **every** document: cluster_id =
    the minimum doc_id of the document's connected component in the
    ``ngram_jaccard_pairs`` graph (singletons are their own cluster);
    ``is_survivor`` marks the one kept doc per cluster. This is the
    operator a 100 TB dedup pass actually ends with — pairs alone don't
    tell you what to drop when near-dup relations chain (A~B, B~C but
    not A~C must still collapse to one survivor).

    Distributed end-to-end: pairs stream out of the blocked Jaccard op,
    components are labeled by bucket-shuffled min-label propagation
    (:func:`_cc_labels` — no driver-side graph), and the full-corpus
    assignment is one more ``groupby(doc_id)`` Min over
    ``union(docs as (doc_id, doc_id), labels)`` — no join, no broadcast
    of the label table. SQL-oracle-able via a recursive CTE."""
    return _assign_clusters(
        sf_dir,
        _cc_labels(
            _symmetric_edges(ngram_jaccard_pairs(sf_dir, threshold)),
            max_rounds=max_rounds,
            max_driver_edges=max_driver_edges,
        ),
    )


def minhash_clusters(
    sf_dir: str,
    threshold: float = 0.8,
    max_rounds: int = 16,
    max_driver_edges: int = 4_000_000,
):
    """:func:`dedup_clusters` over the **MinHash-LSH** pair graph — the
    scale-realistic fuzzy-dedup end-to-end (banding prunes candidates
    sub-quadratically, so this composition is what a 100 TB pass runs;
    the ngram variant is the exact-oracle twin). Approximate only in
    pair recall; the CC labeling and assignment are exact over whatever
    pairs banding found, so every cluster is a union of true near-dup
    links (every emitted pair score is exact). Rows-only for the
    driver; pinned in tests by sequential union-find equivalence over
    the same pair set. NOTE: MinHash bands corpus-wide while the ngram
    op blocks by (lang, source), so MinHash clusters can legitimately
    merge cross-source duplicates the blocked op never compares — the
    two ops' clusters are not a refinement pair."""
    return _assign_clusters(
        sf_dir,
        _cc_labels(
            # _symmetric_edges projects doc_a/doc_b itself; no strip stage
            _symmetric_edges(minhash_lsh_pairs(sf_dir, threshold)),
            max_rounds=max_rounds,
            max_driver_edges=max_driver_edges,
        ),
    )


def _assign_clusters(sf_dir: str, labels):
    """(node, val=label) Dataset (or None) → full-corpus
    (doc_id, cluster_id, is_survivor) via one union + groupby Min —
    no join, no broadcast of the label table."""
    from ray.data.aggregate import Min

    def self_labeled(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "cluster": t["doc_id"]})

    assigned = _docs(sf_dir, ["doc_id"]).map_batches(
        self_labeled, batch_format="pyarrow"
    )
    if labels is not None:
        assigned = assigned.union(
            labels.map_batches(
                lambda t: pa.table({"doc_id": t["node"], "cluster": t["val"]}),
                batch_format="pyarrow",
            )
        )

    def finish(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "is_survivor", pa.array((ids == cl).astype(np.int64))
        )

    return (
        assigned.groupby("doc_id")
        .aggregate(Min("cluster", alias_name="cluster_id"))
        .map_batches(finish, batch_format="pyarrow")
    )


def novel_docs(sf_dir: str, ref_source: str = "src0", num_buckets: int = 64):
    """Incremental-ingestion dedup: documents *outside* ``ref_source``
    whose exact text does not already exist in ``ref_source`` — the
    "which of today's crawl is actually new" pass that precedes
    appending to a 100 TB corpus.

    One hash-bucket shuffle over fingerprints: the reference side is
    combined per batch to one tiny flag row per (fp, batch) — its
    payload never shuffles — while candidate rows carry their payload
    through. Each bucket group drops candidates whose fp has any
    reference flag, all keys of the bucket in one vectorized ``isin``
    pass. The broadcast-set alternative (ship all reference fps via
    ``ray.put``) only works while the reference fits one node's heap;
    this path has no such cap."""

    def prep(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        df = pd.DataFrame(
            {
                "fp_md5": fps,
                "is_ref": np.array([s == ref_source for s in src], bool),
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "lang": batch["lang"].to_pylist(),
                "source": src,
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        ref = df[df["is_ref"]].drop_duplicates("fp_md5")  # batch combiner
        out = pd.concat([ref, df[~df["is_ref"]]], ignore_index=True)
        bkt = np.array(
            [int(fp[:8], 16) % num_buckets for fp in out["fp_md5"]], np.int64
        )
        return from_pandas_typed(
            out.assign(bkt=bkt), ("fp_md5", "lang", "source")
        )

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("novel_docs(bucket)", None, len(group))
        taken = group.loc[group["is_ref"], "fp_md5"]
        keep = group[~group["is_ref"] & ~group["fp_md5"].isin(set(taken))]
        # typed output: a fully-deduped bucket filters to zero rows, and
        # untyped object lang/source would degrade to arrow null there
        return from_pandas_typed(
            keep[["doc_id", "lang", "source", "n_chars"]].astype(
                {"doc_id": np.int64, "n_chars": np.int64}
            ),
            ("lang", "source"),
        )

    return (
        _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(filter_bucket, batch_format="pandas")
    )


def paragraph_dedup(sf_dir: str, num_buckets: int = 64):
    """C4-style paragraph-level exact dedup: split every document on
    newlines, keep each distinct (non-blank) paragraph only at its
    globally first occurrence (min (doc_id, position)), and reassemble
    the surviving paragraphs per document in original order.

    Two bounded shuffles, combiner-shaped throughout:

    1. paragraph survivor election — explode to (para, doc_id, pos)
       with (doc_id, pos) packed into one int64 so "first occurrence"
       is a plain Min; each batch pre-reduces to one row per distinct
       paragraph (a paragraph duplicated millions of times ships one
       row per batch, not per occurrence), then ``groupby(hash(para) %
       num_buckets)`` elects the min inside the bucket. Paragraph text
       rides the shuffle exactly once per (batch, distinct para).
    2. document reassembly — survivors (side 'k') union per-doc
       paragraph counts (side 'c', one row per doc including zero-para
       docs) → ``groupby(doc_id % num_buckets)`` → in-group ordered
       join back to (doc_id, n_paras, n_kept, text_kept).

    Skew note: the hottest possible paragraph costs one row per source
    batch in its bucket; the hottest document is bounded by its own
    paragraph count — no group ever holds a corpus-sized set."""
    import ray.data

    _POS_BITS = 20  # pos < 1M paragraphs per doc; doc_id < 2^43
    _WS = " \t\r\n\x0b\x0c"  # explicit ASCII whitespace: matches the
    # oracle's trim(para, <same chars>) exactly (Python's default strip
    # also eats unicode spaces, which SQL trim would not)

    def elect_partial(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        paras, packed = [], []
        for d, text in zip(doc_ids, batch["text"].to_pylist()):
            if not 0 <= d < (1 << 43):
                # a raise, not an assert: the sibling pos guard below
                # survives python -O and this one must too
                raise ValueError(
                    f"doc_id {d} overflows the packed (doc_id, pos) key"
                )
            base = int(d) << _POS_BITS
            lines = text.split("\n")
            if len(lines) >= (1 << _POS_BITS):
                raise ValueError(
                    f"doc {d} has {len(lines)} lines — pos overflows the "
                    f"packed (doc_id, pos) key ({_POS_BITS} bits)"
                )
            for pos, p in enumerate(lines):
                # blank test strips the explicit ASCII whitespace set so
                # the SQL oracle (trim over the same chars) agrees on
                # tab/CR-only lines
                if p.strip(_WS):
                    paras.append(p)
                    packed.append(base | pos)
        if not paras:  # typed empty (from_pandas infers null for empty object)
            return pa.table(
                {
                    "para": pa.array([], pa.string()),
                    "packed": pa.array([], pa.int64()),
                    "bkt": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame({"para": paras, "packed": np.array(packed, np.int64)})
        g = df.groupby("para", as_index=False)["packed"].min()  # combiner
        bkt = np.array(
            [
                int.from_bytes(hashlib.md5(p.encode()).digest()[:4], "big")
                % num_buckets
                for p in g["para"]
            ],
            np.int64,
        )
        return from_pandas_typed(g.assign(bkt=bkt), ("para",))

    def elect(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("paragraph_dedup(bucket)", None, len(group))
        g = group.groupby("para", as_index=False)["packed"].min()
        return pa.table(
            {
                "doc_id": pa.array(
                    (g["packed"].to_numpy() >> _POS_BITS).astype(np.int64)
                ),
                "pos": pa.array(
                    (g["packed"].to_numpy() & ((1 << _POS_BITS) - 1)).astype(
                        np.int64
                    )
                ),
                "para": pa.array(g["para"], pa.string()),
            }
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = np.array(
            [
                sum(1 for p in t.split("\n") if p.strip(_WS))
                for t in batch["text"].to_pylist()
            ],
            np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids.astype(np.int64)),
                "pos": pa.array(np.zeros(len(n), np.int64)),
                "para": pa.array([""] * len(n), pa.string()),
                "n_paras": pa.array(n),
                "side": pa.array(["c"] * len(n), pa.string()),
            }
        )

    def tag_survivor(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_paras", pa.array(np.zeros(len(batch), np.int64))
        ).append_column("side", pa.array(["k"] * len(batch), pa.string()))

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dbkt", pa.array((d % num_buckets).astype(np.int64))
        )

    def reassemble(group: pd.DataFrame) -> pd.DataFrame:
        counts = (
            group[group["side"] == "c"]
            .groupby("doc_id")["n_paras"]
            .sum()
            .astype(np.int64)
        )
        kept = group[group["side"] == "k"].sort_values(
            ["doc_id", "pos"], kind="stable"
        )
        txt = kept.groupby("doc_id")["para"].agg("\n".join)
        n_kept = kept.groupby("doc_id")["para"].size().astype(np.int64)
        out = pd.DataFrame({"n_paras": counts})
        out["n_kept"] = n_kept.reindex(counts.index, fill_value=0).astype(
            np.int64
        )
        out["text_kept"] = txt.reindex(counts.index, fill_value="")
        return out.reset_index().rename(columns={"index": "doc_id"})

    survivors = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(elect_partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(elect, batch_format="pandas")
        .map_batches(tag_survivor, batch_format="pyarrow")
    )
    counts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_partial, batch_format="pyarrow"
    )
    return (
        survivors.union(counts)
        .map_batches(add_doc_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("dbkt")
        .map_groups(reassemble, batch_format="pandas")
    )


def train_test_containment(
    sf_dir: str, eval_source: str = "src0", threshold: float = 0.8
):
    """Benchmark-decontamination check: for every *eval* document (the
    ``eval_source`` rows — the benchmark set), the maximum token-set
    containment ``|A∩B| / |A|`` over all *train* documents B, plus the
    count of train docs at-or-over the threshold. Containment (not
    Jaccard) is the decontamination score: a benchmark question fully
    quoted inside a long web page has low Jaccard but containment 1.0.

    Scale shape: the eval side is small by assumption (benchmarks are
    thousands of rows, the corpus is the 100 TB side), so it broadcasts
    as an **inverted token index** (sorted unique token hashes →
    postings of eval-doc slots); the train side streams through one
    ``map_batches`` where each doc's unique token hashes resolve to
    per-eval-doc intersection counts via one searchsorted + one
    bincount over gathered postings — no pairwise loop over eval docs,
    no shuffle over train rows. Per-batch partials (running max + hit
    count per eval doc, only nonzero rows emitted) reduce in a final
    Max/Sum aggregate over the tiny eval keyspace."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    import pyarrow.parquet as pq

    # eval side: filter pushdown — only the benchmark rows leave storage
    ev = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("source", "=", eval_source)],
    )
    ev_ids = np.asarray(ev["doc_id"], dtype=np.int64)
    tok_sets = []
    for text in ev["text"].to_pylist():
        toks = _TOKEN_RE.findall(text.lower())
        th = np.array([_token_hash(t) for t in toks], dtype=np.uint64)
        tok_sets.append(np.unique(th))
    sizes = np.array([len(s) for s in tok_sets], dtype=np.int64)
    # inverted index: token -> eval-doc slots holding it
    all_tok = np.concatenate(tok_sets) if tok_sets else np.array([], np.uint64)
    all_doc = np.repeat(np.arange(len(tok_sets), dtype=np.int32), sizes)
    order = np.argsort(all_tok, kind="stable")
    tok_sorted = all_tok[order]
    post_sorted = all_doc[order]
    uniq_tok, starts = np.unique(tok_sorted, return_index=True)
    offsets = np.append(starts, len(tok_sorted)).astype(np.int64)
    index_ref = ray.put((uniq_tok, offsets, post_sorted, sizes, ev_ids))

    def scan_partial(batch: pa.Table) -> pa.Table:
        from chug_ray.ops.relational import _bcast

        toks_u, offs, posts, sz, ids = _bcast(index_ref)
        n_ev = len(ids)
        maxc = np.zeros(n_ev, np.float64)
        hits = np.zeros(n_ev, np.int64)
        for text in batch["text"].to_pylist():
            th = np.unique(_hashed_tokens(text))
            if not len(th) or not len(toks_u):
                continue
            pos = np.searchsorted(toks_u, th)
            valid = pos < len(toks_u)
            pos, th_v = pos[valid], th[valid]
            pos = pos[toks_u[pos] == th_v]
            if not len(pos):
                continue
            # vectorized multi-slice gather of the matched postings
            s, e = offs[pos], offs[pos + 1]
            lens = e - s
            flat = np.repeat(s - np.concatenate(([0], np.cumsum(lens)[:-1])),
                             lens) + np.arange(lens.sum())
            counts = np.bincount(posts[flat], minlength=n_ev)
            cont = np.where(sz > 0, counts / np.maximum(sz, 1), 0.0)
            maxc = np.maximum(maxc, cont)
            hits += cont >= threshold
        nz = np.nonzero((maxc > 0) | (hits > 0))[0]
        return pa.table(
            {
                "doc_id": pa.array(ids[nz]),
                "max_containment": pa.array(maxc[nz], pa.float64()),
                "n_hits": pa.array(hits[nz], pa.int64()),
            }
        )

    zero = pa.table(
        {
            "doc_id": pa.array(ev_ids),
            "max_containment": pa.array(np.zeros(len(ev_ids)), pa.float64()),
            "n_hits": pa.array(np.zeros(len(ev_ids), np.int64)),
        }
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cont = batch["max_containment"].to_numpy(zero_copy_only=False)
        e4 = np.floor(cont * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "max_containment_e4": pa.array(e4),
                "n_hits": pc.cast(batch["n_hits"], pa.int64()),
            }
        )

    def train_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.not_equal(batch["source"], pa.scalar(eval_source))
        )

    train = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    ).map_batches(train_only, batch_format="pyarrow")
    return (
        train.map_batches(scan_partial, batch_format="pyarrow")
        .union(ray.data.from_arrow(zero))
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("doc_id")
        .aggregate(
            Max("max_containment", alias_name="max_containment"),
            Sum("n_hits", alias_name="n_hits"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def substring_dedup(sf_dir: str, k: int = 5, num_buckets: int = 64):
    """Exact substring-level dedup at k-token-window granularity — the
    ExactSubstr family (Lee et al., "Deduplicating Training Data Makes
    Language Models Better") re-expressed shuffle-native: instead of a
    monolithic suffix array, every k-token window hashes to a 128-bit
    key and the *globally first* occurrence of each window wins; every
    other occurrence marks its k token positions for removal, and each
    document is reassembled from its surviving tokens.

    Reference anchor: the reference engine has no substring dedup; the
    packed-Min election machinery mirrors :func:`paragraph_dedup`
    (chug_ray/ops/dedup.py) one level finer.

    Scale shape (two bounded shuffles, loser-split combiner):

    1. window election — each batch tokenizes its docs, hashes every
       k-gram with TWO independent 64-bit polynomial hashes over cached
       blake2b-64 token hashes (vectorized sliding windows — no
       per-window Python; ≈128-bit combined key space keeps distinct-
       gram collisions ≈ (n²/2)·2⁻¹²⁸ ≈ 0 at 100 TB; the key never
       leaves the engine, so the SQL oracle matches by gram identity,
       not key value), and *locally resolves intra-batch duplicates*
       via one lexsort: for a gram seen twice in one batch, only the
       min-packed occurrence enters the gram shuffle (side 's'); the
       rest are already-proven duplicates and short-circuit to the doc
       shuffle as (doc_id, pos) loser rows (side 'd'). The hottest
       possible gram therefore costs one shuffle row per batch, not per
       occurrence — same skew bound as paragraph_dedup's combiner.
    2. global election — ``groupby(g1 % num_buckets)`` groups
       the batch-minima; within a gram, every row except the global min
       decodes its packed (doc_id, pos) and joins the loser stream.
    3. reassembly — losers ∪ (doc_id, text) rows, bucketed by
       ``doc_id % num_buckets``; each doc re-tokenizes once, masks the
       union of [pos, pos+k) over its loser windows, and emits the
       surviving tokens. Group size is bounded by docs-per-bucket ×
       (text + its own loser rows) — no corpus-sized group.

    Output: (doc_id, n_tokens, n_windows, n_dup_windows, n_kept,
    text_kept) — integer-exact, hash-comparable against the DuckDB
    window/LATERAL oracle at the same fixed k."""
    import ray.data

    _POS_BITS = 20  # pos < 1M windows per doc; doc_id < 2^43

    # two independent polynomial hashes (vectorized): multiplier powers
    # A^(k-1-j), B^(k-1-j) mod 2^64; the second runs over splitmix64-mixed
    # token hashes so the pair behaves as a ~128-bit gram key
    _A, _B = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    _MULT_A = np.array(
        [pow(_A, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64
    )
    _MULT_B = np.array(
        [pow(_B, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64
    )

    def _mix64(x: np.ndarray) -> np.ndarray:
        # splitmix64 finalizer, vectorized uint64
        with np.errstate(over="ignore"):
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))

    def _win_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        swv = np.lib.stride_tricks.sliding_window_view
        # one pass: tokenize per doc (inherent), then everything batch-level
        all_toks: list[str] = []
        lens_l, dids_l = [], []
        for d, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            toks = _TOKEN_RE.findall(text.lower())
            all_toks.extend(toks)
            lens_l.append(len(toks))
            dids_l.append(int(d))
        lens = np.array(lens_l, np.int64)
        dids = np.array(dids_l, np.int64)
        if len(dids):
            if dids.min() < 0 or dids.max() >= (1 << 43):
                # a raise, not an assert: must survive python -O like
                # the sibling pos guard below
                raise ValueError(
                    "doc_id overflows the packed (doc_id, pos) key"
                )
            if int((lens - k + 1).max()) >= (1 << _POS_BITS):
                bad = dids[np.argmax(lens)]
                raise ValueError(
                    f"doc {bad} has {int(lens.max())} tokens — window pos "
                    f"overflows the packed (doc_id, pos) key ({_POS_BITS} bits)"
                )
        th_all = np.empty(len(all_toks), np.uint64)
        if all_toks:
            # hash only DISTINCT tokens (cached per process); factorize is
            # the vectorized token→code map
            codes, uniques = pd.factorize(np.array(all_toks, dtype=object))
            uh = np.array(
                [_SKETCH_CACHE.setdefault(t, _token_hash(t)) for t in uniques],
                dtype=np.uint64,
            )
            th_all = uh[codes]
        if len(th_all) >= k:
            with np.errstate(over="ignore"):
                g1_all = (swv(th_all, k) * _MULT_A[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                g2_all = (swv(_mix64(th_all), k) * _MULT_B[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
            # keep only windows that don't cross a doc boundary
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            npos = np.maximum(lens - k + 1, 0)
            wpos = np.arange(int(npos.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(npos)[:-1]]), npos
            )
            widx = np.repeat(starts, npos) + wpos
            g1, g2 = g1_all[widx], g2_all[widx]
            packed = (np.repeat(dids, npos) << _POS_BITS) + wpos
        else:
            g1 = np.empty(0, np.uint64)
            g2 = np.empty(0, np.uint64)
            packed = np.empty(0, np.int64)
        # intra-batch election in one lexsort: first (g1, g2) occurrence
        # by packed order wins side 's'; the rest short-circuit as 'd'
        order = np.lexsort((packed, g2, g1))
        g1, g2, packed = g1[order], g2[order], packed[order]
        win = np.ones(len(g1), bool)
        if len(g1):
            win[1:] = (g1[1:] != g1[:-1]) | (g2[1:] != g2[:-1])
        lose = ~win
        n_w, n_l = int(win.sum()), int(lose.sum())
        side = ["s"] * n_w + ["d"] * n_l
        return pa.table(
            {
                "side": pa.array(side, pa.string()),
                "g1": pa.array(
                    np.concatenate(
                        [g1[win].view(np.int64), np.zeros(n_l, np.int64)]
                    )
                ),
                "g2": pa.array(
                    np.concatenate(
                        [g2[win].view(np.int64), np.zeros(n_l, np.int64)]
                    )
                ),
                "packed": pa.array(
                    np.concatenate([packed[win], np.zeros(n_l, np.int64)])
                ),
                "bkt": pa.array(
                    np.concatenate(
                        [
                            (g1[win] % np.uint64(num_buckets)).astype(np.int64),
                            np.full(n_l, -1, np.int64),
                        ]
                    )
                ),
                "doc_id": pa.array(
                    np.concatenate(
                        [np.zeros(n_w, np.int64), packed[lose] >> _POS_BITS]
                    )
                ),
                "pos": pa.array(
                    np.concatenate(
                        [
                            np.zeros(n_w, np.int64),
                            packed[lose] & np.int64((1 << _POS_BITS) - 1),
                        ]
                    )
                ),
            }
        )

    def _take_side(want: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch["side"], pa.scalar(want)))

        return fn

    def _elect(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("substring_dedup(bucket)", None, len(group))
        g1 = group["g1"].to_numpy(np.int64)
        g2 = group["g2"].to_numpy(np.int64)
        packed = group["packed"].to_numpy(np.int64)
        order = np.lexsort((packed, g2, g1))
        g1, g2, packed = g1[order], g2[order], packed[order]
        lose = np.zeros(len(g1), bool)
        if len(g1):
            lose[1:] = (g1[1:] == g1[:-1]) & (g2[1:] == g2[:-1])
        losers = packed[lose]
        return pa.table(
            {
                "doc_id": pa.array(losers >> _POS_BITS),
                "pos": pa.array(losers & np.int64((1 << _POS_BITS) - 1)),
            }
        )

    def _doc_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "pos": pa.array(np.full(len(d), -1, np.int64)),
                "text": batch["text"],
                "side": pa.array(["t"] * len(d), pa.string()),
            }
        )

    def _tag_loser(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pos": batch["pos"],
                "text": pa.array([""] * len(batch), pa.string()),
                "side": pa.array(["d"] * len(batch), pa.string()),
            }
        )

    def _add_doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dbkt", pa.array((d % num_buckets).astype(np.int64))
        )

    def _reassemble(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("substring_dedup(doc)", None, len(group))
        texts = group[group["side"] == "t"]
        dup_pos = group[group["side"] == "d"].groupby("doc_id")["pos"]
        dups = {d: p.to_numpy(np.int64) for d, p in dup_pos}
        out_id, out_nt, out_nw, out_nd, out_nk, out_txt = (
            [], [], [], [], [], []
        )
        for d, text in zip(
            texts["doc_id"].to_numpy(np.int64), texts["text"]
        ):
            toks = _TOKEN_RE.findall(text.lower())
            n = len(toks)
            pos = dups.get(d, np.empty(0, np.int64))
            covered = np.zeros(n, bool)
            for p in pos:
                covered[p : p + k] = True
            kept = [t for t, c in zip(toks, covered) if not c]
            out_id.append(int(d))
            out_nt.append(n)
            out_nw.append(max(n - k + 1, 0))
            out_nd.append(len(pos))
            out_nk.append(len(kept))
            out_txt.append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_tokens": pa.array(out_nt, pa.int64()),
                "n_windows": pa.array(out_nw, pa.int64()),
                "n_dup_windows": pa.array(out_nd, pa.int64()),
                "n_kept": pa.array(out_nk, pa.int64()),
                "text_kept": pa.array(out_txt, pa.string()),
            }
        )

    partials = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_win_partial, batch_format="pyarrow")
        .materialize()  # split point: both sides read it without recompute
    )
    global_losers = (
        partials.map_batches(_take_side("s"), batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(_elect, batch_format="pandas")
    )
    local_losers = partials.map_batches(
        _take_side("d"), batch_format="pyarrow"
    ).map_batches(
        lambda b: b.select(["doc_id", "pos"]), batch_format="pyarrow"
    )
    losers = local_losers.union(global_losers).map_batches(
        _tag_loser, batch_format="pyarrow"
    )
    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _doc_rows, batch_format="pyarrow"
    )
    return (
        losers.union(docs)
        .map_batches(_add_doc_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("dbkt")
        .map_groups(_reassemble, batch_format="pandas")
    )


def semdedup(
    sf_dir: str,
    threshold: float = 0.35,
    tile: int = 4096,
    max_group_rows: int = 20_000,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding space with k-means, then
    deduplicate WITHIN each cluster by cosine similarity — the
    cluster-then-dedup trick that makes embedding dedup sub-quadratic
    at corpus scale without a global pair join.

    Composition of existing verified machinery: centroids from
    :func:`chug_ray.ops.knn._train_centroids` (deterministic
    distributed sample, session-cached), one assignment matmul per
    batch, then per-cluster groups run the exact tiled strip scan
    (:func:`_cos_strip_pairs`) with the random-hyperplane banded
    fallback above ``max_group_rows`` — the same skew guard as
    :func:`embedding_near_dup`. Duplicate groups are connected
    components of the >threshold graph; the minimum vec_id survives as
    each group's representative.

    Output: every vector with (cluster, rep_id, keep) — keep=1 iff the
    row IS its component's representative; rep_id gives dedup lineage.
    no_oracle (clusters come from iterative k-means); pinned by
    determinism-under-repartitioning, planted-duplicate recall, and
    survivor-coverage tests.

    Partitioning assumption (documented per the custom-operator rule):
    each k-means cluster materializes as ONE map_groups group, so the
    centroid count must scale with the corpus (k ≈ n / target cluster
    size, as in the SemDeDup paper's 11k clusters; the trainer's k is a
    sample-size knob). Group sizes are recorded via
    ``record_group('semdedup(cluster)', ...)`` so an oversized cluster
    is visible in telemetry, and the >``max_group_rows`` banded path
    keeps the pair step near-linear even then."""
    import ray

    from chug_ray.ops.knn import (
        _read_embeddings,
        _train_centroids,
        _unit_rows,
    )

    cents = _train_centroids(sf_dir)
    cent_ref = ray.put(cents)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.ops.relational import _bcast

        c = _bcast(cent_ref)  # per-process cache, not a per-batch fetch
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        if c.shape[1] != mat.shape[1]:  # degenerate training: one cluster
            cluster = np.zeros(len(mat), np.int64)
        else:
            cluster = np.argmax(_unit_rows(mat) @ c.T, axis=1).astype(
                np.int64
            )
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "embedding": batch["embedding"],
                "cluster": cluster,
            }
        )

    def dedup_group(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        g = group.sort_values("vec_id")
        record_group(
            "semdedup(cluster)",
            str(int(g["cluster"].iloc[0])) if len(g) else None,
            len(g),
        )
        ids = g["vec_id"].to_numpy(np.int64)
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        unit = _unit_rows(mat)
        if len(ids) <= max_group_rows:
            va, vb, _ = _cos_strip_pairs(ids, unit, threshold, tile)
        else:
            va, vb, _ = _banded_cos_pairs(ids, unit, threshold, tile)
        rep_np = ids.copy()  # copy: a view would alias the keep compare
        if len(va):
            nodes, labels = _union_find_labels(va, vb)
            # ids is sorted (g sorted by vec_id): scatter component
            # minima onto the member positions
            rep_np[np.searchsorted(ids, nodes)] = labels
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(np.int64),
                "rep_id": rep_np,
                "keep": (rep_np == ids).astype(np.int64),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(assign, batch_format="pandas", batch_size=4096)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("cluster")
        .map_groups(dedup_group, batch_format="pandas")
    )


def fuzzy_name_pairs(sf_dir: str):
    """Edit-distance-1 fuzzy self-join over the part-name DICTIONARY —
    the typo-pair detector (FastSS / deletion-neighborhood blocking:
    two strings are at Levenshtein distance ≤1 iff they share a member
    of their deletion neighborhoods; Bocek et al. 2007, public
    algorithm). Output: each unordered pair of DISTINCT names at
    distance exactly 1, with both names' row multiplicities.

    Scale shape — dictionary-level, never row-level:

    1. ``groupby(p_name)`` collapses the fact table to the distinct-
       name dictionary (vocabulary-bounded) with counts;
    2. each name emits its identity plus one deletion variant per
       character position; a ``groupby(variant)`` co-locates exactly
       the candidate pairs (substitution pairs meet at the shared
       deletion, insert/delete pairs meet at identity-vs-deletion) —
       no all-pairs comparison, and group sizes are telemetry-recorded;
    3. in-group verification runs a two-pointer distance-1 check (no
       DP), and a final pair-key groupby dedups pairs that met in more
       than one bucket (duplicated-character insertions).

    Quadratic-blowup guard by construction: identical names are ONE
    dictionary row, so equal-name row groups never pairwise-explode —
    multiplicities ride along as counts instead."""
    import ray.data
    from ray.data.aggregate import Count

    from chug_ray.telemetry import record_group
    from chug_ray.util import stable_hash64

    names = (
        ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
        .groupby("p_name")
        .aggregate(Count(alias_name="n"))
        .materialize()  # dictionary: reused as the variant emitter input
    )

    def variants(batch: pa.Table) -> pa.Table:
        out_v, out_name, out_n = [], [], []
        ns = batch["n"].to_numpy(zero_copy_only=False)
        for name, n in zip(batch["p_name"].to_pylist(), ns):
            n = int(n)
            out_v.append(stable_hash64("fuzzy", name))
            out_name.append(name)
            out_n.append(n)
            for i in range(len(name)):
                out_v.append(
                    stable_hash64("fuzzy", name[:i] + name[i + 1:])
                )
                out_name.append(name)
                out_n.append(n)
        return pa.table(
            {
                # stable_hash64 yields unsigned 64-bit values; reinterpret
                # as signed for the int64 shuffle key
                "vkey": pa.array(
                    np.array(out_v, np.uint64).view(np.int64)
                ),
                "name": pa.array(out_name, pa.string()),
                "n": pa.array(np.array(out_n, np.int64)),
            }
        )

    def _dist1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        if lb - la != 1:
            return False
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # a bucket holds each (name, n) once per emitting variant; the
        # same name can appear twice only via hash collision — drop dups
        group = group.drop_duplicates("name")
        record_group("fuzzy_name_pairs", int(group["vkey"].iloc[0]), len(group))
        rows_a, rows_b, na, nb = [], [], [], []
        names_ = group["name"].tolist()
        ns = group["n"].tolist()
        for i in range(len(names_)):
            for j in range(i + 1, len(names_)):
                a, b = names_[i], names_[j]
                if abs(len(a) - len(b)) > 1:
                    continue
                if not _dist1(a, b):
                    continue
                if b < a:
                    a, b = b, a
                    x, y = ns[j], ns[i]
                else:
                    x, y = ns[i], ns[j]
                rows_a.append(a)
                rows_b.append(b)
                na.append(int(x))
                nb.append(int(y))
        # typed empty-safe Arrow table: an empty pandas object column
        # would infer a null type and fail downstream schema unification
        return pa.table(
            {
                "name_a": pa.array(rows_a, pa.string()),
                "name_b": pa.array(rows_b, pa.string()),
                "n_a": pa.array(np.array(na, np.int64)),
                "n_b": pa.array(np.array(nb, np.int64)),
            }
        )

    def dedup_pairs(group: pd.DataFrame) -> pa.Table:
        g = group.iloc[:1]
        return pa.table(
            {
                "name_a": pa.array(g["name_a"].tolist(), pa.string()),
                "name_b": pa.array(g["name_b"].tolist(), pa.string()),
                "n_a": pa.array(g["n_a"].to_numpy(np.int64)),
                "n_b": pa.array(g["n_b"].to_numpy(np.int64)),
            }
        )

    return (
        names.map_batches(variants, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("vkey")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()  # pinned before the pair-dedup shuffle
        .groupby(["name_a", "name_b"])
        .map_groups(dedup_pairs, batch_format="pandas")
    )
