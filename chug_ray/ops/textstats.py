"""Text-analysis operators over the ``documents`` table.

Large-scale training-data-pipeline ops: token counting, quality
scoring, language-ID heuristic, document fingerprinting. All per-batch
work is vectorized (``pyarrow.compute`` regex kernels — C, zero-copy);
every op streams (no driver-side materialization) and each has an
exact DuckDB SQL oracle in ``__ray_entry__`` using the same token
definition ``[a-z0-9]+`` over lowercased text (RE2 on both sides).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from chug_ray.util import from_pandas_typed, round_away
import pyarrow.compute as pc

TOKEN_RE = "[a-z0-9]+"

# Distinct-value-domain cap for the broadcast-cum-table window ops
# (chars_quantiles, percent_rank_in_lang). Their scale contract is
# "cardinality = distinct values, tiny next to row count"; this cap
# makes that assumption checked, not assumed: ~4M (value, count) rows
# ≈ 64 MB of driver/group memory. Past it, fail loudly — the fix is a
# coarser value domain (bucketize) or a sort-based rank, not a silent
# multi-GB driver table.
VALUE_DOMAIN_CAP = 4_000_000
PUNCT_RE = r"[.,;:!?]"

# language-ID stopword profiles; scores are whole-token match counts.
LANG_PROFILES = {
    "en": ("the", "and", "of"),
    "fr": ("le", "et", "les"),
    "de": ("der", "und", "das"),
    "es": ("el", "y", "los"),
}
LANG_ORDER = ("en", "fr", "de", "es")  # deterministic argmax tie-break


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=list(columns)
    )


def _count_re(arr: pa.ChunkedArray, pattern: str) -> pa.Array:
    return pc.count_substring_regex(arr, pattern)


def token_count(sf_dir: str):
    """(doc_id, n_tokens, n_chars) per document."""

    def fn(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.cast(_count_re(low, TOKEN_RE), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def quality_score(sf_dir: str):
    """Integer quality signals: token/punct/stopword counts + a simple
    keep/drop flag (the usual corpus-filter shape)."""

    def fn(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        n_tokens = pc.cast(_count_re(low, TOKEN_RE), pa.int64())
        n_punct = pc.cast(_count_re(batch["text"], PUNCT_RE), pa.int64())
        n_stop = pc.cast(_count_re(low, r"\b(the|and|of|a|to)\b"), pa.int64())
        keep = pc.cast(
            pc.and_(pc.greater_equal(n_tokens, 10), pc.greater(n_stop, 0)),
            pa.int32(),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "n_stopwords": n_stop,
                "keep": keep,
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def lang_id(sf_dir: str):
    """Stopword-profile language ID (n-gram-free heuristic): whole-token
    match counts per profile, deterministic argmax in LANG_ORDER."""

    def fn(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        scores = {}
        for lang, words in LANG_PROFILES.items():
            pat = r"\b(" + "|".join(words) + r")\b"
            scores[lang] = pc.cast(_count_re(low, pat), pa.int64())
        import numpy as np

        arrs = [scores[lang].to_numpy(zero_copy_only=False) for lang in LANG_ORDER]
        mat = np.stack(arrs, axis=1)
        pred_idx = np.argmax(mat, axis=1)  # first max wins = LANG_ORDER
        pred = np.array(LANG_ORDER, dtype=object)[pred_idx]
        cols = {"doc_id": batch["doc_id"]}
        for lang in LANG_ORDER:
            cols[f"score_{lang}"] = scores[lang]
        cols["pred_lang"] = pa.array(pred, pa.string())
        return pa.table(cols)

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def fingerprint(sf_dir: str):
    """(doc_id, fp_md5) content fingerprint (md5 of raw text)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "fp_md5": pa.array(fps, pa.string())}
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def top_k_tokens(sf_dir: str, k: int = 20):
    """Global top-k tokens by occurrence: per-batch Counter (combiner)
    → tiny ``groupby(token)`` over partials → sort+limit on the small
    result. The shuffle carries one row per (token, batch), never per
    occurrence."""
    from collections import Counter
    import re

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    token_re = re.compile(TOKEN_RE)

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(token_re.findall(text.lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n"] = batch["n"].astype(np.int64)
        return batch

    return (
        agg.map_batches(finalize, batch_format="pandas")
        .materialize()  # the sort also samples its lazy input: pin the
        # aggregate output so the token shuffle runs once (window.py NOTE)
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def simhash(sf_dir: str):
    """64-bit SimHash over whole-token hashes (near-dup sketch).

    Not SQL-expressible → rows-only driver check; determinism is pinned
    by unit tests instead.
    """
    import re

    import numpy as np

    token_re = re.compile(TOKEN_RE)
    bit_weights = 1 << np.arange(64, dtype=np.uint64)
    # per-worker-process token-hash cache (shared with the dedup family's
    # sketching — same blake2b-64 definition)
    from chug_ray.ops.dedup import _SKETCH_CACHE, _token_hash

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            toks = token_re.findall(text.lower())
            if not toks:
                out.append("0" * 16)
                continue
            hashes = np.array(
                [_SKETCH_CACHE.setdefault(t, _token_hash(t)) for t in toks],
                dtype=np.uint64,
            )
            bits = (hashes[:, None] & bit_weights[None, :]) != 0
            votes = bits.sum(axis=0) * 2 - len(toks)
            sig = int((votes > 0) @ bit_weights.astype(object))
            out.append(f"{sig:016x}")
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.string())}
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _lang_char_counts(sf_dir: str):
    """Aggregated (lang, n_chars, n) value counts as a Dataset — the
    shared per-(lang, length) combiner behind chars_quantiles,
    percent_rank_in_lang, mad_outliers and winsorized_stats: per-batch
    pandas groupby partials (Arrow out, lang pinned) into ONE
    (lang, n_chars) Sum. One implementation so a combiner fix cannot
    silently skip a sibling op."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def value_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby(["lang", "n_chars"], as_index=False).agg(
            n=("n_chars", "size")
        )
        return from_pandas_typed(out, ("lang",))

    return (
        _docs(sf_dir, ("lang", "n_chars"))
        .map_batches(value_counts, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
    )


def chars_quantiles(sf_dir: str, ps=(25, 50, 75, 95, 99)):
    """Exact distributed quantiles of ``n_chars`` per lang.

    The full-sort a naive percentile needs is replaced by **value
    counting**: a per-batch (lang, n_chars) count combiner, a native
    Arrow-block Sum aggregate over the counts (cardinality = distinct
    values per lang, tiny next to row count), then one in-group cumsum
    walk picks each quantile. Matches DuckDB ``quantile_disc`` exactly
    (discrete quantile = sorted value at index ``ceil(p·n) − 1``)."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    counts = _lang_char_counts(sf_dir)

    def quantiles(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from chug_ray.telemetry import record_group

        record_group("chars_quantiles(lang)", group["lang"].iloc[0], len(group))
        if len(group) > VALUE_DOMAIN_CAP:
            raise ValueError(
                f"chars_quantiles: lang {group['lang'].iloc[0]!r} has "
                f"{len(group)} distinct n_chars values (> "
                f"{VALUE_DOMAIN_CAP}); the value-count rank shortcut "
                "assumes a small value domain — bucketize the values or "
                "use a sort-based quantile instead"
            )
        g = group.sort_values("n_chars")
        values = g["n_chars"].to_numpy()
        cum = g["n"].to_numpy().cumsum()
        total = int(cum[-1])
        rows = []
        for p in ps:
            idx = max(0, math.ceil(p / 100.0 * total) - 1)
            v = values[int(np.searchsorted(cum, idx + 1))]
            rows.append(
                {
                    "lang": g["lang"].iloc[0],
                    "p_pct": int(p),
                    "value": int(v),
                }
            )
        return pd.DataFrame(rows, columns=["lang", "p_pct", "value"])

    # counts is itself an aggregate output: pin it so the second
    # shuffle's sampling doesn't re-run the first
    return counts.materialize().groupby("lang").map_groups(
        quantiles, batch_format="pandas"
    )


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters): duplicate-token
    fraction, most-frequent-token fraction, and most-frequent-bigram
    fraction — the standard drop rules for boilerplate/spam pages in a
    web-scale corpus. Fractions are emitted as integer 1e-4 units
    (round-half-away) so hashes match the SQL oracle exactly.

    Per-doc token multisets are inherent (like the sketch/fingerprint
    kernels); within a doc everything is numpy — tokens are
    integer-coded with ``np.unique(return_inverse)`` and bigram counts
    come from coding the adjacent-pair ids, never string concatenation."""
    import re

    import numpy as np

    tok_re = re.compile(TOKEN_RE)

    def _e4(x: float) -> int:
        return int(np.floor(x * 1e4 + 0.5))  # x >= 0 always here

    def fn(batch: pa.Table) -> pa.Table:
        n_tok = np.empty(batch.num_rows, np.int64)
        n_uni = np.empty(batch.num_rows, np.int64)
        dup_e4 = np.empty(batch.num_rows, np.int64)
        top_e4 = np.empty(batch.num_rows, np.int64)
        big_e4 = np.empty(batch.num_rows, np.int64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = tok_re.findall(text.lower())
            n = len(toks)
            n_tok[i] = n
            if n == 0:
                n_uni[i] = dup_e4[i] = top_e4[i] = big_e4[i] = 0
                continue
            uniq, inv, counts = np.unique(
                np.asarray(toks, dtype=object),
                return_inverse=True,
                return_counts=True,
            )
            u = len(uniq)
            n_uni[i] = u
            dup_e4[i] = _e4(1.0 - u / n)
            top_e4[i] = _e4(counts.max() / n)
            if n >= 2:
                pair = inv[:-1].astype(np.int64) * u + inv[1:]
                big_e4[i] = _e4(
                    np.unique(pair, return_counts=True)[1].max() / (n - 1)
                )
            else:
                big_e4[i] = 0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_unique": pa.array(n_uni),
                "dup_token_frac_e4": pa.array(dup_e4),
                "top_token_frac_e4": pa.array(top_e4),
                "top_bigram_frac_e4": pa.array(big_e4),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def clean_text(sf_dir: str):
    """Whitespace normalization — the standard pre-tokenization cleanup
    for crawled text: collapse every whitespace run (tabs, newlines,
    repeated spaces) to one space and trim the ends. Pure
    ``pyarrow.compute`` RE2 kernels (same regex engine as the DuckDB
    oracle), zero-copy in, vectorized, streams.

    Trim is space-only (``utf8_trim(characters=" ")``), matching SQL
    ``trim()``: RE2 ``\\s`` is ASCII in both engines, so a U+2028/2029
    separator at a string edge survives the replace in BOTH — Arrow's
    ``utf8_trim_whitespace`` would strip it (Unicode White_Space) and
    silently diverge from the oracle on such crawled text."""

    def fn(batch: pa.Table) -> pa.Table:
        cleaned = pc.utf8_trim(
            pc.replace_substring_regex(batch["text"], r"\s+", " "),
            characters=" ",
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": cleaned,
                "n_clean_chars": pc.cast(pc.utf8_length(cleaned), pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def approx_distinct_tokens(sf_dir: str, p: int = 12):
    """HyperLogLog distinct-token estimate per language (Flajolet et
    al. 2007) — the sketch that replaces an exact-distinct shuffle at
    100 TB: the ``groupby(lang)`` carries ONE ``2^p``-byte register
    array per (lang, batch) no matter how many tokens flow through.

    Per batch: blake2b-64 token hashes (shared per-process cache with
    the dedup family) split into a ``p``-bit register index and the
    rank of the remaining bits' leading one; ``np.maximum.at``
    scatter-max fills the batch's registers. Merge = elementwise max;
    estimate = harmonic-mean formula with the standard small-range
    linear-counting correction. Deterministic (hash-based, no RNG);
    standard error ≈ 1.04/√m ≈ 1.6% at p=12 — pinned against the exact
    distinct count in tests."""
    import re

    import numpy as np
    import pandas as pd

    from chug_ray.ops.dedup import _SKETCH_CACHE, _token_hash

    tok_re = re.compile(TOKEN_RE)
    m = 1 << p

    def batch_registers(batch: pa.Table) -> pa.Table:
        regs: dict[str, np.ndarray] = {}
        for lang, text in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = set(tok_re.findall(text.lower()))
            if not toks:
                continue
            h = np.array(
                [_SKETCH_CACHE.setdefault(t, _token_hash(t)) for t in toks],
                dtype=np.uint64,
            )
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            low = h & np.uint64((1 << (64 - p)) - 1)
            # bit length via frexp's exponent, NOT np.log2: low < 2^52
            # is exactly representable in float64 and frexp is exact,
            # while log2(2^b - 1) rounds UP to b within half an ulp of
            # a power of two, understating rho by 1 for those hashes
            _, exp = np.frexp(np.maximum(low, 1).astype(np.float64))
            rho = np.where(low == 0, 64 - p + 1, (64 - p) - (exp - 1)).astype(
                np.uint8
            )
            reg = regs.setdefault(lang, np.zeros(m, np.uint8))
            np.maximum.at(reg, idx, rho)
        return pa.table(
            {
                "lang": pa.array(list(regs.keys()), pa.string()),
                "registers": pa.array(
                    [r.tolist() for r in regs.values()], pa.list_(pa.uint8())
                ),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        reg = np.maximum.reduce(
            np.stack([np.asarray(r, np.uint8) for r in group["registers"]])
        )
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
        zeros = int((reg == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting, small range
        return pd.DataFrame(
            {
                "lang": [group["lang"].iloc[0]],
                "est_distinct": np.array([round(est)], np.int64),
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "text", "lang"))
        .map_batches(batch_registers, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


def oov_rate(sf_dir: str, vocab_k: int = 1000):
    """Out-of-vocabulary rate per document — the integer-exact core of
    a CCNet-style LM quality filter: fraction of a doc's tokens not in
    the corpus's top-``vocab_k`` token vocabulary, as 1e-4 units.
    (A perplexity score would add float ``log`` whose last-ulp differs
    between engines; the OOV fraction keeps the whole filter
    order-independent integer math, hash-exact vs the SQL oracle.)

    Two-phase broadcast-stats shape: phase 1 reuses the top-k-tokens
    combiner (shuffle carries one row per (token, batch)) and pulls
    only the ``vocab_k`` vocabulary rows to the driver for one
    ``ray.put``; phase 2 scores every doc against the broadcast
    sorted-array vocab with a per-doc ``searchsorted`` membership test.
    Ties at the vocabulary boundary break (count desc, token asc) —
    pinned in both engines."""
    import re

    import numpy as np
    import ray

    tok_re = re.compile(TOKEN_RE)

    vocab = np.sort(
        np.array(
            [r["token"] for r in top_k_tokens(sf_dir, k=vocab_k).take_all()],
            dtype=object,
        )
    )
    vocab_ref = ray.put(vocab)

    def _e4(x: float) -> int:
        return int(np.floor(x * 1e4 + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        # per-PROCESS cache: the vocab is an object array of Python
        # strings that ray.get fully re-unpickles on every call
        v = _bcast_uni(vocab_ref)
        n_tok = np.empty(batch.num_rows, np.int64)
        n_oov = np.empty(batch.num_rows, np.int64)
        rate = np.empty(batch.num_rows, np.int64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = np.asarray(tok_re.findall(text.lower()), dtype=object)
            n = len(toks)
            n_tok[i] = n
            if n == 0:
                n_oov[i] = rate[i] = 0
                continue
            pos = np.searchsorted(v, toks)
            pos[pos >= len(v)] = len(v) - 1
            oov = int((v[pos] != toks).sum()) if len(v) else n
            n_oov[i] = oov
            rate[i] = _e4(oov / n)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_oov": pa.array(n_oov),
                "oov_rate_e4": pa.array(rate),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def cms_heavy_hitters(sf_dir: str, k: int = 20, w: int = 8192, d: int = 4):
    """Heavy-hitter tokens via a count-min sketch — the bounded-memory
    twin of :func:`top_k_tokens`: the exact op's shuffle carries one
    row per *distinct token* per batch (unbounded vocabulary), while
    the sketch's merge traffic is a fixed ``d×w`` counter grid per
    batch no matter the vocabulary. CMS is linear, so the distributed
    merge is a plain integer Sum over exploded (cell, count) rows; the
    merged grid (d·w ints — it's a sketch, constant size) comes to the
    driver once for point queries over the candidate set (per-batch
    local top tokens — a batch-local heavy hitter is how a global one
    always looks somewhere). Estimates only ever overestimate
    (est ≥ true ≤ est + εN); both bounds pinned in tests."""
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    tok_re = re.compile(TOKEN_RE)
    seeds = [0x9E37 + 131 * i for i in range(d)]

    def _hashes(tok: str) -> list[int]:
        import hashlib as _hl

        return [
            int.from_bytes(
                _hl.blake2b(
                    tok.encode(), digest_size=8, salt=str(s).encode()
                ).digest(),
                "little",
            )
            % w
            for s in seeds
        ]

    def sketch_batch(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(tok_re.findall(text.lower()))
        grid = np.zeros((d, w), np.int64)
        for tok, n in c.items():
            for row, col in enumerate(_hashes(tok)):
                grid[row, col] += n
        cells = np.nonzero(grid.ravel())[0]
        # the batch's local heavy hitters ride along on sentinel rows
        # (cell = -1): a global heavy hitter is a local one somewhere
        cand = [t for t, _ in c.most_common(4 * k)]
        return pa.table(
            {
                "cell": pa.array(
                    np.concatenate([cells, np.full(len(cand), -1)]), pa.int64()
                ),
                "count": pa.array(
                    np.concatenate(
                        [grid.ravel()[cells], np.zeros(len(cand), np.int64)]
                    ),
                    pa.int64(),
                ),
                "cand": pa.array([""] * len(cells) + cand, pa.string()),
            }
        )

    merged = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(sketch_batch, batch_format="pyarrow")
        .materialize()
    )

    def only_cells(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.greater_equal(t["cell"], 0)).select(
            ["cell", "count"]
        )

    def only_cands(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(_pc.less(t["cell"], 0)).select(["cand"])

    grid = np.zeros(d * w, np.int64)
    cells = (
        merged.map_batches(only_cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("count", alias_name="count"))
        .take_all()
    )
    for r in cells:
        grid[r["cell"]] = r["count"]
    grid = grid.reshape(d, w)
    cands = {
        r["cand"]
        for r in merged.map_batches(only_cands, batch_format="pyarrow").take_all()
    }
    rows = []
    for tok in cands:
        est = min(grid[row, col] for row, col in enumerate(_hashes(tok)))
        rows.append((tok, int(est)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pa.table(
        {
            "token": pa.array([t for t, _ in rows[:k]], pa.string()),
            "est_count": pa.array([n for _, n in rows[:k]], pa.int64()),
        }
    )


def percent_rank_in_lang(sf_dir: str):
    """Per-language ``PERCENT_RANK() OVER (PARTITION BY lang ORDER BY
    n_chars)`` — a rank window WITHOUT any per-group sort or whole-group
    shuffle: tie-aware rank is a pure function of the per-(lang, value)
    counts, so phase 1 reuses the value-count combiner (cardinality =
    distinct values, tiny next to rows), the driver builds per-lang
    exclusive-cumulative tables (bounded by distinct values — the same
    assumption chars_quantiles documents), and phase 2 streams the docs
    through one broadcast ``searchsorted`` map. No shuffle touches the
    fact table."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    agg = (
        _lang_char_counts(sf_dir)
        .materialize()
    )
    # guard the "domain is tiny" assumption BEFORE pulling it to the
    # driver: count() on the materialized aggregate is metadata-only
    n_domain = agg.count()
    from chug_ray.telemetry import record_group

    record_group("percent_rank_in_lang(domain)", None, n_domain)
    if n_domain > VALUE_DOMAIN_CAP:
        raise ValueError(
            f"percent_rank_in_lang: {n_domain} distinct (lang, n_chars) "
            f"pairs (> {VALUE_DOMAIN_CAP}); the broadcast rank table "
            "assumes a small value domain — bucketize the values or use "
            "a sort-based window instead"
        )
    rows = agg.take_all()
    tables: dict[str, tuple] = {}
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["n_chars"], r["n"]))
    for lang, vc in by_lang.items():
        vc.sort()
        values = np.array([v for v, _ in vc], np.int64)
        counts = np.array([c for _, c in vc], np.int64)
        cum_before = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tables[lang] = (values, cum_before, int(counts.sum()))
    tables_ref = ray.put(tables)

    def assign(batch: pa.Table) -> pa.Table:
        from chug_ray.ops.relational import _bcast

        tb = _bcast(tables_ref)
        langs = batch["lang"].to_pylist()
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(nc), np.float64)
        lang_arr = np.asarray(langs, object)
        for lang in set(langs):
            values, cum_before, n = tb[lang]
            m = lang_arr == lang
            rank = cum_before[np.searchsorted(values, nc[m])] + 1
            pr[m] = (rank - 1) / (n - 1) if n > 1 else 0.0
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "lang": batch["lang"],
                "n_chars": pa.array(nc.astype(np.int64)),
                "pct_rank_e4": pa.array(
                    np.floor(pr * 10000.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return _docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        assign, batch_format="pyarrow"
    )


def distinctive_terms(sf_dir: str, k: int = 3, num_buckets: int = 64):
    """TF-IDF-style distinctive terms: per document, the top-``k``
    tokens ranked by (term frequency DESC, corpus document-frequency
    ASC, token ASC) — "frequent here, rare everywhere". The classic
    ``tf * log(N/df)`` score ranks identically at fixed tf as df moves,
    but its float ties differ in the last ulp between engines; the
    lexicographic form keeps the semantics and drops the float, so the
    result is hash-exact vs the SQL oracle.

    Two bucket shuffles, both vectorized in-group:
      1. the batch combiner explodes docs to distinct
         ``(doc_id, token, tf)`` rows; shuffle on
         ``blake2b(token) % B`` and annotate ``df`` = rows-per-token in
         the group (rows are distinct per (doc, token), and every row
         of one token lands in ONE bucket, so the in-group count IS the
         global df). The skew unit is the token — a stopword's df rows
         fill one bucket; at web scale the relief valve is a broadcast
         df table for the top vocabulary (cf. :func:`oov_rate`) with the
         shuffle only for the long tail.
      2. shuffle on ``doc_id % B``; per-doc top-k via one vectorized
         sort + ``groupby().head(k)`` inside each bucket.
    No driver materialization; the df side never leaves the cluster.
    """
    import hashlib
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd

    token_re = re.compile(TOKEN_RE)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        toks: list[str] = []
        tfs: list[int] = []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = Counter(token_re.findall(text.lower()))
            doc_ids.extend([did] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        buckets = [
            int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
            )
            % num_buckets
            for t in toks
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "tbucket": pa.array(buckets, pa.int64()),
            }
        )

    def annotate_df(group: pd.DataFrame) -> pd.DataFrame:
        df_col = (
            group.groupby("token")["doc_id"].transform("size").to_numpy()
        )
        out = group.assign(
            df=df_col.astype(np.int64),
            dbucket=(group["doc_id"].to_numpy() % num_buckets).astype(
                np.int64
            ),
        )
        return out[["doc_id", "token", "tf", "df", "dbucket"]]

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["doc_id", "tf", "df", "token"],
            ascending=[True, False, True, True],
            kind="mergesort",
            ignore_index=True,
        )
        head = g.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
        head["rnk"] = (
            head.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        ).astype(np.int64)
        return head[["doc_id", "token", "tf", "df", "rnk"]]

    exploded = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
    )
    with_df = (
        exploded.groupby("tbucket")
        .map_groups(annotate_df, batch_format="pandas")
        .materialize()  # pin phase-1 output before the second shuffle
    )
    return with_df.groupby("dbucket").map_groups(topk, batch_format="pandas")


def ngram_perplexity(sf_dir: str, m: int = 5000):
    """CCNet-style n-gram LM quality score (the second half of the
    CCNet filter; :func:`oov_rate` is the first): build a distributed
    bigram count table over the corpus, broadcast the top-``m`` rows,
    and score every document by how "expected" its bigrams are.

    Integer-exact by construction: the per-bigram log-probability
    surrogate is ``floor(log2(count))`` — computed on the Ray side as
    ``count.bit_length() - 1`` (pure integer, no libm at all) and on
    the DuckDB side as ``floor(log2(count))``, which are provably equal
    for counts < 2³² (log2 of an exact power of two is exact; for any
    other integer the true value sits ≥ 2⁻³² away from an integer while
    double log2 errs < 2⁻⁵⁰). A float ``ln``-based perplexity would
    differ in the last ulp between engines and break hash-equality.

    Scale shape: phase 1 is the :func:`top_k_tokens` combiner at bigram
    granularity — the shuffle carries one row per (bigram, batch), so
    the hottest bigram ("of the" × 10⁹) costs one row per batch, and
    the top-``m`` cut is a sort+limit over the already-aggregated
    table. Phase 2 is one ``ray.put`` of the (sorted bigram array,
    log2-score array) pair and a per-batch ``searchsorted`` — no second
    shuffle. Ties at the table boundary break (count desc, bigram asc),
    pinned in both engines.

    Output: (doc_id, n_bigrams, n_hits, log2_score) — higher score =
    more in-vocabulary bigram mass = lower LM surprise."""
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    token_re = re.compile(TOKEN_RE)

    def bigram_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = token_re.findall(text.lower())
            c.update(
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            )
        return pa.table(
            {
                "bg": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n"] = batch["n"].astype(np.int64)
        return batch

    top = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(bigram_partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bg")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(finalize, batch_format="pandas")
        .materialize()  # pin the aggregate before the sort's sampling pass
        .sort(["n", "bg"], descending=[True, False])
        .limit(m)
        .take_all()
    )
    from chug_ray.telemetry import record_group

    record_group("ngram_perplexity(table)", None, len(top))
    bgs = np.array([r["bg"] for r in top], dtype=object)
    order = np.argsort(bgs)
    bgs = bgs[order]
    # floor(log2(count)) without floats: bit_length - 1
    log2s = np.array(
        [int(top[i]["n"]).bit_length() - 1 for i in order], np.int64
    )
    table_ref = ray.put((bgs, log2s))

    def score(batch: pa.Table) -> pa.Table:
        v, s = _bcast_uni(table_ref)  # per-process cache (object strings)
        n_bg = np.empty(batch.num_rows, np.int64)
        n_hit = np.empty(batch.num_rows, np.int64)
        sc = np.empty(batch.num_rows, np.int64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = token_re.findall(text.lower())
            if len(toks) < 2:
                n_bg[i] = n_hit[i] = sc[i] = 0
                continue
            bg = np.array(
                [f"{a} {b}" for a, b in zip(toks, toks[1:])], dtype=object
            )
            n_bg[i] = len(bg)
            if len(v):
                pos = np.searchsorted(v, bg)
                pos[pos >= len(v)] = len(v) - 1
                hit = v[pos] == bg
                n_hit[i] = int(hit.sum())
                sc[i] = int(s[pos[hit]].sum())
            else:
                n_hit[i] = sc[i] = 0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(n_bg),
                "n_hits": pa.array(n_hit),
                "log2_score": pa.array(sc),
            }
        )

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        score, batch_format="pyarrow"
    )


def c4_filter(sf_dir: str, num_buckets: int = 64):
    """C4-style corpus-filter composite — the full keep/drop decision a
    pretraining pipeline makes per document, as one dataflow: quality
    heuristics (token/stopword thresholds) ∧ language gate (English by
    the stopword-profile ID) ∧ exact-dedup election (min doc_id per
    distinct text wins). This is the flagship "would this doc enter the
    training set?" operator; the per-signal columns stay visible so a
    user can audit WHY a doc dropped.

    Scale shape: the quality/lang signals are map-only (pa.compute
    kernels, no shuffle). The dedup flag costs two bounded shuffles:
    (1) fp election — per-batch distinct-(fp, min doc_id) combiner rows
    (the hottest duplicate text ships one row per batch) →
    ``groupby(hash(fp) % num_buckets)`` elects the global min per fp
    and emits only winner (doc_id) rows; (2) doc merge — winner rows
    union the per-doc signal rows, ``groupby(doc_id % num_buckets)``,
    in-group membership mark. No broadcast of the (corpus-sized)
    survivor set, no full-text second pass — fp rides the shuffles,
    text does not."""
    import numpy as np
    import pandas as pd
    import ray.data

    def signals(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        n_tokens = pc.cast(_count_re(low, TOKEN_RE), pa.int64())
        n_stop = pc.cast(_count_re(low, r"\b(the|and|of|a|to)\b"), pa.int64())
        keep_quality = (
            pc.and_(pc.greater_equal(n_tokens, 10), pc.greater(n_stop, 0))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        scores = {}
        for lang in LANG_ORDER:
            pat = r"\b(" + "|".join(LANG_PROFILES[lang]) + r")\b"
            scores[lang] = _count_re(low, pat).to_numpy(zero_copy_only=False)
        mat = np.stack([scores[lang] for lang in LANG_ORDER], axis=1)
        keep_lang = (np.argmax(mat, axis=1) == 0).astype(np.int64)  # 'en'
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "keep_quality": pa.array(keep_quality),
                "keep_lang": pa.array(keep_lang),
                "fp": pa.array(fps, pa.string()),
            }
        )

    def elect_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "fp": batch["fp"].to_pylist(),
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("fp", as_index=False)["doc_id"].min()  # combiner
        bkt = np.array(
            [
                int.from_bytes(hashlib.md5(f.encode()).digest()[:4], "big")
                % num_buckets
                for f in g["fp"]
            ],
            np.int64,
        )
        return from_pandas_typed(g.assign(bkt=bkt), ("fp",))

    def elect(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("c4_filter(fp bucket)", None, len(group))
        winners = group.groupby("fp")["doc_id"].min().to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(winners),
                "keep_quality": pa.array(np.zeros(len(winners), np.int64)),
                "keep_lang": pa.array(np.zeros(len(winners), np.int64)),
                "side": pa.array(["w"] * len(winners), pa.string()),
            }
        )

    def tag_signal(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "keep_quality": batch["keep_quality"],
                "keep_lang": batch["keep_lang"],
                "side": pa.array(["s"] * len(batch), pa.string()),
            }
        )

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dbkt", pa.array((d % num_buckets).astype(np.int64))
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group("c4_filter(doc bucket)", None, len(group))
        s = group[group["side"] == "s"]
        winners = set(
            group.loc[group["side"] == "w", "doc_id"].to_numpy(np.int64)
        )
        d = s["doc_id"].to_numpy(np.int64)
        kd = np.fromiter((x in winners for x in d), bool, len(d)).astype(
            np.int64
        )
        kq = s["keep_quality"].to_numpy(np.int64)
        kl = s["keep_lang"].to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "keep_quality": pa.array(kq),
                "keep_lang": pa.array(kl),
                "keep_dedup": pa.array(kd),
                "keep": pa.array(kq & kl & kd),
            }
        )

    sig = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(signals, batch_format="pyarrow")
        .materialize()  # split point: signals feed both the election and the merge
    )
    winners = (
        sig.map_batches(elect_partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(elect, batch_format="pandas")
    )
    return (
        sig.map_batches(tag_signal, batch_format="pyarrow")
        .union(winners)
        .map_batches(add_doc_bucket, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("dbkt")
        .map_groups(merge, batch_format="pandas")
    )


# Gopher rule set (Rae et al. 2021, "Scaling Language Models: ... Gopher",
# table A1) — re-expressed integer-exact so the keep decision is
# hash-comparable against a SQL oracle: every ratio threshold r is the
# cross-multiplied integer inequality (e.g. mean word length >= 3 becomes
# word_chars >= 3 * n_words).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signal_table(
    batch: pa.Table, compute_stopwords: bool = True
) -> pa.Table:
    """The Gopher rule battery as a reusable per-batch kernel:
    (doc_id, raw signals, one keep flag per rule, conjunction `keep`).
    Shared by :func:`gopher_filter` and the composed
    ``curation.curation_pipeline`` recipe so both stay semantically
    identical to the single DuckDB expression set.

    ``compute_stopwords=False`` skips the ``GOPHER_STOPWORDS`` regex
    loop — 8 extra full-text scans, the battery's hottest part — for
    callers that gate the stopword rule off; ``n_stop_distinct``,
    ``keep_stop`` and the conjunction ``keep`` then read as if no stop
    word matched (0 / 0 / 0) and MUST NOT be consumed."""
    import numpy as np

    low = pc.utf8_lower(batch["text"])
    n_words = _count_re(low, TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.int64)
    word_chars = _count_re(low, "[a-z0-9]").to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = (
        _count_re(low, "[a-z0-9]*[a-z][a-z0-9]*")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_sym = (
        _count_re(batch["text"], r"#|\.\.\.")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_nl = _count_re(batch["text"], "\n").to_numpy(zero_copy_only=False).astype(np.int64)
    n_lines = n_nl + 1
    n_bullet = (
        _count_re(batch["text"], r"(?m)^[ \t]*[-*]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_ellip = (
        _count_re(batch["text"], r"(?m)\.\.\.$")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_stop = np.zeros(len(batch), np.int64)
    if compute_stopwords:
        for w in GOPHER_STOPWORDS:
            n_stop += (
                _count_re(low, rf"\b{w}\b").to_numpy(zero_copy_only=False)
                > 0
            ).astype(np.int64)

    keep_words = ((n_words >= 50) & (n_words <= 100_000)).astype(np.int64)
    keep_mean_wl = (
        (word_chars >= 3 * n_words) & (word_chars <= 10 * n_words)
    ).astype(np.int64)
    keep_symbol = (10 * n_sym <= n_words).astype(np.int64)
    keep_bullet = (10 * n_bullet <= 9 * n_lines).astype(np.int64)
    keep_ellipsis = (10 * n_ellip <= 3 * n_lines).astype(np.int64)
    keep_alpha = (5 * n_alpha >= 4 * n_words).astype(np.int64)
    keep_stop = (n_stop >= 2).astype(np.int64)
    keep = (
        keep_words
        * keep_mean_wl
        * keep_symbol
        * keep_bullet
        * keep_ellipsis
        * keep_alpha
        * keep_stop
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "word_chars": pa.array(word_chars),
            "n_alpha_words": pa.array(n_alpha),
            "n_symbols": pa.array(n_sym),
            "n_lines": pa.array(n_lines),
            "n_bullet_lines": pa.array(n_bullet),
            "n_ellipsis_lines": pa.array(n_ellip),
            "n_stop_distinct": pa.array(n_stop),
            "keep_words": pa.array(keep_words),
            "keep_mean_wl": pa.array(keep_mean_wl),
            "keep_symbol": pa.array(keep_symbol),
            "keep_bullet": pa.array(keep_bullet),
            "keep_ellipsis": pa.array(keep_ellipsis),
            "keep_alpha": pa.array(keep_alpha),
            "keep_stop": pa.array(keep_stop),
            "keep": pa.array(keep),
        }
    )


def gopher_filter(sf_dir: str):
    """Gopher-rules corpus quality filter — the published heuristic
    battery (word count bounds, mean word length, symbol-to-word ratio,
    bullet/ellipsis line ratios, alphabetic-word fraction, >=2 distinct
    stop words), one keep flag per rule plus the conjunction, all
    integer-exact.

    Reference anchor: the reference engine has no quality filter; this
    extends the corpus-filter family (quality_score, c4_filter) with the
    published Gopher rule set.

    Scale shape: map-only — every signal is a non-overlapping RE2 count
    (pa.compute count_substring_regex) over the text column; no shuffle,
    no state, streams at any scale. The same RE2 patterns run verbatim in
    the DuckDB oracle, so match semantics are engine-identical.
    """
    return _docs(sf_dir).map_batches(
        gopher_signal_table, batch_format="pyarrow"
    )


# BM25 retrieval (Robertson/Okapi, k1=1.2, b=0.75) over the documents
# table for a fixed deterministic query set. Terms drawn from the synth
# corpus vocabulary; one rare term ("dup") exercises the idf contrast.
BM25_QUERIES = (
    ("hash", "join"),
    ("stream", "filter", "window"),
    ("dup", "merge"),
)


def bm25_search(sf_dir: str, k: int = 10):
    """BM25 top-k retrieval — scores every document against each fixed
    query and returns the k best per query (rank, score) — the lexical
    search primitive of a training-data curation stack (e.g. quality
    anchoring, targeted corpus probes).

    Reference anchor: no reference counterpart; extends the text-analysis
    family with classic sparse retrieval.

    Scale shape (one bounded shuffle + one map pass):

    1. stats pass — per-batch combiner rows: one row per query term
       (partial document frequency) plus one totals row (doc count,
       token count); ``groupby(term)`` sums ≤ |terms|+1 rows per batch,
       and the driver pulls only that |terms|+1-row table (bounded by
       the query set, not the corpus).
    2. scoring pass — idf/avgdl ride into the closure (a few floats);
       per-batch tf via RE2 counts, vectorized BM25, and a local top-k
       prune so each batch ships ≤ k rows per query into the final
       per-query selection (``groupby(query_id).map_groups``), the same
       partial-top-k shape as knn_bruteforce.

    Float parity: every arithmetic step mirrors the DuckDB oracle's
    expression tree (same association order, same libm log), so the
    doubles are bit-identical and ranking agrees exactly; scores are
    rounded to 4 decimals only at the output edge.
    """
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    terms = sorted({t for q in BM25_QUERIES for t in q})

    def stats_partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        n_tok = int(
            _count_re(low, TOKEN_RE).to_numpy(zero_copy_only=False).sum()
        )
        rows_t, rows_df = [], []
        for t in terms:
            hit = (
                _count_re(low, rf"\b{t}\b").to_numpy(zero_copy_only=False) > 0
            )
            rows_t.append(t)
            rows_df.append(int(hit.sum()))
        return pa.table(
            {
                "term": pa.array(rows_t + [""], pa.string()),
                "df": pa.array(rows_df + [0], pa.int64()),
                "n_docs": pa.array([0] * len(terms) + [len(batch)], pa.int64()),
                "n_tokens": pa.array([0] * len(terms) + [n_tok], pa.int64()),
            }
        )

    stats = (
        _docs(sf_dir)
        .map_batches(stats_partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .take_all()  # bounded: |query terms| + 1 rows
    )
    n_docs = sum(r["n_docs"] for r in stats)
    tot_tokens = sum(r["n_tokens"] for r in stats)
    avgdl = tot_tokens / n_docs  # double, same expression as the oracle
    df_map = {r["term"]: r["df"] for r in stats if r["term"]}
    idf = {
        t: math.log(1 + (n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5))
        for t in terms
    }

    def score_partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        dl = (
            _count_re(low, TOKEN_RE)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = {
            t: _count_re(low, rf"\b{t}\b")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            for t in terms
        }
        out_q, out_d, out_s = [], [], []
        for qi, q in enumerate(BM25_QUERIES):
            score = np.zeros(len(dl), np.float64)
            hits = np.zeros(len(dl), np.int64)
            for t in q:  # fixed order == the oracle's left-assoc sum
                contrib = idf[t] * (
                    (tf[t] * 2.2)
                    / (tf[t] + 1.2 * (0.25 + 0.75 * dl / avgdl))
                )
                score = score + contrib
                hits += (tf[t] > 0).astype(np.int64)
            mask = hits > 0
            s, d = score[mask], doc_id[mask]
            order = np.lexsort((d, -s))[:k]  # local top-k prune
            out_q.extend([qi] * len(order))
            out_d.extend(d[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score_raw": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(group: pd.DataFrame) -> pa.Table:
        import numpy as np

        s = group["score_raw"].to_numpy(np.float64)
        d = group["doc_id"].to_numpy(np.int64)
        order = np.lexsort((d, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(
                    group["query_id"].to_numpy(np.int64)[order]
                ),
                "doc_id": pa.array(d[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "score": pa.array(round_away(s[order], 4)),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(score_partial, batch_format="pyarrow")
        .materialize()  # partials before the shuffle
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def mad_outliers(sf_dir: str):
    """Per-language robust outlier flag — |n_chars − median| > 3·MAD,
    with median and MAD both *discrete* (quantile_disc semantics:
    sorted value at ceil(0.5·n)−1), so the whole rule is integer-exact.

    Reference anchor: no reference counterpart; extends the corpus
    statistics family (chars_quantiles) into per-group robust filtering
    — the standard length-outlier gate of a curation pipeline.

    Scale shape: ONE (lang, n_chars) value-count combiner shuffle
    (chars_quantiles' machinery — cardinality = distinct values, capped
    by VALUE_DOMAIN_CAP with loud failure); median and MAD are derived
    per lang from the count table (MAD's |v−med| re-aggregation happens
    on the same domain-bounded counts, no second corpus pass); the
    per-lang (med, mad) table — bounded by |langs| — rides into the
    flagging map's closure. Two corpus passes total, nothing
    corpus-sized on the driver.
    """
    import math

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    counts_ds = (
        _lang_char_counts(sf_dir)
        .materialize()  # guard BEFORE the driver pull
    )
    n_cells = counts_ds.count()
    if n_cells > VALUE_DOMAIN_CAP:
        raise ValueError(
            f"mad_outliers: {n_cells} distinct (lang, n_chars) cells "
            f"exceed the value-domain assumption — bucketize first"
        )
    counts = counts_ds.take_all()  # bounded: checked against the cap above

    def _disc_median(values: np.ndarray, ns: np.ndarray) -> int:
        order = np.argsort(values, kind="stable")
        v, c = values[order], ns[order]
        cum = c.cumsum()
        total = int(cum[-1])
        idx = max(0, math.ceil(0.5 * total) - 1)
        return int(v[np.searchsorted(cum, idx + 1)])

    stats = {}
    cdf = pd.DataFrame(counts)
    for lang, g in cdf.groupby("lang"):
        vals = g["n_chars"].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        med = _disc_median(vals, ns)
        dev = pd.DataFrame({"d": np.abs(vals - med), "n": ns}).groupby(
            "d", as_index=False
        )["n"].sum()
        mad = _disc_median(
            dev["d"].to_numpy(np.int64), dev["n"].to_numpy(np.int64)
        )
        stats[lang] = (med, mad)

    def flag(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        med = np.array([stats[l][0] for l in langs], np.int64)
        mad = np.array([stats[l][1] for l in langs], np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_chars": pa.array(x),
                "med": pa.array(med),
                "mad": pa.array(mad),
                "is_outlier": pa.array(
                    (np.abs(x - med) > 3 * mad).astype(np.int64)
                ),
            }
        )

    return _docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        flag, batch_format="pyarrow"
    )


def weighted_sample_k(sf_dir: str, k: int = 20):
    """Deterministic weighted sampling WITHOUT replacement (A-ES /
    Efraimidis-Spirakis): each doc draws a keyed uniform u from a
    multiplicative hash of doc_id, scores ln(u)/weight (weight =
    n_chars), and the k largest scores win — the distributed, seedable
    version of 'sample k docs proportionally to length'.

    Reference anchor: the reference's sampling is shard-level
    (weighted resample/union, ops/sources.py); this adds the row-level
    weighted-k primitive a curation pipeline uses for audits and
    eval-set draws.

    Scale shape: map-only scoring + per-batch partial top-k (each batch
    ships ≤ k rows) + one constant-key final selection — the
    knn_bruteforce shape; nothing corpus-sized moves.

    Float parity: u = ((doc_id·2654435761 mod 2³²) + 0.5) / 2³² and the
    ln(u)/w expression mirror the DuckDB oracle term-for-term, so
    ranking agrees bit-exactly (uint64 wraparound and HUGEINT agree
    mod 2³²).
    """
    import numpy as np
    import pandas as pd

    M = np.uint64(2654435761)
    MOD = np.uint64(4294967296)

    def score_partial(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = (d * M) % MOD  # == exact product mod 2^32 (2^32 | 2^64)
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        skey = np.log(u) / w
        order = np.lexsort(
            (d.astype(np.int64), -skey)
        )[:k]  # local top-k prune
        return pa.table(
            {
                "doc_id": pa.array(d[order].astype(np.int64)),
                "n_chars": pa.array(
                    batch["n_chars"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[order]
                ),
                "skey": pa.array(skey[order]),
                "one": pa.array(np.zeros(len(order), np.int64)),
            }
        )

    def final_topk(group: pd.DataFrame) -> pa.Table:
        s = group["skey"].to_numpy(np.float64)
        d = group["doc_id"].to_numpy(np.int64)
        order = np.lexsort((d, -s))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(d[order]),
                "n_chars": pa.array(
                    group["n_chars"].to_numpy(np.int64)[order]
                ),
                "sample_key": pa.array(round_away(s[order], 8)),
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "n_chars"))
        .map_batches(score_partial, batch_format="pyarrow")
        .materialize()  # partials before the shuffle
        .groupby("one")
        .map_groups(final_topk, batch_format="pandas")
    )


def dsir_select(
    sf_dir: str, target_lang: str = "en", m: int = 5000, k: int = 50
):
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    rank documents by how much more likely their tokens are under a
    TARGET unigram model than under the CORPUS model, and keep the
    top-``k`` — importance resampling with n-gram proxy models, the
    published recipe for picking pretraining data that "looks like"
    a target domain (here: the ``target_lang`` slice).

    Integer-exact cross-engine by the :func:`ngram_perplexity` trick:
    the per-token log-ratio surrogate is ``floor(log2(1+n_target)) −
    floor(log2(1+n_corpus))`` — pure bit_length arithmetic on the Ray
    side, ``floor(log2(...))`` in DuckDB, provably equal for counts
    < 2³² — so per-doc scores are int64 SUMS (order-invariant) and the
    oracle hash-matches exactly, unlike a float ln-ratio.

    Scale shape: ONE token-count pass emits per-batch (token,
    n_corpus, n_target) combiner partials (the target counter rides in
    the same row — no second corpus scan); the top-``m`` vocabulary cut
    (count desc, token asc — pinned both engines) bounds the broadcast
    table; scoring is a per-batch searchsorted; selection is per-batch
    partial top-k, driver merges blocks·k short rows — never the
    corpus."""
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    token_re = re.compile(TOKEN_RE)

    def count_partial(batch: pa.Table) -> pa.Table:
        nc: Counter = Counter()
        nt: Counter = Counter()
        langs = batch["lang"].to_pylist()
        for text, lang in zip(batch["text"].to_pylist(), langs):
            toks = token_re.findall(text.lower())
            nc.update(toks)
            if lang == target_lang:
                nt.update(toks)
        words = list(nc.keys())
        return pa.table(
            {
                "w": pa.array(words, pa.string()),
                "nc": pa.array([nc[w] for w in words], pa.int64()),
                "nt": pa.array([nt.get(w, 0) for w in words], pa.int64()),
            }
        )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["nc"] = batch["nc"].astype(np.int64)
        batch["nt"] = batch["nt"].astype(np.int64)
        return batch

    top = (
        _docs(sf_dir, ("doc_id", "text", "lang"))
        .map_batches(count_partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("w")
        .aggregate(Sum("nc", alias_name="nc"), Sum("nt", alias_name="nt"))
        .map_batches(finalize, batch_format="pandas")
        .materialize()  # pin the aggregate before the sort's sampling pass
        .sort(["nc", "w"], descending=[True, False])
        .limit(m)
        .take_all()
    )
    from chug_ray.telemetry import record_group

    record_group("dsir_select(vocab)", None, len(top))
    words = np.array([r["w"] for r in top], dtype=object)
    order = np.argsort(words)
    words = words[order]
    wgt = np.array(
        [
            (int(top[i]["nt"]) + 1).bit_length()
            - 1
            - ((int(top[i]["nc"]) + 1).bit_length() - 1)
            for i in order
        ],
        np.int64,
    )
    table_ref = ray.put((words, wgt))

    def score_topk(batch: pa.Table) -> pa.Table:
        v, s = _bcast_uni(table_ref)  # per-process cache (object strings)
        n = batch.num_rows
        n_tok = np.empty(n, np.int64)
        sc = np.empty(n, np.int64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = token_re.findall(text.lower())
            n_tok[i] = len(toks)
            if not len(toks) or not len(v):
                sc[i] = 0
                continue
            tk = np.array(toks, dtype=object)
            pos = np.searchsorted(v, tk)
            pos[pos >= len(v)] = len(v) - 1
            hit = v[pos] == tk
            sc[i] = int(s[pos[hit]].sum())
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # token-less docs are out of scope (the oracle's token explode
        # never produces a row for them)
        nz = n_tok > 0
        ids, n_tok, sc = ids[nz], n_tok[nz], sc[nz]
        # local partial top-k: (score desc, doc_id asc)
        order = np.lexsort((ids, -sc))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order].astype(np.int64)),
                "n_tokens": pa.array(n_tok[order]),
                "score": pa.array(sc[order]),
            }
        )

    rows = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(score_topk, batch_format="pyarrow")
        .take_all()  # bounded: <= k rows per block
    )
    ids = np.array([r["doc_id"] for r in rows], np.int64)
    ntk = np.array([r["n_tokens"] for r in rows], np.int64)
    scs = np.array([r["score"] for r in rows], np.int64)
    order = np.lexsort((ids, -scs))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[order]),
            "n_tokens": pa.array(ntk[order]),
            "score": pa.array(scs[order]),
        }
    )


def train_test_split(sf_dir: str, test_permille: int = 100):
    """Deterministic hash-based train/test split — the standard
    leakage-safe corpus split (hash the stable document key, not a
    row-order RNG, so the assignment survives re-sharding, appends and
    re-runs; cf. the keyed-RNG rule in ``chug_ray/util.py``).

    ``h = (doc_id · 2654435761) mod 2³²`` (Knuth multiplicative hash);
    a doc is 'test' iff ``h mod 1000 < test_permille``. Fully
    vectorized in uint64 (doc_id < 2³² is asserted, so the product
    never wraps 2⁶⁴ and numpy's wraparound arithmetic equals the SQL
    oracle's HUGEINT form exactly). One embarrassingly-parallel
    ``map_batches`` pass — no shuffle, no driver state, and the split
    of any one document is computable in isolation."""
    import numpy as np

    K = np.uint64(2654435761)
    M32 = np.uint64(4294967296)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not ((ids >= 0).all() and (ids < (1 << 32)).all()):
            raise ValueError(
                "doc_id outside [0, 2^32): the uint64 product would wrap"
            )
        h = (ids.astype(np.uint64) * K) % M32
        bucket = (h % np.uint64(1000)).astype(np.int64)
        split = np.where(bucket < test_permille, "test", "train")
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "hash_bucket": pa.array(bucket),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return _docs(sf_dir, ("doc_id",)).map_batches(fn, batch_format="pyarrow")


def vocab_overlap(sf_dir: str, num_buckets: int = 64):
    """Per-source vocabulary Jaccard overlap matrix — the corpus-mixing
    diagnostic (how much do two sources share their token vocabulary?).
    Emits one row per unordered source pair with ≥1 shared token:
    (src_a < src_b, shared, vocab_a, vocab_b, jaccard_e6) where
    ``jaccard_e6 = ⌊shared·10⁶ / (vocab_a + vocab_b − shared)⌋`` is
    integer-exact (no float division → hash-exact vs the oracle).

    Shape: the batch combiner emits DISTINCT (source, token) rows
    (a token repeated millions of times in one source ships once per
    batch); ONE ``blake2b(token) % B`` bucket shuffle co-locates each
    token's rows, so the in-group distinct-source set is global; each
    group emits per-pair and per-source partial counts, and the final
    groupby sums ≤ |sources|² rows per bucket. Bounded by vocab ×
    sources, never by corpus rows."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    token_re = re.compile(TOKEN_RE)

    def explode(batch: pa.Table) -> pa.Table:
        pairs: set[tuple[str, str]] = set()
        for src, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok in token_re.findall(text.lower()):
                pairs.add((src, tok))
        if not pairs:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "bkt": pa.array([], pa.int64()),
                }
            )
        srcs, toks = zip(*sorted(pairs))
        bkt = [
            int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
            % num_buckets
            for t in toks
        ]
        return pa.table(
            {
                "source": pa.array(list(srcs), pa.string()),
                "token": pa.array(list(toks), pa.string()),
                "bkt": pa.array(np.array(bkt, np.int64)),
            }
        )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("vocab_overlap(bucket)", None, len(group))
        v = group[["source", "token"]].drop_duplicates()
        sizes = v.groupby("source", as_index=False).size()
        out = [
            pd.DataFrame(
                {
                    "src_a": sizes["source"],
                    "src_b": "",
                    "n": sizes["size"].astype(np.int64),
                    "kind": "s",
                }
            )
        ]
        m = v.merge(v, on="token", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        if len(m):
            p = m.groupby(["source_a", "source_b"], as_index=False).size()
            out.append(
                pd.DataFrame(
                    {
                        "src_a": p["source_a"],
                        "src_b": p["source_b"],
                        "n": p["size"].astype(np.int64),
                        "kind": "p",
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    rows = (
        _docs(sf_dir, ("source", "text"))
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("bkt")
        .map_groups(per_bucket, batch_format="pandas")
        .materialize()  # pin before the (tiny) final shuffle
        .groupby(["kind", "src_a", "src_b"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: |sources| + |sources|² rows
    )
    sizes = {r["src_a"]: int(r["n"]) for r in rows if r["kind"] == "s"}
    out = []
    for r in sorted(
        (r for r in rows if r["kind"] == "p"),
        key=lambda r: (r["src_a"], r["src_b"]),
    ):
        a, b, shared = r["src_a"], r["src_b"], int(r["n"])
        union = sizes[a] + sizes[b] - shared
        out.append(
            (a, b, shared, sizes[a], sizes[b], shared * 1_000_000 // union)
        )
    return pa.table(
        {
            "src_a": pa.array([o[0] for o in out], pa.string()),
            "src_b": pa.array([o[1] for o in out], pa.string()),
            "shared": pa.array([o[2] for o in out], pa.int64()),
            "vocab_a": pa.array([o[3] for o in out], pa.int64()),
            "vocab_b": pa.array([o[4] for o in out], pa.int64()),
            "jaccard_e6": pa.array([o[5] for o in out], pa.int64()),
        }
    )


def collocations(sf_dir: str, min_count: int = 5, k: int = 20):
    """PMI-ranked collocations: the top-``k`` adjacent token bigrams by
    pointwise mutual information, ``PMI ∝ c_xy·N / (c_x·c_y)`` — the
    classic phrase-discovery op (Church & Hanks 1990) used to mine
    multi-word expressions from a pretraining corpus.

    Hash-exactness: the score is emitted as
    ``pmi_ratio_e6 = ⌊c_xy·10⁶·N / (c_x·c_y)⌋`` computed in unbounded
    Python ints over the ≥``min_count`` candidates only (the product
    overflows int64 at web scale; the candidate set is already reduced)
    — no logs, no floats, so ranking and values match the HUGEINT SQL
    oracle bit-for-bit. Ties at the k-boundary break lexicographically.

    Shape: unigram counts reduce via batch-Counter combiners to a
    vocab-bounded table broadcast once (the :func:`oov_rate` bound);
    bigram batch-Counters shuffle one row per (batch, distinct bigram)
    into a ``groupby(bigram)``; the ≥min_count candidates score
    vectorized against the broadcast and a per-batch partial top-k
    caps the final sort at k·|batches| rows."""
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    token_re = re.compile(TOKEN_RE)

    def uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(token_re.findall(text.lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    uni_rows = (
        _docs(sf_dir, ("text",))
        .map_batches(uni_partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: vocabulary size (the oov_rate bound)
    )
    toks = np.array([r["token"] for r in uni_rows], dtype=object)
    cnts = np.array([int(r["n"]) for r in uni_rows], np.int64)
    order = np.argsort(toks, kind="stable")
    total = int(cnts.sum())
    uni_ref = ray.put((toks[order], cnts[order]))

    def big_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            ts = token_re.findall(text.lower())
            c.update(zip(ts, ts[1:]))
        ks = list(c.keys())
        return pa.table(
            {
                "tok_a": pa.array([a for a, _ in ks], pa.string()),
                "tok_b": pa.array([b for _, b in ks], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    def score(batch: pa.Table) -> pa.Table:
        vt, vc = _bcast_uni(uni_ref)
        c_xy = batch["n"].to_numpy(zero_copy_only=False)
        keep = c_xy >= min_count
        batch = batch.filter(pa.array(keep))
        c_xy = c_xy[keep]
        a = np.asarray(batch["tok_a"], dtype=object)
        b = np.asarray(batch["tok_b"], dtype=object)
        ca = vc[np.searchsorted(vt, a)]
        cb = vc[np.searchsorted(vt, b)]
        # unbounded-int score on the reduced candidate set (int64 would
        # overflow at c_xy·N·1e6 ≳ 9e18, i.e. already at ~1e6 tokens)
        ratio = [
            int(x) * 1_000_000 * total // (int(y) * int(z))
            for x, y, z in zip(c_xy, ca, cb)
        ]
        df = pd.DataFrame(
            {
                "tok_a": a,
                "tok_b": b,
                "c_xy": c_xy,
                "pmi_ratio_e6": np.array(ratio, np.int64),
            }
        )
        df = df.sort_values(
            ["pmi_ratio_e6", "tok_a", "tok_b"],
            ascending=[False, True, True],
        ).head(k)  # per-batch partial top-k
        return from_pandas_typed(df, ("tok_a", "tok_b"))

    return (
        _docs(sf_dir, ("text",))
        .map_batches(big_partial, batch_format="pyarrow")
        .materialize()  # partials (see window.py NOTE)
        .groupby(["tok_a", "tok_b"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(score, batch_format="pyarrow")
        .materialize()  # pin the partial top-k before the global sort
        .sort(
            ["pmi_ratio_e6", "tok_a", "tok_b"],
            descending=[True, False, False],
        )
        .limit(k)
    )


# per-process broadcast cache: ONE implementation, shared with the
# relational family so cache/session fixes reach every user
from chug_ray.ops.relational import _bcast as _bcast_uni  # noqa: E402


def collapse_runs(sf_dir: str):
    """Intra-document run collapse: drop every token equal to its
    immediate predecessor ('batch batch batch' → 'batch') — the
    cheapest of the Gopher-family repetition CLEANUPS (the stats
    variant is :func:`repetition_stats`; this one rewrites the text).

    Embarrassingly parallel map — per-doc token runs never cross a
    batch boundary, so there is no shuffle and no state. The per-doc
    findall is inherent (same as repetition_stats); the run mask is
    one vectorized shift-compare per document."""
    import re

    import numpy as np

    token_re = re.compile(TOKEN_RE)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        clean = np.empty(n, object)
        n_kept = np.empty(n, np.int64)
        n_removed = np.empty(n, np.int64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = np.array(token_re.findall(text.lower()), dtype=object)
            if len(toks) == 0:
                clean[i], n_kept[i], n_removed[i] = "", 0, 0
                continue
            keep = np.concatenate(([True], toks[1:] != toks[:-1]))
            kept = toks[keep]
            clean[i] = " ".join(kept)
            n_kept[i] = len(kept)
            n_removed[i] = len(toks) - len(kept)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_clean": pa.array(clean, pa.string()),
                "n_kept": pa.array(n_kept),
                "n_removed": pa.array(n_removed),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def grouped_moments(sf_dir: str):
    """Per-lang covariance moments of (n_chars, n_tokens) — the
    distributed building block for correlation / linear fits: exact
    int64 (n, Σx, Σy, Σx², Σy², Σxy) per group, from which Pearson r
    or an OLS slope is two divisions on the consumer side (floats never
    cross the wire, so the result is order-invariant and hash-exact —
    the kmeans_lloyd fixed-point rule applied to second moments).

    One map-only combiner pass (per-batch per-lang sums) into a
    lang-domain-sized groupby. Overflow bound: Σx² ≤ n·max(x)² must
    stay under 2⁶³ — asserted per batch with Python ints, so a
    million-char doc fails loudly, not silently."""
    import re

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    token_re = re.compile(TOKEN_RE)

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pandas()
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.array(
            [
                len(token_re.findall(t.lower()))
                for t in batch["text"].to_pylist()
            ],
            np.int64,
        )
        mx, my = int(np.abs(x).max(initial=0)), int(np.abs(y).max(initial=0))
        if not len(x) * max(mx, my) ** 2 < (1 << 63):
            raise ValueError(
                "second-moment sum would overflow int64; shrink batch_size"
            )
        df = pd.DataFrame(
            {"lang": langs, "n": 1, "sx": x, "sy": y,
             "sxx": x * x, "syy": y * y, "sxy": x * y}
        )
        g = df.groupby("lang", as_index=False).sum()
        cols = {"lang": pa.array(g["lang"].tolist(), pa.string())}
        for c in ("n", "sx", "sy", "sxx", "syy", "sxy"):
            cols[c] = pa.array(g[c].to_numpy(np.int64))
        return pa.table(cols)

    return (
        _docs(sf_dir, ("lang", "n_chars", "text"))
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs (see window.py NOTE)
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )


def token_coverage(sf_dir: str, pct: int = 90):
    """Nucleus vocabulary per language: the size of the smallest token
    set (ordered by descending count, token ascending on ties) whose
    occurrences cover ≥ ``pct``% of the language's tokens — the
    head-vs-tail vocabulary-concentration diagnostic used when sizing
    tokenizers and spotting boilerplate-dominated corpora.

    Reference anchor: no chug counterpart; extends the text-analysis
    family with the cumulative-threshold-over-ordered-counts shape.

    Scale shape: per-batch Counter partials bound the shuffle at one row
    per (lang, token, batch); a single ``groupby(lang)`` then reduces
    each language's partials with a vectorized pandas sum + cumsum (the
    per-lang group is the language's vocabulary — Heaps'-law bounded,
    not corpus bounded). All arithmetic is int64 (the threshold test is
    ``100·cum_prev < pct·total``), so the oracle matches exactly.
    """
    from collections import Counter
    import re

    import numpy as np
    import pandas as pd

    token_re = re.compile(TOKEN_RE)

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        per_lang: dict[str, Counter] = {}
        for lang, text in zip(langs, texts):
            per_lang.setdefault(lang, Counter()).update(
                token_re.findall(text.lower())
            )
        rows_l, rows_t, rows_n = [], [], []
        for lang, c in per_lang.items():
            rows_l.extend([lang] * len(c))
            rows_t.extend(c.keys())
            rows_n.extend(c.values())
        return pa.table(
            {
                "lang": pa.array(rows_l, pa.string()),
                "token": pa.array(rows_t, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    def nucleus(group: pd.DataFrame) -> pd.DataFrame:
        from chug_ray.telemetry import record_group

        record_group("token_coverage(lang)", None, len(group))
        s = (
            group.groupby("token", as_index=False)["n"]
            .sum()
            .sort_values(["n", "token"], ascending=[False, True])
        )
        n = s["n"].to_numpy(np.int64)
        cum = np.cumsum(n)
        tot = int(cum[-1]) if len(cum) else 0
        in_nucleus = 100 * (cum - n) < pct * tot
        return pd.DataFrame(
            {
                "lang": [group["lang"].iloc[0]],
                "total_tokens": np.array([tot], np.int64),
                "vocab_size": np.array([len(s)], np.int64),
                "nucleus_size": np.array([int(in_nucleus.sum())], np.int64),
                "nucleus_tokens": np.array(
                    [int(cum[in_nucleus].max()) if in_nucleus.any() else 0],
                    np.int64,
                ),
            }
        )

    return (
        _docs(sf_dir, ("lang", "text"))
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("lang")
        .map_groups(nucleus, batch_format="pandas")
    )


def mode_per_group(sf_dir: str):
    """Exact per-group MODE — the most frequent ``n_chars`` value per
    language, ties broken to the smallest value (a total order, so the
    answer is partitioning-independent).

    Scale shape: per-batch (lang, n_chars)→count partials feed one
    ``groupby(lang, n_chars)`` sum; a second per-batch combiner then
    reduces that (already bounded by the distinct-value domain) table
    to one best row per lang per batch, and the final per-lang argmax
    runs over ≤ |langs| × n_batches tiny rows via ``map_groups``. No
    packed-int trick: counts can exceed 2**23 at 10^12 rows, so packing
    (count << 40 | value) would overflow int64 — the two-level argmax
    is overflow-free at any scale."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
                "n_chars": pa.array(g["n_chars"].to_numpy(np.int64)),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    counts = (
        _docs(sf_dir, ("lang", "n_chars"))
        .map_batches(count_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()  # partials: Ray's sort shuffle re-executes lazy inputs
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # pinned before the argmax combiner re-reads it
    )

    def best_partial(batch: pd.DataFrame) -> pa.Table:
        batch = batch.sort_values(
            ["lang", "n", "n_chars"], ascending=[True, False, True]
        ).drop_duplicates("lang")
        return pa.table(
            {
                "lang": pa.array(batch["lang"].to_numpy(object), pa.string()),
                "mode_n_chars": pa.array(batch["n_chars"].to_numpy(np.int64)),
                "n_docs": pa.array(batch["n"].to_numpy(np.int64)),
            }
        )

    def final_best(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["n_docs", "mode_n_chars"], ascending=[False, True]
        )
        return group.iloc[:1]

    return (
        counts.map_batches(best_partial, batch_format="pandas")
        .materialize()  # pinned: groupby samples re-execute lazy inputs
        .groupby("lang")
        .map_groups(final_best, batch_format="pandas")
    )


def pearson_by_lang(sf_dir: str):
    """Per-lang Pearson correlation of (n_chars, n_tokens) as e6 fixed
    point — the consumer-side division :func:`grouped_moments`
    deliberately leaves out, packaged as its own op.

    Scale shape: identical to grouped_moments (one combiner pass, one
    lang-domain groupby); the r computation is a vectorized map over
    the ≤|langs| moment rows. Float parity: every moment is an exact
    int64; both sides cast to DOUBLE and evaluate the SAME expression
    tree (n·sxy − sx·sy) / (sqrt(n·sxx − sx²)·sqrt(n·syy − sy²)), so
    the doubles (and the half-away e6 rounding) are bit-identical.
    Zero-variance groups are excluded on both sides (den > 0)."""
    import numpy as np

    moments = grouped_moments(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        f = {
            c: batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
        }
        num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
        den = np.sqrt(f["n"] * f["sxx"] - f["sx"] * f["sx"]) * np.sqrt(
            f["n"] * f["syy"] - f["sy"] * f["sy"]
        )
        keep = den > 0
        r = num[keep] / den[keep]
        r_e6 = (np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5)).astype(np.int64)
        return pa.table(
            {
                "lang": pc.cast(
                    batch.filter(pa.array(keep))["lang"], pa.string()
                ),
                "n": pa.array(f["n"][keep].astype(np.int64)),
                "r_e6": pa.array(r_e6),
            }
        )

    return moments.map_batches(score, batch_format="pyarrow")


def winsorized_stats(sf_dir: str, lo_pct: int = 5, hi_pct: int = 95):
    """Per-lang winsorized sum — clip ``n_chars`` at the exact discrete
    per-group percentiles (quantile_disc: sorted value at
    ceil(p·n) − 1) and report the clipped integer sum, the robust-mean
    building block (mean = sum_clipped / n on the consumer side so no
    float crosses the wire).

    Scale shape: ONE value-count combiner shuffle (cardinality =
    distinct values per lang, domain-capped like chars_quantiles); the
    cut points AND the clipped sum both derive from that count table in
    the same per-lang map_groups — the fact table streams exactly
    once."""
    import math

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    counts = (
        _lang_char_counts(sf_dir)
        .materialize()  # pinned before the per-lang map_groups shuffle
    )

    def winsorize(group: pd.DataFrame) -> pa.Table:
        from chug_ray.telemetry import record_group

        record_group(
            "winsorized_stats(lang)", group["lang"].iloc[0], len(group)
        )
        if len(group) > VALUE_DOMAIN_CAP:
            raise ValueError(
                f"winsorized_stats: lang {group['lang'].iloc[0]!r} has "
                f"{len(group)} distinct values (> {VALUE_DOMAIN_CAP}); "
                "bucketize the values or widen the cap explicitly"
            )
        group = group.sort_values("n_chars")
        vals = group["n_chars"].to_numpy(np.int64)
        cnt = group["n"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        lo = int(vals[np.searchsorted(cum, math.ceil(lo_pct / 100 * n))])
        hi = int(vals[np.searchsorted(cum, math.ceil(hi_pct / 100 * n))])
        clipped = np.clip(vals, lo, hi)
        s = int((clipped * cnt).sum())
        return pa.table(
            {
                "lang": pa.array([group["lang"].iloc[0]], pa.string()),
                "lo": pa.array([lo], pa.int64()),
                "hi": pa.array([hi], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "sum_clipped": pa.array([s], pa.int64()),
            }
        )

    return counts.groupby("lang").map_groups(
        winsorize, batch_format="pandas"
    )


def ols_by_lang(sf_dir: str):
    """Per-lang ordinary-least-squares fit of n_tokens ~ n_chars as e6
    fixed point — the regression consumer of :func:`grouped_moments`
    (Pearson's sibling; same one-combiner-pass scale shape).

    Float parity: slope = (n·sxy − sx·sy)/(n·sxx − sx²) and intercept =
    (sy − slope·sx)/n are evaluated over exact int64 moments with the
    SAME double expression tree on both sides; zero-x-variance groups
    are excluded (den > 0)."""
    import numpy as np

    moments = grouped_moments(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        f = {
            c: batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in ("n", "sx", "sy", "sxx", "sxy")
        }
        num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
        den = f["n"] * f["sxx"] - f["sx"] * f["sx"]
        keep = den > 0
        slope = num[keep] / den[keep]
        intercept = (f["sy"][keep] - slope * f["sx"][keep]) / f["n"][keep]

        def e6(x: np.ndarray) -> np.ndarray:
            return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(
                np.int64
            )

        return pa.table(
            {
                "lang": pc.cast(
                    batch.filter(pa.array(keep))["lang"], pa.string()
                ),
                "n": pa.array(f["n"][keep].astype(np.int64)),
                "slope_e6": pa.array(e6(slope)),
                "intercept_e6": pa.array(e6(intercept)),
            }
        )

    return moments.map_batches(score, batch_format="pyarrow")


def table_checksum(sf_dir: str):
    """Order-invariant content checksum of the documents table: the
    per-row 32-bit md5 prefix of ``doc_id|lang|n_chars`` summed mod
    2³² — the cheap equality probe for incremental/sync validation
    (two snapshots match iff their checksums and row counts match,
    with hash-collision probability, not proof).

    Scale shape: map-only combiner (one partial per batch, each
    already reduced mod 2³² so partial sums never overflow int64 even
    at 10¹² rows), one tiny final fold."""
    import hashlib

    from ray.data.aggregate import Sum

    MOD = 1 << 32

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        nchars = batch["n_chars"].to_numpy(zero_copy_only=False)
        total = 0
        for i in range(len(ids)):
            h = hashlib.md5(
                f"{ids[i]}|{langs[i]}|{nchars[i]}".encode()
            ).hexdigest()[:8]
            total += int(h, 16)
        return pa.table(
            {
                "checksum": pa.array([total % MOD], pa.int64()),
                "n_rows": pa.array([len(ids)], pa.int64()),
            }
        )

    import numpy as np
    import pandas as pd

    agg = (
        _docs(sf_dir, ("doc_id", "lang", "n_chars"))
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .materialize()
        .aggregate(Sum("checksum", alias_name="s"), Sum("n_rows", alias_name="n"))
    )
    return pd.DataFrame(
        {
            "checksum": pd.Series([int(agg["s"]) % MOD], dtype=np.int64),
            "n_rows": pd.Series([int(agg["n"])], dtype=np.int64),
        }
    )


def char_entropy(sf_dir: str):
    """Per-document character-level Shannon entropy — the
    compression-ratio quality proxy (low entropy ⇔ repetitive /
    boilerplate text), next to repetition_stats and quality_score.

    Float parity without an ordered float sum: each character's term
    (c/n)·ln(n/c) is floored to e9 fixed point FIRST, and the per-doc
    result is the INTEGER sum of those terms — order-invariant, so the
    unordered SQL aggregate and the numpy sum agree exactly. Empty
    texts are excluded on both sides. Map-only (no shuffle); the
    per-doc char count is the inherent per-row kernel (parser-style),
    vectorized per document via np.unique."""
    import numpy as np
    import pandas as pd

    def score(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        keep_idx, out_n, out_d, out_e = [], [], [], []
        for i, t in enumerate(texts):
            if not t:
                continue
            chars, cnt = np.unique(list(t), return_counts=True)
            n = float(len(t))
            c = cnt.astype(np.float64)
            terms = np.floor((c / n) * np.log(n / c) * 1e9)
            keep_idx.append(i)
            out_n.append(len(t))
            out_d.append(len(chars))
            out_e.append(int(terms.astype(np.int64).sum()))
        return pa.table(
            {
                # native doc_id type carried through (int64 in the
                # synthetic tables, string in ingested corpora)
                "doc_id": batch["doc_id"].take(pa.array(keep_idx, pa.int64())),
                "n_chars_text": pa.array(out_n, pa.int64()),
                "distinct_chars": pa.array(out_d, pa.int64()),
                "entropy_e9": pa.array(out_e, pa.int64()),
            }
        )

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        score, batch_format="pyarrow", batch_size=4096
    )


def greedy_coverage(sf_dir: str, k: int = 10, max_vocab: int = 50_000_000):
    """Greedy maximum-coverage data selection: pick ``k`` documents,
    each round choosing the doc adding the most NOT-yet-covered
    distinct tokens (ties: smallest doc_id) — the classic submodular
    facility-location/set-cover selector for pretraining-subset
    curation (next to dsir_select and temperature_mixture). Greedy is
    deterministic, so the result is partitioning-independent; pinned
    against a sequential reference in tests/test_greedy_coverage.py.

    Scale shape: documents are tokenized ONCE into a materialized
    (doc_id, token-hash list) table; each of the ≤k rounds is one
    streaming pass over it — per-batch local argmax partials (each
    carrying only its winner's hash list) with the covered set
    broadcast via ray.put, bounded by the distinct-token vocabulary
    (Heaps-bounded; ``max_vocab`` loud guard). Early-stops when no doc
    adds coverage."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    import ray

    token_re = re.compile(TOKEN_RE)

    def tokenize(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        hashes = []
        for t in texts:
            toks = set(token_re.findall(t.lower()))
            hashes.append(
                sorted(
                    int.from_bytes(
                        hashlib.md5(w.encode()).digest()[:8], "big"
                    )
                    >> 1  # keep int64-positive
                    for w in toks
                )
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "hashes": pa.array(hashes, pa.list_(pa.int64())),
            }
        )

    toks = (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(tokenize, batch_format="pyarrow", batch_size=4096)
        .materialize()
    )

    covered = np.array([], np.int64)
    picks = []
    for rank in range(1, k + 1):
        cov_ref = ray.put(covered)

        def best_partial(batch: pa.Table, _ref=cov_ref) -> pa.Table:
            cov = ray.get(_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            lists = batch["hashes"].to_pylist()
            best = (-1, None, None)  # (new_count, doc_id, hashes)
            for i, hs in enumerate(lists):
                h = np.asarray(hs, np.int64)
                new = int(len(h) - np.isin(h, cov, assume_unique=True).sum())
                if new > best[0] or (
                    new == best[0] and best[1] is not None and ids[i] < best[1]
                ):
                    best = (new, int(ids[i]), hs)
            if best[1] is None:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "new": pa.array([], pa.int64()),
                        "hashes": pa.array([], pa.list_(pa.int64())),
                    }
                )
            return pa.table(
                {
                    "doc_id": pa.array([best[1]], pa.int64()),
                    "new": pa.array([best[0]], pa.int64()),
                    "hashes": pa.array([best[2]], pa.list_(pa.int64())),
                }
            )

        rows = toks.map_batches(
            best_partial, batch_format="pyarrow"
        ).take_all()  # ≤ one row per batch
        if not rows:
            break
        rows.sort(key=lambda r: (-r["new"], r["doc_id"]))
        top = rows[0]
        if top["new"] <= 0:
            break
        covered = np.union1d(
            covered, np.asarray(top["hashes"], np.int64)
        )
        if len(covered) > max_vocab:
            raise ValueError(
                f"greedy_coverage: covered vocabulary {len(covered)} "
                f"exceeds max_vocab={max_vocab}"
            )
        picks.append((rank, top["doc_id"], top["new"], len(covered)))

    return pd.DataFrame(
        picks, columns=["rank", "doc_id", "new_tokens", "covered_total"]
    ).astype(np.int64)


def weighted_sample_per_lang(sf_dir: str, k: int = 5):
    """Stratified A-ES: deterministic weighted sampling WITHOUT
    replacement, k docs PER LANG proportionally to length — the
    per-group variant of :func:`weighted_sample_k` (same keyed-uniform
    ln(u)/w score, same float-parity recipe), for per-language audit /
    eval-set draws.

    Scale shape: per-batch per-lang top-k partials (each batch ships
    ≤ k rows per lang it contains) into a lang-domain groupby — the
    sample_per_group shape with A-ES keys instead of raw hashes."""
    import numpy as np
    import pandas as pd

    M = np.uint64(2654435761)
    MOD = np.uint64(4294967296)

    def score_partial(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        h = (d * M) % MOD
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        skey = np.log(u) / w
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "doc_id": d.astype(np.int64),
                "n_chars": batch["n_chars"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "skey": skey,
            }
        )
        top = (
            df.sort_values(["lang", "skey", "doc_id"],
                           ascending=[True, False, True], kind="stable")
            .groupby("lang", group_keys=False)
            .head(k)
        )
        return from_pandas_typed(top, ("lang",))

    def final_topk(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["skey", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "rank": pa.array(
                    np.arange(1, len(g) + 1, dtype=np.int64)
                ),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "n_chars": pa.array(g["n_chars"].to_numpy(np.int64)),
                "sample_key": pa.array(
                    round_away(g["skey"].to_numpy(), 8)
                ),
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "lang", "n_chars"))
        .map_batches(score_partial, batch_format="pyarrow")
        .materialize()  # partials before the shuffle
        .groupby("lang")
        .map_groups(final_topk, batch_format="pandas")
    )


def k_anonymity(sf_dir: str, k: int = 5, bucket_chars: int = 100):
    """k-anonymity audit over the quasi-identifier tuple
    (lang, source, n_chars bucket): combinations shared by fewer than
    ``k`` documents are re-identification risks — the privacy-audit
    companion to pii_redact. Returns the violating combos with counts.

    Scale shape: one combiner pass (per-batch per-combo counts) into a
    quasi-identifier-domain groupby; output bounded by the violating
    combos."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "source": batch["source"].to_pylist(),
                "chars_bucket": (
                    batch["n_chars"].to_numpy(zero_copy_only=False)
                    // bucket_chars
                ).astype(np.int64),
            }
        )
        g = df.groupby(
            ["lang", "source", "chars_bucket"], as_index=False
        ).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "source": pa.array(g["source"].tolist(), pa.string()),
                "chars_bucket": pa.array(
                    g["chars_bucket"].to_numpy(np.int64)
                ),
                "n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def violations(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["n"], pa.scalar(k))
        return batch.filter(keep)

    return (
        _docs(sf_dir, ("lang", "source", "n_chars"))
        .map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby(["lang", "source", "chars_bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(violations, batch_format="pyarrow")
    )


def balanced_lang_sample(sf_dir: str, target_per_lang: int = 40):
    """Language-rebalancing sample: keep each document with probability
    ``target_per_lang / count(lang)`` via a deterministic md5 cut on
    doc_id — the inverse-frequency resampler that flattens a skewed
    language mix (the shard-level weighted_union's row-level sibling).
    Expected kept docs per lang ≈ target regardless of the original
    distribution; fully deterministic and resharding-proof (the keep
    decision is a pure function of doc_id and the lang's global count).

    Scale shape: one combiner lang-count pass (lang-domain bounded,
    broadcast) + one map-only filter; no shuffle of the fact table.
    Float parity: the threshold floor(target/count·2³²) and the 32-bit
    md5 prefix compare are mirrored integer-for-integer in the oracle."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        langs, c = np.unique(batch["lang"].to_pylist(), return_counts=True)
        return pa.table(
            {
                "lang": pa.array(list(langs), pa.string()),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    rows = (
        _docs(sf_dir, ("lang",))
        .map_batches(count_partial, batch_format="pyarrow")
        .materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("lang")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # bounded by the lang domain
    )
    thresholds = {
        r["lang"]: int(np.floor(target_per_lang / r["c"] * 4294967296.0))
        for r in rows
    }
    thr_ref = ray.put(thresholds)

    def keep(batch: pa.Table) -> pa.Table:
        thr = _bcast_uni(thr_ref)  # per-process cache (Python dict)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pylist()
        mask = np.zeros(len(ids), bool)
        for i in range(len(ids)):
            h = int(
                hashlib.md5(str(ids[i]).encode()).hexdigest()[:8], 16
            )
            mask[i] = h < thr.get(langs[i], 0)
        return batch.filter(pa.array(mask))

    return _docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        keep, batch_format="pyarrow"
    )
