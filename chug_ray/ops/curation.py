"""Composed end-to-end curation recipe over the documents table.

Every other ``queries()`` entry exercises ONE operator; this module is
the composition flagship for the data-curation surface — the shape a
real training-data run takes: quality-filter → exact-dedup →
deterministic subsample → per-language selection, chained as a single
lazy Ray Dataset pipeline (one streaming plan, no driver materialization
between stages) and verified end-to-end against one DuckDB expression
chain.

Scale shape of the chain (the point of the demo):

1. **Gopher keep** — map-only; reuses the exact rule battery of
   ``textstats.gopher_signal_table`` (no drift between the standalone
   filter and the composite). Text is fingerprinted (md5) in the SAME
   pass, so the full-text column is dropped before anything shuffles.
2. **Exact dedup (min doc_id per fingerprint)** — ONE
   ``hash(fp) % num_buckets`` groupby carrying only
   (fp 16 B, doc_id, lang, n_words); the survivor election is in-group
   and vectorized. The ``exact_dedup`` shape, but carrying the
   companion columns so no join-back pass is needed.
3. **Deterministic subsample** — map-only md5(doc_id) gate (the
   repo-wide keyed-hash sampling rule: resharding/retry-proof, no RNG
   state, SQL-mirrorable).
4. **Per-language top-k by length** — per-batch partial top-k (each
   batch forwards at most ``k`` rows per language) into ONE
   language-keyed ``map_groups`` final ranking; the shuffle carries
   ≤ k · num_batches rows, never the corpus.

Reference anchor: no chug counterpart (chug is a loader, not a curation
engine); the recipe composes this repo's published-recipe family
(Gopher rules arXiv:2112.11446 §A1.1, C4/CCNet siblings in
``textstats.py``) into the canonical filter→dedup→sample→select chain.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from chug_ray.util import from_pandas_typed


def curation_pipeline(
    sf_dir: str,
    k: int = 20,
    sample_hex: str = "c0",
    num_buckets: int = 64,
    use_stopword_rule: bool = False,
):
    """documents → Gopher keep → exact-dedup survivors → md5(doc_id)
    subsample (first byte < 0x``sample_hex``) → per-lang top-``k`` by
    (n_words DESC, doc_id ASC). Returns (lang, doc_id, n_words,
    rank_in_lang); fully deterministic, one SQL oracle verifies the
    whole chain.

    ``use_stopword_rule`` gates Gopher's ≥2-distinct-stop-words rule:
    the registered query runs the six STRUCTURAL rules only, because
    the synthetic test vocabulary contains no natural-language stop
    words (the full battery would keep zero documents — verified, and
    exactly what the rule is supposed to do to non-natural text; a
    real corpus run enables it)."""
    import ray.data

    from chug_ray.ops.textstats import gopher_signal_table

    # md5 hexdigest chars are lowercase; an uppercase or odd-length gate
    # would silently compare against a different byte threshold
    sample_hex = sample_hex.lower()
    if len(sample_hex) != 2 or any(
        c not in "0123456789abcdef" for c in sample_hex
    ):
        raise ValueError(
            f"sample_hex must be two lowercase hex chars, got {sample_hex!r}"
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def keep_and_fingerprint(batch: pa.Table) -> pa.Table:
        # the stopword scans (8 full-text regex passes) are skipped
        # when the rule is gated off — the battery's hottest part
        sig = gopher_signal_table(
            batch, compute_stopwords=use_stopword_rule
        )
        keep = np.ones(len(batch), np.int64)
        rules = [
            "keep_words",
            "keep_mean_wl",
            "keep_symbol",
            "keep_bullet",
            "keep_ellipsis",
            "keep_alpha",
        ] + (["keep_stop"] if use_stopword_rule else [])
        for rule in rules:
            keep &= sig[rule].to_numpy(zero_copy_only=False)
        mask = keep == 1
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[mask]
        langs = batch["lang"].to_numpy(zero_copy_only=False)[mask]
        nw = sig["n_words"].to_numpy(zero_copy_only=False)[mask]
        texts = batch["text"].to_numpy(zero_copy_only=False)[mask]
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        bucket = (
            np.array(
                [
                    int.from_bytes(bytes.fromhex(f[:8]), "big")
                    for f in fps
                ],
                np.int64,
            )
            % num_buckets
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "lang": pa.array(langs, pa.string()),
                "n_words": pa.array(nw.astype(np.int64)),
                "fp": pa.array(fps, pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def survivors(group: pd.DataFrame) -> pa.Table:
        # min doc_id per fingerprint, companion columns carried along
        g = group.sort_values("doc_id", kind="stable").drop_duplicates(
            "fp", keep="first"
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
                "n_words": pa.array(g["n_words"].to_numpy(np.int64)),
            }
        )

    def sample_gate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.array(
            [
                hashlib.md5(str(int(i)).encode()).hexdigest()[:2]
                < sample_hex
                for i in ids
            ],
            bool,
        )
        return batch.filter(pa.array(keep))

    def topk_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["n_words", "doc_id"], ascending=[False, True], kind="stable"
        )
        g = df.groupby("lang", sort=False).head(k)
        # pin lang — the downstream groupby KEY — so an all-filtered
        # (empty) block cannot degrade it to an arrow null column
        return from_pandas_typed(g, ("lang",))

    def topk_final(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["n_words", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.table(
            {
                "lang": pa.array(g["lang"].to_numpy(object), pa.string()),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "n_words": pa.array(g["n_words"].to_numpy(np.int64)),
                "rank_in_lang": pa.array(
                    np.arange(1, len(g) + 1, dtype=np.int64)
                ),
            }
        )

    return (
        docs.map_batches(keep_and_fingerprint, batch_format="pyarrow")
        .materialize()  # partials: the sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(survivors, batch_format="pandas")
        .map_batches(sample_gate, batch_format="pyarrow")
        .map_batches(topk_partial, batch_format="pyarrow")
        .materialize()  # partials before the language shuffle
        .groupby("lang")
        .map_groups(topk_final, batch_format="pandas")
    )
