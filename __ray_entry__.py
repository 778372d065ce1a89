"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in chug_ray) calls ray.init()/ray.shutdown().

Queries cover SURVEY.md §2's operator inventory re-expressed
Ray-Data-first plus the large-scale training-data ops (dedup families,
similarity search, text analysis, multimodal plumbing, stream-shaped
windows). Every SQL-expressible op has a DuckDB oracle with matching
column names; genuinely non-SQL ops (extraction pipeline, MinHash-LSH,
SimHash, LSH-ANN, media decode) are rows-only checked by the driver and
golden-checked in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

from chug_ray.ops.textstats import LANG_PROFILES

# ---------------------------------------------------------------------------
# extraction queries (the flagship; non-SQL → rows-only + pytest goldens)
# ---------------------------------------------------------------------------


def _build_extract_out(sf_dir: str, page_sampling: str):
    """One definition of the benchmark extraction setup (corpus → config
    → pipeline) so every entry-point queries the SAME configuration."""
    import ray.data

    from chug_ray.config import ExtractConfig
    from chug_ray.pipeline import broadcast_media_meta, build_extract_pipeline
    from chug_ray.synth import corpus_for_sf_dir

    docs_path, media_path, _ = corpus_for_sf_dir(sf_dir)
    cfg = ExtractConfig(
        page_sampling=page_sampling, seed=0, media_store_path=media_path
    )
    out = build_extract_pipeline(
        ray.data.read_parquet(docs_path),
        cfg,
        media_meta_ref=broadcast_media_meta(media_path),
    )
    return out, cfg, docs_path, media_path


def _extract_summary(sf_dir: str, page_sampling: str):
    """Run the extraction pipeline on the synthesized interleaved corpus
    for this scale factor; summarize per doc (stable schema, compact)."""
    import hashlib

    out, _, _, _ = _build_extract_out(sf_dir, page_sampling)

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_spans = pc.cast(
            pc.fill_null(pc.list_value_length(batch["spans"]), 0), pa.int64()
        )
        err_stage = pc.fill_null(pc.struct_field(batch["err"], "stage"), "")
        hashes = []
        for spans in batch["spans"].to_pylist():
            h = hashlib.blake2b(digest_size=8)
            for s in spans or []:
                h.update(
                    f"{s['kind']}\x00{s['text']}\x00{s['media_ref']}\x01".encode()
                )
            hashes.append(h.hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_spans": n_spans,
                "err_stage": err_stage,
                "spans_hash": pa.array(hashes, pa.string()),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def _extract_parity(sf_dir: str, page_sampling: str):
    """Driver-checkable extraction correctness: run the distributed
    pipeline AND the sequential per-doc oracle (the same ``extract_doc``
    the pytest goldens pin — `chug_ray/kernels/extract.py`) over the
    same corpus, compare per doc under span-sequence equality
    (kind, text, media_ref, offset) + parse + err stage, and emit
    (doc_id, matched). The comparison itself is distributed: both sides
    reduce to per-doc canonical hashes, then one groupby(doc_id) joins
    them — nothing materializes on the driver. The SQL oracle asserts
    every doc matched."""
    import hashlib

    import pandas as pd
    import ray.data

    from chug_ray.pipeline import _extract_doc_fn, _store_ref_for

    pipe_out, cfg, docs_path, media_path = _build_extract_out(
        sf_dir, page_sampling
    )

    def canon_hash(batch: pa.Table) -> pa.Table:
        hashes = []
        for spans, parse, err in zip(
            batch["spans"].to_pylist(),
            batch["parse"].to_pylist(),
            batch["err"].to_pylist(),
        ):
            h = hashlib.blake2b(digest_size=12)
            for s in spans or []:
                h.update(
                    f"{s['kind']}\x00{s['text']}\x00{s['media_ref']}"
                    f"\x00{s['offset']}\x01".encode()
                )
            if parse is not None:
                h.update(
                    f"P{parse['num_pages']}:"
                    f"{list(parse['page_indices'] or [])}".encode()
                )
            if err is not None:
                h.update(f"E{err['stage']}".encode())
            hashes.append(h.hexdigest())
        return pa.table(
            {"doc_id": batch["doc_id"], "h": pa.array(hashes, pa.string())}
        )

    def tag(side: str):
        import zlib

        def fn(batch: pa.Table) -> pa.Table:
            bkt = [
                zlib.crc32(str(d).encode()) % 64
                for d in batch["doc_id"].to_pylist()
            ]
            return batch.append_column(
                "side", pa.array([side] * len(batch), pa.string())
            ).append_column("bkt", pa.array(bkt, pa.int64()))

        return fn

    pipe = pipe_out.map_batches(
        canon_hash, batch_format="pyarrow"
    ).map_batches(tag("pipeline"), batch_format="pyarrow")
    oracle = (
        ray.data.read_parquet(docs_path)
        .map_batches(
            _extract_doc_fn(cfg.to_json(), _store_ref_for(media_path)),
            batch_format="pyarrow",
        )
        .map_batches(canon_hash, batch_format="pyarrow")
        .map_batches(tag("oracle"), batch_format="pyarrow")
    )

    def judge(group: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per hash bucket (per-doc map_groups calls
        # dominate wall time at tens of thousands of keys): matched ⇔
        # exactly one row per side and a single distinct hash
        counts = (
            group.groupby(["doc_id", "side"]).size().unstack(fill_value=0)
        )
        n_hashes = group.groupby("doc_id")["h"].nunique()
        matched = (
            (counts.get("pipeline", 0) == 1)
            & (counts.get("oracle", 0) == 1)
            & (n_hashes == 1)
        )
        return pd.DataFrame(
            {"doc_id": matched.index, "matched": matched.to_numpy()}
        )

    return pipe.union(oracle).groupby("bkt").map_groups(
        judge, batch_format="pandas"
    )


def _span_kind_stats(sf_dir: str, page_sampling: str = "all_valid"):
    """Extraction composed with the analytics layer: run the flagship
    pipeline, then aggregate its *output* spans by kind (count + total
    text chars) — the "how much text/media did extraction yield" report
    every corpus build ends with. Vectorized over the list<struct>
    column (flattened child arrays, no per-row Python); combiner →
    one tiny groupby(kind). Rows-only (extraction is not SQL); the
    per-doc span content is pinned by the parity queries and goldens."""
    import pyarrow.compute as pc

    out, _, _, _ = _build_extract_out(sf_dir, page_sampling)

    def partial(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        flat = spans.combine_chunks().flatten() if isinstance(
            spans, pa.ChunkedArray
        ) else spans.flatten()
        if len(flat) == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        kinds = flat.field("kind")
        chars = pc.fill_null(pc.utf8_length(flat.field("text")), 0)
        # pure-Arrow combiner: no Python string objects, no pandas frame
        g = (
            pa.table({"kind": kinds, "n_chars": pc.cast(chars, pa.int64())})
            .group_by("kind")
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
        )
        return pa.table(
            {
                "kind": g["kind"],
                "n_spans": pc.cast(g["n_chars_count"], pa.int64()),
                "n_chars": pc.cast(g["n_chars_sum"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": t["kind"],
                "n_spans": pc.cast(t["n_spans"], pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    return (
        out.map_batches(partial, batch_format="pyarrow")
        .materialize()  # partials: Ray's sort shuffle re-executes lazy
        # inputs — unpinned, the groupby would run the WHOLE extraction
        # pipeline twice (window.py NOTE)
        .groupby("kind")
        .aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("n_chars", alias_name="n_chars"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def entry() -> Any:
    """Flagship pipeline: interleaved-document extraction at sf0.001."""
    return _extract_summary("/root/testdata/sf0.001", "all_valid")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    from chug_ray.ops import (
        curation,
        dedup,
        graph,
        knn,
        pii,
        relational,
        selection,
        sources,
        textstats,
        tokenize,
        window,
    )
    from chug_ray.ops import media as media_ops
    from chug_ray.synth import corpus_for_sf_dir

    def _media_stats(sf_dir: str):
        _, media_path, _ = corpus_for_sf_dir(sf_dir)
        return media_ops.media_frame_stats(media_path)

    def _sample_frames(sf_dir: str):
        _, media_path, _ = corpus_for_sf_dir(sf_dir)
        return media_ops.sample_frames(media_path)

    def _imagespec_decode(sf_dir: str):
        _, media_path, _ = corpus_for_sf_dir(sf_dir)
        return media_ops.imagespec_decode(media_path, "rgba8")

    def _audio_windows(sf_dir: str):
        _, media_path, _ = corpus_for_sf_dir(sf_dir)
        return media_ops.audio_window_features(media_path, window=4096)

    def _phash_dups(sf_dir: str):
        _, media_path, _ = corpus_for_sf_dir(sf_dir)
        return media_ops.phash_dups(media_path)

    def _augment_frames(sf_dir: str):
        _, media_path, _ = corpus_for_sf_dir(sf_dir)
        return media_ops.augment_frames(media_path, size=(32, 32), seed=0)

    # NOTE on ordering: the driver's correctness harness records only the
    # FIRST 50 dict entries. The literal dict below keeps its historical
    # grouping; _R5_WINDOW (after the dict) re-orders the first 50 for the
    # round-5 rotation — the 44 entries that have never had a driver
    # CORRECTNESS row in rounds 1-4 (33 SQL-oracled + 11 rows-only), the
    # two flagship parity queries, and the 4 stalest r02-green entries.
    base = {
        # --- extraction parity: pipeline vs sequential per-doc oracle,
        # compared distributed; SQL oracle asserts matched=TRUE per doc
        "extract_parity_all_valid": lambda sf: _extract_parity(
            sf, "all_valid"
        ),
        "extract_parity_random": lambda sf: _extract_parity(sf, "random"),
        # --- TPC-H composites + sinks never in a driver window
        "regional_supplier_revenue": relational.regional_supplier_revenue,
        "shipping_priority": relational.shipping_priority,
        "order_priority_revenue": relational.order_priority_revenue,
        "customers_with_events": relational.customers_with_events,
        "export_tile_stats": selection.export_tile_stats,
        "decile_bucket": selection.decile_bucket,
        "top_docs_per_group": relational.top_docs_per_group,
        "uniform_sample_k": sources.uniform_sample_k,
        "hfds_stream_docs": sources.hfds_stream_docs,
        # --- new in round 4
        "substring_dedup": dedup.substring_dedup,
        "ngram_perplexity": textstats.ngram_perplexity,
        "c4_filter": textstats.c4_filter,
        "large_quantity_orders": relational.large_quantity_orders,
        "cheapest_supplier_per_part": relational.cheapest_supplier_per_part,
        "gopher_filter": textstats.gopher_filter,
        "rollup_revenue": relational.rollup_revenue,
        "bm25_search": textstats.bm25_search,
        "mad_outliers": textstats.mad_outliers,
        "weighted_sample_k": textstats.weighted_sample_k,
        "late_shipment_orders": relational.late_shipment_orders,
        "cust_order_distribution": relational.cust_order_distribution,
        "priority_line_counts": relational.priority_line_counts,
        "small_quantity_revenue": relational.small_quantity_revenue,
        "important_parts": relational.important_parts,
        "top_supplier": relational.top_supplier,
        "supplier_count_by_class": relational.supplier_count_by_class,
        "sole_late_supplier": relational.sole_late_supplier,
        "idle_rich_customers": relational.idle_rich_customers,
        "pii_redact": pii.pii_redact,
        "temperature_mixture": sources.temperature_mixture,
        "dsir_select": textstats.dsir_select,
        "semdedup": dedup.semdedup,  # no_oracle (k-means clusters)
        "kmeans_lloyd": knn.kmeans_lloyd,  # no_oracle (iterative)
        # --- new in round 4, session 3 (never driver-checked; these 15
        # close out the 50-entry window — 48 oracled + semdedup/kmeans)
        "promo_revenue": relational.promo_revenue,
        "discounted_revenue": relational.discounted_revenue,
        "returned_item_customers": relational.returned_item_customers,
        "nation_volume_shipping": relational.nation_volume_shipping,
        "train_test_split": textstats.train_test_split,
        "vocab_overlap": textstats.vocab_overlap,
        "collocations": textstats.collocations,
        "profit_by_nation_year": relational.profit_by_nation_year,
        "market_share": relational.market_share,
        "radius_search": knn.radius_search,
        "collapse_runs": textstats.collapse_runs,
        "dominant_suppliers": relational.dominant_suppliers,
        "sample_per_group": sources.sample_per_group,
        "grouped_moments": textstats.grouped_moments,
        "forecast_revenue_change": relational.forecast_revenue_change,
        # ------- entries below are outside the driver's 50-entry window
        # --- never driver-checked rows-only entries (first in line for
        # the round-5 rotation, with anything new added after this point)
        "span_kind_stats": _span_kind_stats,  # rows-only (extraction)
        "audio_window_features": _audio_windows,  # rows-only (PCM stand-in)
        "bpe_train": tokenize.bpe_train,  # rows-only (iterative argmax;
        # pinned against a sequential BPE in tests/test_bpe_train.py)
        # --- new in round 4, session 5 (oracled; never driver-checked —
        # first in line for the round-5 window rotation)
        "value_histogram": window.value_histogram,
        "user_entropy": window.user_entropy,
        "mode_per_group": textstats.mode_per_group,
        "monthly_revenue_series": relational.monthly_revenue_series,
        "pareto_frontier": selection.pareto_frontier,
        "fuzzy_name_pairs": dedup.fuzzy_name_pairs,
        "pagerank": graph.pagerank,  # rows-only (iterative; bit-exact
        # vs a sequential reference in tests/test_pagerank.py)
        "pearson_by_lang": textstats.pearson_by_lang,
        "winsorized_stats": textstats.winsorized_stats,
        "first_last_touch": window.first_last_touch,
        "triangle_count": graph.triangle_count,
        "part_pair_support": relational.part_pair_support,
        "embedding_covariance": knn.embedding_covariance,
        "pca_project": knn.pca_project,  # rows-only (LAPACK eigen solve;
        # bit-exact vs a sequential reference in tests/test_pca.py)
        "ols_by_lang": textstats.ols_by_lang,
        "pair_lift": relational.pair_lift,
        "retention_cohorts": window.retention_cohorts,
        "kcore": graph.kcore,  # rows-only (iterative peel; equal to a
        # sequential reference in tests/test_assoc_cohort_graph.py)
        "mahalanobis_outliers": knn.mahalanobis_outliers,  # rows-only
        # (LAPACK inverse; bit-exact vs sequential in tests/test_pca.py)
        "cube_revenue": relational.cube_revenue,
        "table_checksum": textstats.table_checksum,
        "hits": graph.hits,  # rows-only (iterative; bit-exact vs a
        # sequential reference in tests/test_assoc_cohort_graph.py)
        "char_entropy": textstats.char_entropy,
        "greedy_coverage": textstats.greedy_coverage,  # rows-only
        # (iterative greedy; equal to sequential in tests/test_greedy_coverage.py)
        "orders_per_nation": relational.orders_per_nation,
        "bounce_rate": window.bounce_rate,
        "hourly_anomalies": window.hourly_anomalies,
        "systematic_sample": selection.systematic_sample,
        "weighted_sample_per_lang": textstats.weighted_sample_per_lang,
        "k_anonymity": textstats.k_anonymity,
        "max_streak": window.max_streak,
        "balanced_shards": selection.balanced_shards,
        "balanced_lang_sample": textstats.balanced_lang_sample,
        "zorder_layout": selection.zorder_layout,
        "order_cadence": relational.order_cadence,
        "churned_users": window.churned_users,
        # --- new in round 4, session 4 (oracled; never driver-checked)
        "user_journey": window.user_journey,
        "sliding_distinct_users": window.sliding_distinct_users,
        "token_coverage": textstats.token_coverage,
        "phash_dups": _phash_dups,  # rows-only (payload decode)
        "approx_quantiles": window.approx_quantiles,  # rows-only (sketch)
        # --- r02-green (rows+schema+hash where oracled)
        "weighted_union": sources.weighted_union,
        "vqa_prompt": sources.vqa_prompt,
        "hfds_docs": sources.hfds_docs,
        "stratified_sample": sources.stratified_sample,
        "orders_by_segment": relational.orders_by_segment,
        "region_customer_stats": relational.region_customer_stats,
        "customers_without_events": relational.customers_without_events,
        # --- extraction pipeline (rows-only; oracle = pytest goldens)
        "extract_all_valid": lambda sf: _extract_summary(sf, "all_valid"),
        "extract_first": lambda sf: _extract_summary(sf, "first"),
        "extract_random": lambda sf: _extract_summary(sf, "random"),
        # --- multimodal plumbing (rows-only, r02-green)
        "media_frame_stats": _media_stats,
        "sample_frames": _sample_frames,
        "imagespec_decode": _imagespec_decode,
        # --- dedup — SQL-oracled where expressible (r03-green)
        "exact_dedup": dedup.exact_dedup,
        "dedup_survivors": dedup.dedup_survivors,
        "paragraph_dedup": dedup.paragraph_dedup,
        "dedup_clusters": dedup.dedup_clusters,
        "novel_docs": dedup.novel_docs,
        "train_test_containment": dedup.train_test_containment,
        "embedding_near_dup": dedup.embedding_near_dup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        # --- joins / relational (r03-green)
        "asof_last_order": relational.asof_last_order,
        "events_after_order": relational.events_after_order,
        "pricing_summary": relational.pricing_summary,
        "top_revenue_orders": relational.top_revenue_orders,
        # --- tokenize / packing (r03-green)
        "tokenize_ids": tokenize.tokenize_ids,
        "chunk_documents": tokenize.chunk_documents,
        "pack_sequences": window.pack_sequences,
        "text_targets": tokenize.text_targets,
        "distinctive_terms": textstats.distinctive_terms,
        # --- stream-shaped (events; r03-green)
        "sessionize": window.sessionize,
        "event_transitions": window.event_transitions,
        "user_event_pivot": window.user_event_pivot,
        "signup_conversion": window.signup_conversion,
        # ------- entries below are outside the driver's 50-entry window;
        # ------- all r03-green (or rows-only sketches pinned by pytest)
        "token_count": textstats.token_count,
        "quality_score": textstats.quality_score,
        "lang_id": textstats.lang_id,
        "fingerprint": textstats.fingerprint,
        "top_k_tokens": textstats.top_k_tokens,
        "chars_quantiles": textstats.chars_quantiles,
        "repetition_stats": textstats.repetition_stats,
        "clean_text": textstats.clean_text,
        "approx_distinct_tokens": textstats.approx_distinct_tokens,  # rows-only (sketch)
        "oov_rate": textstats.oov_rate,
        "cms_heavy_hitters": textstats.cms_heavy_hitters,  # rows-only (sketch)
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,  # rows-only
        "minhash_clusters": dedup.minhash_clusters,  # rows-only (approx pairs)
        "simhash": textstats.simhash,  # rows-only
        # --- similarity search (embeddings)
        "knn_bruteforce": knn.knn_bruteforce,
        "knn_lsh": knn.knn_lsh,  # rows-only (approximate)
        "knn_ivf": knn.knn_ivf,  # rows-only (approximate)
        "embedding_stats": knn.embedding_stats,
        "kmeans_assign": knn.kmeans_assign,  # rows-only (iterative)
        # --- stream-shaped (events)
        "tumbling_window": window.tumbling_window,
        "hopping_window": window.hopping_window,
        "event_type_stats": window.event_type_stats,
        "running_user_totals": window.running_user_totals,
        "rolling_user_sum": window.rolling_user_sum,
        "hourly_active_users": window.hourly_active_users,
        "percent_rank_in_lang": textstats.percent_rank_in_lang,
        # --- relational / operator inventory demos
        "filter_project": relational.filter_project,
        "explode_tokens": relational.explode_tokens,
        "docs_by_lang_source": relational.docs_by_lang_source,
        "flatten_props": sources.flatten_props,  # r02-green, rotated out
        # keyed-RNG train augmentation stack (SURVEY §2.11 random half;
        # rows-only: pixel warps aren't SQL-expressible). Appended last —
        # the r05 window above is frozen.
        "augment_frames": _augment_frames,
        # SQL-oracled graph closures (appended after the frozen window):
        # min-label components + hop-capped BFS, both reproducible by
        # DuckDB recursive CTEs over the same md5-sampled edge set
        "connected_components": graph.connected_components,
        "bfs_hops": graph.bfs_hops,
        # composed end-to-end curation recipe (filter→dedup→sample→
        # select), one lazy plan, one SQL oracle for the whole chain
        "curation_pipeline": curation.curation_pipeline,
    }

    # Round-5 window rotation (VERDICT r4 task #1): the driver records only
    # the first 50 dict entries, so lead with everything that has never had
    # a driver CORRECTNESS row in any round.
    _R5_WINDOW = [
        # 33 SQL-oracled, never driver-checked (r4 sessions 3-5)
        "value_histogram", "user_entropy", "mode_per_group",
        "monthly_revenue_series", "pareto_frontier", "fuzzy_name_pairs",
        "pearson_by_lang", "winsorized_stats", "first_last_touch",
        "triangle_count", "part_pair_support", "embedding_covariance",
        "ols_by_lang", "pair_lift", "retention_cohorts", "cube_revenue",
        "table_checksum", "char_entropy", "orders_per_nation",
        "bounce_rate", "hourly_anomalies", "systematic_sample",
        "weighted_sample_per_lang", "k_anonymity", "max_streak",
        "balanced_shards", "balanced_lang_sample", "zorder_layout",
        "order_cadence", "churned_users", "user_journey",
        "sliding_distinct_users", "token_coverage",
        # 11 rows-only, never driver-checked (each pinned by pytest)
        "span_kind_stats", "audio_window_features", "bpe_train",
        "pagerank", "pca_project", "kcore", "mahalanobis_outliers",
        "hits", "greedy_coverage", "phash_dups", "approx_quantiles",
        # flagship extraction parity (r04-green; keep visible in the
        # final round's window)
        "extract_parity_all_valid", "extract_parity_random",
        # round-5 additions, never driver-checked — in-window so they
        # get a driver row in their first round (displacing the two
        # stalest r02-green refreshes, which keep sweep + pytest
        # evidence): recursive-CTE-oracled graph closures, the
        # chain-oracled end-to-end curation recipe, and the keyed-RNG
        # augmentation stack (rows-only)
        "connected_components", "bfs_hops",
        "curation_pipeline", "augment_frames",
    ]
    ordered = {k: base[k] for k in _R5_WINDOW}
    ordered.update({k: v for k, v in base.items() if k not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered on the same parquet tables)
# ---------------------------------------------------------------------------

_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _lang_scores_sql() -> str:
    parts = []
    for lang, words in LANG_PROFILES.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        parts.append(
            f"len(regexp_extract_all(lower(text), '{pat}')) AS score_{lang}"
        )
    return ", ".join(parts)


def _gopher_stop_sql() -> str:
    from chug_ray.ops.textstats import GOPHER_STOPWORDS

    terms = [
        f"(CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPWORDS
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _bm25_oracle_sql(k: int = 10) -> str:
    """BM25 oracle with the exact expression tree the Ray op evaluates
    (same association order), so the doubles are bit-identical."""
    from chug_ray.ops.textstats import BM25_QUERIES

    terms = sorted({t for q in BM25_QUERIES for t in q})
    tf_cols = ",\n                       ".join(
        f"CAST(len(regexp_extract_all(lower(text), '\\b{t}\\b')) AS DOUBLE)"
        f" AS tf_{t}"
        for t in terms
    )
    per_query = []
    for qi, q in enumerate(BM25_QUERIES):
        contribs = " + ".join(
            f"(ln(1 + (g.n_docs - f.df_{t} + 0.5) / (f.df_{t} + 0.5))"
            f" * ((tf_{t} * 2.2)"
            f" / (tf_{t} + 1.2 * (0.25 + 0.75 * dl / (g.tot / g.n_docs)))))"
            for t in q
        )
        hits = " + ".join(
            f"(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)" for t in q
        )
        per_query.append(f"""
            SELECT query_id, doc_id, rank, round(score, 4) AS score FROM (
                SELECT CAST({qi} AS BIGINT) AS query_id, doc_id, score,
                       CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                            AS BIGINT) AS rank
                FROM (SELECT doc_id, ({contribs}) AS score,
                             ({hits}) AS n_hits
                      FROM d CROSS JOIN g CROSS JOIN f) WHERE n_hits > 0
            ) WHERE rank <= {k}""")
    df_cols = ", ".join(
        f"(SELECT count(*) FROM documents"
        f" WHERE regexp_matches(lower(text), '\\b{t}\\b')) AS df_{t}"
        for t in terms
    )
    union = "\n            UNION ALL".join(per_query)
    return f"""
            WITH d AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS DOUBLE) AS dl,
                       {tf_cols}
                FROM documents
            ), g AS (
                SELECT count(*) AS n_docs,
                       sum(CAST(len(regexp_extract_all(lower(text),
                           '[a-z0-9]+')) AS BIGINT)) AS tot
                FROM documents
            ), f AS (
                SELECT {df_cols}
            )
            {union}
        """


def _pii_oracle() -> str:
    from chug_ray.ops.pii import pii_oracle_sql

    return pii_oracle_sql()


def oracle_sql() -> dict[str, str]:
    return {
        "token_count": f"""
            SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "quality_score": f"""
            WITH s AS (
                SELECT doc_id,
                       CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
                       CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|a|to)\\b')) AS BIGINT) AS n_stopwords
                FROM documents
            )
            SELECT doc_id, n_tokens, n_punct, n_stopwords,
                   CAST(CASE WHEN n_tokens >= 10 AND n_stopwords > 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
            FROM s
        """,
        "lang_id": f"""
            WITH s AS (SELECT doc_id, {_lang_scores_sql()} FROM documents)
            SELECT doc_id,
                   CAST(score_en AS BIGINT) AS score_en,
                   CAST(score_fr AS BIGINT) AS score_fr,
                   CAST(score_de AS BIGINT) AS score_de,
                   CAST(score_es AS BIGINT) AS score_es,
                   CASE WHEN score_en >= score_fr AND score_en >= score_de AND score_en >= score_es THEN 'en'
                        WHEN score_fr >= score_de AND score_fr >= score_es THEN 'fr'
                        WHEN score_de >= score_es THEN 'de'
                        ELSE 'es' END AS pred_lang
            FROM s
        """,
        "fingerprint": "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
        "tokenize_ids": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            v AS (SELECT token, row_number() OVER (ORDER BY token) AS id
                  FROM (SELECT DISTINCT unnest(toks) AS token FROM t)),
            e AS (SELECT doc_id, unnest(toks) AS token,
                         CAST(unnest(range(len(toks))) AS BIGINT) AS pos FROM t)
            SELECT e.doc_id, e.pos, CAST(v.id AS BIGINT) AS token_id
            FROM e JOIN v USING (token) WHERE e.pos < 32
        """,
        "text_targets": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            v AS (SELECT token, row_number() OVER (ORDER BY token) AS id
                  FROM (SELECT DISTINCT unnest(toks) AS token FROM t)),
            e AS (SELECT doc_id, unnest(toks) AS token,
                         CAST(unnest(range(len(toks))) AS BIGINT) AS pos FROM t),
            tr AS (SELECT e.doc_id, e.pos, CAST(v.id AS BIGINT) AS token_id, e.token
                   FROM e JOIN v USING (token) WHERE e.pos < 32),
            ft AS (SELECT doc_id, token AS first_token FROM tr WHERE pos = 0),
            pe AS (SELECT tr.doc_id, max(tr.pos) AS prompt_end
                   FROM tr JOIN ft ON tr.doc_id = ft.doc_id AND tr.token = ft.first_token
                   GROUP BY tr.doc_id),
            grid AS (SELECT doc_id, CAST(unnest(range(32)) AS BIGINT) AS pos FROM documents)
            SELECT g.doc_id, g.pos,
                   COALESCE(tr.token_id, 0) AS input_id,
                   CASE WHEN tr.token_id IS NULL THEN -100
                        WHEN g.pos <= pe.prompt_end THEN -100
                        ELSE tr.token_id END AS target_id
            FROM grid g
            LEFT JOIN tr ON g.doc_id = tr.doc_id AND g.pos = tr.pos
            LEFT JOIN pe ON g.doc_id = pe.doc_id
        """,
        "chunk_documents": f"""
            WITH t AS (
                SELECT doc_id, {_TOK} AS toks FROM documents
            ), c AS (
                SELECT doc_id, toks,
                       CAST(ceil(len(toks) / 32.0) AS BIGINT) AS nc
                FROM t WHERE len(toks) > 0
            )
            SELECT c.doc_id, CAST(g.i AS BIGINT) AS chunk_idx,
                   array_to_string(c.toks[g.i * 32 + 1 : (g.i + 1) * 32], ' ')
                       AS chunk_text,
                   CAST(least(len(c.toks) - g.i * 32, 32) AS BIGINT)
                       AS n_tokens
            FROM c, LATERAL (SELECT unnest(range(c.nc)) AS i) g(i)
        """,
        "pack_sequences": f"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len({_TOK}) AS BIGINT) AS n_tokens
                FROM documents
            ), r AS (
                SELECT doc_id, n_tokens,
                       SUM(n_tokens) OVER (
                           ORDER BY doc_id ROWS UNBOUNDED PRECEDING
                       ) AS running
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(floor((running - n_tokens) / 512.0) AS BIGINT) AS seq_id
            FROM r
        """,
        "exact_dedup": """
            SELECT md5(text) AS fp_md5,
                   CAST(min(doc_id) AS BIGINT) AS doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "dedup_survivors": """
            WITH s AS (
                SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
                FROM documents GROUP BY md5(text)
            )
            SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
            FROM documents d JOIN s USING (doc_id)
        """,
        "distinctive_terms": f"""
            WITH e AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM e GROUP BY doc_id, token),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
            r AS (SELECT t.doc_id, t.token, t.tf, d.df,
                         row_number() OVER (
                             PARTITION BY t.doc_id
                             ORDER BY t.tf DESC, d.df ASC, t.token ASC
                         ) AS rnk
                  FROM tf t JOIN df d USING (token))
            SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 3
        """,
        "top_k_tokens": f"""
            WITH t AS (SELECT unnest({_TOK}) AS token FROM documents),
            c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
            SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT 20
        """,
        "token_coverage": f"""
            WITH tc AS (
                SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT lang, unnest({_TOK}) AS tok FROM documents)
                GROUP BY lang, tok
            ), r AS (
                SELECT lang, c,
                       sum(c) OVER (
                           PARTITION BY lang ORDER BY c DESC, tok ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum,
                       sum(c) OVER (PARTITION BY lang) AS tot
                FROM tc
            )
            SELECT lang,
                   CAST(max(tot) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_size,
                   CAST(sum(CASE WHEN 100*(cum-c) < 90*tot THEN 1 ELSE 0 END)
                        AS BIGINT) AS nucleus_size,
                   CAST(max(CASE WHEN 100*(cum-c) < 90*tot THEN cum ELSE 0 END)
                        AS BIGINT) AS nucleus_tokens
            FROM r GROUP BY lang
        """,
        "chars_quantiles": """
            SELECT lang, CAST(25 AS BIGINT) AS p_pct,
                   CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS value
            FROM documents GROUP BY lang
            UNION ALL SELECT lang, 50, CAST(quantile_disc(n_chars, 0.50) AS BIGINT)
            FROM documents GROUP BY lang
            UNION ALL SELECT lang, 75, CAST(quantile_disc(n_chars, 0.75) AS BIGINT)
            FROM documents GROUP BY lang
            UNION ALL SELECT lang, 95, CAST(quantile_disc(n_chars, 0.95) AS BIGINT)
            FROM documents GROUP BY lang
            UNION ALL SELECT lang, 99, CAST(quantile_disc(n_chars, 0.99) AS BIGINT)
            FROM documents GROUP BY lang
        """,
        "clean_text": """
            SELECT doc_id,
                   trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean_text,
                   CAST(length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS BIGINT)
                       AS n_clean_chars
            FROM documents
        """,
        "oov_rate": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS tok FROM documents
            ), vocab AS (
                SELECT tok FROM (
                    SELECT tok, count(*) AS n FROM tok GROUP BY tok
                    ORDER BY n DESC, tok ASC LIMIT 1000
                )
            ), per_doc AS (
                SELECT t.doc_id,
                       count(*) AS n_tokens,
                       count(*) FILTER (v.tok IS NULL) AS n_oov
                FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
                GROUP BY t.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
                   CASE WHEN p.n_tokens > 0
                        THEN CAST(round(CAST(p.n_oov AS DOUBLE) / p.n_tokens * 10000, 0) AS BIGINT)
                        ELSE 0 END AS oov_rate_e4
            FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
        """,
        "novel_docs": """
            SELECT d.doc_id, d.lang, d.source, d.n_chars
            FROM documents d
            WHERE d.source <> 'src0'
              AND NOT EXISTS (
                    SELECT 1 FROM documents r
                    WHERE r.source = 'src0' AND md5(r.text) = md5(d.text)
              )
        """,
        "train_test_containment": f"""
            WITH t AS (
                SELECT doc_id, source, list_distinct({_TOK}) AS toks
                FROM documents
            ), ev AS (
                SELECT doc_id, toks FROM t WHERE source = 'src0'
            ), tr AS (
                SELECT toks FROM t WHERE source <> 'src0'
            ), p AS (
                SELECT ev.doc_id,
                       CASE WHEN len(ev.toks) = 0 THEN 0.0
                            ELSE CAST(len(list_intersect(ev.toks, tr.toks)) AS DOUBLE)
                                   / len(ev.toks)
                       END AS cont
                FROM ev CROSS JOIN tr
            )
            SELECT doc_id,
                   CAST(round(max(cont) * 10000, 0) AS BIGINT) AS max_containment_e4,
                   CAST(count(*) FILTER (cont >= 0.8) AS BIGINT) AS n_hits
            FROM p GROUP BY doc_id
        """,
        "repetition_stats": f"""
            WITH t AS (
                SELECT doc_id, {_TOK} AS toks FROM documents
            ), u AS (
                SELECT doc_id, unnest(toks) AS tok FROM t
            ), c AS (
                SELECT doc_id, tok, count(*) AS c FROM u GROUP BY doc_id, tok
            ), a AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS n_unique,
                       CAST(max(c) AS BIGINT) AS top_c
                FROM c GROUP BY doc_id
            ), bgr AS (
                SELECT t.doc_id, t.toks[i] || ' ' || t.toks[i + 1] AS bg
                FROM t, LATERAL (
                    SELECT unnest(generate_series(1, len(t.toks) - 1)) AS i
                ) g(i)
            ), bc AS (
                SELECT doc_id, bg, count(*) AS c FROM bgr GROUP BY doc_id, bg
            ), ba AS (
                SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg
                FROM bc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.n_unique, 0) AS n_unique,
                   CASE WHEN a.n_tokens > 0
                        THEN CAST(round((1 - CAST(a.n_unique AS DOUBLE) / a.n_tokens) * 10000, 0) AS BIGINT)
                        ELSE 0 END AS dup_token_frac_e4,
                   CASE WHEN a.n_tokens > 0
                        THEN CAST(round(CAST(a.top_c AS DOUBLE) / a.n_tokens * 10000, 0) AS BIGINT)
                        ELSE 0 END AS top_token_frac_e4,
                   CASE WHEN ba.n_bg > 0
                        THEN CAST(round(CAST(ba.top_bg AS DOUBLE) / ba.n_bg * 10000, 0) AS BIGINT)
                        ELSE 0 END AS top_bigram_frac_e4
            FROM documents d
            LEFT JOIN a ON a.doc_id = d.doc_id
            LEFT JOIN ba ON ba.doc_id = d.doc_id
        """,
        "paragraph_dedup": """
            WITH p AS (
                SELECT doc_id, string_split(text, chr(10)) AS paras FROM documents
            ), e AS (
                SELECT doc_id, CAST(unnest(range(len(paras))) AS BIGINT) AS pos,
                       unnest(paras) AS para
                FROM p
            ), ne AS (
                -- explicit ASCII whitespace set, matching the engine's
                -- strip(" \\t\\r\\n\\x0b\\x0c") on tab/CR-only lines
                SELECT * FROM e
                WHERE trim(para, ' ' || chr(9) || chr(13) || chr(10)
                                 || chr(11) || chr(12)) <> ''
            ), w AS (
                SELECT doc_id, pos, para,
                       row_number() OVER (
                           PARTITION BY para ORDER BY doc_id, pos
                       ) AS rn
                FROM ne
            ), k AS (
                SELECT doc_id, pos, para FROM w WHERE rn = 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_paras,
                   CAST(COALESCE(ck.n, 0) AS BIGINT) AS n_kept,
                   COALESCE(agg.txt, '') AS text_kept
            FROM documents d
            LEFT JOIN (SELECT doc_id, count(*) AS n FROM ne GROUP BY doc_id) cn
                   USING (doc_id)
            LEFT JOIN (SELECT doc_id, count(*) AS n FROM k GROUP BY doc_id) ck
                   USING (doc_id)
            LEFT JOIN (SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS txt
                       FROM k GROUP BY doc_id) agg
                   USING (doc_id)
        """,
        "substring_dedup": f"""
            WITH t AS (
                SELECT doc_id, {_TOK} AS toks FROM documents
            ), w AS (
                SELECT doc_id,
                       CAST(unnest(range(len(toks) - 5 + 1)) AS BIGINT) AS pos,
                       toks
                FROM t WHERE len(toks) >= 5
            ), wg AS (
                -- md5 of the space-joined 5-gram: matches the engine's key
                SELECT doc_id, pos,
                       md5(array_to_string(toks[pos + 1 : pos + 5], ' ')) AS g
                FROM w
            ), m AS (
                SELECT g, min(doc_id * 1048576 + pos) AS mn FROM wg GROUP BY g
            ), dup AS (
                SELECT wg.doc_id, wg.pos
                FROM wg JOIN m ON wg.g = m.g
                WHERE wg.doc_id * 1048576 + wg.pos > m.mn
            ), cov AS (
                SELECT DISTINCT dup.doc_id, dup.pos + o.off AS tpos
                FROM dup CROSS JOIN (SELECT unnest(range(5)) AS off) o
            ), e AS (
                SELECT doc_id, unnest(toks) AS tok,
                       CAST(unnest(range(len(toks))) AS BIGINT) AS tpos
                FROM t
            ), kept AS (
                SELECT e.doc_id, e.tok, e.tpos
                FROM e LEFT JOIN cov
                  ON e.doc_id = cov.doc_id AND e.tpos = cov.tpos
                WHERE cov.doc_id IS NULL
            )
            SELECT t.doc_id,
                   CAST(len(t.toks) AS BIGINT) AS n_tokens,
                   CAST(greatest(len(t.toks) - 5 + 1, 0) AS BIGINT) AS n_windows,
                   CAST(COALESCE(dc.n, 0) AS BIGINT) AS n_dup_windows,
                   CAST(COALESCE(kc.n, 0) AS BIGINT) AS n_kept,
                   COALESCE(kc.txt, '') AS text_kept
            FROM t
            LEFT JOIN (SELECT doc_id, count(*) AS n FROM dup GROUP BY doc_id) dc
                   USING (doc_id)
            LEFT JOIN (SELECT doc_id, count(*) AS n,
                              string_agg(tok, ' ' ORDER BY tpos) AS txt
                       FROM kept GROUP BY doc_id) kc
                   USING (doc_id)
        """,
        "ngram_perplexity": f"""
            WITH t AS (
                SELECT doc_id, {_TOK} AS toks FROM documents
            ), b0 AS (
                SELECT doc_id,
                       unnest(toks[1 : len(toks) - 1]) AS w1,
                       unnest(toks[2 : len(toks)]) AS w2
                FROM t WHERE len(toks) >= 2
            ), b AS (
                SELECT doc_id, w1 || ' ' || w2 AS bg FROM b0
            ), c AS (
                SELECT bg, count(*) AS cnt FROM b GROUP BY bg
            ), topm AS (
                SELECT bg, cnt FROM c ORDER BY cnt DESC, bg LIMIT 5000
            ), sc AS (
                SELECT b.doc_id,
                       count(*) AS n_bigrams,
                       count(topm.bg) AS n_hits,
                       COALESCE(sum(CAST(floor(log2(topm.cnt)) AS BIGINT)), 0)
                         AS log2_score
                FROM b LEFT JOIN topm USING (bg) GROUP BY b.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(sc.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(COALESCE(sc.log2_score, 0) AS BIGINT) AS log2_score
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        "c4_filter": f"""
            WITH s AS (
                SELECT doc_id,
                       CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                       CAST(len(regexp_extract_all(lower(text),
                            '\\b(the|and|of|a|to)\\b')) AS BIGINT) AS n_stop,
                       {_lang_scores_sql()},
                       md5(text) AS fp
                FROM documents
            ), q AS (
                SELECT doc_id,
                       CAST(CASE WHEN n_tokens >= 10 AND n_stop > 0
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_quality,
                       CAST(CASE WHEN score_en >= score_fr
                                  AND score_en >= score_de
                                  AND score_en >= score_es
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_lang,
                       fp
                FROM s
            ), w AS (
                SELECT fp, min(doc_id) AS keeper FROM q GROUP BY fp
            )
            SELECT q.doc_id, q.keep_quality, q.keep_lang,
                   CAST(CASE WHEN q.doc_id = w.keeper THEN 1 ELSE 0 END
                        AS BIGINT) AS keep_dedup,
                   CAST(q.keep_quality * q.keep_lang *
                        (CASE WHEN q.doc_id = w.keeper THEN 1 ELSE 0 END)
                        AS BIGINT) AS keep
            FROM q JOIN w USING (fp)
        """,
        "large_quantity_orders": """
            WITH t AS (
                SELECT l_orderkey AS o_orderkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS BIGINT)) > 150
            )
            SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, t.total_qty
            FROM t JOIN orders o USING (o_orderkey)
        """,
        "cheapest_supplier_per_part": """
            WITH l AS (
                SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                       CAST(round(l_extendedprice * (1 - l_discount)
                                  / l_quantity * 100) AS BIGINT) AS unit_cents
                FROM lineitem
            ), r AS (
                SELECT p_partkey, s_suppkey, unit_cents,
                       row_number() OVER (
                           PARTITION BY p_partkey
                           ORDER BY unit_cents, s_suppkey
                       ) AS rn
                FROM l
            )
            SELECT r.p_partkey, CAST(r.s_suppkey AS BIGINT) AS s_suppkey,
                   s.s_name, r.unit_cents
            FROM r JOIN supplier s USING (s_suppkey) WHERE rn = 1
        """,
        "gopher_filter": f"""
            WITH s AS (
                SELECT doc_id,
                       CAST(len({_TOK}) AS BIGINT) AS n_words,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]'))
                            AS BIGINT) AS word_chars,
                       CAST(len(regexp_extract_all(lower(text),
                            '[a-z0-9]*[a-z][a-z0-9]*')) AS BIGINT)
                            AS n_alpha_words,
                       CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                            AS BIGINT) AS n_symbols,
                       CAST(len(regexp_extract_all(text, '\\n')) + 1
                            AS BIGINT) AS n_lines,
                       CAST(len(regexp_extract_all(text, '(?m)^[ \\t]*[-*]'))
                            AS BIGINT) AS n_bullet_lines,
                       CAST(len(regexp_extract_all(text, '(?m)\\.\\.\\.$'))
                            AS BIGINT) AS n_ellipsis_lines,
                       {_gopher_stop_sql()} AS n_stop_distinct
                FROM documents
            ), k AS (
                SELECT *,
                       CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_words,
                       CAST(CASE WHEN word_chars >= 3 * n_words
                                  AND word_chars <= 10 * n_words
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_mean_wl,
                       CAST(CASE WHEN 10 * n_symbols <= n_words
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_symbol,
                       CAST(CASE WHEN 10 * n_bullet_lines <= 9 * n_lines
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_bullet,
                       CAST(CASE WHEN 10 * n_ellipsis_lines <= 3 * n_lines
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_ellipsis,
                       CAST(CASE WHEN 5 * n_alpha_words >= 4 * n_words
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_alpha,
                       CAST(CASE WHEN n_stop_distinct >= 2
                            THEN 1 ELSE 0 END AS BIGINT) AS keep_stop
                FROM s
            )
            SELECT doc_id, n_words, word_chars, n_alpha_words, n_symbols,
                   n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_distinct,
                   keep_words, keep_mean_wl, keep_symbol, keep_bullet,
                   keep_ellipsis, keep_alpha, keep_stop,
                   keep_words * keep_mean_wl * keep_symbol * keep_bullet
                     * keep_ellipsis * keep_alpha * keep_stop AS keep
            FROM k
        """,
        # composed curation chain: gopher keep → min-doc_id-per-md5(text)
        # survivors → md5(doc_id) subsample gate → per-lang top-20 by
        # (n_words DESC, doc_id ASC) — one expression chain verifying the
        # whole recipe end-to-end (same rule battery as gopher_filter)
        "curation_pipeline": f"""
            WITH s AS (
                SELECT doc_id, lang, text,
                       CAST(len({_TOK}) AS BIGINT) AS n_words,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]'))
                            AS BIGINT) AS word_chars,
                       CAST(len(regexp_extract_all(lower(text),
                            '[a-z0-9]*[a-z][a-z0-9]*')) AS BIGINT)
                            AS n_alpha_words,
                       CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                            AS BIGINT) AS n_symbols,
                       CAST(len(regexp_extract_all(text, '\\n')) + 1
                            AS BIGINT) AS n_lines,
                       CAST(len(regexp_extract_all(text, '(?m)^[ \\t]*[-*]'))
                            AS BIGINT) AS n_bullet_lines,
                       CAST(len(regexp_extract_all(text, '(?m)\\.\\.\\.$'))
                            AS BIGINT) AS n_ellipsis_lines,
                       {_gopher_stop_sql()} AS n_stop_distinct
                FROM documents
            ),
            g AS (
                -- the six structural Gopher rules; the stopword rule is
                -- parameter-gated off (synthetic vocabulary has none)
                SELECT doc_id, lang, text, n_words FROM s
                WHERE n_words >= 50 AND n_words <= 100000
                  AND word_chars >= 3 * n_words
                  AND word_chars <= 10 * n_words
                  AND 10 * n_symbols <= n_words
                  AND 10 * n_bullet_lines <= 9 * n_lines
                  AND 10 * n_ellipsis_lines <= 3 * n_lines
                  AND 5 * n_alpha_words >= 4 * n_words
            ),
            surv AS (
                SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text)
            ),
            samp AS (
                SELECT g.lang, g.doc_id, g.n_words
                FROM g JOIN surv USING (doc_id)
                WHERE substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 2) < 'c0'
            ),
            r AS (
                SELECT lang, doc_id, n_words,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY n_words DESC, doc_id
                       ) AS rank_in_lang
                FROM samp
            )
            SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, n_words,
                   CAST(rank_in_lang AS BIGINT) AS rank_in_lang
            FROM r WHERE rank_in_lang <= 20
        """,
        "rollup_revenue": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus)
                        AS BIGINT) AS lvl,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                        AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "bm25_search": _bm25_oracle_sql(),
        "late_shipment_orders": """
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_late_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o.o_orderpriority
        """,
        "cust_order_distribution": """
            WITH c AS (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
                GROUP BY c.c_custkey
            )
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM c GROUP BY c_count
        """,
        "priority_line_counts": """
            SELECT l.l_returnflag,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                                 ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                        AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                                 ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                        AS BIGINT) AS low_line_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l.l_returnflag
        """,
        "small_quantity_revenue": """
            WITH s AS (
                SELECT l.l_partkey,
                       sum(CAST(l.l_quantity AS BIGINT)) AS sum_qty,
                       count(*) AS cnt
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_brand = 'Brand#1'
                GROUP BY l.l_partkey
            )
            SELECT CAST(COALESCE(sum(CAST(round(l.l_extendedprice * 100)
                                          AS BIGINT)), 0) AS BIGINT)
                       AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
            WHERE 5 * CAST(l.l_quantity AS BIGINT) * s.cnt < s.sum_qty
        """,
        "pii_redact": _pii_oracle(),
        "dsir_select": f"""
            WITH tok AS (
                SELECT doc_id, lang, unnest({_TOK}) AS w FROM documents
            ), c AS (
                SELECT w, count(*) AS nc,
                       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt
                FROM tok GROUP BY w
            ), top AS (
                SELECT w, CAST(floor(log2(1 + nt)) - floor(log2(1 + nc))
                               AS BIGINT) AS wgt
                FROM c ORDER BY nc DESC, w LIMIT 5000
            ), s AS (
                SELECT t.doc_id, count(*) AS n_tokens,
                       COALESCE(sum(tp.wgt), 0) AS score
                FROM tok t LEFT JOIN top tp ON t.w = tp.w
                GROUP BY t.doc_id
            )
            SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank,
                   doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(score AS BIGINT) AS score
            FROM s ORDER BY score DESC, doc_id LIMIT 50
        """,
        "temperature_mixture": """
            WITH c AS (
                SELECT source, count(*) AS n FROM documents GROUP BY source
            ), t AS (
                SELECT source,
                       CAST(floor(least(1.0, 2.0 * pow(CAST(n AS DOUBLE),
                                                       -0.5))
                                  * 4294967296.0) AS BIGINT) AS thr
                FROM c
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN t USING (source)
            WHERE CAST((CAST(d.doc_id AS HUGEINT) * 2654435761)
                       % 4294967296 AS BIGINT) < t.thr
        """,
        "important_parts": """
            WITH v AS (
                SELECT l_partkey AS p_partkey,
                       sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 100) AS BIGINT)) AS value_cents
                FROM lineitem GROUP BY l_partkey
            )
            SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents
            FROM v
            WHERE value_cents > (SELECT (CAST(sum(value_cents) AS HUGEINT)
                                         * 1300) // (count(*) * 1000)
                                 FROM v)
        """,
        "top_supplier": """
            WITH r AS (
                SELECT l_suppkey AS s_suppkey,
                       sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 100) AS BIGINT)) AS total_revenue_cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(r.total_revenue_cents AS BIGINT) AS total_revenue_cents
            FROM r JOIN supplier s ON r.s_suppkey = s.s_suppkey
            WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents)
                                           FROM r)
        """,
        "supplier_count_by_class": """
            SELECT p.p_brand, p.p_type,
                   CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p.p_brand, p.p_type
        """,
        "sole_late_supplier": """
            WITH l1 AS (
                SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
                FROM lineitem GROUP BY l_orderkey, l_suppkey
            ), j AS (
                SELECT l1.l_orderkey, l1.l_suppkey,
                       CASE WHEN l1.ms > o.o_orderdate + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END AS late
                FROM l1 JOIN orders o ON l1.l_orderkey = o.o_orderkey
            ), f AS (
                SELECT l_suppkey FROM j
                WHERE late = 1
                  AND 1 = (SELECT sum(late) FROM j x
                           WHERE x.l_orderkey = j.l_orderkey)
                  AND 2 <= (SELECT count(*) FROM j x
                            WHERE x.l_orderkey = j.l_orderkey)
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(count(*) AS BIGINT) AS numwait
            FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
            GROUP BY s.s_suppkey, s.s_name
        """,
        "idle_rich_customers": """
            WITH cb AS (
                SELECT c_custkey, c_mktsegment,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                FROM customer
            ), t AS (
                SELECT sum(cents) AS s, count(*) AS n
                FROM cb WHERE cents > 0
            )
            SELECT c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(c.cents) AS BIGINT) AS totacctbal_cents
            FROM cb c, t
            WHERE c.cents * t.n > t.s
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY c.c_mktsegment
        """,
        "mad_outliers": """
            WITH m AS (
                SELECT lang, quantile_disc(n_chars, 0.5) AS med
                FROM documents GROUP BY lang
            ), a AS (
                SELECT d.lang,
                       quantile_disc(abs(d.n_chars - m.med), 0.5) AS mad
                FROM documents d JOIN m USING (lang) GROUP BY d.lang
            )
            SELECT d.doc_id, d.lang, d.n_chars,
                   CAST(m.med AS BIGINT) AS med,
                   CAST(a.mad AS BIGINT) AS mad,
                   CAST(CASE WHEN abs(d.n_chars - m.med) > 3 * a.mad
                        THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
            FROM documents d JOIN m USING (lang) JOIN a ON d.lang = a.lang
        """,
        "weighted_sample_k": """
            WITH s AS (
                SELECT doc_id, n_chars,
                       ln((CAST((CAST(doc_id AS HUGEINT) * 2654435761)
                                % 4294967296 AS DOUBLE) + 0.5) / 4294967296)
                         / CAST(n_chars AS DOUBLE) AS skey
                FROM documents
            )
            SELECT CAST(row_number() OVER (ORDER BY skey DESC, doc_id)
                        AS BIGINT) AS rank,
                   doc_id, n_chars, round(skey, 8) AS sample_key
            FROM s ORDER BY skey DESC, doc_id LIMIT 20
        """,
        "ngram_jaccard_pairs": f"""
            WITH t AS (
                SELECT doc_id, lang, source, list_distinct({_TOK}) AS toks
                FROM documents
            ), p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                         / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) AS jac
                FROM t a JOIN t b
                  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM p WHERE jac >= 0.8
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE t AS (
                SELECT doc_id, lang, source, list_distinct({_TOK}) AS toks
                FROM documents
            ), p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM t a JOIN t b
                  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                        / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.8
            ), edges AS (
                SELECT doc_a AS a, doc_b AS b FROM p
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM p
            ), reach AS (
                SELECT a AS node, b AS peer FROM edges
                UNION
                SELECT r.node, e.b AS peer FROM reach r JOIN edges e ON e.a = r.peer
            ), cl AS (
                SELECT node, LEAST(node, MIN(peer)) AS cluster_id
                FROM reach GROUP BY node
            )
            SELECT d.doc_id,
                   COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
                   CAST(d.doc_id = COALESCE(cl.cluster_id, d.doc_id) AS BIGINT) AS is_survivor
            FROM documents d LEFT JOIN cl ON cl.node = d.doc_id
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   CAST(round(list_cosine_similarity(a.embedding, b.embedding) * 10000, 0) AS BIGINT) AS cos_sim_e4
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 8),
                 c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
                 s AS (SELECT q.query_id, c.vec_id,
                              list_cosine_similarity(q.embedding, c.embedding) AS sim
                       FROM q CROSS JOIN c),
                 r AS (SELECT query_id, vec_id, sim,
                              row_number() OVER (PARTITION BY query_id
                                                 ORDER BY sim DESC, vec_id ASC) AS rank
                       FROM s)
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank,
                   CAST(round(sim * 10000, 0) AS BIGINT) AS cos_sim_e4
            FROM r WHERE rank <= 10
        """,
        "embedding_stats": """
            WITH v AS (
                SELECT label,
                       list_transform(
                           embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)
                       ) AS comp_e4
                FROM embeddings
            ), pv AS (
                SELECT label,
                       list_aggregate(comp_e4, 'sum') AS sum_comp_e4,
                       list_aggregate(
                           list_transform(comp_e4, x -> x * x), 'sum'
                       ) AS norm_sq_e8
                FROM v
            )
            SELECT label,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(sum_comp_e4) AS BIGINT) AS sum_comp_e4,
                   CAST(min(norm_sq_e8) AS BIGINT) AS min_norm_sq_e8,
                   CAST(max(norm_sq_e8) AS BIGINT) AS max_norm_sq_e8
            FROM pv GROUP BY label
        """,
        "tumbling_window": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY 1, 2
        """,
        "hopping_window": """
            WITH h AS (
                SELECT unnest([
                         CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP),
                         CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP)
                       ]) AS window_start,
                       event_type,
                       CAST(round(value * 10000, 0) AS BIGINT) AS value_e4
                FROM events
            )
            SELECT window_start, event_type, count(*) AS n_events,
                   CAST(sum(value_e4) AS BIGINT) AS sum_value_e4
            FROM h GROUP BY 1, 2
        """,
        "running_user_totals": """
            SELECT event_id, user_id, ts,
                   CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS running_e4
            FROM events
        """,
        "event_transitions": """
            WITH o AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events
            )
            SELECT prev_type, event_type, count(*) AS n
            FROM o WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "signup_conversion": """
            WITH s AS (
                SELECT user_id, min(ts) AS signup_ts
                FROM events WHERE event_type = 'signup' GROUP BY user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS first_purchase_ts
                FROM events e JOIN s ON s.user_id = e.user_id
                           AND e.ts >= s.signup_ts
                WHERE e.event_type = 'purchase'
                GROUP BY e.user_id
            )
            SELECT CAST(s.user_id AS BIGINT) AS user_id, s.signup_ts,
                   p.first_purchase_ts,
                   CAST(p.first_purchase_ts IS NOT NULL AS BIGINT) AS converted
            FROM s LEFT JOIN p USING (user_id)
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
                   CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_value_e4
            FROM events GROUP BY user_id
        """,
        "percent_rank_in_lang": """
            SELECT doc_id, lang, n_chars,
                   CAST(round(PERCENT_RANK() OVER (
                       PARTITION BY lang ORDER BY n_chars
                   ) * 10000, 0) AS BIGINT) AS pct_rank_e4
            FROM documents
        """,
        "hourly_active_users": """
            SELECT date_trunc('hour', ts) AS window_start,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "user_journey": """
            WITH ranked AS (
                SELECT user_id, event_type, ts, event_id,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS rn
                FROM events
            ), agg AS (
                SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY user_id
            ), j AS (
                SELECT user_id,
                       string_agg(event_type, '>' ORDER BY ts, event_id)
                           AS journey
                FROM ranked WHERE rn <= 12 GROUP BY user_id
            )
            SELECT agg.user_id AS user_id, agg.n_events AS n_events,
                   j.journey AS journey
            FROM agg JOIN j USING (user_id)
        """,
        "sliding_distinct_users": """
            WITH hu AS (
                SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
                FROM events
            ), hours AS (SELECT DISTINCT h FROM hu)
            SELECT hours.h AS hour,
                   CAST(count(DISTINCT hu.user_id) AS BIGINT) AS users_24h
            FROM hours JOIN hu
              ON hu.h >= hours.h - INTERVAL 23 HOUR AND hu.h <= hours.h
            GROUP BY hours.h
        """,
        "rolling_user_sum": """
            SELECT event_id, user_id, ts,
                   CAST(SUM(CAST(round(value * 10000, 0) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS rolling_e4
            FROM events
        """,
        "asof_last_order": """
            WITH cand AS (
                SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
                       row_number() OVER (
                           PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                       ) AS rn
                FROM events e
                JOIN orders o ON o.o_custkey = e.user_id
                             AND o.o_orderdate <= e.ts
            )
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(user_id AS BIGINT) AS user_id,
                   CAST(o_orderkey AS BIGINT) AS last_orderkey,
                   o_orderdate AS last_orderdate
            FROM cand WHERE rn = 1
        """,
        "regional_supplier_revenue": """
            SELECT n.n_name,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND s.s_nationkey = c.c_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
        """,
        "order_priority_revenue": """
            SELECT o.o_orderpriority, l.l_returnflag,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        """,
        "shipping_priority": """
            SELECT l.l_orderkey,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   o.o_orderdate, o.o_orderpriority
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-03-15'
              AND l.l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY 1, 3, 4
            ORDER BY revenue_cents DESC, l_orderkey ASC
            LIMIT 10
        """,
        "events_after_order": """
            SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
                   CAST(o.o_custkey AS BIGINT) AS user_id,
                   CAST(count(e.user_id) AS BIGINT) AS n_events_7d,
                   CAST(COALESCE(sum(CAST(round(e.value * 10000, 0) AS BIGINT)), 0) AS BIGINT) AS sum_value_e4
            FROM orders o
            LEFT JOIN events e ON e.user_id = o.o_custkey
                              AND e.ts >= o.o_orderdate
                              AND e.ts < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY 1, 2
        """,
        "region_customer_stats": """
            SELECT r.r_name, c.c_mktsegment, count(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        """,
        "customers_without_events": """
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
            FROM customer
            WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)
        """,
        "customers_with_events": """
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
            FROM customer
            WHERE c_custkey IN (SELECT DISTINCT user_id FROM events)
        """,
        "event_type_stats": """
            SELECT event_type, count(*) AS n,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "sessionize": """
            WITH o AS (
                SELECT event_id, ts, user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM o
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
            FROM s GROUP BY user_id, session_id
        """,
        "filter_project": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars >= 200 AND lang IN ('en', 'fr')
        """,
        "explode_tokens": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents)
            SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
                   unnest(toks) AS token
            FROM t
        """,
        "docs_by_lang_source": """
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang, source
        """,
        "weighted_union": """
            SELECT doc_id, source, lang FROM documents
            WHERE (source = 'src0' AND doc_id % 100 < 70)
               OR (source <> 'src0' AND doc_id % 100 < 30)
        """,
        "export_tile_stats": """
            WITH t AS (
                SELECT n_chars,
                       NTILE(8) OVER (ORDER BY n_chars, doc_id) AS tile
                FROM documents
            )
            SELECT CAST(tile AS BIGINT) AS tile, count(*) AS n_rows,
                   CAST(min(n_chars) AS BIGINT) AS min_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM t GROUP BY tile
        """,
        "decile_bucket": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS decile
            FROM documents
        """,
        "top_docs_per_group": """
            WITH r AS (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id ASC
                       ) AS rank
                FROM documents
            )
            SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars
            FROM r WHERE rank <= 5
        """,
        "hfds_docs": """
            SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
        """,
        # the stream path must yield exactly the same row SET (the
        # driver compare sorts before hashing, so shuffle order is free)
        "hfds_stream_docs": """
            SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
        """,
        "uniform_sample_k": """
            SELECT doc_id, lang, n_chars FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 100
        """,
        "stratified_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE doc_id % 10 < CASE lang WHEN 'en' THEN 5
                                          WHEN 'fr' THEN 3
                                          ELSE 1 END
        """,
        "flatten_props": """
            SELECT event_id, event_type,
                   CAST(COALESCE(json_extract(props, '$.k'),
                                 json_extract(props, '$.key'),
                                 json_extract(props, '$.value'), -1) AS BIGINT) AS k
            FROM events
        """,
        "vqa_prompt": """
            WITH q AS (
                SELECT doc_id,
                       'what is the language of doc ' || CAST(doc_id AS VARCHAR) AS question,
                       CASE WHEN n_chars % 2 = 0 THEN lang ELSE source END AS answer
                FROM documents
            )
            SELECT doc_id, question, answer,
                   '<s_question>' || question || '</s_question><s_answer>' AS prompt_eval,
                   '<s_question>' || question || '</s_question><s_answer>'
                     || answer || '</s_answer>' AS prompt_train
            FROM q
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            WITH r AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT l_orderkey, revenue_cents FROM r
            ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10
        """,
        "orders_by_segment": """
            SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_price_cents
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "promo_revenue": """
            SELECT CAST(COALESCE(sum(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                       ELSE 0 END), 0) AS BIGINT) AS promo_cents,
                   CAST(COALESCE(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)), 0) AS BIGINT) AS total_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
              AND l.l_shipdate < TIMESTAMP '1996-10-01'
        """,
        "discounted_revenue": """
            SELECT CAST(COALESCE(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
               OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
               OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
        """,
        "returned_item_customers": """
            WITH rev AS (
                SELECT o.o_custkey AS c_custkey,
                       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS revenue_cents
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o.o_orderdate < TIMESTAMP '1996-04-01'
                GROUP BY o.o_custkey
            ),
            top AS (
                SELECT * FROM rev
                ORDER BY revenue_cents DESC, c_custkey ASC LIMIT 20
            )
            SELECT t.c_custkey, c.c_name,
                   CAST(t.revenue_cents AS BIGINT) AS revenue_cents,
                   CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
                   n.n_name
            FROM top t
            JOIN customer c ON t.c_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "nation_volume_shipping": """
            WITH j AS (
                SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                       CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT) AS cents
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation sn ON s.s_nationkey = sn.n_nationkey
                JOIN nation cn ON c.c_nationkey = cn.n_nationkey
                WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
                       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
                  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate < TIMESTAMP '1998-01-01'
            )
            SELECT supp_nation, cust_nation, l_year,
                   CAST(sum(cents) AS BIGINT) AS revenue_cents
            FROM j GROUP BY supp_nation, cust_nation, l_year
        """,
        "train_test_split": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 1000 AS BIGINT) AS hash_bucket,
                   CASE WHEN (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 1000 < 100
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        """,
        "vocab_overlap": f"""
            WITH t AS (SELECT source, {_TOK} AS toks FROM documents),
            v AS (
                SELECT DISTINCT source, token
                FROM (SELECT source, unnest(toks) AS token FROM t)
            ),
            sizes AS (SELECT source, count(*) AS n FROM v GROUP BY source),
            pairs AS (
                SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
                FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT p.src_a, p.src_b, CAST(p.shared AS BIGINT) AS shared,
                   CAST(sa.n AS BIGINT) AS vocab_a,
                   CAST(sb.n AS BIGINT) AS vocab_b,
                   CAST((CAST(p.shared AS HUGEINT) * 1000000)
                        // (sa.n + sb.n - p.shared) AS BIGINT) AS jaccard_e6
            FROM pairs p
            JOIN sizes sa ON p.src_a = sa.source
            JOIN sizes sb ON p.src_b = sb.source
        """,
        "collocations": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            tok AS (
                SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
                       unnest(toks) AS token
                FROM t
            ),
            uni AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
            n AS (SELECT count(*) AS total FROM tok),
            big AS (
                SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS c_xy
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                GROUP BY 1, 2
                HAVING count(*) >= 5
            ),
            scored AS (
                SELECT tok_a, tok_b, c_xy,
                       CAST((CAST(c_xy AS HUGEINT) * 1000000 * (SELECT total FROM n))
                            // (CAST(ua.c AS HUGEINT) * ub.c) AS BIGINT) AS pmi_ratio_e6
                FROM big
                JOIN uni ua ON tok_a = ua.token
                JOIN uni ub ON tok_b = ub.token
            )
            SELECT tok_a, tok_b, CAST(c_xy AS BIGINT) AS c_xy, pmi_ratio_e6
            FROM scored
            ORDER BY pmi_ratio_e6 DESC, tok_a ASC, tok_b ASC LIMIT 20
        """,
        "profit_by_nation_year": """
            WITH pcost AS (
                SELECT p_partkey,
                       CAST(round(p_retailprice * 10, 0) AS BIGINT) AS unit_cost_cents
                FROM part WHERE p_name LIKE '%rod%'
            )
            SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                            - CAST(l.l_quantity AS BIGINT) * pcost.unit_cost_cents)
                        AS BIGINT) AS profit_cents
            FROM lineitem l
            JOIN pcost ON l.l_partkey = pcost.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY n.n_name, year(o.o_orderdate)
        """,
        "market_share": """
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
                            THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS nation_cents,
                   CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
            GROUP BY 1
        """,
        "radius_search": """
            WITH q AS (SELECT vec_id AS query_id, embedding
                       FROM embeddings WHERE vec_id < 8),
                 c AS (SELECT vec_id, embedding
                       FROM embeddings WHERE vec_id >= 8),
                 s AS (SELECT q.query_id, c.vec_id,
                              CAST(round(list_cosine_similarity(q.embedding, c.embedding) * 10000, 0)
                                   AS BIGINT) AS cos_sim_e4
                       FROM q CROSS JOIN c)
            SELECT query_id, vec_id, cos_sim_e4
            FROM s WHERE cos_sim_e4 >= 2500
        """,
        "collapse_runs": f"""
            WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            tok AS (
                SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
                       unnest(toks) AS token
                FROM t
            ),
            runs AS (
                SELECT doc_id, pos, token,
                       lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                FROM tok
            ),
            dedup AS (
                SELECT doc_id,
                       string_agg(token, ' ' ORDER BY pos) AS text_clean,
                       count(*) AS n_kept
                FROM runs WHERE prev IS NULL OR token <> prev
                GROUP BY doc_id
            )
            SELECT t.doc_id,
                   COALESCE(d.text_clean, '') AS text_clean,
                   CAST(COALESCE(d.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(len(t.toks) - COALESCE(d.n_kept, 0) AS BIGINT) AS n_removed
            FROM t LEFT JOIN dedup d ON t.doc_id = d.doc_id
        """,
        "dominant_suppliers": """
            WITH w AS (
                SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
            ),
            ps AS (
                SELECT l_partkey, l_suppkey, sum(qty) AS supp_qty
                FROM w GROUP BY 1, 2
            ),
            pt AS (SELECT l_partkey, sum(qty) AS part_qty FROM w GROUP BY 1)
            SELECT ps.l_partkey AS p_partkey, p.p_name,
                   ps.l_suppkey AS s_suppkey, s.s_name,
                   CAST(ps.supp_qty AS BIGINT) AS supp_qty,
                   CAST(pt.part_qty AS BIGINT) AS part_qty
            FROM ps
            JOIN pt ON ps.l_partkey = pt.l_partkey
            JOIN part p ON ps.l_partkey = p.p_partkey
            JOIN supplier s ON ps.l_suppkey = s.s_suppkey
            WHERE 2 * ps.supp_qty > pt.part_qty
        """,
        "sample_per_group": """
            WITH r AS (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM documents
            )
            SELECT doc_id, lang, n_chars FROM r WHERE rk <= 10
        """,
        "grouped_moments": f"""
            WITH s AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS x,
                       CAST(len({_TOK}) AS BIGINT) AS y
                FROM documents
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM s GROUP BY lang
        """,
        "forecast_revenue_change": """
            SELECT CAST(COALESCE(sum(
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * CAST(round(l_discount * 100, 0) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_e4,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND round(l_discount * 100, 0) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "value_histogram": """
            WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
            r AS (
                SELECT CASE WHEN hi = lo THEN 0.0
                            ELSE least(floor((value - lo) * 20.0 / (hi - lo)),
                                       19.0) END AS binf,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events, b
            ),
            a AS (
                SELECT CAST(binf AS BIGINT) AS bin,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(cents) AS BIGINT) AS sum_cents
                FROM r GROUP BY 1
            )
            SELECT bin, lo + CAST(bin AS DOUBLE) * (hi - lo) / 20.0 AS lo_edge,
                   n, sum_cents
            FROM a, b
        """,
        "user_entropy": """
            WITH c AS (
                SELECT user_id,
                       CAST(count(*) FILTER (WHERE event_type = 'click') AS DOUBLE) AS na,
                       CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE) AS nb,
                       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS nc,
                       CAST(count(*) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS nd,
                       CAST(count(*) FILTER (WHERE event_type = 'view') AS DOUBLE) AS ne
                FROM events GROUP BY user_id
            ),
            e AS (
                SELECT user_id, na + nb + nc + nd + ne AS total,
                       CASE WHEN na > 0 THEN na * ln(na) ELSE 0.0 END
                     + CASE WHEN nb > 0 THEN nb * ln(nb) ELSE 0.0 END
                     + CASE WHEN nc > 0 THEN nc * ln(nc) ELSE 0.0 END
                     + CASE WHEN nd > 0 THEN nd * ln(nd) ELSE 0.0 END
                     + CASE WHEN ne > 0 THEN ne * ln(ne) ELSE 0.0 END AS s
                FROM c
            )
            SELECT user_id, CAST(total AS BIGINT) AS n_events,
                   CAST(floor((ln(total) - s / total) * 1000000.0 + 0.5)
                        AS BIGINT) AS entropy_e6
            FROM e
        """,
        "mode_per_group": """
            WITH c AS (
                SELECT lang, n_chars, CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY lang, n_chars
            )
            SELECT lang, n_chars AS mode_n_chars, n AS n_docs FROM c
            QUALIFY row_number() OVER (
                PARTITION BY lang ORDER BY n DESC, n_chars ASC) = 1
        """,
        "monthly_revenue_series": """
            WITH m AS (
                SELECT CAST(date_part('year', o_orderdate) AS BIGINT) * 12
                       + CAST(date_part('month', o_orderdate) AS BIGINT) - 1 AS ym,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders
            ),
            a AS (SELECT ym, CAST(sum(cents) AS BIGINT) AS revenue_cents,
                         CAST(count(*) AS BIGINT) AS n_orders
                  FROM m GROUP BY ym),
            b AS (SELECT min(ym) AS lo, max(ym) AS hi FROM m),
            s AS (SELECT unnest(generate_series(lo, hi)) AS ym FROM b)
            SELECT CAST(s.ym // 12 AS BIGINT) AS year,
                   CAST(s.ym % 12 + 1 AS BIGINT) AS month,
                   COALESCE(a.revenue_cents, 0) AS revenue_cents,
                   COALESCE(a.n_orders, 0) AS n_orders
            FROM s LEFT JOIN a USING (ym)
        """,
        "pareto_frontier": """
            SELECT p.p_partkey, p.p_retailprice,
                   CAST(p.p_size AS BIGINT) AS p_size
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))
        """,
        "fuzzy_name_pairs": """
            WITH d AS (
                SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n
                FROM part GROUP BY p_name
            )
            SELECT a.name AS name_a, b.name AS name_b,
                   a.n AS n_a, b.n AS n_b
            FROM d a JOIN d b
              ON a.name < b.name AND levenshtein(a.name, b.name) = 1
        """,
        "pearson_by_lang": """
            WITH s AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS x,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS y
                FROM documents
            ),
            m AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * x) AS BIGINT) AS sxx,
                       CAST(sum(y * y) AS BIGINT) AS syy,
                       CAST(sum(x * y) AS BIGINT) AS sxy
                FROM s GROUP BY lang
            ),
            r AS (
                SELECT lang, n,
                       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS num,
                       (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                       AS den
                FROM m
            )
            SELECT lang, n,
                   CAST(CASE WHEN num / den < 0
                             THEN -floor(abs(num / den) * 1000000.0 + 0.5)
                             ELSE floor(abs(num / den) * 1000000.0 + 0.5)
                        END AS BIGINT) AS r_e6
            FROM r WHERE den > 0
        """,
        "winsorized_stats": """
            WITH q AS (
                SELECT lang,
                       CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS lo,
                       CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS hi
                FROM documents GROUP BY lang
            )
            SELECT d.lang, q.lo, q.hi,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(GREATEST(LEAST(CAST(d.n_chars AS BIGINT), q.hi),
                                     q.lo)) AS BIGINT) AS sum_clipped
            FROM documents d JOIN q USING (lang)
            GROUP BY d.lang, q.lo, q.hi
        """,
        # DOULION-sampled co-supplier triangle count: the md5 hex
        # compare mirrors graph._edge_keep_mask's first-byte cut of 32
        # ('20' hex) exactly (lexicographic 2-hex-char compare ==
        # numeric byte compare)
        "triangle_count": """
            WITH os AS (
                SELECT DISTINCT l_orderkey o, l_suppkey s FROM lineitem
            ),
            e0 AS (
                SELECT DISTINCT a.s u, b.s v
                FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
            ),
            e AS (
                SELECT u, v FROM e0
                WHERE substr(md5(u || '-' || v), 1, 2) < '20'
            )
            SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT count(*)
                         FROM e e1
                         JOIN e e2 ON e1.v = e2.u
                         JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
                        AS BIGINT) AS n_triangles
        """,
        # min-label connected components over the same md5-sampled edge
        # set: the recursive closure propagates every label along edges
        # and MIN(lab) per node is exactly the min-node-id fixpoint the
        # Ray union-find / min-label propagation converges to
        "connected_components": """
            WITH RECURSIVE os AS (
                SELECT DISTINCT l_orderkey o, l_suppkey s FROM lineitem
            ),
            e0 AS (
                SELECT DISTINCT a.s u, b.s v
                FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
            ),
            e AS (
                SELECT u, v FROM e0
                WHERE substr(md5(u || '-' || v), 1, 2) < '20'
            ),
            sym AS (
                SELECT u AS node, v AS nbr FROM e
                UNION ALL
                SELECT v, u FROM e
            ),
            reach(node, lab) AS (
                SELECT node, node FROM (SELECT DISTINCT node FROM sym)
                UNION
                SELECT s.nbr, r.lab
                FROM reach r JOIN sym s ON s.node = r.node
            ),
            comp AS (
                SELECT node, MIN(lab) AS component FROM reach GROUP BY node
            )
            SELECT CAST(c.node AS BIGINT) AS supp,
                   CAST(c.component AS BIGINT) AS component,
                   CAST(z.sz AS BIGINT) AS comp_size
            FROM comp c
            JOIN (SELECT component, count(*) AS sz
                  FROM comp GROUP BY component) z USING (component)
        """,
        # hop-capped BFS walk from the smallest node id in the sampled
        # edge set; MIN(d) per node = exact hop distance (cap mirrors
        # the Ray side's max_hops=64 eccentricity bound)
        "bfs_hops": """
            WITH RECURSIVE os AS (
                SELECT DISTINCT l_orderkey o, l_suppkey s FROM lineitem
            ),
            e0 AS (
                SELECT DISTINCT a.s u, b.s v
                FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
            ),
            e AS (
                SELECT u, v FROM e0
                WHERE substr(md5(u || '-' || v), 1, 2) < '20'
            ),
            sym AS (
                SELECT u AS node, v AS nbr FROM e
                UNION ALL
                SELECT v, u FROM e
            ),
            walk(node, d) AS (
                SELECT MIN(LEAST(u, v)), 0 FROM e HAVING COUNT(*) > 0
                UNION
                SELECT s.nbr, w.d + 1
                FROM walk w JOIN sym s ON s.node = w.node
                WHERE w.d < 64
            )
            SELECT CAST(node AS BIGINT) AS supp,
                   CAST(MIN(d) AS BIGINT) AS hops
            FROM walk GROUP BY node
        """,
        "part_pair_support": """
            WITH op AS (
                SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem
            )
            SELECT a.p AS p1, b.p AS p2,
                   CAST(count(*) AS BIGINT) AS support
            FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "embedding_covariance": """
            WITH x AS (
                SELECT vec_id,
                       CAST(CASE WHEN v < 0
                                 THEN -floor(abs(v) * 1000000.0 + 0.5)
                                 ELSE floor(abs(v) * 1000000.0 + 0.5)
                            END AS BIGINT) AS xe,
                       i
                FROM (SELECT vec_id,
                             CAST(unnest(embedding) AS DOUBLE) AS v,
                             unnest(range(len(embedding))) AS i
                      FROM embeddings)
            )
            SELECT a.i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(a.xe) AS BIGINT) AS si,
                   CAST(sum(b.xe) AS BIGINT) AS sj,
                   CAST(sum(a.xe * b.xe) AS BIGINT) AS gram
            FROM x a JOIN x b USING (vec_id) WHERE a.i <= b.i
            GROUP BY 1, 2
        """,
        "ols_by_lang": """
            WITH s AS (
                SELECT lang, CAST(n_chars AS BIGINT) AS x,
                       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS y
                FROM documents
            ),
            m AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * x) AS BIGINT) AS sxx,
                       CAST(sum(x * y) AS BIGINT) AS sxy
                FROM s GROUP BY lang
            ),
            r AS (
                SELECT lang, n,
                       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS num,
                       (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS den,
                       CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                       CAST(n AS DOUBLE) AS nd
                FROM m
            ),
            f AS (
                SELECT lang, n, num / den AS slope,
                       (syd - (num / den) * sxd) / nd AS icept
                FROM r WHERE den > 0
            )
            SELECT lang, n,
                   CAST(CASE WHEN slope < 0
                             THEN -floor(abs(slope) * 1000000.0 + 0.5)
                             ELSE floor(abs(slope) * 1000000.0 + 0.5)
                        END AS BIGINT) AS slope_e6,
                   CAST(CASE WHEN icept < 0
                             THEN -floor(abs(icept) * 1000000.0 + 0.5)
                             ELSE floor(abs(icept) * 1000000.0 + 0.5)
                        END AS BIGINT) AS intercept_e6
            FROM f
        """,
        "pair_lift": """
            WITH op AS (
                SELECT DISTINCT l_orderkey o, l_partkey p FROM lineitem
            ),
            ps AS (SELECT p, CAST(count(*) AS BIGINT) s FROM op GROUP BY p),
            nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) n FROM op),
            pairs AS (
                SELECT a.p p1, b.p p2, CAST(count(*) AS BIGINT) support
                FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
                GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            f AS (
                SELECT p1, p2, support,
                       CAST(support AS DOUBLE) / CAST(sa.s AS DOUBLE) AS conf,
                       CAST(nn.n AS DOUBLE) * CAST(support AS DOUBLE)
                         / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE))
                         AS lift
                FROM pairs JOIN ps sa ON sa.p = pairs.p1
                           JOIN ps sb ON sb.p = pairs.p2 CROSS JOIN nn
            )
            SELECT p1, p2, support,
                   CAST(floor(abs(conf) * 1000000.0 + 0.5) AS BIGINT)
                       AS conf_e6,
                   CAST(floor(abs(lift) * 1000000.0 + 0.5) AS BIGINT)
                       AS lift_e6
            FROM f
        """,
        "cube_revenue": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100, 0) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "table_checksum": """
            SELECT CAST(sum(('0x' || substr(md5(doc_id || '|' || lang
                           || '|' || CAST(n_chars AS VARCHAR)), 1, 8)
                           )::BIGINT) % 4294967296 AS BIGINT) AS checksum,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM documents
        """,
        "order_cadence": """
            WITH g AS (
                SELECT o_custkey custkey, CAST(count(*) AS BIGINT)
                           n_orders,
                       CAST(datediff('day', min(o_orderdate),
                                     max(o_orderdate)) AS BIGINT)
                           span_days
                FROM orders GROUP BY 1 HAVING count(*) >= 2
            )
            SELECT custkey, n_orders, span_days,
                   CAST(floor(CAST(span_days AS DOUBLE)
                              / (CAST(n_orders AS DOUBLE) - 1.0)
                              * 1000000.0 + 0.5) AS BIGINT) AS avg_gap_e6
            FROM g
        """,
        "churned_users": """
            WITH pu AS (
                SELECT user_id, max(ts) lst,
                       CAST(count(*) AS BIGINT) n_events
                FROM events GROUP BY 1
            ),
            gm AS (SELECT max(lst) g FROM pu)
            SELECT user_id, n_events,
                   CAST((epoch_us(g) - epoch_us(lst)) // 86400000000
                        AS BIGINT) AS days_inactive,
                   epoch_us(g) - epoch_us(lst) > 1 * 86400000000
                       AS churned
            FROM pu CROSS JOIN gm
        """,
        "zorder_layout": """
            WITH b AS (
                SELECT CAST(min(n_chars) AS BIGINT) xmin,
                       CAST(max(n_chars) AS BIGINT)
                           - CAST(min(n_chars) AS BIGINT) + 1 xspan,
                       CAST(min(doc_id) AS BIGINT) ymin,
                       CAST(max(doc_id) AS BIGINT)
                           - CAST(min(doc_id) AS BIGINT) + 1 yspan
                FROM documents
            ),
            q AS (
                SELECT (CAST(n_chars AS BIGINT) - xmin) * 65536 // xspan
                           AS x16,
                       (CAST(doc_id AS BIGINT) - ymin) * 65536 // yspan
                           AS y16
                FROM documents CROSS JOIN b
            ),
            z AS (
                SELECT list_sum(list_transform(range(16), i ->
                           (((x16 >> i) & 1) << (2 * i + 1))
                           + (((y16 >> i) & 1) << (2 * i)))) AS code
                FROM q
            ),
            a AS (
                SELECT CAST(code AS BIGINT) code,
                       CAST(code AS BIGINT) >> 28 AS zfile
                FROM z
            )
            SELECT CAST(zfile AS BIGINT) zfile,
                   CAST(count(*) AS BIGINT) n_docs,
                   CAST(min(code) AS BIGINT) code_min,
                   CAST(max(code) AS BIGINT) code_max
            FROM a GROUP BY 1
        """,
        "balanced_lang_sample": """
            WITH lc AS (
                SELECT lang, CAST(count(*) AS BIGINT) c
                FROM documents GROUP BY lang
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN lc USING (lang)
            WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                  )::BIGINT
                  < CAST(floor(40.0 / c * 4294967296.0) AS BIGINT)
        """,
        "balanced_shards": """
            WITH r AS (
                SELECT CAST(n_chars AS BIGINT) cst,
                       ROW_NUMBER() OVER (ORDER BY n_chars DESC,
                                          doc_id ASC) - 1 AS rank
                FROM documents
            ),
            a AS (
                SELECT cst,
                       CASE WHEN (rank // 16) % 2 = 0 THEN rank % 16
                            ELSE 15 - rank % 16 END AS shard
                FROM r
            )
            SELECT CAST(shard AS BIGINT) shard,
                   CAST(count(*) AS BIGINT) n_docs,
                   CAST(sum(cst) AS BIGINT) cost_sum
            FROM a GROUP BY 1
        """,
        "k_anonymity": """
            SELECT lang, source,
                   CAST(n_chars // 100 AS BIGINT) AS chars_bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5
        """,
        "max_streak": """
            WITH ud AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS DATE) d
                FROM events
            ),
            r AS (
                SELECT user_id, d,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY d) rk
                FROM ud
            ),
            isl AS (
                SELECT user_id, d - CAST(rk AS INTEGER) island FROM r
            ),
            runs AS (
                SELECT user_id, island, CAST(count(*) AS BIGINT) run
                FROM isl GROUP BY 1, 2
            ),
            act AS (
                SELECT user_id, CAST(count(*) AS BIGINT) n_active_days
                FROM ud GROUP BY 1
            )
            SELECT runs.user_id,
                   CAST(max(run) AS BIGINT) max_streak_days,
                   any_value(n_active_days) n_active_days
            FROM runs JOIN act USING (user_id) GROUP BY 1
        """,
        "weighted_sample_per_lang": """
            WITH s AS (
                SELECT lang, doc_id, CAST(n_chars AS BIGINT) n_chars,
                       ln(((CAST(doc_id AS HUGEINT) * 2654435761)
                           % 4294967296 + 0.5) / 4294967296.0)
                       / CAST(n_chars AS DOUBLE) AS skey
                FROM documents
            ),
            r AS (
                SELECT lang, doc_id, n_chars, skey,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY skey DESC, doc_id ASC)
                           AS rank
                FROM s
            )
            SELECT lang, CAST(rank AS BIGINT) rank, doc_id, n_chars,
                   round(skey, 8) AS sample_key
            FROM r WHERE rank <= 5
        """,
        "hourly_anomalies": """
            WITH h AS (
                SELECT date_trunc('hour', ts) hr,
                       CAST(count(*) AS BIGINT) n
                FROM events GROUP BY 1
            ),
            m AS (
                SELECT CAST(count(*) AS BIGINT) k,
                       CAST(sum(n) AS BIGINT) s,
                       CAST(sum(n * n) AS BIGINT) ss
                FROM h
            ),
            z AS (
                SELECT hr, n,
                       (CAST(n AS DOUBLE)
                        - CAST(s AS DOUBLE) / CAST(k AS DOUBLE))
                       / sqrt(CAST(k * ss - s * s AS DOUBLE)
                              / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)))
                           AS zv
                FROM h CROSS JOIN m WHERE k * ss - s * s > 0
            )
            SELECT strftime(hr, '%Y-%m-%d %H:00:00') AS hour_ts,
                   n AS n_events,
                   CAST(CASE WHEN zv < 0
                             THEN -floor(abs(zv) * 1000000.0 + 0.5)
                             ELSE floor(abs(zv) * 1000000.0 + 0.5)
                        END AS BIGINT) AS z_e6,
                   abs(CAST(CASE WHEN zv < 0
                                 THEN -floor(abs(zv) * 1000000.0 + 0.5)
                                 ELSE floor(abs(zv) * 1000000.0 + 0.5)
                            END AS BIGINT)) > 2000000 AS is_anomaly
            FROM z
        """,
        "systematic_sample": """
            WITH r AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) n_chars,
                       ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1
                           AS rank
                FROM documents
            )
            SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank % 10 = 0
        """,
        "bounce_rate": """
            WITH e AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                                 > INTERVAL 30 MINUTE OR
                            lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                            THEN 1 ELSE 0 END AS new_s
                FROM events
            ),
            s AS (
                SELECT user_id, ts,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM e
            ),
            sess AS (
                SELECT user_id, sid, min(ts) start_ts, count(*) n_events
                FROM s GROUP BY user_id, sid
            ),
            d AS (
                SELECT strftime(date_trunc('day', start_ts), '%Y-%m-%d')
                           AS day,
                       CAST(count(*) AS BIGINT) n_sessions,
                       CAST(count(*) FILTER (n_events = 1) AS BIGINT)
                           n_bounces
                FROM sess GROUP BY 1
            )
            SELECT day, n_sessions, n_bounces,
                   CAST(floor(CAST(n_bounces AS DOUBLE)
                              / CAST(n_sessions AS DOUBLE)
                              * 1000000.0 + 0.5) AS BIGINT) AS bounce_e6
            FROM d
        """,
        "orders_per_nation": """
            SELECT c_nationkey,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS total_price_cents,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        """,
        "char_entropy": """
            WITH c AS (
                SELECT doc_id, length(text) n, unnest(split(text, '')) ch
                FROM documents WHERE length(text) > 0
            ),
            cc AS (
                SELECT doc_id, any_value(n) n, ch, count(*) c
                FROM c GROUP BY doc_id, ch
            )
            SELECT doc_id,
                   CAST(any_value(n) AS BIGINT) AS n_chars_text,
                   CAST(count(*) AS BIGINT) AS distinct_chars,
                   CAST(sum(CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                             * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                             * 1000000000.0) AS BIGINT)) AS BIGINT)
                       AS entropy_e9
            FROM cc GROUP BY doc_id
        """,
        "retention_cohorts": """
            WITH um AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) m FROM events
            ),
            fm AS (SELECT user_id, min(m) f FROM um GROUP BY user_id)
            SELECT strftime(f, '%Y-%m-%d') AS cohort_date,
                   CAST(datediff('day', f, m) AS BIGINT) AS day_offset,
                   CAST(count(DISTINCT um.user_id) AS BIGINT) AS n_users
            FROM um JOIN fm USING (user_id) GROUP BY 1, 2
        """,
        "first_last_touch": """
            WITH r AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn_d
                FROM events
            )
            SELECT user_id,
                   max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM r GROUP BY user_id
        """,
        **_extract_parity_oracles(),
    }


def _extract_parity_oracles(
    sf_dir: str = "/root/testdata/sf0.01",
) -> dict[str, str]:
    """SQL oracles for the extraction-parity queries: every doc in the
    synthesized interleaved corpus must come back matched=TRUE. The
    corpus is a deterministic pure function of the sf tag cached under
    /tmp (chug_ray/synth.py); it is synthesized here if absent so the
    oracle can read it regardless of run order. The default resolves
    for sf0.01 (the driver's comparison scale); the pytest harness
    rebuilds these entries for its own sf."""
    from chug_ray.synth import corpus_for_sf_dir

    try:
        docs_path, _, _ = corpus_for_sf_dir(sf_dir)
    except Exception:  # corpus synth impossible here: omit the oracles
        return {}
    sql = f"""
        SELECT doc_id, TRUE AS matched
        FROM read_parquet('{docs_path}')
    """
    return {
        "extract_parity_random": sql,
        "extract_parity_all_valid": sql,
    }
