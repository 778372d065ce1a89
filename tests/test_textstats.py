"""Edge-case kernels for the text-analysis ops (the bulk coverage is
the DuckDB parity harness in test_oracle_parity.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_repetition_stats_edge_cases(ray_session, tmp_path):
    from chug_ray.ops.textstats import repetition_stats

    sf = _write_docs(
        tmp_path,
        [
            "",  # no tokens at all
            "one",  # single token: no bigrams
            "w w w w",  # fully repeated: dup 3/4, top 4/4, bigram 3/3
            "a b a b a",  # top token 3/5, top bigram 2/4
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(sf).take_all()}
    assert rows[0] == {
        "doc_id": 0,
        "n_tokens": 0,
        "n_unique": 0,
        "dup_token_frac_e4": 0,
        "top_token_frac_e4": 0,
        "top_bigram_frac_e4": 0,
    }
    assert (rows[1]["n_tokens"], rows[1]["n_unique"]) == (1, 1)
    assert rows[1]["top_token_frac_e4"] == 10000
    assert rows[1]["top_bigram_frac_e4"] == 0
    assert rows[2]["dup_token_frac_e4"] == 7500
    assert rows[2]["top_token_frac_e4"] == 10000
    assert rows[2]["top_bigram_frac_e4"] == 10000
    assert rows[3]["top_token_frac_e4"] == 6000
    assert rows[3]["top_bigram_frac_e4"] == 5000


def test_hll_estimate_within_error_bound(ray_session):
    """HLL at p=12 has standard error ~1.6%; pin ±5% against the exact
    per-lang distinct token count, plus determinism."""
    import re

    import duckdb

    from chug_ray.ops.textstats import TOKEN_RE, approx_distinct_tokens

    sf = "/root/testdata/sf0.01"
    est1 = {r["lang"]: r["est_distinct"] for r in approx_distinct_tokens(sf).take_all()}
    est2 = {r["lang"]: r["est_distinct"] for r in approx_distinct_tokens(sf).take_all()}
    assert est1 == est2  # hash-based, no RNG

    exact = dict(
        duckdb.sql(
            f"""
            SELECT lang, count(DISTINCT tok) FROM (
                SELECT lang, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
                FROM read_parquet('{sf}/documents.parquet')
            ) GROUP BY lang
            """
        ).fetchall()
    )
    assert set(est1) == set(exact)
    for lang, ex in exact.items():
        assert abs(est1[lang] - ex) / ex < 0.05, (lang, est1[lang], ex)


def test_cms_heavy_hitters_bounds(ray_session):
    """CMS point estimates only overestimate; with w=8192 and ~30k
    distinct tokens, collisions are small — the exact top-20 must all
    surface with est >= true and est <= true + small slack."""
    from chug_ray.ops.textstats import cms_heavy_hitters, top_k_tokens

    sf = "/root/testdata/sf0.01"
    exact = {r["token"]: r["n"] for r in top_k_tokens(sf, k=20).take_all()}
    cms = cms_heavy_hitters(sf, k=20)
    est = dict(zip(cms["token"].to_pylist(), cms["est_count"].to_pylist()))
    n_total = sum(exact.values())  # lower bound on corpus token count
    assert set(exact) <= set(est), set(exact) - set(est)
    for tok, true_n in exact.items():
        assert est[tok] >= true_n, (tok, est[tok], true_n)
        assert est[tok] <= true_n + max(50, 0.01 * n_total), (tok, est[tok], true_n)


def test_mad_outliers_domain_cap(ray_session, tmp_path, monkeypatch):
    """mad_outliers must fail loudly (not silently build a giant driver
    table) when the (lang, n_chars) cell count exceeds the domain cap."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from chug_ray.ops import textstats

    n = 64
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(range(100, 100 + n), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(textstats, "VALUE_DOMAIN_CAP", 4)
    with pytest.raises(ValueError, match="value-domain"):
        textstats.mad_outliers(str(tmp_path))


def test_weighted_sample_prefers_heavy_docs(ray_session, tmp_path):
    """A-ES sampling is weight-proportional: with 90% light docs (w=10)
    and 10% heavy docs (w=10000), the heavy minority must dominate the
    top-k draw. Deterministic (keyed hash), so the assertion is exact
    for this fixture, not flaky."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.textstats import weighted_sample_k

    n = 500
    w = [10000 if i % 10 == 0 else 10 for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(w, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = weighted_sample_k(str(tmp_path), k=20).take_all()
    assert len(out) == 20
    heavy = sum(1 for r in out if r["n_chars"] == 10000)
    # heavy docs are 10% of the corpus but carry ~99% of total weight
    assert heavy >= 16, f"only {heavy}/20 heavy docs sampled"
    # ranks are 1..k and keys are non-increasing
    ranks = [r["rank"] for r in out]
    assert sorted(ranks) == list(range(1, 21))
    keys = [r["sample_key"] for r in sorted(out, key=lambda r: r["rank"])]
    assert all(a >= b for a, b in zip(keys, keys[1:]))


def test_bm25_rare_term_dominates(ray_session):
    """The 'dup merge' query contains one rare term (dup); docs that
    actually contain 'dup' must outrank docs that only match the common
    term, and every returned doc must contain at least one query term."""
    import duckdb

    from chug_ray.ops.textstats import bm25_search

    sf = "/root/testdata/sf0.001"
    out = [r for r in bm25_search(sf).take_all() if r["query_id"] == 2]
    assert len(out) == 10
    con = duckdb.connect()
    dup_docs = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{sf}/documents.parquet' "
            "WHERE regexp_matches(lower(text), '\\bdup\\b')"
        ).fetchall()
    }
    assert dup_docs, "fixture lost its rare term"
    top = sorted(out, key=lambda r: r["rank"])
    # with ~29 'dup' occurrences in 500 docs, idf(dup) >> idf(merge):
    # the top ranks must all be dup-containing docs
    n_lead = min(len(dup_docs), 5)
    assert all(r["doc_id"] in dup_docs for r in top[:n_lead]), top[:n_lead]


def test_new_ops_edge_cases(ray_session, tmp_path):
    """Empty text, zero-weight docs and a tiny corpus must not crash any
    of the round-4 ops; zero-weight docs sort last (-inf key) in the
    weighted sample, matching the oracle's ln(u)/0 semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops import textstats
    from chug_ray.ops.dedup import substring_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["", "the cat and the hat with a bat", "hash join dup"],
                pa.string(),
            ),
            "lang": pa.array(["en", "en", "fr"], pa.string()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "n_chars": pa.array([0, 30, 13], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    assert len(textstats.gopher_filter(sf).take_all()) == 3
    assert len(textstats.mad_outliers(sf).take_all()) == 3
    assert len(substring_dedup(sf).take_all()) == 3
    bm = textstats.bm25_search(sf).take_all()
    assert all(r["score"] > 0 for r in bm)  # only term-hit docs returned
    ws = sorted(
        textstats.weighted_sample_k(sf).take_all(), key=lambda r: r["rank"]
    )
    assert ws[-1]["doc_id"] == 0 and ws[-1]["sample_key"] == float("-inf")
