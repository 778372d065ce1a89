"""Scale guards for the pairwise dedup family: skewed blocks must
complete without materializing a quadratic frame, and the guarded paths
must agree with the exact paths where both apply."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _skewed_corpus(tmp_path) -> str:
    """1,000 docs, 90% in one (lang, source) block, with planted
    near-duplicate pairs inside the dominant block."""
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(200)]
    texts, langs, sources = [], [], []
    for i in range(1000):
        toks = list(rng.choice(vocab, size=30))
        texts.append(" ".join(toks))
        if i < 900:
            langs.append("en")
            sources.append("web")
        else:
            langs.append("fr")
            sources.append("books")
    # planted duplicates: doc 10 == doc 11, doc 20 ~ doc 21 (1-token edit)
    texts[11] = texts[10]
    t20 = texts[20].split()
    t20[0] = "w0" if t20[0] != "w0" else "w1"
    texts[21] = " ".join(t20)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    d = tmp_path / "skewed"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_ngram_skewed_block_banded_path(ray_session, tmp_path):
    """A block over the group cap routes through in-group MinHash
    banding: it completes, every emitted score is exact, the planted
    dups surface, and the result is a subset of the exact answer."""
    from chug_ray.ops.dedup import ngram_jaccard_pairs

    sf = _skewed_corpus(tmp_path)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sf, threshold=0.8).take_all()
    }
    banded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            sf, threshold=0.8, max_group_rows=100
        ).take_all()
    }
    assert (10, 11) in banded  # identical pair always survives banding
    assert banded[(10, 11)] == 1.0
    assert set(banded) <= set(exact)  # candidates only pruned, never added
    for pair, jac in banded.items():
        assert jac == exact[pair]  # scores stay exact on the banded path
    # near-identical planted pair is found by the exact path
    assert (20, 21) in exact


def test_ngram_exact_path_unchanged_at_sf(ray_session):
    """Default cap ⇒ exact path at test scales: same answer as a direct
    in-memory all-pairs computation."""
    from chug_ray.ops.dedup import (
        _jaccard,
        _token_set,
        ngram_jaccard_pairs,
    )
    from chug_ray.util import round_away

    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    by_block: dict[tuple, list[tuple]] = {}
    for did, text, lang, src in zip(
        docs["doc_id"].to_pylist(),
        docs["text"].to_pylist(),
        docs["lang"].to_pylist(),
        docs["source"].to_pylist(),
    ):
        by_block.setdefault((lang, src), []).append((did, _token_set(text)))
    want = set()
    for members in by_block.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                jac = _jaccard(members[i][1], members[j][1])
                if jac >= 0.8:
                    want.add(
                        (members[i][0], members[j][0], float(round_away(jac, 4)))
                    )
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(SF).take_all()
    }
    assert got == want


def test_embedding_tiled_equals_untiled(ray_session):
    from chug_ray.ops.dedup import embedding_near_dup

    big = {
        (r["vec_a"], r["vec_b"], r["cos_sim_e4"])
        for r in embedding_near_dup(SF, tile=4096).take_all()
    }
    small = {
        (r["vec_a"], r["vec_b"], r["cos_sim_e4"])
        for r in embedding_near_dup(SF, tile=7).take_all()
    }
    assert big == small
    assert big  # corpus contains same-label near-dups


def test_ivf_centroids_clamp_on_tiny_corpus(ray_session, tmp_path):
    """12 vectors: the stride sample is empty, the fallback samples the
    4 candidates, centroid count clamps — knn_ivf still answers."""
    from chug_ray.ops.knn import knn_ivf

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((12, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array(
                [list(map(float, e)) for e in emb], pa.list_(pa.float64())
            ),
        }
    )
    d = tmp_path / "tiny"
    d.mkdir()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    rows = knn_ivf(str(d)).take_all()
    assert rows
    assert {r["query_id"] for r in rows} <= set(range(8))
    assert all(r["vec_id"] >= 8 for r in rows)


def test_sessionize_chunk_invariance(ray_session):
    """The two-level sessionize must give identical sessions for any
    chunk size (1-hour chunks force heavy boundary stitching; a 1-year
    chunk is effectively the single-pass answer)."""
    from chug_ray.ops.window import sessionize

    def rows(chunk_hours):
        return sorted(
            tuple(r.values())
            for r in sessionize(SF, chunk_hours=chunk_hours).take_all()
        )

    assert rows(1) == rows(24 * 365)
    import pytest

    with pytest.raises(ValueError):
        sessionize(SF, gap_minutes=120, chunk_hours=1)


def test_embedding_skewed_label_banded_path(ray_session, tmp_path):
    """A label block over the group cap routes through random-hyperplane
    bucketing + exact verify: it completes, every emitted score is
    exact, planted near-identical pairs surface, and the result is a
    subset of the exact answer (candidates only pruned, never added)."""
    from chug_ray.ops.dedup import embedding_near_dup

    rng = np.random.default_rng(11)
    n, d = 400, 32
    emb = rng.standard_normal((n, d))
    # plant an identical pair and a near-identical pair
    emb[302] = emb[301]
    emb[312] = emb[311] + 0.01 * rng.standard_normal(d)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, e)) for e in emb], pa.list_(pa.float64())
            ),
            # 90% of rows share one label: a dominant block
            "label": pa.array(
                ["big" if i % 10 else "small" for i in range(n)]
            ),
        }
    )
    dd = tmp_path / "skewemb"
    dd.mkdir()
    pq.write_table(tbl, str(dd / "embeddings.parquet"))

    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim_e4"]
        for r in embedding_near_dup(str(dd), threshold=0.8).take_all()
    }
    banded = {
        (r["vec_a"], r["vec_b"]): r["cos_sim_e4"]
        for r in embedding_near_dup(
            str(dd), threshold=0.8, max_group_rows=100
        ).take_all()
    }
    assert (301, 302) in exact and (311, 312) in exact
    # identical vectors hash identically in every table -> always found
    assert banded[(301, 302)] == 10000
    assert set(banded) <= set(exact)  # pruned, never added
    for pair, sim in banded.items():
        assert sim == exact[pair]  # scores stay exact on the banded path


def test_running_totals_chunk_invariance(ray_session):
    """The distributed prefix sum must be exact for ANY chunking: the
    per-user exclusive chunk offsets stitch local cumsums into the same
    global running totals regardless of chunk width."""
    from chug_ray.ops.window import running_user_totals

    sf = "/root/testdata/sf0.001"

    def run(hours):
        df = running_user_totals(sf, chunk_hours=hours).to_pandas()
        return (
            df.sort_values("event_id").reset_index(drop=True)[
                ["event_id", "running_e4"]
            ]
        )

    a, b, c = run(24), run(6), run(1)
    assert a.equals(b) and b.equals(c)


def test_running_totals_single_hot_user(ray_session, tmp_path):
    """One user owns every event: the (user, chunk) partitioning must
    still bound groups (events split across chunks; only the per-chunk
    summary stream is per-user) and the totals stay exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.window import running_user_totals

    n = 5000
    ts = pd.date_range("2024-01-01", periods=n, freq="7min")  # ~24 days
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(np.zeros(n, np.int64)),
            "value": pa.array(np.ones(n, np.float64)),
        }
    )
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    out = running_user_totals(str(d), chunk_hours=24).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    assert (out["running_e4"].to_numpy() == (np.arange(n) + 1) * 10000).all()


def test_novel_docs_single_dominant_fingerprint(ray_session, tmp_path):
    """All candidate docs share one text (one fp bucket gets everything):
    the bucketed anti-dedup must still drop them all against one
    reference row and keep the lone distinct doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.dedup import novel_docs

    n = 4000
    texts = ["the same page"] * n + ["unique page"]
    sources = ["src0"] + ["srcX"] * (n - 1) + ["srcX"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n + 1), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * (n + 1)),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "skewfp"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    kept = [r["doc_id"] for r in novel_docs(str(d)).take_all()]
    assert kept == [n]  # only the unique doc survives


def test_paragraph_dedup_hot_paragraph_and_blank_docs(ray_session, tmp_path):
    """A paragraph duplicated across 90% of the corpus must reduce to
    one shuffle row per source batch (survivor = its first occurrence),
    blank-only docs must still appear with n_paras = 0, and within-doc
    repeats keep only the earliest position."""
    from chug_ray.ops.dedup import paragraph_dedup

    hot = "breaking news everyone copies this line"
    texts = []
    for i in range(400):
        if i == 7:
            texts.append("   \n\n  ")  # blank-only doc
        elif i == 11:
            # within-doc repeat of a unique para
            texts.append(f"once{i}\nonce{i}\nunique tail {i}")
        elif i < 360:
            texts.append(f"{hot}\nunique para {i}")
        else:
            texts.append(f"unique para {i}\n{hot}")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(400), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        paragraph_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 400
    # blank-only doc present with zeros
    blank = out[out.doc_id == 7].iloc[0]
    assert blank.n_paras == 0 and blank.n_kept == 0 and blank.text_kept == ""
    # hot paragraph survives only in doc 0 (its first occurrence)
    assert out[out.doc_id == 0].iloc[0].text_kept == f"{hot}\nunique para 0"
    with_hot = out[out.text_kept.str.contains(hot, regex=False)]
    assert with_hot.doc_id.tolist() == [0]
    # within-doc repeat deduped to the earliest position
    rep = out[out.doc_id == 11].iloc[0]
    assert rep.n_paras == 3 and rep.n_kept == 2
    assert rep.text_kept == "once11\nunique tail 11"
    # every other doc keeps its unique paragraph
    assert (out[~out.doc_id.isin([7])].n_kept >= 1).all()


def test_rolling_sum_chunk_invariance(ray_session):
    """The bounded rolling window must be exact for ANY chunking: the
    carry-in rows replace whatever lookback the chunk cut removed."""
    from chug_ray.ops.window import rolling_user_sum

    sf = "/root/testdata/sf0.001"

    def run(hours):
        df = rolling_user_sum(sf, k=3, chunk_hours=hours).to_pandas()
        return df.sort_values("event_id").reset_index(drop=True)[
            ["event_id", "rolling_e4"]
        ]

    a, b, c = run(24), run(6), run(1)
    assert a.equals(b) and b.equals(c)


def test_rolling_sum_sparse_chunks(ray_session, tmp_path):
    """Events weeks apart (many empty chunks between them): the carry
    chain must hop the gaps so every window still sees the user's true
    previous k-1 events."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.window import rolling_user_sum

    # one event per 10 days -> every chunk_hours=24 chunk has one event,
    # separated by 9 empty chunks; plus a burst at the end
    ts = list(pd.date_range("2024-01-01", periods=8, freq="10D")) + list(
        pd.date_range("2024-06-01", periods=4, freq="1min")
    )
    n = len(ts)
    vals = np.arange(1, n + 1, dtype=np.float64)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(pd.Series(ts)),
            "user_id": pa.array(np.full(n, 5, np.int64)),
            "value": pa.array(vals),
        }
    )
    d = tmp_path / "sparse"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    out = rolling_user_sum(str(d), k=3, chunk_hours=24).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    v_e4 = (vals * 10000).astype(np.int64)
    expect = [int(v_e4[max(0, i - 2): i + 1].sum()) for i in range(n)]
    assert out["rolling_e4"].tolist() == expect


def test_containment_planted_contamination(ray_session, tmp_path):
    """An eval doc fully quoted inside a long train page must score
    containment 1.0 even though Jaccard is tiny; disjoint eval docs
    score 0 and still appear in the output."""
    from chug_ray.ops.dedup import train_test_containment

    filler = " ".join(f"w{i}" for i in range(300))
    quoted = "the secret benchmark answer is fourty two"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    quoted,  # eval: fully contained in doc 2
                    "zq xv jk completely disjoint tokens",  # eval: no hit
                    f"{filler} {quoted} {filler}",  # train: contains doc 0
                    "another train doc entirely",  # train
                ]
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["src0", "src0", "web", "web"]),
            "n_chars": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        train_test_containment(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out["max_containment_e4"].tolist()[0] == 10000  # fully quoted
    assert out["n_hits"].tolist() == [1, 0]
    assert out["max_containment_e4"].tolist()[1] == 0


def test_bucket_count_invariance_new_ops(ray_session):
    """Results of the round-3 bucketed ops must not depend on the bucket
    count (the partitioning knob scales with the cluster, not the data)."""
    import pandas as pd

    from chug_ray.ops.dedup import paragraph_dedup
    from chug_ray.ops.relational import regional_supplier_revenue
    from chug_ray.ops.textstats import distinctive_terms
    from chug_ray.ops.window import hourly_active_users

    sf = "/root/testdata/sf0.001"
    for fn in (
        paragraph_dedup,
        hourly_active_users,
        distinctive_terms,
        regional_supplier_revenue,
    ):
        a = fn(sf, num_buckets=3).to_pandas()
        b = fn(sf, num_buckets=64).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols, ignore_index=True),
            b[cols].sort_values(cols, ignore_index=True),
            check_dtype=False,
            check_exact=True,
        )


def test_substring_dedup_hot_window_and_edge_docs(ray_session, tmp_path):
    """A 5-gram duplicated across most of the corpus must keep only its
    first occurrence; docs shorter than k have zero windows and keep
    all tokens; within-doc repeats dedup to the earliest position."""
    from chug_ray.ops.dedup import substring_dedup

    hot = "alpha beta gamma delta epsilon"  # the hot 5-gram
    texts = []
    for i in range(300):
        if i == 3:
            texts.append("tiny doc")  # n < k: no windows
        elif i == 9:
            texts.append("")  # empty doc
        elif i == 12:
            # hot gram twice within one doc + unique tail
            texts.append(f"{hot} {hot} tail{i} t{i}b t{i}c t{i}d t{i}e")
        elif i < 200:
            texts.append(f"{hot} unique{i} u{i}b u{i}c u{i}d")
        else:
            texts.append(f"unique{i} u{i}b u{i}c u{i}d {hot}")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        substring_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 300
    # short/empty docs: zero windows, everything kept
    tiny = out[out.doc_id == 3].iloc[0]
    assert tiny.n_windows == 0 and tiny.text_kept == "tiny doc"
    empty = out[out.doc_id == 9].iloc[0]
    assert empty.n_tokens == 0 and empty.text_kept == ""
    # the hot gram's tokens survive only in doc 0
    first = out[out.doc_id == 0].iloc[0]
    assert first.text_kept.startswith(hot)
    assert first.n_dup_windows == 0
    later = out[(out.doc_id > 0) & (out.doc_id < 200) & (out.doc_id != 3)
                & (out.doc_id != 9) & (out.doc_id != 12)]
    assert not later.text_kept.str.contains("alpha", regex=False).any()
    # each later doc lost exactly the 5 hot tokens, kept its unique ones
    assert (later.n_kept == later.n_tokens - 5).all()
    # within-doc repeat: second occurrence removed too
    rep = out[out.doc_id == 12].iloc[0]
    assert rep.n_dup_windows >= 1
    assert "alpha" not in rep.text_kept
    assert "tail12" in rep.text_kept
    # telemetry recorded both bucketed stages
    from chug_ray import telemetry

    snap = telemetry.snapshot()
    assert "substring_dedup(bucket)" in snap
    assert "substring_dedup(doc)" in snap


def test_ngram_perplexity_hot_bigram_and_table_cut(ray_session, tmp_path):
    """The hottest bigram must cost one shuffle row per batch (combiner
    shape — asserted indirectly: the run completes and the table is
    bounded by m), scores are pure-integer (bit_length), and docs made
    of out-of-table bigrams score zero."""
    from chug_ray.ops.textstats import ngram_perplexity

    texts = []
    for i in range(300):
        if i == 5:
            texts.append("solo")  # < 2 tokens: zero bigrams
        elif i < 250:
            texts.append("the cat " * 40)  # hot bigrams
        else:
            texts.append(f"rare{i} pair{i}")  # unique bigram each
    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        ngram_perplexity(str(tmp_path), m=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 300
    solo = out[out.doc_id == 5].iloc[0]
    assert solo.n_bigrams == 0 and solo.log2_score == 0
    hot = out[out.doc_id == 0].iloc[0]
    # "the cat"×40 → bigrams: the-cat (40/doc × 249 docs = 9960),
    # cat-the (39/doc × 249 = 9711): both table slots known
    assert hot.n_bigrams == 79 and hot.n_hits == 79
    # integer log2: floor(log2(9960)) = 13, floor(log2(9711)) = 13
    assert hot.log2_score == 40 * 13 + 39 * 13
    # rare docs: their unique bigram is out-of-table (m=2 cut)
    rare = out[out.doc_id >= 250]
    assert (rare.n_hits == 0).all() and (rare.log2_score == 0).all()
    from chug_ray import telemetry

    snap = telemetry.snapshot()
    assert "ngram_perplexity(table)" in snap


def test_c4_filter_hot_duplicate_and_signals(ray_session, tmp_path):
    """The composite keep decision: the hottest duplicate text keeps
    only its min-doc_id copy, non-English and low-quality docs drop,
    and the per-signal columns expose why."""
    from chug_ray.ops.textstats import c4_filter

    good = ("the cat and the dog of the house went to the market and "
            "bought a fish of great size")
    texts, ids = [], []
    for i in range(200):
        if i == 5:
            texts.append("le chat et le chien les deux vont au marche "
                         "et le jour est long et les amis sont la")  # fr
        elif i == 9:
            texts.append("tiny")  # fails quality
        elif i < 150:
            texts.append(good)  # hot duplicate
        else:
            texts.append(f"{good} unique tail {i}")
        ids.append(i)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        c4_filter(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 200
    # the hot duplicate survives only at doc 0
    dups = out[(out.doc_id < 150) & ~out.doc_id.isin([5, 9])]
    assert dups[dups.doc_id == 0].keep.tolist() == [1]
    assert (dups[dups.doc_id > 0].keep == 0).all()
    assert (dups[dups.doc_id > 0].keep_dedup == 0).all()
    assert (dups.keep_quality == 1).all() and (dups.keep_lang == 1).all()
    # french doc: quality fine, lang gate drops it
    fr = out[out.doc_id == 5].iloc[0]
    assert fr.keep_lang == 0 and fr.keep == 0
    # tiny doc: quality gate drops it
    tiny = out[out.doc_id == 9].iloc[0]
    assert tiny.keep_quality == 0 and tiny.keep == 0
    # unique good docs all keep
    uniq = out[out.doc_id >= 150]
    assert (uniq.keep == 1).all()
    from chug_ray import telemetry

    snap = telemetry.snapshot()
    assert "c4_filter(fp bucket)" in snap
    assert "c4_filter(doc bucket)" in snap


def test_bucket_count_invariance_round4_composites(ray_session):
    """late_shipment_orders and cust_order_distribution must not depend
    on the bucket count (partitioning knob scales with the cluster)."""
    import pandas as pd
    import pyarrow as pa

    from chug_ray.ops.relational import (
        cust_order_distribution,
        late_shipment_orders,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (late_shipment_orders, cust_order_distribution):
        res = []
        for nb in (3, 64):
            r = fn(sf, num_buckets=nb)
            df = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
            cols = sorted(df.columns)
            res.append(df[cols].sort_values(cols, ignore_index=True))
        pd.testing.assert_frame_equal(
            res[0], res[1], check_dtype=False, check_exact=True
        )


def test_priority_line_counts_bucket_invariance(ray_session):
    """The Q12-shaped composite must be invariant to the bucket-count
    partitioning knob (it scales with the cluster, not the data)."""
    import pandas as pd

    from chug_ray.ops.relational import priority_line_counts

    sf = "/root/testdata/sf0.001"
    res = []
    for nb in (3, 64):
        df = priority_line_counts(sf, num_buckets=nb).to_pandas()
        cols = sorted(df.columns)
        res.append(df[cols].sort_values(cols, ignore_index=True))
    pd.testing.assert_frame_equal(
        res[0], res[1], check_dtype=False, check_exact=True
    )
    assert (res[0]["high_line_count"] + res[0]["low_line_count"] > 0).all()


def test_small_quantity_revenue_empty_brand(ray_session):
    """A brand with no parts must yield the zero row, not an error —
    the broadcast membership path has to survive an empty key set."""
    from chug_ray.ops.relational import small_quantity_revenue

    out = small_quantity_revenue(
        "/root/testdata/sf0.001", brand="Brand#NOPE"
    ).to_pandas()
    assert len(out) == 1
    assert int(out.revenue_cents.iloc[0]) == 0
    assert int(out.n_lines.iloc[0]) == 0


def test_q21_q22_bucket_invariance(ray_session):
    """sole_late_supplier and idle_rich_customers must be invariant to
    the bucket-count partitioning knob."""
    import pandas as pd
    import pyarrow as pa

    from chug_ray.ops.relational import (
        idle_rich_customers,
        sole_late_supplier,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (sole_late_supplier, idle_rich_customers):
        res = []
        for nb in (3, 64):
            r = fn(sf, num_buckets=nb)
            df = r.to_pandas() if isinstance(r, pa.Table) else r.to_pandas()
            cols = sorted(df.columns)
            res.append(df[cols].sort_values(cols, ignore_index=True))
        assert len(res[0]) > 0, f"{fn.__name__}: degenerate empty result"
        pd.testing.assert_frame_equal(
            res[0], res[1], check_dtype=False, check_exact=True
        )


def test_important_parts_threshold_subset(ray_session):
    """A stricter ppm threshold must select a strict subset — the
    global-scalar HAVING cut is monotone in the threshold."""
    from chug_ray.ops.relational import important_parts

    sf = "/root/testdata/sf0.001"
    loose = set(
        important_parts(sf, mult_permille=500)
        .to_pandas()["p_partkey"]
        .tolist()
    )
    strict = set(
        important_parts(sf, mult_permille=1600)
        .to_pandas()["p_partkey"]
        .tolist()
    )
    assert strict < loose
    assert len(strict) > 0


def test_top_supplier_empty_window(ray_session):
    """An empty ship-date window must yield the typed empty result."""
    from chug_ray.ops.relational import top_supplier

    out = top_supplier(
        "/root/testdata/sf0.001", date_lo="1990-01-01", date_hi="1990-01-02"
    ).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_revenue_cents"]
