"""curation_pipeline: composed filter→dedup→sample→select recipe.
End-to-end SQL parity is covered by tests/test_oracle_parity.py; here:
funnel structure, the stopword-rule gate, and rank integrity."""

from __future__ import annotations

import numpy as np

from chug_ray.ops.curation import curation_pipeline

SF = "/root/testdata/sf0.001"


def test_rank_integrity_and_per_lang_cap(ray_session):
    df = curation_pipeline(SF, k=5).to_pandas()
    assert len(df) > 0
    for lang, g in df.groupby("lang"):
        assert len(g) <= 5
        ranks = np.sort(g["rank_in_lang"].to_numpy())
        assert (ranks == np.arange(1, len(g) + 1)).all()
        # rank order follows (n_words DESC, doc_id ASC)
        gg = g.sort_values("rank_in_lang")
        nw = gg["n_words"].to_numpy()
        assert (np.diff(nw) <= 0).all()
    assert df["doc_id"].is_unique


def test_stopword_rule_gate(ray_session):
    # the synthetic vocabulary has no natural-language stop words, so
    # enabling the full Gopher battery must keep zero documents — the
    # rule doing exactly its job on non-natural text
    df = curation_pipeline(SF, use_stopword_rule=True).to_pandas()
    assert len(df) == 0


def test_sample_gate_subset(ray_session):
    # a tighter sample gate must select a subset of the looser one
    loose = set(
        curation_pipeline(SF, k=10_000, sample_hex="c0")
        .to_pandas()["doc_id"]
        .tolist()
    )
    tight = set(
        curation_pipeline(SF, k=10_000, sample_hex="40")
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert tight < loose
