"""Edge-case and invariance guards for the round-4 session-3 operators
(promo_revenue, discounted_revenue, returned_item_customers,
nation_volume_shipping, train_test_split, vocab_overlap, collocations).
Happy paths are pinned by the DuckDB parity harness in
test_oracle_parity.py; these cover the knobs the oracle can't move."""

from __future__ import annotations

import numpy as np
import pandas as pd

from chug_ray.ops.relational import (
    nation_volume_shipping,
    returned_item_customers,
)
from chug_ray.ops.textstats import (
    collocations,
    train_test_split,
    vocab_overlap,
)

SF = "/root/testdata/sf0.001"


def _pd(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def test_nation_volume_bucket_invariance(ray_session):
    """The orderkey co-shuffle must give identical results at any
    bucket count (each order wholly in one bucket)."""
    a = _canon(_pd(nation_volume_shipping(SF, num_buckets=4)))
    b = _canon(_pd(nation_volume_shipping(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)


def test_nation_volume_unknown_nation_raises(ray_session):
    import pytest

    with pytest.raises(ValueError, match="unknown nation"):
        nation_volume_shipping(SF, nation_a="ATLANTIS")


def test_returned_item_customers_bucket_invariance(ray_session):
    a = _canon(_pd(returned_item_customers(SF, num_buckets=4)))
    b = _canon(_pd(returned_item_customers(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)


def test_returned_item_customers_k_prefix(ray_session):
    """Top-5 must be a prefix of top-20 under the deterministic
    (revenue DESC, custkey ASC) order."""
    t20 = _pd(returned_item_customers(SF, k=20)).sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    )
    t5 = _pd(returned_item_customers(SF, k=5)).sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    )
    assert len(t5) == 5
    pd.testing.assert_frame_equal(
        t5.reset_index(drop=True),
        t20.head(5).reset_index(drop=True),
    )


def test_train_test_split_is_stable_and_partitions(ray_session):
    """Same doc → same split on every run (hash, not RNG), every doc
    assigned exactly one split, and the test share is near the dial."""
    a = _pd(train_test_split(SF)).sort_values("doc_id", ignore_index=True)
    b = _pd(train_test_split(SF)).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["split"].unique()) <= {"train", "test"}
    assert a["doc_id"].is_unique
    frac = (a["split"] == "test").mean()
    assert 0.05 < frac < 0.2  # 100‰ dial, 500 docs: loose CLT band


def test_train_test_split_permille_dial(ray_session):
    zero = _pd(train_test_split(SF, test_permille=0))
    assert (zero["split"] == "train").all()
    full = _pd(train_test_split(SF, test_permille=1000))
    assert (full["split"] == "test").all()


def test_vocab_overlap_bucket_invariance(ray_session):
    a = _canon(_pd(vocab_overlap(SF, num_buckets=4)))
    b = _canon(_pd(vocab_overlap(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)


def test_vocab_overlap_jaccard_bounds(ray_session):
    df = _pd(vocab_overlap(SF))
    assert (df["jaccard_e6"] >= 0).all() and (df["jaccard_e6"] <= 1_000_000).all()
    assert (df["shared"] <= df[["vocab_a", "vocab_b"]].min(axis=1)).all()
    assert (df["src_a"] < df["src_b"]).all()


def test_collocations_min_count_monotone(ray_session):
    """Raising min_count can only shrink the candidate set; surviving
    bigrams keep identical scores."""
    lo = _pd(collocations(SF, min_count=2, k=1000))
    hi = _pd(collocations(SF, min_count=10, k=1000))
    assert (hi["c_xy"] >= 10).all()
    merged = hi.merge(lo, on=["tok_a", "tok_b"], suffixes=("_hi", "_lo"))
    assert len(merged) == len(hi)
    assert (merged["pmi_ratio_e6_hi"] == merged["pmi_ratio_e6_lo"]).all()


def test_profit_by_nation_year_bucket_invariance(ray_session):
    from chug_ray.ops.relational import profit_by_nation_year

    a = _canon(_pd(profit_by_nation_year(SF, num_buckets=4)))
    b = _canon(_pd(profit_by_nation_year(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)


def test_profit_by_nation_year_no_match_is_empty(ray_session):
    from chug_ray.ops.relational import profit_by_nation_year

    df = _pd(profit_by_nation_year(SF, name_like="no-such-part-name"))
    assert len(df) == 0


def test_market_share_consistency(ray_session):
    """Numerator can never exceed the denominator (both come from the
    same joined row set), and the unknown-nation dial raises."""
    from chug_ray.ops.relational import market_share

    import pytest

    df = _pd(market_share(SF))
    assert (df["nation_cents"] <= df["total_cents"]).all()
    with pytest.raises(ValueError, match="unknown nation"):
        market_share(SF, target_nation="ATLANTIS")


def test_market_share_bucket_invariance(ray_session):
    from chug_ray.ops.relational import market_share

    a = _canon(_pd(market_share(SF, num_buckets=4)))
    b = _canon(_pd(market_share(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)


def test_radius_search_threshold_monotone(ray_session):
    """A tighter radius returns a subset, with identical similarities."""
    from chug_ray.ops.knn import radius_search

    lo = _pd(radius_search(SF, threshold_e4=2000))
    hi = _pd(radius_search(SF, threshold_e4=3000))
    assert (hi["cos_sim_e4"] >= 3000).all()
    merged = hi.merge(lo, on=["query_id", "vec_id"], suffixes=("_hi", "_lo"))
    assert len(merged) == len(hi)
    assert (merged["cos_sim_e4_hi"] == merged["cos_sim_e4_lo"]).all()


def test_collapse_runs_idempotent(ray_session):
    """Collapsing a collapsed corpus removes nothing (no adjacent
    duplicates can survive the first pass)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    from chug_ray.ops.textstats import collapse_runs

    first = _pd(collapse_runs(SF))
    assert (first["n_removed"] >= 0).all()
    assert first["n_removed"].sum() > 0  # the synth corpus has runs
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(first["doc_id"].to_numpy()),
                    "text": pa.array(first["text_clean"].tolist(), pa.string()),
                }
            ),
            os.path.join(td, "documents.parquet"),
        )
        second = _pd(collapse_runs(td))
    assert (second["n_removed"] == 0).all()


def test_dominant_suppliers_bucket_invariance_and_uniqueness(ray_session):
    from chug_ray.ops.relational import dominant_suppliers

    a = _canon(_pd(dominant_suppliers(SF, num_buckets=4)))
    b = _canon(_pd(dominant_suppliers(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)
    # strictly-more-than-half admits at most one winner per part
    assert a["p_partkey"].is_unique
    assert (2 * a["supp_qty"] > a["part_qty"]).all()


def test_supplier_count_by_class_bucket_invariance(ray_session):
    from chug_ray.ops.relational import supplier_count_by_class

    a = _canon(_pd(supplier_count_by_class(SF, num_buckets=3)))
    b = _canon(_pd(supplier_count_by_class(SF, num_buckets=64)))
    pd.testing.assert_frame_equal(a, b)


def test_sample_per_group_depth_and_determinism(ray_session):
    from chug_ray.ops.sources import sample_per_group

    a = _pd(sample_per_group(SF, k=7))
    b = _pd(sample_per_group(SF, k=7))
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
    counts = a.groupby("lang").size()
    assert (counts <= 7).all()
    # k=3 sample must be a subset of k=7 (bottom-k hash is nested)
    s3 = _pd(sample_per_group(SF, k=3))
    merged = s3.merge(a, on=["doc_id", "lang", "n_chars"])
    assert len(merged) == len(s3)


def test_grouped_moments_cauchy_schwarz(ray_session):
    """n·Σxy − Σx·Σy bounded by the product of the std terms (exact
    integer identity check), and totals match the corpus size."""
    from chug_ray.ops.textstats import grouped_moments

    df = _pd(grouped_moments(SF))
    n, sx, sy = df["n"], df["sx"], df["sy"]
    sxx, syy, sxy = df["sxx"], df["syy"], df["sxy"]
    cov2 = (n * sxy - sx * sy) ** 2
    var = (n * sxx - sx * sx) * (n * syy - sy * sy)
    assert (cov2 <= var).all()
    assert int(n.sum()) == 500
