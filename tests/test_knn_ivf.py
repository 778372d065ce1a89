"""IVF ANN: determinism, exactness of returned similarities, and recall
against the brute-force baseline."""

from __future__ import annotations

import pandas as pd

from chug_ray.ops.knn import knn_bruteforce, knn_ivf

SF = "/root/testdata/sf0.001"


def _frame(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )


def test_ivf_deterministic(ray_session):
    a = _frame(knn_ivf(SF))
    b = _frame(knn_ivf(SF))
    pd.testing.assert_frame_equal(a, b)


def test_ivf_sims_exact_and_recall(ray_session):
    exact = _frame(knn_bruteforce(SF))
    approx = _frame(knn_ivf(SF))

    # every returned (query, vec) pair's similarity equals the exact one
    exact_sims = {
        (r.query_id, r.vec_id): r.cos_sim_e4 for r in exact.itertuples()
    }
    brute_all = exact_sims  # top-k only, so check pairs present there
    for r in approx.itertuples():
        if (r.query_id, r.vec_id) in brute_all:
            assert r.cos_sim_e4 == brute_all[(r.query_id, r.vec_id)]

    # pruned search still finds a reasonable share of the true top-k
    exact_pairs = set(exact_sims)
    approx_pairs = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4, f"IVF recall too low: {recall:.2f}"

    # ranks are contiguous from 1 per query
    for _, grp in approx.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))


def test_kmeans_assign_deterministic_and_total(ray_session):
    from chug_ray.ops.knn import N_CENTROIDS, kmeans_assign

    sf = "/root/testdata/sf0.01"
    a = {r["vec_id"]: (r["cluster"], r["cos_sim_e4"])
         for r in kmeans_assign(sf).take_all()}
    b = {r["vec_id"]: (r["cluster"], r["cos_sim_e4"])
         for r in kmeans_assign(sf).take_all()}
    assert a == b  # deterministic across runs
    assert len(a) == 500  # every embedding labeled
    assert all(0 <= cl < N_CENTROIDS for cl, _ in a.values())


def test_kmeans_lloyd_row_order_invariance(ray_session, tmp_path):
    """Lloyd's fixed-point partial sums are order-invariant: the same
    embeddings written in reversed row order with tiny row groups must
    produce bit-identical assignments and distances."""
    import pyarrow.parquet as pq

    from chug_ray.ops.knn import kmeans_lloyd

    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir()
    b_dir.mkdir()
    pq.write_table(src, str(a_dir / "embeddings.parquet"))
    rev = src.take(list(range(src.num_rows - 1, -1, -1)))
    pq.write_table(
        rev, str(b_dir / "embeddings.parquet"), row_group_size=37
    )
    key = lambda rows: sorted(
        (r["vec_id"], r["cluster"], r["dist2_e4"]) for r in rows
    )
    a = key(kmeans_lloyd(str(a_dir)).take_all())
    b = key(kmeans_lloyd(str(b_dir)).take_all())
    assert a == b
    # totality + label range
    assert len(a) == src.num_rows
    assert {c for _, c, _ in a} <= set(range(8))
