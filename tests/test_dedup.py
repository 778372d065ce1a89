"""Dedup-family operators: determinism, threshold guarantees, and
survivor-set invariants at sf0.001."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_minhash_deterministic_and_verified(ray_session):
    from chug_ray.ops.dedup import minhash_lsh_pairs

    a = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(SF).take_all()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(SF).take_all()
    )
    assert a == b  # fixed hash family → identical candidates + scores
    assert a, "corpus contains near-duplicates"
    for doc_a, doc_b, jac in a:
        assert doc_a < doc_b  # canonical pair order, no self-pairs
        assert jac >= 0.6  # every emitted pair is Jaccard-verified


def test_minhash_scores_match_direct_jaccard(ray_session):
    """Every emitted pair's score equals the Jaccard recomputed directly
    from the two texts (the LSH banding only prunes candidates — the
    verify stage must report exact similarities)."""
    import pyarrow.parquet as pq

    from chug_ray.ops.dedup import _jaccard, _token_set, minhash_lsh_pairs
    from chug_ray.util import round_away

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    pairs = minhash_lsh_pairs(SF).take_all()
    assert pairs
    for r in pairs:
        expect = float(
            round_away(_jaccard(_token_set(texts[r["doc_a"]]),
                                _token_set(texts[r["doc_b"]])), 4)
        )
        assert r["jaccard"] == expect
    # token-set-identical pairs must surface with score exactly 1
    assert any(r["jaccard"] == 1.0 for r in pairs)


def test_survivors_are_min_ids_and_unique_texts(ray_session):
    import pyarrow.parquet as pq

    from chug_ray.ops.dedup import dedup_survivors

    rows = dedup_survivors(SF).take_all()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # one row per survivor
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    by_text: dict[str, int] = {}
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        by_text[text] = min(by_text.get(text, doc_id), doc_id)
    assert sorted(ids) == sorted(by_text.values())


def test_empty_token_docs_never_pair():
    """union == 0 is no-pair everywhere, matching the SQL oracle's
    0/0 -> NULL (excluded by the threshold filter)."""
    import numpy as np

    from chug_ray.ops.dedup import (
        _banded_jaccard_pairs,
        _exact_jaccard_pairs,
        _jaccard,
    )

    assert _jaccard(set(), set()) == 0.0
    ids = np.array([1, 2], dtype=np.int64)
    empty = [np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)]
    assert _exact_jaccard_pairs(ids, empty, 0.5) == []
    assert _banded_jaccard_pairs(ids, empty, 0.5) == []


def test_minhash_bottom_k_sketch_cap(ray_session, tmp_path):
    """Docs over the sketch cap ship only bottom-k token hashes; the
    estimator keeps identical pairs at 1.0 and near-dup scores close to
    exact, and the capped run finds the same planted pairs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(5)
    vocab = [f"w{i:04d}" for i in range(3000)]

    def doc(words):
        return " ".join(words)

    texts = []
    for i in range(30):
        texts.append(doc(rng.choice(vocab, size=600, replace=False)))
    # planted: 30/31 identical, 32/33 ~90% token overlap (long docs,
    # both far over the 64-token cap used below)
    texts.append(texts[0])
    base = list(rng.choice(vocab, size=600, replace=False))
    texts.append(doc(base))
    texts.append(doc(base[:540] + list(rng.choice(
        [w for w in vocab if w not in base], size=60, replace=False))))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / "long"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            str(d), threshold=0.6, sketch_k=1 << 30
        ).take_all()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            str(d), threshold=0.6, sketch_k=64
        ).take_all()
    }
    assert exact[(0, 30)] == 1.0 and capped[(0, 30)] == 1.0
    assert (31, 32) in exact and (31, 32) in capped
    for pair, est in capped.items():
        assert abs(est - exact.get(pair, est)) < 0.2


# ---------------------------------------------------------------------------
# connected-components clustering
# ---------------------------------------------------------------------------


def _edges_ds(pairs):
    import ray.data

    from chug_ray.ops.dedup import _symmetric_edges

    return _symmetric_edges(
        ray.data.from_items(
            [{"doc_a": a, "doc_b": b} for a, b in pairs]
        )
    )


def _labels_of(pairs, **kw):
    from chug_ray.ops.dedup import _cc_labels

    ds = _cc_labels(_edges_ds(pairs), **kw)
    return {r["node"]: r["val"] for r in ds.take_all()} if ds else {}


# max_driver_edges=0 forces the distributed propagation loop; the
# default exercises the driver union-find fast path. Both must agree.
import pytest as _pytest


@_pytest.mark.parametrize("mde", [0, 4_000_000])
def test_cc_chain_needs_multiple_rounds(ray_session, mde):
    # path graph 10-11-...-17: diameter 7, min label must travel the
    # whole chain — exercises the iterative propagation, not just the
    # round-0 aggregate
    pairs = [(i, i + 1) for i in range(10, 17)]
    labels = _labels_of(pairs, max_driver_edges=mde)
    assert labels == {i: 10 for i in range(10, 18)}


@_pytest.mark.parametrize("mde", [0, 4_000_000])
def test_cc_two_components_and_star(ray_session, mde):
    pairs = [(5, 9), (9, 7), (20, 21), (22, 21), (23, 21)]
    labels = _labels_of(pairs, max_driver_edges=mde)
    assert labels == {5: 5, 9: 5, 7: 5, 20: 20, 21: 20, 22: 20, 23: 20}


def test_cc_driver_and_distributed_paths_agree(ray_session):
    import numpy as np

    rng = np.random.default_rng(7)
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 60, (120, 2)) if p[0] != p[1]]
    a = _labels_of(pairs, max_driver_edges=0)
    b = _labels_of(pairs)
    assert a == b


def test_cc_max_rounds_raises_not_silently_truncates(ray_session):
    import pytest

    pairs = [(i, i + 1) for i in range(0, 30)]  # diameter 30
    with pytest.raises(RuntimeError, match="did not converge"):
        _labels_of(pairs, max_rounds=2, max_driver_edges=0)


def test_dedup_clusters_singletons_and_chains(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.dedup import dedup_clusters

    # doc 0/1/2 form a near-dup chain (0~1, 1~2 share 9 of 10 tokens;
    # 0~2 share 8 of 10 — still >= 0.8 only via the chain for the pair
    # threshold used below), doc 3 is unrelated
    base = [f"tok{i}" for i in range(10)]
    texts = [
        " ".join(base),
        " ".join(base[:-1] + ["aa"]),
        " ".join(base[:-2] + ["aa", "bb"]),
        "entirely different words here",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "cc"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dedup_clusters(str(d), threshold=0.8).take_all()
    }
    assert out == {0: (0, 1), 1: (0, 0), 2: (0, 0), 3: (3, 1)}


def test_novel_docs_drops_ref_dups_only(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.dedup import novel_docs

    rows = [
        # (doc_id, text, source)
        (0, "already ingested", "src0"),
        (1, "also ingested", "src0"),
        (2, "already ingested", "src1"),  # dup of ref -> dropped
        (3, "genuinely new", "src1"),     # kept
        (4, "genuinely new", "src2"),     # dup of another NEW doc -> kept
        (5, "also ingested", "src2"),     # dup of ref -> dropped
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    d = tmp_path / "inc"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    kept = sorted(r["doc_id"] for r in novel_docs(str(d)).take_all())
    assert kept == [3, 4]
