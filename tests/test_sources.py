"""Source-composition ops: plan-time shard shuffle determinism and the
deterministic weighted-union membership rule (reference S2/S3 analogs)."""

from __future__ import annotations

from chug_ray.ops.sources import shuffled_files, weighted_union


def test_shuffled_files_deterministic_permutation():
    paths = [f"shard-{i:04d}" for i in range(20)]
    a = shuffled_files(paths, seed=7)
    b = shuffled_files(paths, seed=7)
    c = shuffled_files(paths, seed=8)
    assert a == b  # same seed → same order
    assert sorted(a) == sorted(paths)  # permutation, nothing lost
    assert a != c  # different seed → different order
    assert paths == [f"shard-{i:04d}" for i in range(20)]  # input untouched


def test_weighted_union_membership(ray_session):
    sf = "/root/testdata/sf0.001"
    rows = weighted_union(sf, a_pct=70, other_pct=30).take_all()
    for r in rows:
        if r["source"] == "src0":
            assert r["doc_id"] % 100 < 70
        else:
            assert r["doc_id"] % 100 < 30
    # both sides contribute
    assert {r["source"] == "src0" for r in rows} == {True, False}
