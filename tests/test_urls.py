"""URL machinery (M10): brace expansion, env substitution, multi-source
splitting — cases mirror the reference's expand_urls/split_sources
behavior (`/root/reference/src/chug/common/urls.py`,
`common/config.py:181-224`)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from chug_ray.urls import (
    SourceSpec,
    envsubst,
    expand_braces,
    expand_urls,
    plan_files,
    split_sources,
)


def test_numeric_range_zero_padded():
    assert expand_braces("s-{0000..0003}.tar") == [
        "s-0000.tar",
        "s-0001.tar",
        "s-0002.tar",
        "s-0003.tar",
    ]


def test_numeric_range_unpadded_and_reverse():
    assert expand_braces("{8..11}") == ["8", "9", "10", "11"]
    assert expand_braces("{3..1}") == ["3", "2", "1"]


def test_alternation_and_nesting():
    assert expand_braces("{a,b}/x") == ["a/x", "b/x"]
    assert expand_braces("{a,b{1..2}}") == ["a", "b1", "b2"]
    assert expand_braces("{a,b}{0..1}") == ["a0", "a1", "b0", "b1"]


def test_alpha_range_and_literal_braces():
    assert expand_braces("{a..c}") == ["a", "b", "c"]
    # non-pattern braces stay literal (bash behavior)
    assert expand_braces("x{abc}y") == ["x{abc}y"]


def test_envsubst_prefix_lookup(monkeypatch):
    monkeypatch.setenv("WDS_ROOT", "/data")
    assert envsubst("${ROOT}/shard") == "/data/shard"
    monkeypatch.setenv("CHUG_ONLYCHUG", "/c")
    assert envsubst("${ONLYCHUG}") == "/c"
    monkeypatch.setenv("BARE", "/b")
    assert envsubst("${BARE}") == "/b"
    with pytest.raises(KeyError):
        envsubst("${NOPE_MISSING_VAR}")


def test_envsubst_iterates(monkeypatch):
    monkeypatch.setenv("WDS_A", "${B}/a")
    monkeypatch.setenv("WDS_B", "/root2")
    assert envsubst("${A}") == "/root2/a"


def test_expand_urls_multisource_weights(monkeypatch):
    monkeypatch.setenv("WDS_D", "/d")
    urls, weights = expand_urls("${D}/s{0..1}.pq::${D}/t.pq", weights="2::3")
    assert urls == ["/d/s0.pq", "/d/s1.pq", "/d/t.pq"]
    assert weights == [2.0, 2.0, 3.0]  # per-source weight broadcast


def test_expand_urls_scalar_weight_and_list_passthrough():
    urls, weights = expand_urls(["a", "b"], weights=1.5)
    assert urls == ["a", "b"] and weights == [1.5, 1.5]
    with pytest.raises(ValueError):
        expand_urls("a::b", weights="1")


def test_split_sources():
    specs, total = split_sources(
        "s1::s2", sampling_weights="1::2", num_samples="100::200"
    )
    assert specs == [
        SourceSpec(url="s1", sampling_weight=1.0, num_samples=100),
        SourceSpec(url="s2", sampling_weight=2.0, num_samples=200),
    ]
    assert total == 300
    specs, total = split_sources("solo", num_samples=50)
    assert specs == [SourceSpec(url="solo")] and total == 50


def test_plan_files_and_partitions(tmp_path, monkeypatch):
    for i in range(4):
        pq.write_table(
            pa.table({"doc_id": pa.array([i], pa.int64())}),
            str(tmp_path / f"docs-{i:04d}.parquet"),
        )
    pat = str(tmp_path / "docs-{0000..0003}.parquet")
    assert plan_files(pat) == [
        str(tmp_path / f"docs-{i:04d}.parquet") for i in range(4)
    ]
    # directory entries expand to their parquet listing
    assert len(plan_files(str(tmp_path))) == 4

    from chug_ray.run import plan_partitions

    monkeypatch.setenv("CHUG_CORPUS", str(tmp_path))
    groups = plan_partitions("${CORPUS}/docs-{0000..0003}.parquet", 2)
    assert len(groups) == 2
    assert sorted(f for g in groups for f in g) == plan_files(pat)
    with pytest.raises(FileNotFoundError):
        plan_partitions(str(tmp_path / "docs-{0004..0005}.parquet"), None)


def test_urldir():
    from chug_ray.urls import urldir

    assert urldir("/data/shards/s-0001.tar") == "/data/shards"
    assert urldir("s3://bucket/path/s.tar") == "s3://bucket/path"
    assert urldir("https://host/a/b/c.parquet?x=1") == "https://host/a/b?x=1"
