"""End-to-end: Ray pipeline output == sequential oracle under
span-sequence equality (kind, text, media_ref, order), across sampling
policies, skew-path splits, partitionings, and resume (SURVEY.md §5.2.4/5)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from chug_ray.config import ExtractConfig
from chug_ray.io import read_output
from chug_ray.oracle import canonical, diff, oracle_extract_table
from chug_ray.pipeline import broadcast_media_meta, build_extract_pipeline
from chug_ray.run import run_job


def _load_tables(docs_path, media_path):
    return pq.read_table(docs_path), pq.read_table(media_path)


def _run_pipeline(ray, docs_path, media_path, cfg):
    docs = ray.data.read_parquet(docs_path)
    meta_ref = broadcast_media_meta(media_path)
    out = build_extract_pipeline(docs, cfg, media_meta_ref=meta_ref)
    return out.take_all()  # t1 scale — fine to materialize in tests


def _assert_matches_oracle(ray, t1_corpus, cfg):
    _, docs_path, media_path = t1_corpus
    docs_tbl, media_tbl = _load_tables(docs_path, media_path)
    expected = canonical(oracle_extract_table(docs_tbl, media_tbl, cfg))
    actual = canonical(_run_pipeline(ray, docs_path, media_path, cfg))
    problems = diff(expected, actual)
    assert not problems, "\n".join(problems)
    assert len(actual) == len(expected)


@pytest.mark.parametrize("policy", ["all_valid", "first", "all", "random"])
def test_pipeline_matches_oracle(ray_session, t1_corpus, policy):
    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(
        page_sampling=policy, seed=3, media_store_path=media_path
    )
    _assert_matches_oracle(ray_session, t1_corpus, cfg)


@pytest.mark.parametrize("mode", ["broadcast", "ranged"])
def test_store_backends_bit_identical(ray_session, t1_corpus, mode):
    """The ranged row-group backend must produce the same spans as the
    broadcast backend, and both must match the sequential oracle."""
    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(
        page_sampling="all_valid",
        seed=3,
        media_store_path=media_path,
        media_store_mode=mode,
        # drive some docs down the heavy path so every store-consuming
        # stage (light extract, explode planning, unit decode) runs
        heavy_cost_threshold=40,
    )
    _assert_matches_oracle(ray_session, t1_corpus, cfg)


@pytest.mark.parametrize(
    "threshold,picked",
    [(10**15, "broadcast"), (0, "ranged")],
)
def test_auto_media_mode_footer_pick(
    ray_session, t1_corpus, threshold, picked, caplog
):
    """media_store_mode='auto' picks from the parquet footer byte total
    (the auto_join pattern) and the picked backend still matches the
    sequential oracle bit-for-bit."""
    import logging

    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(
        page_sampling="all_valid",
        seed=3,
        media_store_path=media_path,
        media_store_mode="auto",
        media_broadcast_threshold_bytes=threshold,
        heavy_cost_threshold=40,
    )
    with caplog.at_level(logging.INFO, logger="chug_ray.pipeline"):
        _assert_matches_oracle(ray_session, t1_corpus, cfg)
    assert any(
        f"picked {picked}" in r.getMessage() for r in caplog.records
    )


def test_auto_media_mode_nbytes_matches_footer(t1_corpus):
    import pyarrow.parquet as pq2

    from chug_ray.pipeline import _media_store_nbytes

    _, _, media_path = t1_corpus
    md = pq2.ParquetFile(media_path).metadata
    want = sum(
        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
    )
    assert _media_store_nbytes(media_path) == want > 0


def test_ranged_store_lookup_with_tiny_lru(ray_session, t1_corpus):
    """Cache capacity 1 still answers every ref correctly (evict+reload)."""
    import pyarrow.parquet as pq2

    from chug_ray.io import MediaStore, RangedMediaStore, prepare_ranged_store

    _, _, media_path = t1_corpus
    store_dir = prepare_ranged_store(media_path, rows_per_group=4)
    ranged = RangedMediaStore(store_dir, cache_groups=1)
    broadcast = MediaStore(media_path)
    refs = pq2.read_table(media_path, columns=["media_ref"])[
        "media_ref"
    ].to_pylist()
    assert refs
    for ref in refs:
        assert ranged.lookup(ref) == broadcast.lookup(ref)
    assert ranged.lookup("zzz-no-such-ref") is None


def test_all_heavy_equals_all_light(ray_session, t1_corpus):
    """Forcing every doc down the explode/reassemble path must reproduce
    the light path bit-for-bit — the explode is a bijection."""
    _, docs_path, media_path = t1_corpus
    base = dict(page_sampling="all_valid", seed=5, media_store_path=media_path)
    light = _run_pipeline(
        ray_session, docs_path, media_path,
        ExtractConfig(heavy_cost_threshold=10**9, **base),
    )
    heavy = _run_pipeline(
        ray_session, docs_path, media_path,
        ExtractConfig(heavy_cost_threshold=0, pages_per_unit=3, **base),
    )
    problems = diff(canonical(light), canonical(heavy))
    assert not problems, "\n".join(problems)


def test_partitioning_invariance(ray_session, t1_corpus):
    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(page_sampling="random", seed=9, media_store_path=media_path)
    meta_ref = broadcast_media_meta(media_path)
    a = build_extract_pipeline(
        ray_session.data.read_parquet(docs_path), cfg, meta_ref
    ).take_all()
    b = build_extract_pipeline(
        ray_session.data.read_parquet(docs_path, override_num_blocks=7),
        cfg,
        meta_ref,
    ).take_all()
    problems = diff(canonical(a), canonical(b))
    assert not problems, "\n".join(problems)


def test_run_job_resume(ray_session, t1_corpus, tmp_path):
    """Kill-and-resume: a rerun skips completed partitions and the final
    output equals a clean full run."""
    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(
        page_sampling="all_valid", seed=1, media_store_path=media_path
    )
    out_root = str(tmp_path / "out")
    m1 = run_job(docs_path, out_root, cfg)
    assert len(m1) == 1 and m1[0].n_docs == 200
    first_completed_at = m1[0].completed_at

    # rerun: manifest hit, no recompute (completed_at unchanged)
    m2 = run_job(docs_path, out_root, cfg)
    assert m2[0].completed_at == first_completed_at

    # config change ⇒ partition recomputed
    cfg2 = ExtractConfig(
        page_sampling="first", seed=1, media_store_path=media_path
    )
    m3 = run_job(docs_path, out_root, cfg2)
    assert m3[0].completed_at != first_completed_at

    out = read_output(out_root)
    docs_tbl, media_tbl = _load_tables(docs_path, media_path)
    expected = canonical(oracle_extract_table(docs_tbl, media_tbl, cfg2))
    actual = canonical(out.to_pylist())
    problems = diff(expected, actual)
    assert not problems, "\n".join(problems)


def test_error_accounting(ray_session, t1_corpus, tmp_path):
    """No row silently lost: every input doc appears in the output, either
    extracted or in the error side channel; manifests record both."""
    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(page_sampling="all_valid", seed=2, media_store_path=media_path)
    out_root = str(tmp_path / "out")
    manifests = run_job(docs_path, out_root, cfg)
    total = sum(m.n_docs for m in manifests)
    assert total == 200
    errs = sum(m.n_err_docs for m in manifests)
    docs_tbl, media_tbl = _load_tables(docs_path, media_path)
    oracle_rows = oracle_extract_table(docs_tbl, media_tbl, cfg)
    assert errs == sum(1 for r in oracle_rows if r["err"] is not None)
    assert errs > 0  # corpus includes corrupt/missing archetypes


def test_run_job_ranged_mode_resume(ray_session, t1_corpus, tmp_path):
    """The job driver with the ranged store backend: produces the same
    output as broadcast mode and still honors checkpoint resume."""
    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(
        page_sampling="all_valid",
        seed=1,
        media_store_path=media_path,
        media_store_mode="ranged",
    )
    out_root = str(tmp_path / "ranged_out")
    m1 = run_job(docs_path, out_root, cfg)
    assert len(m1) == 1 and m1[0].n_docs == 200
    m2 = run_job(docs_path, out_root, cfg)
    assert m2[0].completed_at == m1[0].completed_at  # checkpoint hit

    docs_tbl, media_tbl = _load_tables(docs_path, media_path)
    expected = canonical(oracle_extract_table(docs_tbl, media_tbl, cfg))
    actual = canonical(read_output(out_root).to_pylist())
    problems = diff(expected, actual)
    assert not problems, "\n".join(problems)


def test_run_job_overlap_matches_sequential(ray_session, t1_corpus, tmp_path):
    """Overlapped partition execution (driver threads) is bit-identical
    to the strictly sequential loop — partitions are independent
    checkpoint units either way."""
    import pyarrow.parquet as pq

    from chug_ray.io import read_output

    _, docs_path, media_path = t1_corpus
    # split the corpus into 4 shard files so there are partitions to overlap
    t = pq.read_table(docs_path)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    step = (t.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(
            t.slice(i * step, step), str(shard_dir / f"s-{i}.parquet")
        )
    cfg = ExtractConfig(
        page_sampling="random", seed=3, media_store_path=media_path
    )
    seq_out = str(tmp_path / "seq")
    ovl_out = str(tmp_path / "ovl")
    m_seq = run_job(str(shard_dir), seq_out, cfg, overlap=1)
    m_ovl = run_job(str(shard_dir), ovl_out, cfg, overlap=3)
    assert [m.partition_id for m in m_seq] == [m.partition_id for m in m_ovl]
    assert [m.n_docs for m in m_seq] == [m.n_docs for m in m_ovl]

    def rows(root):
        tbl = read_output(root)
        return sorted(
            zip(tbl["doc_id"].to_pylist(), tbl["spans"].to_pylist())
        )

    assert rows(seq_out) == rows(ovl_out)


def test_span_pages_path_no_broadcast_and_identical(
    ray_session, t1_corpus, tmp_path, monkeypatch
):
    """Default path: docs tables carry span_pages, the classifier reads
    cost from the batch, and run_job never builds the O(n_media)
    driver-resident media-meta broadcast. A legacy table (column
    dropped) must take the broadcast path and produce bit-identical
    output."""
    import os

    import chug_ray.run as runmod

    _, docs_path, media_path = t1_corpus
    cfg = ExtractConfig(
        page_sampling="random", seed=0, media_store_path=media_path
    )

    calls = []
    orig = runmod.broadcast_media_meta
    monkeypatch.setattr(
        runmod,
        "broadcast_media_meta",
        lambda p: (calls.append(p), orig(p))[1],
    )
    out_new = str(tmp_path / "out_new")
    run_job(docs_path, out_new, cfg, num_partitions=2)
    assert not calls, "broadcast built despite span_pages column"

    legacy_docs = str(tmp_path / "legacy_documents.parquet")
    t = pq.read_table(docs_path)
    assert "span_pages" in t.schema.names
    pq.write_table(t.drop_columns(["span_pages"]), legacy_docs)
    out_old = str(tmp_path / "out_old")
    run_job(legacy_docs, out_old, cfg, num_partitions=2)
    assert calls, "legacy table must fall back to the broadcast"

    a = canonical(read_output(out_new).to_pylist())
    b = canonical(read_output(out_old).to_pylist())
    problems = diff(a, b)
    assert not problems, "\n".join(problems)


def test_classifier_rejects_misaligned_span_pages(ray_session, tmp_path):
    """span_pages shorter/longer than spans is corrupt input: loud
    plan-time-ish failure, not silently wrong costs."""
    import pyarrow as pa
    import pytest as _pytest

    from chug_ray.pipeline import make_classifier

    batch = pa.table(
        {
            "doc_id": pa.array(["a"]),
            "spans": pa.array(
                [[{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]]
            ),
            "span_pages": pa.array([[1, 2]], pa.list_(pa.int32())),
        }
    )
    with _pytest.raises(ValueError, match="span_pages length"):
        make_classifier(None, 8)(batch)
