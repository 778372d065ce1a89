"""Pins for the final-round core-path hardening: ranged-store thread
safety, directory store_mtime keys, unambiguous incremental
fingerprints, mixed-format span_pages probing, url expansion on the
incremental CLI path, and the plan-time error-policy notice."""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _tiny_media(path: str, n: int = 6):
    pq.write_table(
        pa.table(
            {
                "media_ref": pa.array([f"m{i:03d}" for i in range(n)]),
                "payload": pa.array([b"x" * 64] * n, pa.binary()),
            }
        ),
        path,
    )


def test_prepare_ranged_store_concurrent_threads(ray_session, tmp_path):
    """Two threads preparing the same cold key must both return a
    valid store (run_job's overlap=2 cold-cache scenario) — no
    rmtree-under-writer or replace-on-nonempty crash."""
    from chug_ray.io import RangedMediaStore, prepare_ranged_store

    src = str(tmp_path / "media.parquet")
    _tiny_media(src)
    dst = str(tmp_path / "ranged_store")
    results, errors = [], []

    def go():
        try:
            results.append(prepare_ranged_store(src, dst_dir=dst))
        except Exception as e:  # pragma: no cover - the bug under test
            errors.append(e)

    ts = [threading.Thread(target=go) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    assert results == [dst, dst]
    store = RangedMediaStore(dst)
    assert store.lookup("m003") == b"x" * 64


def test_store_mtime_sees_in_place_rewrite(tmp_path):
    """A directory store's cache key must change when a contained file
    is rewritten in place (the dir's own mtime does not)."""
    from chug_ray.io import store_mtime

    d = tmp_path / "store"
    d.mkdir()
    f = d / "part.parquet"
    _tiny_media(str(f))
    before = store_mtime(str(d))
    os.utime(d, (before - 100, before - 100))  # freeze the dir mtime
    os.utime(f, (before + 50, before + 50))  # rewrite-in-place analog
    assert store_mtime(str(d)) >= before + 50


def test_doc_fp_framing_unambiguous():
    """Field values containing the old separator byte (or None) must
    not collide: length-prefixed framing keeps boundaries exact."""
    from chug_ray.incremental import _doc_fp_batch

    def fp_of(spans):
        t = pa.table(
            {
                "doc_id": pa.array(["d"]),
                "spans": pa.array(
                    [spans],
                    pa.list_(
                        pa.struct(
                            [
                                ("kind", pa.string()),
                                ("text", pa.string()),
                                ("media_ref", pa.string()),
                                ("offset", pa.int64()),
                            ]
                        )
                    ),
                ),
            }
        )
        return _doc_fp_batch(t)["fp"][0].as_py()

    a = fp_of(
        [{"kind": "text", "text": "x", "media_ref": "y\x00z", "offset": 0}]
    )
    b = fp_of(
        [{"kind": "text", "text": "x\x00y", "media_ref": "z", "offset": 0}]
    )
    assert a != b
    c = fp_of(
        [{"kind": "text", "text": None, "media_ref": None, "offset": 0}]
    )
    d = fp_of(
        [{"kind": "text", "text": "None", "media_ref": "None", "offset": 0}]
    )
    assert c != d


def test_plan_notice_for_reference_aliases(recwarn, caplog):
    """warn_and_continue / log_and_continue must emit their channel
    once at plan time (the reference side effect is not dropped)."""
    import logging
    import warnings

    from chug_ray.errors import plan_notice

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan_notice("warn_and_continue")
    assert len(w) == 1 and "err channel" in str(w[0].message)

    with caplog.at_level(logging.WARNING, logger="chug_ray"):
        plan_notice("log_and_continue")
    assert any("err channel" in r.message for r in caplog.records)

    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        plan_notice("skip")  # no channel -> silent
    assert not w2


def test_run_job_mixed_span_pages_falls_back(ray_session, tmp_path):
    """A corpus mixing files with and without span_pages must take the
    broadcast-meta fallback for ALL files (not misroute legacy rows)."""
    from chug_ray.config import CorpusConfig, ExtractConfig
    from chug_ray.run import run_job
    from chug_ray.synth import write_corpus_inline

    corpus = tmp_path / "corpus"
    write_corpus_inline(
        CorpusConfig(seed=3, n_docs=40, skew="test"), str(corpus)
    )
    docs = pq.read_table(str(corpus / "documents.parquet"))
    shards = tmp_path / "shards"
    shards.mkdir()
    half = docs.num_rows // 2
    pq.write_table(docs.slice(0, half), str(shards / "a.parquet"))
    legacy = docs.slice(half).drop_columns(["span_pages"])
    pq.write_table(legacy, str(shards / "b.parquet"))

    out = tmp_path / "out"
    manifests = run_job(
        str(shards),
        str(out),
        ExtractConfig(media_store_path=str(corpus / "media.parquet")),
        num_partitions=2,
    )
    assert sum(m.n_docs for m in manifests) == docs.num_rows


def test_incremental_cli_expands_brace_patterns(ray_session, tmp_path):
    """--docs brace patterns must work on the incremental path exactly
    as they do on the full-run path."""
    from chug_ray.config import CorpusConfig, ExtractConfig
    from chug_ray.incremental import run_incremental
    from chug_ray.run import run_job
    from chug_ray.urls import expand_urls, plan_files

    corpus = tmp_path / "corpus"
    write = __import__(
        "chug_ray.synth", fromlist=["write_corpus_inline"]
    ).write_corpus_inline
    write(CorpusConfig(seed=5, n_docs=30, skew="test"), str(corpus))
    docs = pq.read_table(str(corpus / "documents.parquet"))
    for i in range(2):
        n = docs.num_rows // 2
        pq.write_table(
            docs.slice(i * n, n), str(tmp_path / f"s-{i:03d}.parquet")
        )
    pattern = str(tmp_path / "s-{000..001}.parquet")

    cfg = ExtractConfig(media_store_path=str(corpus / "media.parquet"))
    prev_out = tmp_path / "prev_out"
    run_job(pattern, str(prev_out), cfg, num_partitions=1)

    # mirror run.py's CLI expansion seam, then run incrementally with
    # the SAME snapshot: everything must be copied, nothing extracted
    sources, _ = expand_urls(pattern)
    files = [f for s in sources for f in plan_files(s)]
    assert len(files) == 2
    out = tmp_path / "out"
    s = run_incremental(
        files, files, str(prev_out), str(out), cfg, num_out_partitions=1
    )
    assert s["n_extracted"] == 0
    assert s["n_copied"] == docs.num_rows
