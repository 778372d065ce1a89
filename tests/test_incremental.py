"""Incremental re-extraction (chug_ray/incremental.py): the delta run
must be bit-identical to a full re-run over the new snapshot while
extracting only the changed docs."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from chug_ray.config import CorpusConfig, ExtractConfig
from chug_ray.incremental import run_incremental
from chug_ray.io import read_output
from chug_ray.run import run_job
from chug_ray.synth import write_corpus_inline


def _canon(table: pa.Table) -> dict:
    rows = {}
    for r in table.to_pylist():
        spans = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in (r["spans"] or [])
        )
        parse = (
            (r["parse"]["num_pages"], tuple(r["parse"]["page_indices"] or []))
            if r["parse"] is not None
            else None
        )
        err = r["err"]["stage"] if r["err"] is not None else None
        rows[r["doc_id"]] = (spans, parse, err)
    return rows


def test_incremental_equals_full_rerun(ray_session, tmp_path):
    v1 = str(tmp_path / "v1")
    write_corpus_inline(CorpusConfig(seed=11, n_docs=120, skew="test"), v1)
    docs1 = os.path.join(v1, "documents.parquet")
    media = os.path.join(v1, "media.parquet")
    cfg = ExtractConfig(
        page_sampling="random", seed=0, media_store_path=media
    )
    out1 = str(tmp_path / "out1")
    run_job(docs1, out1, cfg, num_partitions=2)

    # v2 snapshot: 4 docs removed, 4 docs changed (a span edited),
    # 4 docs added (clones under fresh ids)
    t = pq.read_table(docs1)
    rows = t.to_pylist()
    removed = {rows[i]["doc_id"] for i in range(0, 16, 4)}
    changed = [rows[i]["doc_id"] for i in range(1, 17, 4)]
    v2_rows = []
    for r in rows:
        if r["doc_id"] in removed:
            continue
        if r["doc_id"] in changed:
            spans = list(r["spans"] or [])
            spans.append(
                {
                    "kind": "text",
                    "text": "edited in v2",
                    "media_ref": "",
                    "offset": len(spans),
                }
            )
            r = {
                **r,
                "spans": spans,
                "span_pages": list(r["span_pages"] or []) + [1],
            }
        v2_rows.append(r)
    added = []
    for i in range(17, 33, 4):
        src = rows[i]
        added.append(src["doc_id"] + "-v2new")
        v2_rows.append({**src, "doc_id": added[-1]})
    v2 = str(tmp_path / "v2")
    os.makedirs(v2)
    docs2 = os.path.join(v2, "documents.parquet")
    pq.write_table(pa.Table.from_pylist(v2_rows, schema=t.schema), docs2)

    out2_inc = str(tmp_path / "out2_inc")
    summary = run_incremental(docs2, docs1, out1, out2_inc, cfg)
    assert summary["n_extracted"] == len(changed) + len(added)
    assert summary["n_copied"] == len(v2_rows) - len(changed) - len(added)

    out2_full = str(tmp_path / "out2_full")
    run_job(docs2, out2_full, cfg, num_partitions=2)

    got = _canon(read_output(out2_inc))
    want = _canon(read_output(out2_full))
    assert set(got) == set(want)
    mism = [d for d in want if got[d] != want[d]]
    assert not mism, f"{len(mism)} docs differ, e.g. {mism[:3]}"
    # removed docs are gone, added docs are present
    assert removed.isdisjoint(got)
    assert set(added) <= set(got)
    # manifests exist per partition
    mdir = os.path.join(out2_inc, "_manifests")
    parts = [f for f in os.listdir(mdir) if f.startswith("part-")]
    assert len(parts) == 4


def test_incremental_rejects_config_change(ray_session, tmp_path):
    v1 = str(tmp_path / "v1")
    write_corpus_inline(CorpusConfig(seed=3, n_docs=30, skew="test"), v1)
    docs1 = os.path.join(v1, "documents.parquet")
    media = os.path.join(v1, "media.parquet")
    cfg = ExtractConfig(page_sampling="first", seed=0, media_store_path=media)
    out1 = str(tmp_path / "out1")
    run_job(docs1, out1, cfg, num_partitions=1)
    cfg2 = ExtractConfig(
        page_sampling="all_valid", seed=0, media_store_path=media
    )
    with pytest.raises(ValueError, match="config changed"):
        run_incremental(
            docs1, docs1, out1, str(tmp_path / "out2"), cfg2
        )


def test_incremental_rejects_media_change(ray_session, tmp_path):
    """In-place media payload edits are invisible to docs-side span
    fingerprints; the media-store fingerprint must catch them."""
    v1 = str(tmp_path / "v1")
    write_corpus_inline(CorpusConfig(seed=5, n_docs=30, skew="test"), v1)
    docs1 = os.path.join(v1, "documents.parquet")
    media = os.path.join(v1, "media.parquet")
    cfg = ExtractConfig(page_sampling="first", seed=0, media_store_path=media)
    out1 = str(tmp_path / "out1")
    run_job(docs1, out1, cfg, num_partitions=1)
    # rewrite the media store in place (same path, same schema)
    t = pq.read_table(media)
    payloads = t["payload"].to_pylist()
    payloads[0] = payloads[0] + b"\x00"
    pq.write_table(
        t.set_column(
            t.schema.get_field_index("payload"),
            "payload",
            pa.array(payloads, pa.large_binary()),
        ),
        media,
    )
    with pytest.raises(ValueError, match="media store changed"):
        run_incremental(docs1, docs1, out1, str(tmp_path / "out2"), cfg)


def test_incremental_chains_off_incremental_output(ray_session, tmp_path):
    """A second incremental run whose --prev-out is itself an
    incremental output must validate cleanly: the summary manifest
    (incremental.json, which carries no media_fp) must be skipped by
    the prev-manifest validation loop."""
    v1 = str(tmp_path / "v1")
    write_corpus_inline(CorpusConfig(seed=7, n_docs=40, skew="test"), v1)
    docs1 = os.path.join(v1, "documents.parquet")
    media = os.path.join(v1, "media.parquet")
    cfg = ExtractConfig(page_sampling="first", seed=0, media_store_path=media)
    out1 = str(tmp_path / "out1")
    run_job(docs1, out1, cfg, num_partitions=1)

    # v2: edit one doc
    t = pq.read_table(docs1)
    rows = t.to_pylist()
    rows[0] = {
        **rows[0],
        "spans": list(rows[0]["spans"] or [])
        + [{"kind": "text", "text": "v2", "media_ref": "", "offset": 99}],
        "span_pages": list(rows[0]["span_pages"] or []) + [1],
    }
    v2 = str(tmp_path / "v2")
    os.makedirs(v2)
    docs2 = os.path.join(v2, "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), docs2)
    out2 = str(tmp_path / "out2")
    s2 = run_incremental(docs2, docs1, out1, out2, cfg)
    assert s2["n_extracted"] == 1

    # v3: identical to v2 — chain the incremental off the incremental
    v3 = str(tmp_path / "v3")
    os.makedirs(v3)
    docs3 = os.path.join(v3, "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), docs3)
    out3 = str(tmp_path / "out3")
    s3 = run_incremental(docs3, docs2, out2, out3, cfg)
    assert s3["n_extracted"] == 0
    assert s3["n_copied"] == len(rows)
    got = _canon(read_output(out3))
    want = _canon(read_output(out2))
    assert got == want


def test_incremental_removed_only_bucket_schema(ray_session, tmp_path):
    """A hash bucket containing only removed docs yields an empty
    classify frame; it must be typed (string doc_id) so Arrow schema
    unification with non-empty buckets succeeds."""
    v1 = str(tmp_path / "v1")
    write_corpus_inline(CorpusConfig(seed=9, n_docs=24, skew="test"), v1)
    docs1 = os.path.join(v1, "documents.parquet")
    media = os.path.join(v1, "media.parquet")
    cfg = ExtractConfig(page_sampling="first", seed=0, media_store_path=media)
    out1 = str(tmp_path / "out1")
    run_job(docs1, out1, cfg, num_partitions=1)

    # v2 removes half the docs; with many buckets some buckets are
    # removed-only, exercising the typed-empty branch
    t = pq.read_table(docs1)
    rows = [r for i, r in enumerate(t.to_pylist()) if i % 2 == 0]
    v2 = str(tmp_path / "v2")
    os.makedirs(v2)
    docs2 = os.path.join(v2, "documents.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), docs2)
    out2 = str(tmp_path / "out2")
    s2 = run_incremental(docs2, docs1, out1, out2, cfg, num_buckets=64)
    assert s2["n_extracted"] == 0
    assert s2["n_docs"] == len(rows)
