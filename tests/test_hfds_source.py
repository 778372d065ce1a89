"""hfds-shaped source (S6): snapshot shard resolution, decode-disable
passthrough, and SafeDataset-style row-skip semantics."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_snapshot_roundtrip(ray_session, tmp_path):
    from chug_ray.ops.sources import hfds_snapshot_files, hfds_source, make_hfds_snapshot

    snap = make_hfds_snapshot(
        f"{SF}/documents.parquet", str(tmp_path / "snap"), shards=3
    )
    files = hfds_snapshot_files(snap)
    assert len(files) == 3
    rows = hfds_source(snap, columns=["doc_id"]).take_all()
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    assert sorted(r["doc_id"] for r in rows) == sorted(src["doc_id"].to_pylist())
    with pytest.raises(FileNotFoundError):
        hfds_snapshot_files(snap, split="validation")


def test_safe_decode_skips_bad_rows(ray_session, tmp_path):
    """SafeDataset semantics: a decode_fn raising on some rows drops
    exactly those rows under skip policy, and propagates under raise."""
    from chug_ray.ops.sources import hfds_source, make_hfds_snapshot

    snap = make_hfds_snapshot(
        f"{SF}/documents.parquet", str(tmp_path / "snap")
    )

    def decode(row):
        if row["doc_id"] % 10 == 3:
            raise ValueError("corrupt row")
        return row

    rows = hfds_source(
        snap, columns=["doc_id", "lang"], decode_fn=decode
    ).take_all()
    ids = {r["doc_id"] for r in rows}
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    all_ids = set(src["doc_id"].to_pylist())
    assert ids == {i for i in all_ids if i % 10 != 3}

    with pytest.raises(Exception):
        hfds_source(
            snap, columns=["doc_id"], decode_fn=decode, error_policy="raise"
        ).take_all()


def test_hfds_docs_matches_documents(ray_session):
    from chug_ray.ops.sources import hfds_docs

    rows = hfds_docs(SF).take_all()
    src = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )
    want = sorted(
        zip(
            src["doc_id"].to_pylist(),
            src["lang"].to_pylist(),
            src["source"].to_pylist(),
            (int(x) for x in src["n_chars"].to_pylist()),
        )
    )
    got = sorted(
        (r["doc_id"], r["lang"], r["source"], r["n_chars"]) for r in rows
    )
    assert got == want
