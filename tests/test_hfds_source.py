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


def test_hfds_stream_source_set_equal_and_epoch_reorders(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.sources import hfds_stream_source, make_hfds_snapshot

    tbl = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "val": pa.array([f"v{i}" for i in range(200)]),
        }
    )
    src = tmp_path / "docs.parquet"
    pq.write_table(tbl, str(src))
    snap = make_hfds_snapshot(str(src), str(tmp_path / "snap"), shards=4)

    def ids(epoch):
        return [
            r["doc_id"]
            for r in hfds_stream_source(
                snap, seed=7, epoch=epoch, buffer_size=16
            ).take_all()
        ]

    e0, e0b, e1 = ids(0), ids(0), ids(1)
    # the row SET is exactly the snapshot at every epoch
    assert sorted(e0) == list(range(200)) == sorted(e1)
    # same (seed, epoch) → same order; different epoch → different order
    assert e0 == e0b
    assert e0 != e1


def test_hfds_stream_buffer_bounds_displacement(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chug_ray.ops.sources import hfds_stream_source, make_hfds_snapshot

    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64())})
    src = tmp_path / "docs.parquet"
    pq.write_table(tbl, str(src))
    # one shard → one block: within-block displacement must stay inside
    # the buffer_size span, like a reservoir of that size
    snap = make_hfds_snapshot(str(src), str(tmp_path / "snap"), shards=1)
    out = np.array(
        [
            r["doc_id"]
            for r in hfds_stream_source(
                snap, seed=3, epoch=0, buffer_size=32
            ).take_all()
        ]
    )
    displacement = np.abs(out - np.arange(len(out)))
    assert displacement.max() < 32
    assert (out != np.arange(len(out))).any()  # actually shuffled
