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


def test_hfds_stream_source_set_equal_across_epochs(ray_session, tmp_path):
    """The globally observed ORDER of the stream is consumption-order
    (Ray block splits/completion — same contract as the reference's
    worker-count-dependent buffer), so the distributed assertions are
    about the row SET; the deterministic components (shard order,
    within-block permutation) are pinned as pure functions below."""
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

    for epoch in (0, 1):
        got = sorted(
            r["doc_id"]
            for r in hfds_stream_source(
                snap, seed=7, epoch=epoch, buffer_size=16
            ).take_all()
        )
        assert got == list(range(200))  # nothing dropped or duplicated


def test_hfds_stream_shard_order_deterministic_per_epoch():
    from chug_ray.ops.sources import _stream_shard_order

    e0 = list(_stream_shard_order(16, seed=7, epoch=0))
    e0b = list(_stream_shard_order(16, seed=7, epoch=0))
    e1 = list(_stream_shard_order(16, seed=7, epoch=1))
    assert e0 == e0b  # set_epoch-style reseeding is deterministic
    assert e0 != e1  # and epoch actually reorders
    assert sorted(e0) == list(range(16)) == sorted(e1)


def test_hfds_stream_buffer_block_permutation():
    """The per-block buffer shuffle: deterministic for a given block,
    displacement bounded by buffer_size, epoch-sensitive."""
    import numpy as np
    import pyarrow as pa

    from chug_ray.ops.sources import _buffer_shuffle_block

    block = pa.table({"doc_id": pa.array(range(300), pa.int64())})
    a = _buffer_shuffle_block(block, seed=3, epoch=0, buffer_size=32)
    b = _buffer_shuffle_block(block, seed=3, epoch=0, buffer_size=32)
    c = _buffer_shuffle_block(block, seed=3, epoch=1, buffer_size=32)
    out = a["doc_id"].to_numpy()
    assert a.equals(b)  # keyed → deterministic
    assert not a.equals(c)  # epoch reorders
    displacement = np.abs(out - np.arange(len(out)))
    assert displacement.max() < 32  # reservoir displacement bound
    assert (out != np.arange(len(out))).any()  # actually shuffled
    assert sorted(out.tolist()) == list(range(300))


def test_hfds_stream_pipeline_wiring(ray_session, tmp_path):
    """End-to-end wiring proof (the pure-function tests alone would stay
    green if the pipeline stopped applying them): with preserve_order
    and override_num_blocks pinning one block per shard (the docstring's
    bit-reproducible mode), the streamed order must equal manually
    composing shard permutation + per-block buffer shuffle with the
    SAME (seed, epoch) — dropping the shuffle, hardcoding the epoch, or
    mis-threading args breaks the equality."""
    import pyarrow as pa
    import ray

    from chug_ray.ops.sources import (
        _buffer_shuffle_block,
        _stream_shard_order,
        hfds_snapshot_files,
        hfds_stream_source,
        make_hfds_snapshot,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array(range(64), pa.int64()),
            "val": pa.array([f"v{i}" for i in range(64)]),
        }
    )
    src = tmp_path / "docs.parquet"
    pq.write_table(tbl, str(src))
    snap = make_hfds_snapshot(str(src), str(tmp_path / "snap"), shards=4)
    files = hfds_snapshot_files(snap)

    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        for seed, epoch in ((7, 0), (7, 1), (3, 0)):
            got = [
                r["doc_id"]
                for r in hfds_stream_source(
                    snap,
                    seed=seed,
                    epoch=epoch,
                    buffer_size=8,
                    override_num_blocks=len(files),
                ).take_all()
            ]
            want = []
            for i in _stream_shard_order(len(files), seed, epoch):
                shard = pq.read_table(files[i])
                want.extend(
                    _buffer_shuffle_block(shard, seed, epoch, 8)[
                        "doc_id"
                    ].to_pylist()
                )
            assert got == want, (seed, epoch)
    finally:
        ctx.execution_options.preserve_order = prev
