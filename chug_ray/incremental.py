"""Incremental re-extraction: refresh a corpus output for a new input
snapshot by re-running the extraction pipeline ONLY on new/changed
documents and copying prior output rows through for unchanged ones —
the daily-crawl-refresh pass a 100 TB corpus cannot afford to recompute
from scratch.

Because every random draw in the pipeline is keyed ``(seed, doc_id,
offset)``, the incremental output is **bit-identical** to a full re-run
over the new snapshot (asserted by tests/test_incremental.py), while
the decode work — the dominant cost — touches only the delta.

Shapes (all bounded, no driver materialization of any table):
* delta detection — both snapshots reduce to (doc_id, content-hash)
  rows, one doc-hash bucket shuffle classifies each doc new / changed /
  unchanged / removed;
* payload routing — the new snapshot's rows and the prior output's
  rows each co-shuffle once with the tiny status rows on the same
  buckets (an in-group ``is_in`` filter), so changed docs flow to the
  extraction pipeline and unchanged docs to the copy path;
* sharded write — one hive pass (``partition_cols``) lays the merged
  output down as ``part-<k>`` directories with per-partition manifests,
  same layout and stats as :func:`chug_ray.run.run_job`.

A config-hash mismatch against the prior manifests invalidates the copy
path entirely (the caller should fall back to a full run).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa

from chug_ray.config import ExtractConfig
from chug_ray.io import PartitionManifest, media_store_fp, output_stats
from chug_ray.pipeline import broadcast_media_meta, build_extract_pipeline
from chug_ray.run import _config_hash


def _doc_fp_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fp) rows: a content hash over the span sequence.

    Length-prefixed field framing, NOT separator-joined f-strings: a
    text containing the separator byte (or a None rendering as the
    string 'None') could otherwise shift field boundaries and let two
    different documents collide to one fingerprint — which would make
    the incremental run copy stale prior output instead of
    re-extracting. Both snapshots hash with the same function inside
    one run, so the encoding needs no cross-version stability."""
    fps = []
    none_marker = b"\xff\xff\xff\xffN"  # impossible as a length prefix
    for spans in batch["spans"].to_pylist():
        h = hashlib.blake2b(digest_size=12)
        for s in spans or []:
            for v in (s["kind"], s["text"], s["media_ref"], s["offset"]):
                if v is None:
                    h.update(none_marker)
                else:
                    b = (
                        v.encode("utf-8")
                        if isinstance(v, str)
                        else str(v).encode()
                    )
                    h.update(len(b).to_bytes(4, "little"))
                    h.update(b)
            h.update(b"\x01")
        fps.append(h.hexdigest())
    return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps)})


def _bkt(ids, num_buckets: int) -> pa.Array:
    """Stable vectorized bucket of doc_id strings.

    FNV-1a over unicode codepoints in WIDTH-bounded numpy passes (one
    vector op per character column of the fixed-width view) instead of
    a per-row Python hash call — doc_ids are short, so this is ~width
    masked multiplies per batch. Pure arithmetic: deterministic across
    processes, machines and library versions, like the repo's other
    keyed hashes. Only shuffle/partition routing depends on it, so the
    exact function choice never affects row values."""
    strs = np.asarray([str(d) for d in ids], dtype=str)
    n = len(strs)
    if n == 0:
        return pa.array([], pa.int64())
    width = strs.dtype.itemsize // 4
    codes = strs.view(np.uint32).reshape(n, width)
    mask32 = np.uint64(0xFFFFFFFF)
    prime = np.uint64(16777619)
    h = np.full(n, 2166136261, np.uint64)
    for j in range(width):
        c = codes[:, j].astype(np.uint64)
        live = c != 0  # U-dtype zero-pads past each string's end
        if not live.any():
            break
        h = np.where(live, ((h ^ c) * prime) & mask32, h)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64())


def _status_dataset(new_docs, prev_docs, num_buckets: int):
    """(bucket, doc_id, unchanged) for every doc in the NEW snapshot."""
    import pandas as pd

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([side] * len(batch))
            ).append_column("bucket", _bkt(batch["doc_id"].to_pylist(),
                                           num_buckets))

        return fn

    both = (
        new_docs.map_batches(_doc_fp_batch, batch_format="pyarrow")
        .map_batches(tag("n"), batch_format="pyarrow")
        .union(
            prev_docs.map_batches(_doc_fp_batch, batch_format="pyarrow")
            .map_batches(tag("o"), batch_format="pyarrow")
        )
    )

    def classify(group: pd.DataFrame) -> pd.DataFrame:
        piv = group.pivot_table(
            index="doc_id", columns="side", values="fp", aggfunc="first"
        )
        n = piv.get("n")
        if n is None:  # bucket holds only removed docs — typed empty
            # (an empty object-dtype frame infers a null Arrow column
            # that fails schema unification against string doc_id blocks)
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "unchanged": pa.array([], pa.int8()),
                }
            )
        o = piv.get("o")
        unchanged = (
            (n == o) if o is not None else pd.Series(False, index=piv.index)
        )
        keep = n.notna()  # docs present in the new snapshot only
        return pd.DataFrame(
            {
                "doc_id": piv.index[keep],
                "unchanged": unchanged[keep].astype(np.int8),
            }
        )

    return (
        both.materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(classify, batch_format="pandas")
    )


def _route(payload_ds, status_ds, keep_unchanged: bool, num_buckets: int):
    """Co-shuffle payload rows with status rows; keep the requested side.

    Returns the payload rows (original columns) whose doc status matches
    ``keep_unchanged``."""

    def prep_payload(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", _bkt(batch["doc_id"].to_pylist(), num_buckets)
        ).append_column("is_status", pa.array([False] * len(batch)))

    def prep_status(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch["doc_id"]}
        for name in payload_cols:
            if name != "doc_id":
                cols[name] = pa.nulls(len(batch), payload_types[name])
        t = pa.table(cols)
        t = t.append_column(
            "bucket", _bkt(batch["doc_id"].to_pylist(), num_buckets)
        ).append_column("is_status", pa.array([True] * len(batch)))
        return t.append_column(
            "unchanged_flag", batch["unchanged"].cast(pa.int8())
        )

    payload_schema = payload_ds.schema()
    payload_cols = payload_schema.names
    payload_types = dict(zip(payload_schema.names, payload_schema.types))
    # the union below relies on both sides emitting columns in the same
    # order; prep_status puts doc_id first, so the payload must too
    # (ValueError, not assert: must survive python -O)
    if payload_cols[0] != "doc_id":
        raise ValueError(
            f"prior output's first column must be doc_id, got "
            f"{payload_cols}"
        )

    def add_flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "unchanged_flag", pa.nulls(len(batch), pa.int8())
        )

    import pyarrow.compute as pc

    def pick(group: pa.Table) -> pa.Table:
        st = group.filter(group["is_status"])
        want = pc.equal(
            st["unchanged_flag"], pa.scalar(1 if keep_unchanged else 0, pa.int8())
        )
        ids = st.filter(want)["doc_id"]
        rows = group.filter(pc.invert(group["is_status"]))
        rows = rows.filter(pc.is_in(rows["doc_id"], value_set=ids.combine_chunks()))
        return rows.drop_columns(["bucket", "is_status", "unchanged_flag"])

    both = (
        payload_ds.map_batches(prep_payload, batch_format="pyarrow")
        .map_batches(add_flag, batch_format="pyarrow")
        .union(status_ds.map_batches(prep_status, batch_format="pyarrow"))
    )
    return (
        both.materialize()  # partials: sort shuffle re-executes lazy inputs
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


def run_incremental(
    docs_path: str,
    prev_docs_path: str,
    prev_out_root: str,
    out_root: str,
    cfg: ExtractConfig,
    num_buckets: int = 64,
    num_out_partitions: int = 4,
) -> dict:
    """Produce ``out_root`` for the new snapshot from ``prev_out_root``:
    extract only new/changed docs, copy unchanged output rows through,
    drop removed docs. Returns the incremental manifest dict."""
    import shutil

    import ray.data

    cfg_hash = _config_hash(cfg)
    media_fp = media_store_fp(cfg.media_store_path)
    prev_manifest_dir = os.path.join(prev_out_root, "_manifests")
    for name in os.listdir(prev_manifest_dir):
        # only partition manifests carry config_hash/media_fp; summary
        # files (incremental.json) must not fail validation, or chaining
        # a second incremental run off an incremental output always
        # raises even when nothing changed
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(prev_manifest_dir, name)) as f:
            prev = json.load(f)
        if prev.get("config_hash") != cfg_hash:
            raise ValueError(
                "config changed since the prior run — the copy path is "
                "invalid; run a full job instead"
            )
        # the docs-side span fingerprints cannot see in-place payload
        # edits in the media store, so a changed store invalidates the
        # whole copy path (older manifests without the field also fail,
        # conservatively forcing one full run)
        if prev.get("media_fp", "") != media_fp:
            raise ValueError(
                "media store changed since the prior run — span "
                "fingerprints cannot prove output reuse is safe; run a "
                "full job instead"
            )
    t0 = time.perf_counter()
    new_docs = ray.data.read_parquet(docs_path)
    prev_docs = ray.data.read_parquet(prev_docs_path)
    status = _status_dataset(new_docs, prev_docs, num_buckets).materialize()

    changed_docs = _route(new_docs, status, keep_unchanged=False,
                          num_buckets=num_buckets)
    # span_pages-carrying tables classify from the batch itself; only
    # legacy tables need the driver-side media-meta broadcast
    from chug_ray.io import table_has_column

    extracted = build_extract_pipeline(
        changed_docs, cfg,
        media_meta_ref=(
            None
            if table_has_column(docs_path, "span_pages")
            else broadcast_media_meta(cfg.media_store_path)
        ),
    )
    prev_parts = sorted(
        os.path.join(prev_out_root, d)
        for d in os.listdir(prev_out_root)
        if d.startswith("part-") and not d.endswith(".tmp")
    )
    # expand to files: read_parquet treats a multi-element path list as
    # file paths (a dir list only happens to work when it has one entry)
    prev_files = [
        os.path.join(p, f)
        for p in prev_parts
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    prev_out = ray.data.read_parquet(prev_files)
    copied = _route(prev_out, status, keep_unchanged=True,
                    num_buckets=num_buckets)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", _bkt(batch["doc_id"].to_pylist(), num_out_partitions)
        )

    # delta sizes come from the tiny status rows (extraction keeps every
    # input row via the err channel, so n_extracted == n_changed) —
    # counting the big sides would re-execute their pipelines
    import pyarrow.compute as pc

    def count_partial(batch: pa.Table) -> pa.Table:
        u = int(pc.sum(pc.cast(batch["unchanged"], pa.int64())).as_py() or 0)
        return pa.table(
            {"n_unch": pa.array([u], pa.int64()),
             "n": pa.array([len(batch)], pa.int64())}
        )

    cnt = status.map_batches(count_partial, batch_format="pyarrow").take_all()
    n_copied = sum(r["n_unch"] for r in cnt)
    n_extracted = sum(r["n"] for r in cnt) - n_copied
    tmp_root = out_root + ".tmp"
    if os.path.exists(tmp_root):
        shutil.rmtree(tmp_root)
    extracted.union(copied).map_batches(
        add_part, batch_format="pyarrow"
    ).write_parquet(tmp_root, partition_cols=["part"])
    if os.path.exists(out_root):
        shutil.rmtree(out_root)
    os.replace(tmp_root, out_root)
    # normalize hive dirs to the run_job partition layout + manifests
    manifest_dir = os.path.join(out_root, "_manifests")
    manifests = []
    for d in sorted(os.listdir(out_root)):
        if not d.startswith("part="):
            continue
        k = int(d.split("=")[1])
        pid = f"part-{k:05d}"
        os.replace(os.path.join(out_root, d), os.path.join(out_root, pid))
        n_docs, n_err, n_spans = output_stats(os.path.join(out_root, pid))
        m = PartitionManifest(
            partition_id=pid,
            input_files=[docs_path, prev_out_root],
            config_hash=cfg_hash,
            n_docs=n_docs,
            n_err_docs=n_err,
            n_spans=n_spans,
            wall_time_sec=0.0,
            media_fp=media_fp,
        )
        m.write(manifest_dir)
        manifests.append(m)
    summary = {
        "mode": "incremental",
        "config_hash": cfg_hash,
        "n_extracted": int(n_extracted),
        "n_copied": int(n_copied),
        "n_docs": int(n_extracted + n_copied),
        "wall_time_sec": time.perf_counter() - t0,
        "partitions": [m.partition_id for m in manifests],
    }
    with open(os.path.join(manifest_dir, "incremental.json"), "w") as f:
        json.dump(summary, f)
    return summary
