"""Table IO, media payload store, and partition lineage manifests.

* **Tables**: Lance when the ``lance`` package is importable (the
  north-rule storage format), Parquet fallback with the identical Arrow
  schema otherwise (this sandbox runs the Parquet path — SURVEY.md
  "Environment facts").
* **Media store**: resolves ``media_ref → payload bytes``. In this
  engine media payloads are a *side lookup*, not a distributed join
  (SURVEY.md §2.5): each actor builds its lookup once in ``__init__``.
  The sandbox backend loads the (small) media table into a dict per
  actor; at 100 TB the same interface is backed by ranged reads into a
  hash-partitioned payload store keyed by ``media_ref`` prefix with an
  LRU — the pipeline code is identical either way.
* **Manifests**: one JSON per output partition (input fragments, row /
  span / error counts, config hash, wall time). A rerun skips
  partitions whose manifest is complete and config-compatible — this is
  the checkpoint-resume contract (north_rule).
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from dataclasses import asdict, dataclass, field

import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def is_lance_dir(path) -> bool:
    """A Lance dataset directory carries a ``_versions`` manifest dir;
    that (or a ``.lance`` suffix) is how the read side detects format —
    the write side never has to leave breadcrumbs."""
    return isinstance(path, str) and (
        path.endswith(".lance")
        or os.path.isdir(os.path.join(path, "_versions"))
    )


def table_has_column(path, name: str) -> bool:
    """Footer-only schema probe (no data read): does the table at
    ``path`` (parquet file/dir or Lance dataset) carry ``name``?"""
    if is_lance_dir(path):  # pragma: no cover - lance absent in sandbox
        if not HAVE_LANCE:
            raise RuntimeError(
                f"{path} is a Lance dataset but lance is not importable"
            )
        import lance as _lance

        return name in _lance.dataset(path).schema.names
    import pyarrow.dataset as pads

    return name in pads.dataset(path, format="parquet").schema.names


def read_table_dataset(paths, columns=None, override_num_blocks=None):
    """``ray.data`` read of a docs/media table: Lance if available, else
    Parquet. ``override_num_blocks`` pins the block split (one block per
    input file when set to the file count) — required for
    bit-reproducible streaming order (see hfds_stream_source)."""
    import ray.data

    if HAVE_LANCE and is_lance_dir(paths):
        return ray.data.read_lance(paths, columns=columns)  # pragma: no cover
    return ray.data.read_parquet(
        paths, columns=columns, override_num_blocks=override_num_blocks
    )


def read_partition_table(part_dir: str, columns=None):
    """One written partition as a pyarrow table, whatever format it was
    written in (a Lance partition read without ``lance`` importable is an
    explicit error, not a parquet mis-read)."""
    if is_lance_dir(part_dir):  # pragma: no cover - lance absent in sandbox
        if not HAVE_LANCE:
            raise RuntimeError(
                f"{part_dir} is a Lance dataset but lance is not importable"
            )
        import lance as _lance

        return _lance.dataset(part_dir).to_table(columns=columns)
    import pyarrow.dataset as pads

    return pads.dataset(part_dir, format="parquet").to_table(columns=columns)


class MediaStore:
    """media_ref → payload lookup, built once per actor (broadcast pattern).

    ``data`` short-circuits the parquet load with a **ref-sorted Arrow
    table** the pipeline ``ray.put``s once: plasma zero-copies Arrow
    buffers, so every actor on a node shares one mmap of the payloads —
    per-actor setup is O(1), lookups are a binary search + one payload
    copy. Falling back to ``path`` builds the same sorted table from the
    parquet (used by the sequential oracle and standalone actors)."""

    def __init__(self, path: str | None, data=None):
        self.path = path
        self._tbl = data  # pa.Table sorted by media_ref, or None
        self._refs = None  # numpy str array (built lazily per holder)

    @staticmethod
    def load_arrow(path: str):
        """Read + ref-sort the media table (driver-side, once per job)."""
        import pyarrow.dataset as pads

        tbl = pads.dataset(path, format="parquet").to_table(
            columns=["media_ref", "payload"]
        )
        return tbl.sort_by("media_ref").combine_chunks()

    def _ensure(self):
        if self._refs is None:
            if self._tbl is None:
                if self.path is None:
                    import pyarrow as pa

                    self._tbl = pa.table(
                        {"media_ref": pa.array([], pa.string()),
                         "payload": pa.array([], pa.binary())}
                    )
                else:
                    self._tbl = self.load_arrow(self.path)
            import numpy as np

            self._refs = np.asarray(self._tbl["media_ref"], dtype=str)
            self._payloads = self._tbl["payload"]

    def lookup(self, media_ref: str) -> bytes | None:
        import numpy as np

        self._ensure()
        if not len(self._refs):
            return None
        i = int(np.searchsorted(self._refs, media_ref))
        if i >= len(self._refs) or self._refs[i] != media_ref:
            return None
        return self._payloads[i].as_py()

def store_mtime(path: str) -> float:
    """Cache-key mtime of a media store path.

    A DIRECTORY's own mtime does not change when a contained file is
    rewritten in place, so every (path, mtime)-keyed cache would serve
    stale payloads after such a rewrite; use the max over the directory
    and its entries instead. Plain files keep plain ``getmtime``."""
    if os.path.isdir(path):
        times = [os.path.getmtime(path)]
        for name in os.listdir(path):
            try:
                times.append(os.path.getmtime(os.path.join(path, name)))
            except OSError:  # pragma: no cover - racing delete
                pass
        return max(times)
    return os.path.getmtime(path)


_RANGED_PREP_LOCK = threading.Lock()


def prepare_ranged_store(
    media_parquet: str,
    dst_dir: str | None = None,
    rows_per_group: int = 256,
) -> str:
    """One-time ingest step for the ranged backend: rewrite the payload
    table **ref-sorted with small row groups**, so per-actor lookups can
    read just the row group whose [min, max] ref range covers the key.

    Distributed (``ray.data`` sort → parquet) when a Ray session exists —
    at scale this is the usual sort-partitioned ingest write; falls back
    to a driver-side pyarrow sort for tiny/offline use. Output cached by
    (path, mtime, rows_per_group).

    Concurrency-safe: ``run_job`` overlaps partition threads, so a cold
    cache sees concurrent calls for the same key — a process-wide lock
    serializes sibling threads, the tmp dir is per-call unique, and the
    publish step tolerates another PROCESS having won the
    ``os.replace`` race (first writer wins, later writers discard
    their tmp and reuse the published store)."""
    import pyarrow as pa

    from chug_ray.util import stable_hash_hex

    mtime = store_mtime(media_parquet)
    if dst_dir is None:
        key = stable_hash_hex(media_parquet, mtime, rows_per_group)
        dst_dir = os.path.join("/tmp/chug_ray_ranged", key)
    with _RANGED_PREP_LOCK:
        return _prepare_ranged_locked(
            media_parquet, dst_dir, rows_per_group
        )


def _prepare_ranged_locked(
    media_parquet: str, dst_dir: str, rows_per_group: int
) -> str:
    import uuid as _uuid

    import pyarrow as pa

    if os.path.isdir(dst_dir):
        if os.listdir(dst_dir):
            return dst_dir
        import shutil

        shutil.rmtree(dst_dir)  # empty stub: redo the prepare
    tmp = f"{dst_dir}.tmp-{os.getpid()}-{_uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray:
        import pyarrow as _pa
        import ray.data

        from chug_ray.util import stable_hash_hex as _hx

        def write_group(batch: _pa.Table) -> _pa.Table:
            # one small ref-sorted file per batch: a distributed
            # sort-partitioned write with no driver involvement. The
            # name carries a uuid — duplicate media_ref runs straddling
            # a batch boundary give two batches the same first/last ref,
            # and a hash-only name would silently overwrite one.
            import uuid

            p = os.path.join(
                tmp,
                "g-{}-{}.parquet".format(
                    _hx(
                        batch["media_ref"][0].as_py(),
                        batch["media_ref"][-1].as_py(),
                    ),
                    uuid.uuid4().hex[:8],
                ),
            )
            pq.write_table(batch, p, row_group_size=rows_per_group)
            return _pa.table({"path": _pa.array([p])})

        (
            ray.data.read_parquet(
                media_parquet, columns=["media_ref", "payload"]
            )
            .sort("media_ref")
            .map_batches(
                write_group, batch_format="pyarrow", batch_size=rows_per_group
            )
            .count()
        )
    else:
        import pyarrow.dataset as pads

        tbl = (
            pads.dataset(media_parquet, format="parquet")
            .to_table(columns=["media_ref", "payload"])
            .sort_by("media_ref")
        )
        pq.write_table(
            tbl, os.path.join(tmp, "part-0.parquet"), row_group_size=rows_per_group
        )
    try:
        os.replace(tmp, dst_dir)
    except OSError:
        # another PROCESS published dst_dir first: use theirs
        if os.path.isdir(dst_dir) and os.listdir(dst_dir):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return dst_dir


class RangedMediaStore:
    """media_ref → payload via **ranged row-group reads + LRU**: the
    100 TB backend behind the same ``lookup()`` interface as the
    broadcast :class:`MediaStore`.

    Per actor, ``_ensure`` reads only the parquet *footers* of the
    prepared (ref-sorted, small-row-group) store and builds a sorted
    index of per-row-group [min, max] ref ranges. A lookup binary-
    searches the index, reads the one covering row group (a ranged read
    of ~``rows_per_group`` payloads), and keeps the last
    ``cache_groups`` decoded groups in an LRU — so an actor touches only
    the slice of the payload corpus its batches reference, never the
    whole table."""

    def __init__(self, store_dir: str, cache_groups: int = 8):
        self.store_dir = store_dir
        self.cache_groups = cache_groups
        self._index = None  # (mins, maxs, file_idx, rg_idx) sorted by min
        self._files = None
        self._lru: "dict[tuple, tuple]" = {}

    def _ensure(self):
        if self._index is not None:
            return
        import numpy as np

        if os.path.isdir(self.store_dir):
            paths = sorted(
                os.path.join(self.store_dir, f)
                for f in os.listdir(self.store_dir)
                if f.endswith(".parquet")
            )
        else:
            paths = [self.store_dir]
        self._files = [pq.ParquetFile(p) for p in paths]
        mins, maxs, fidx, gidx = [], [], [], []
        for fi, pf in enumerate(self._files):
            md = pf.metadata
            col = {c: i for i, c in enumerate(md.schema.names)}["media_ref"]
            for gi in range(md.num_row_groups):
                st = md.row_group(gi).column(col).statistics
                if st is None or st.min is None:  # pragma: no cover
                    raise RuntimeError(
                        f"{paths[fi]} row group {gi} lacks media_ref stats"
                    )
                mins.append(st.min)
                maxs.append(st.max)
                fidx.append(fi)
                gidx.append(gi)
        order = np.argsort(np.array(mins, dtype=str), kind="stable")
        self._index = (
            np.array(mins, dtype=str)[order],
            np.array(maxs, dtype=str)[order],
            np.array(fidx, dtype=np.int64)[order],
            np.array(gidx, dtype=np.int64)[order],
        )

    def _group(self, fi: int, gi: int):
        key = (fi, gi)
        hit = self._lru.pop(key, None)
        if hit is None:
            import numpy as np

            tbl = self._files[fi].read_row_group(
                gi, columns=["media_ref", "payload"]
            )
            hit = (np.asarray(tbl["media_ref"], dtype=str), tbl["payload"])
            if len(self._lru) >= self.cache_groups:
                self._lru.pop(next(iter(self._lru)))  # evict oldest
        self._lru[key] = hit  # (re)insert as most recent
        return hit

    def lookup(self, media_ref: str) -> bytes | None:
        import numpy as np

        self._ensure()
        mins, maxs, fidx, gidx = self._index
        if not len(mins):
            return None
        # rightmost group whose min ≤ ref; ranges are disjoint after the
        # sorted write, but check a neighbor in case of equal-min groups
        i = int(np.searchsorted(mins, media_ref, side="right")) - 1
        for j in (i, i - 1):
            if j < 0 or media_ref < mins[j] or media_ref > maxs[j]:
                continue
            refs, payloads = self._group(int(fidx[j]), int(gidx[j]))
            k = int(np.searchsorted(refs, media_ref))
            if k < len(refs) and refs[k] == media_ref:
                return payloads[k].as_py()
        return None


@dataclass
class PartitionManifest:
    partition_id: str
    input_files: list[str]
    config_hash: str
    n_docs: int = 0
    n_err_docs: int = 0
    n_spans: int = 0
    wall_time_sec: float = 0.0
    completed_at: float = field(default_factory=time.time)
    engine_version: str = "chug_ray-0.1.0"
    # content fingerprint of the media payload store the run read (the
    # docs-side fingerprints cannot see in-place payload edits; this can)
    media_fp: str = ""
    # per-operator wall time / task / block counts from Dataset.stats()
    stage_metrics: list = field(default_factory=list)

    def write(self, manifest_dir: str) -> str:
        os.makedirs(manifest_dir, exist_ok=True)
        path = os.path.join(manifest_dir, f"{self.partition_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, path)  # atomic publish
        return path

    @classmethod
    def load(cls, manifest_dir: str, partition_id: str) -> "PartitionManifest | None":
        path = os.path.join(manifest_dir, f"{partition_id}.json")
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return cls(**json.load(f))
        except (json.JSONDecodeError, TypeError):
            return None  # half-written / stale manifest ⇒ redo the partition


def media_store_fp(path: str | None) -> str:
    """Cheap content fingerprint of a media store: per file, size plus a
    hash of the parquet footer tail (64 KiB — stats/offsets/created_by
    change on any rewrite). Catches in-place payload edits that a
    docs-side span fingerprint cannot see."""
    if not path:
        return ""
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        if os.path.isdir(path)
        else [path]
    )
    h = hashlib.blake2b(digest_size=8)
    for f in files:
        size = os.path.getsize(f)
        with open(f, "rb") as fh:
            fh.seek(max(0, size - 65536))
            tail = fh.read()
        h.update(os.path.basename(f).encode())
        h.update(size.to_bytes(8, "little"))
        h.update(tail)
    return h.hexdigest()


def output_stats(out_dir: str) -> tuple[int, int, int]:
    """(n_docs, n_err_docs, n_spans) of a written partition.

    Parquet partitions are counted from the file *footers* alone —
    row counts plus per-row-group (num_values − null_count) on the
    ``spans.…kind`` and ``err.stage`` leaves — so the stats pass reads
    zero data pages (the round-2 version re-read the whole partition's
    spans, including every extracted text). Non-parquet (Lance)
    partitions fall back to a pruned columnar read."""
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    if not files:
        import pyarrow.compute as pc

        tbl = read_partition_table(out_dir, columns=["err", "spans"])
        n_docs = tbl.num_rows
        err_stage = pc.struct_field(tbl["err"], "stage")
        n_err = n_docs - err_stage.null_count
        n_spans = pc.sum(pc.list_value_length(tbl["spans"])).as_py() or 0
        return n_docs, int(n_err), int(n_spans)

    def leaf_nonnull(md, paths, leaf: str) -> int:
        i = paths.index(leaf)
        total = 0
        for g in range(md.num_row_groups):
            c = md.row_group(g).column(i)
            nulls = c.statistics.null_count if c.statistics else 0
            total += c.num_values - nulls
        return total

    n_docs = n_err = n_spans = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        paths = [md.schema.column(i).path for i in range(md.num_columns)]
        n_docs += md.num_rows
        n_err += leaf_nonnull(md, paths, "err.stage")
        n_spans += leaf_nonnull(md, paths, "spans.list.element.kind")
    return n_docs, n_err, n_spans


def write_output_partition(ds, out_dir: str) -> None:
    """Write one partition's rows atomically (temp dir → rename).

    Lance when available (the north-rule storage format), Parquet
    otherwise — identical Arrow schema either way."""
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    if HAVE_LANCE:  # pragma: no cover - lance absent in sandbox
        ds.write_lance(tmp)
    else:
        ds.write_parquet(tmp)
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)


def read_output(out_root: str):
    """All completed partitions as one pyarrow table (test-scale helper)."""
    parts = sorted(
        os.path.join(out_root, d)
        for d in os.listdir(out_root)
        if d.startswith("part-") and not d.endswith(".tmp")
    )
    tables = [read_partition_table(p) for p in parts]
    import pyarrow as pa

    return pa.concat_tables(tables) if tables else None


def write_parquet_table(table, path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)
    return path
