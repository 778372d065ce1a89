"""The Ray-Data-native extraction pipeline.

Topology (SURVEY.md §4.2, §7):

    read docs (Lance/Parquet, column-pruned)
      → classify: est_cost per doc (vectorized Arrow + broadcast page-count
        meta — small side, never a shuffle join)
      → LIGHT docs (cost ≤ threshold — the overwhelming majority):
          map_batches(ExtractDocActor)          # actor pool, no shuffle
      → HEAVY docs (skew monsters):
          map_batches(ExplodeActor)             # doc → per-span / per-page-chunk units
          map_batches(ExtractUnitActor)         # page-parallel decode
          groupby(doc_id).map_groups(reassemble)  # THE one shuffle, key=doc_id
      → union → OUT_SCHEMA rows

Scale notes:
* The only all-to-all exchange is the heavy-path ``groupby(doc_id)``,
  over the rare exploded docs — light docs never shuffle.
* Page selection for SPDF reads only the payload *header* at explode
  time, so a 1000-page monster costs a header read to plan and its page
  chunks decode in parallel.
* Both branches re-execute the cheap read+classify lineage (Ray Data
  datasets are lazy; predicate-splitting a stream into two live branches
  would otherwise require materialization). read+classify is a pruned
  columnar scan plus ~ns/doc arithmetic; at cluster scale the per-
  partition driver (run.py) bounds any re-read to one partition.
* All randomness is keyed by (seed, doc_id, span_offset) → output is
  invariant to parallelism level, partitioning, and resume.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

from chug_ray.config import ExtractConfig
from chug_ray.errors import ExtractError
from chug_ray.io import MediaStore, RangedMediaStore, prepare_ranged_store
from chug_ray.kernels import extract as ex
from chug_ray.schema import OUT_SCHEMA, PARSE_STRUCT, SPANS_TYPE, ERR_STRUCT

UNIT_SPANS_TYPE = pa.list_(
    pa.struct([("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string())])
)
UNIT_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_pos", pa.int32()),
        ("unit_idx", pa.int32()),
        ("spans", UNIT_SPANS_TYPE),
        ("parse_num_pages", pa.int32()),
        ("parse_page_indices", pa.list_(pa.int32())),
        ("err", ERR_STRUCT),
    ]
)

_UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_pos", pa.int32()),
        ("unit_idx", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("span_offset", pa.int32()),
        ("page_indices", pa.list_(pa.int32())),
        ("parse_num_pages", pa.int32()),
        ("parse_page_indices", pa.list_(pa.int32())),
        ("err", ERR_STRUCT),
    ]
)


# --------------------------------------------------------------------------
# classify
# --------------------------------------------------------------------------
# per-worker-process cache of resolved broadcast objects: task pools reuse
# worker processes, so each process pays one object-store deserialize per
# ref instead of one per block (the per-block ray.get of a 10^5-entry
# dict was the single largest cost in the whole pipeline).
_BCAST_CACHE: dict = {}


def _resolve_bcast(ref):
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


_STORE_REF_CACHE: dict = {}
# run_job overlaps partition threads; the driver caches below are
# read-modify-write, so a cold cache would double-load and double-
# ray.put the payload table without a lock (one plasma copy leaks)
_DRIVER_CACHE_LOCK = __import__("threading").Lock()


def _media_store_nbytes(path: str) -> int:
    """Uncompressed payload bytes from parquet FOOTERS only (no data
    read): sum of row-group total_byte_size across the file or every
    file of a directory store."""
    import os

    import pyarrow.parquet as pq

    def one(p: str) -> int:
        md = pq.ParquetFile(p).metadata
        return sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))

    if os.path.isdir(path):
        return sum(
            one(os.path.join(path, f))
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return one(path)


def _store_ref_for(path: str):
    """Driver-side cache: read + ray.put the payload store once per
    (session, path, mtime) per process — repeated executions (warm-up,
    retries, multiple pipelines over one corpus) reuse the same plasma
    object, and a new Ray session never sees the old session's
    now-dangling refs."""
    import os

    import ray

    from chug_ray.util import ray_session_key

    from chug_ray.io import store_mtime

    # store_mtime, not getmtime: a directory store rewritten in place
    # keeps its dir mtime, which would serve stale payloads (io.py)
    key = (
        ray_session_key(),
        path,
        store_mtime(path) if os.path.exists(path) else 0,
    )
    with _DRIVER_CACHE_LOCK:
        ref = _STORE_REF_CACHE.get(key)
        if ref is None:
            ref = ray.put(MediaStore.load_arrow(path))
            _STORE_REF_CACHE[key] = ref
        return ref


def _build_store(cfg: ExtractConfig, data=None):
    """The payload store behind one ``lookup()`` interface: ranged
    row-group reads (scale backend) or the broadcast table view."""
    if cfg.media_store_mode == "ranged" and cfg.media_store_ranged_path:
        return RangedMediaStore(cfg.media_store_ranged_path)
    return MediaStore(cfg.media_store_path, data=data)


def make_classifier(meta_ref, threshold: int):
    """Vectorized cost estimator.

    Default path (docs tables carrying a ``span_pages`` column — every
    table this engine ingests or synthesizes): cost = Σ span_pages,
    read straight from the batch with one list-flatten + numpy
    segment-sum. Nothing driver-resident, nothing broadcast — the
    O(n_media) media-meta arrays of rounds 1–3 are gone.

    Legacy fallback (tables without the column, or rows where it is
    null): ``meta_ref`` is a ``ray.put`` handle to the page-count side
    data as a pair of *sorted numpy arrays* (refs, n_pages) — broadcast
    once, cached per worker process; cost = Σ over spans (media →
    payload page count via searchsorted, else 1)."""
    import numpy as np

    media_kind_set = pa.array(sorted(ex.MEDIA_KINDS))

    def _cost_from_span_pages(batch: pa.Table, n: int):
        """Per-doc cost from the in-batch span_pages column; returns
        (costs, valid_mask) — rows with a null list fall to legacy."""
        col = batch["span_pages"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
        valid = ~np.asarray(col.is_null())
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(
            lengths.astype(np.float64), nan=0
        ).astype(np.int64)
        span_lens = pc.list_value_length(batch["spans"]).to_numpy(
            zero_copy_only=False
        )
        span_lens = np.nan_to_num(
            span_lens.astype(np.float64), nan=0
        ).astype(np.int64)
        bad = valid & (lengths != span_lens)
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            raise ValueError(
                f"doc {batch['doc_id'][i].as_py()!r}: span_pages length "
                f"{lengths[i]} != spans length {span_lens[i]}"
            )
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        costs = np.zeros(n, dtype=np.int64)
        parent = np.repeat(np.arange(n)[valid], lengths[valid])
        np.add.at(costs, parent, flat.astype(np.int64))
        return costs, valid

    def classify(batch: pa.Table) -> pa.Table:
        n = len(batch)
        pre_costs = None
        if "span_pages" in batch.column_names:
            pre_costs, valid = _cost_from_span_pages(batch, n)
            if valid.all():
                return batch.append_column(
                    "est_cost", pa.array(pre_costs.astype(np.int32), pa.int32())
                )
        spans_col = batch["spans"].combine_chunks()
        if isinstance(spans_col, pa.ChunkedArray):  # single-chunk after combine
            spans_col = spans_col.chunk(0)
        lengths = pc.list_value_length(spans_col).to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths.astype(np.float64), nan=0).astype(np.int64)
        flat = pc.list_flatten(spans_col)
        if len(flat) == 0:
            costs = np.zeros(n, dtype=np.int32)
        else:
            kinds = pc.struct_field(flat, "kind")
            is_media = pc.is_in(kinds, value_set=media_kind_set).to_numpy(
                zero_copy_only=False
            )
            cost_per_span = np.ones(len(flat), dtype=np.int64)
            if is_media.any() and meta_ref is not None:
                ref_keys, ref_pages = _resolve_bcast(meta_ref)
                if len(ref_keys):
                    refs = pc.struct_field(flat, "media_ref").to_numpy(
                        zero_copy_only=False
                    )[is_media].astype(str)
                    idx = np.searchsorted(ref_keys, refs)
                    idx_c = np.clip(idx, 0, len(ref_keys) - 1)
                    hit = ref_keys[idx_c] == refs
                    cost_per_span[is_media] = np.where(hit, ref_pages[idx_c], 1)
            parent = np.repeat(np.arange(n), lengths)
            costs = np.zeros(n, dtype=np.int64)
            np.add.at(costs, parent, cost_per_span)
            costs = costs.astype(np.int32)
        if pre_costs is not None:  # mixed table: in-batch counts win per row
            costs = np.where(valid, pre_costs, costs.astype(np.int64)).astype(
                np.int32
            )
        return batch.append_column("est_cost", pa.array(costs, pa.int32()))

    return classify


# --------------------------------------------------------------------------
# light path
# --------------------------------------------------------------------------
class ExtractDocActor:
    """Whole-document extraction (light docs). Media store + config are
    built once per actor (``__init__``), batches stream through ``__call__``."""

    def __init__(self, cfg_json: str, store_ref=None):
        import ray

        self.cfg = ExtractConfig.from_json(cfg_json)
        # fn_constructor_args ships the ObjectRef itself; one ray.get per
        # actor pulls the payload dict from the node-local object store
        data = ray.get(store_ref) if store_ref is not None else None
        self.store = _build_store(self.cfg, data=data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            rows.append(ex.extract_doc(doc_id, spans or [], self.store.lookup, self.cfg))
        return pa.Table.from_pylist(rows, schema=OUT_SCHEMA)


# --------------------------------------------------------------------------
# heavy path
# --------------------------------------------------------------------------
class ExplodeActor:
    """Heavy doc → work-unit rows.

    text/html spans become single units; media spans are *planned* here
    (header-only page selection) and their selected pages split into
    chunks of ``cfg.pages_per_unit``. Planning errors become error units
    so the reassembly reports the same first-error the sequential path
    would."""

    def __init__(self, cfg_json: str, store_ref=None):
        import ray

        self.cfg = ExtractConfig.from_json(cfg_json)
        # fn_constructor_args ships the ObjectRef itself; one ray.get per
        # actor pulls the payload dict from the node-local object store
        data = ray.get(store_ref) if store_ref is not None else None
        self.store = _build_store(self.cfg, data=data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            rows.extend(self._explode_doc(doc_id, spans or []))
        return pa.Table.from_pylist(rows, schema=_UNIT_SCHEMA)

    def _unit(self, doc_id, span_pos, unit_idx=0, **kw):
        base = {
            "doc_id": doc_id,
            "span_pos": span_pos,
            "unit_idx": unit_idx,
            "kind": "",
            "text": "",
            "media_ref": "",
            "span_offset": 0,
            "page_indices": [],
            "parse_num_pages": None,
            "parse_page_indices": None,
            "err": None,
        }
        base.update(kw)
        return base

    def _explode_doc(self, doc_id: str, spans: list[dict]) -> list[dict]:
        cfg = self.cfg
        try:
            ordered = ex.sorted_spans(spans)
        except ExtractError as e:
            if cfg.error_policy == "raise":
                raise
            return [self._unit(doc_id, 0, err=e.as_struct())]

        units = []
        first_media_seen = False
        for pos, span in enumerate(ordered):
            kind = span["kind"]
            if kind in ("text", "html"):
                units.append(
                    self._unit(doc_id, pos, kind=kind, text=span["text"] or "")
                )
                continue
            try:
                if kind not in ex.MEDIA_KINDS:
                    raise ExtractError("normalize", f"unknown span kind {kind!r}")
                ref = span["media_ref"]
                if not ref:
                    raise ExtractError("media", "missing media_ref")
                payload = self.store.lookup(ref)
                if payload is None:
                    raise ExtractError("media", f"media_ref not found: {ref}")
                rng = ex.media_rng(cfg, doc_id, span["offset"])
                plan = ex.plan_media_span(kind, ref, payload, cfg.page_sampling, rng)
            except ExtractError as e:
                if cfg.error_policy == "raise":
                    raise
                units.append(self._unit(doc_id, pos, err=e.as_struct()))
                continue
            is_first = not first_media_seen
            first_media_seen = True
            chunk = max(1, cfg.pages_per_unit)
            indices = list(plan.page_indices)
            for u, start in enumerate(range(0, len(indices), chunk)):
                units.append(
                    self._unit(
                        doc_id,
                        pos,
                        unit_idx=u,
                        kind=kind,
                        media_ref=ref,
                        span_offset=span["offset"],
                        page_indices=indices[start : start + chunk],
                        parse_num_pages=plan.num_pages if (is_first and u == 0) else None,
                        parse_page_indices=indices if (is_first and u == 0) else None,
                    )
                )
        return units


class ExtractUnitActor:
    """Decode one work unit (page-parallel for media spans)."""

    def __init__(self, cfg_json: str, store_ref=None):
        import ray

        self.cfg = ExtractConfig.from_json(cfg_json)
        # fn_constructor_args ships the ObjectRef itself; one ray.get per
        # actor pulls the payload dict from the node-local object store
        data = ray.get(store_ref) if store_ref is not None else None
        self.store = _build_store(self.cfg, data=data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            rows.append(self._extract_unit(row))
        return pa.Table.from_pylist(rows, schema=UNIT_OUT_SCHEMA)

    def _extract_unit(self, row: dict) -> dict:
        out = {
            "doc_id": row["doc_id"],
            "span_pos": row["span_pos"],
            "unit_idx": row["unit_idx"],
            "spans": [],
            "parse_num_pages": row["parse_num_pages"],
            "parse_page_indices": row["parse_page_indices"],
            "err": row["err"],
        }
        if row["err"] is not None:
            return out
        kind = row["kind"]
        try:
            if kind == "text":
                triples = ex.extract_text_span(row["text"])
            elif kind == "html":
                triples = ex.extract_html_span(row["text"])
            else:
                payload = self.store.lookup(row["media_ref"])
                if payload is None:
                    raise ExtractError("media", f"media_ref not found: {row['media_ref']}")
                triples = ex.extract_media_pages(
                    kind,
                    row["media_ref"],
                    payload,
                    tuple(row["page_indices"]),
                    self.cfg.line_break,
                )
        except ExtractError as e:
            if self.cfg.error_policy == "raise":
                raise
            out["err"] = e.as_struct()
            return out
        out["spans"] = [
            {"kind": k, "text": t, "media_ref": m} for (k, t, m) in triples
        ]
        return out


def reassemble_group(group: pa.Table) -> pa.Table:
    """groupby(doc_id) reducer: restore sequential order and renumber.

    Total in-group sort key = (span_pos, unit_idx) — the bijection back
    from the explode. Any error unit collapses the doc to an error row
    (the *first* error in sequential order, matching the light path)."""
    group = group.sort_by([("span_pos", "ascending"), ("unit_idx", "ascending")])
    doc_id = group["doc_id"][0].as_py()
    rows = group.to_pylist()
    err = next((r["err"] for r in rows if r["err"] is not None), None)
    if err is not None:
        out = {"doc_id": doc_id, "spans": [], "parse": None, "err": err}
    else:
        spans = []
        parse = None
        for r in rows:
            if parse is None and r["parse_num_pages"] is not None:
                parse = {
                    "num_pages": r["parse_num_pages"],
                    "page_indices": r["parse_page_indices"],
                }
            for s in r["spans"]:
                spans.append(
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": len(spans),
                    }
                )
        out = {"doc_id": doc_id, "spans": spans, "parse": parse, "err": None}
    return pa.Table.from_pylist([out], schema=OUT_SCHEMA)


# --------------------------------------------------------------------------
# assembly
# --------------------------------------------------------------------------
def _mask(keep_heavy: bool, threshold: int):
    def fn(batch: pa.Table) -> pa.Table:
        heavy = pc.greater(batch["est_cost"], pa.scalar(threshold, pa.int32()))
        mask = heavy if keep_heavy else pc.invert(heavy)
        return batch.filter(mask).drop_columns(["est_cost"])

    return fn


# task-pool wrappers: state (config + media store view) is built once per
# WORKER PROCESS via _resolve_bcast / module caches — the same
# setup-once-work-many contract as the actor classes, but on Ray task
# pools, which schedule to full cluster width instantly (measured here:
# autoscaling actor pools add ~1 actor every few seconds, so short jobs
# finish before the pool reaches size; cfg.use_actor_pools=True keeps the
# actor path for deployments with prestarted pools).
_STATE_CACHE: dict = {}


def _worker_state(cfg_json: str, store_ref):
    key = (cfg_json, store_ref.hex() if store_ref is not None else None)
    state = _STATE_CACHE.get(key)
    if state is None:
        cfg = ExtractConfig.from_json(cfg_json)
        data = _resolve_bcast(store_ref) if store_ref is not None else None
        store = _build_store(cfg, data=data)
        store._ensure()
        state = _STATE_CACHE[key] = (cfg, store)
    return state


def _extract_doc_fn(cfg_json: str, store_ref):
    def fn(batch: pa.Table) -> pa.Table:
        cfg, store = _worker_state(cfg_json, store_ref)
        rows = [
            ex.extract_doc(doc_id, spans or [], store.lookup, cfg)
            for doc_id, spans in zip(
                batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
            )
        ]
        return pa.Table.from_pylist(rows, schema=OUT_SCHEMA)

    return fn


def _explode_fn(cfg_json: str, store_ref):
    def fn(batch: pa.Table) -> pa.Table:
        cfg, store = _worker_state(cfg_json, store_ref)
        worker = ExplodeActor.__new__(ExplodeActor)
        worker.cfg, worker.store = cfg, store
        return worker(batch)

    return fn


def _extract_unit_fn(cfg_json: str, store_ref):
    def fn(batch: pa.Table) -> pa.Table:
        cfg, store = _worker_state(cfg_json, store_ref)
        worker = ExtractUnitActor.__new__(ExtractUnitActor)
        worker.cfg, worker.store = cfg, store
        return worker(batch)

    return fn


def build_extract_pipeline(docs, cfg: ExtractConfig, media_meta_ref=None):
    """docs: ray.data.Dataset with DOC_SCHEMA → Dataset with OUT_SCHEMA."""
    from chug_ray.kernels.pages import VALID_POLICIES

    if cfg.page_sampling not in VALID_POLICIES:  # fail at plan time, not mid-job
        raise ValueError(
            f"unknown page_sampling policy {cfg.page_sampling!r}; "
            f"expected one of {VALID_POLICIES}"
        )
    # accept the reference's named handlers as aliases (errors.py);
    # resolve to the base skip/raise policy at plan time so the actors
    # stay branch-simple, and emit the alias's log/warn side effect once.
    from chug_ray.errors import normalize_policy, plan_notice

    base_policy = normalize_policy(cfg.error_policy)
    if base_policy != cfg.error_policy:
        import dataclasses

        plan_notice(cfg.error_policy)  # the alias's log/warn, once
        cfg = dataclasses.replace(cfg, error_policy=base_policy)
    if cfg.media_store_mode not in ("auto", "broadcast", "ranged"):
        raise ValueError(
            f"unknown media_store_mode {cfg.media_store_mode!r}; "
            "expected 'auto', 'broadcast' or 'ranged'"
        )
    if cfg.media_store_mode == "auto":
        # footer-stats plan-time switch (the auto_join pattern): the
        # parquet footer's uncompressed byte total approximates the
        # in-memory payload table the broadcast path would ray.put.
        # Resolved once per (path, mtime, threshold) — run_job calls
        # this per partition, and the footer scan over a large
        # directory store is not free.
        import dataclasses

        picked = "broadcast"
        if cfg.media_store_path is not None:
            from chug_ray.io import store_mtime

            pick_key = (
                cfg.media_store_path,
                store_mtime(cfg.media_store_path),
                cfg.media_broadcast_threshold_bytes,
            )
            with _DRIVER_CACHE_LOCK:
                picked = _AUTO_PICK_CACHE.get(pick_key)
                if picked is None:
                    nbytes = _media_store_nbytes(cfg.media_store_path)
                    picked = (
                        "ranged"
                        if nbytes > cfg.media_broadcast_threshold_bytes
                        else "broadcast"
                    )
                    logging.getLogger(__name__).info(
                        "media_store_mode=auto picked %s (%d footer "
                        "bytes, threshold %d)",
                        picked,
                        nbytes,
                        cfg.media_broadcast_threshold_bytes,
                    )
                    _AUTO_PICK_CACHE[pick_key] = picked
        cfg = dataclasses.replace(cfg, media_store_mode=picked)
    if cfg.media_store_mode == "ranged" and cfg.media_store_path is not None:
        # prepare the ref-sorted ranged store once (cached by mtime);
        # workers open it lazily — nothing is broadcast.
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            media_store_ranged_path=prepare_ranged_store(cfg.media_store_path),
        )
        store_ref = None
        cfg_json = cfg.to_json()
    else:
        cfg_json = cfg.to_json()
        # payload store: loaded + ray.put ONCE driver-side (cached across
        # executions); workers get a zero-copy plasma view, resolved once
        # per actor (actor path) or per worker process (task path).
        store_ref = (
            _store_ref_for(cfg.media_store_path)
            if cfg.media_store_path is not None
            else None
        )
    classified = docs.map_batches(
        make_classifier(media_meta_ref, cfg.heavy_cost_threshold),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    if cfg.materialize_classified:
        # one read+classify execution feeding both branches; without this
        # the lazy lineage re-executes per branch. Memory is bounded by
        # the partition driver (run.py) at cluster scale.
        classified = classified.materialize()

    light_in = classified.map_batches(
        _mask(False, cfg.heavy_cost_threshold),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    heavy_in = classified.map_batches(
        _mask(True, cfg.heavy_cost_threshold),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    if cfg.use_actor_pools:
        import ray

        ctor_args = (cfg_json, store_ref) if store_ref is not None else (cfg_json,)
        if cfg.max_actors is None:
            cpus = (
                int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized()
                else 8
            )
            max_actors = max(4, int(cpus / max(cfg.num_cpus_per_actor, 0.25)))
        else:
            max_actors = cfg.max_actors
        pool = dict(
            fn_constructor_args=ctor_args,
            concurrency=(cfg.min_actors, max_actors),
            num_cpus=cfg.num_cpus_per_actor,
        )
        light = light_in.map_batches(
            ExtractDocActor, batch_format="pyarrow", batch_size=cfg.batch_size, **pool
        )
        units = heavy_in.map_batches(
            ExplodeActor, batch_format="pyarrow", batch_size=cfg.batch_size, **pool
        ).map_batches(
            ExtractUnitActor,
            batch_format="pyarrow",
            batch_size=max(8, cfg.batch_size // 8),  # units are page chunks
            **pool,
        )
    else:
        light = light_in.map_batches(
            _extract_doc_fn(cfg_json, store_ref),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            num_cpus=cfg.num_cpus_per_actor,
        )
        units = heavy_in.map_batches(
            _explode_fn(cfg_json, store_ref),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            num_cpus=cfg.num_cpus_per_actor,
        ).map_batches(
            _extract_unit_fn(cfg_json, store_ref),
            batch_format="pyarrow",
            batch_size=max(8, cfg.batch_size // 8),
            num_cpus=cfg.num_cpus_per_actor,
        )

    # NOT materialized (measured): pinning units before the reassembly
    # shuffle would avoid the sort's lazy-input sampling re-execution
    # (the ops/window.py combiner finding), but it also serializes the
    # heavy decode against the light branch — the streaming executor
    # otherwise runs both concurrently, and that overlap is worth far
    # more (headline 2.1 s → ~12 s when materialized here). The
    # re-executed heavy decode hides inside the light path's wall time.
    heavy = units.groupby("doc_id").map_groups(
        reassemble_group, batch_format="pyarrow"
    )
    return light.union(heavy)


# one meta broadcast per (session, path, mtime): repeated pipeline
# builds over the same corpus (bench samples, retries, resume) must not
# re-derive or re-put the side data
_MEDIA_META_CACHE: dict = {}
_AUTO_PICK_CACHE: dict = {}  # (path, mtime, threshold) -> mode

# above this many payload rows the meta is sorted distributed; below it
# a pruned driver read + numpy sort is strictly faster (a distributed
# sort's fixed cost, ~1-4 s at 32 cpus, dwarfs a two-column read)
_MEDIA_META_DISTRIBUTED_ROWS = 4_000_000


def broadcast_media_meta(media_path: str | None):
    """ray.put the media page-count meta once (small side broadcast).

    The (media_ref, n_pages) side data never touches the payload bytes
    (column-pruned reads only) and never builds a ``to_pylist()`` dict.
    Small tables: the driver reads just the two thin columns and
    numpy-argsorts them — O(n_media × ~16 B) driver memory, one row per
    payload. Tables past ``_MEDIA_META_DISTRIBUTED_ROWS`` (footer row
    count, no data read): a distributed column-pruned ``read_parquet``
    → ``sort`` and the driver streams the sorted columns. Stored as
    sorted numpy arrays (refs, n_pages): worker-side lookups are
    vectorized searchsorted, and deserialization is an O(1) buffer view
    rather than rebuilding a Python dict. Cached per (session, path,
    mtime)."""
    import os

    import numpy as np
    import ray

    from chug_ray.util import ray_session_key

    if media_path is None:
        return None
    from chug_ray.io import store_mtime

    key = (
        ray_session_key(),
        media_path,
        store_mtime(media_path) if os.path.exists(media_path) else 0,
    )
    # one build under the shared driver-cache lock: overlapped
    # partition threads must not each load + ray.put the meta arrays
    with _DRIVER_CACHE_LOCK:
        if key in _MEDIA_META_CACHE:
            return _MEDIA_META_CACHE[key]

        import pyarrow.dataset as pads

        dataset = pads.dataset(media_path, format="parquet")
        n_rows = sum(f.metadata.num_rows for f in dataset.get_fragments())
        if n_rows > _MEDIA_META_DISTRIBUTED_ROWS:
            import ray.data

            ds = ray.data.read_parquet(
                media_path, columns=["media_ref", "n_pages"]
            ).sort("media_ref")
            refs_parts, pages_parts = [], []
            for b in ds.iter_batches(
                batch_format="pyarrow", batch_size=65536
            ):
                refs_parts.append(
                    b["media_ref"].to_numpy(zero_copy_only=False).astype(str)
                )
                pages_parts.append(
                    b["n_pages"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            refs = (
                np.concatenate(refs_parts)
                if refs_parts
                else np.array([], dtype=str)
            )
            pages = (
                np.concatenate(pages_parts)
                if pages_parts
                else np.array([], dtype=np.int64)
            )
        else:
            tbl = dataset.to_table(columns=["media_ref", "n_pages"])
            refs = tbl["media_ref"].to_numpy(zero_copy_only=False).astype(
                str
            )
            pages = (
                tbl["n_pages"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            order = np.argsort(refs, kind="stable")
            refs, pages = refs[order], pages[order]
        ref = ray.put((refs, pages))
        _MEDIA_META_CACHE[key] = ref
        return ref
