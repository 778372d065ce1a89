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

import pyarrow as pa
import pyarrow.compute as pc

from chug_ray.config import ExtractConfig
from chug_ray.errors import ExtractError
from chug_ray.io import MediaStore
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
def make_classifier(meta_ref, threshold: int):
    """Vectorized cost estimator. ``meta_ref`` is a ``ray.put`` handle to the
    (small) media_ref → n_pages dict, fetched once per task from the local
    object store — broadcast, not re-shipped per batch."""
    import ray

    def classify(batch: pa.Table) -> pa.Table:
        meta = ray.get(meta_ref) if meta_ref is not None else {}
        costs = []
        for spans in batch["spans"].to_pylist():
            cost = 0
            for s in spans or []:
                if s["kind"] in ex.MEDIA_KINDS:
                    cost += meta.get(s["media_ref"], 1)
                else:
                    cost += 1
            costs.append(cost)
        return batch.append_column("est_cost", pa.array(costs, pa.int32()))

    return classify


# --------------------------------------------------------------------------
# light path
# --------------------------------------------------------------------------
class ExtractDocActor:
    """Whole-document extraction (light docs). Media store + config are
    built once per actor (``__init__``), batches stream through ``__call__``."""

    def __init__(self, cfg_json: str):
        self.cfg = ExtractConfig.from_json(cfg_json)
        self.store = MediaStore(self.cfg.media_store_path)

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

    def __init__(self, cfg_json: str):
        self.cfg = ExtractConfig.from_json(cfg_json)
        self.store = MediaStore(self.cfg.media_store_path)

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

    def __init__(self, cfg_json: str):
        self.cfg = ExtractConfig.from_json(cfg_json)
        self.store = MediaStore(self.cfg.media_store_path)

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
    from chug_ray.errors import normalize_policy

    base_policy = normalize_policy(cfg.error_policy)
    if base_policy != cfg.error_policy:
        import dataclasses

        cfg = dataclasses.replace(cfg, error_policy=base_policy)
    cfg_json = cfg.to_json()
    if cfg.max_actors is None:
        import ray

        # size each pool to the cluster: the streaming executor scales
        # pools between (min, max) on demand, so a generous max lets the
        # dominant stage absorb all CPUs while idle pools stay at min.
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        max_actors = max(4, int(cpus / max(cfg.num_cpus_per_actor, 0.25)))
    else:
        max_actors = cfg.max_actors
    classified = docs.map_batches(
        make_classifier(media_meta_ref, cfg.heavy_cost_threshold),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    light = classified.map_batches(
        _mask(False, cfg.heavy_cost_threshold),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    ).map_batches(
        ExtractDocActor,
        fn_constructor_args=(cfg_json,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(cfg.min_actors, max_actors),
        num_cpus=cfg.num_cpus_per_actor,
    )

    heavy = (
        classified.map_batches(
            _mask(True, cfg.heavy_cost_threshold),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        .map_batches(
            ExplodeActor,
            fn_constructor_args=(cfg_json,),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=(cfg.min_actors, max_actors),
            num_cpus=cfg.num_cpus_per_actor,
        )
        .map_batches(
            ExtractUnitActor,
            fn_constructor_args=(cfg_json,),
            batch_format="pyarrow",
            batch_size=max(8, cfg.batch_size // 8),  # units are page chunks
            concurrency=(cfg.min_actors, max_actors),
            num_cpus=cfg.num_cpus_per_actor,
        )
        .groupby("doc_id")
        .map_groups(reassemble_group, batch_format="pyarrow")
    )

    return light.union(heavy)


def broadcast_media_meta(media_path: str | None):
    """ray.put the media page-count meta once (small side broadcast)."""
    import ray

    if media_path is None:
        return None
    return ray.put(MediaStore(media_path).meta())
