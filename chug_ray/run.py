"""Partitioned, resumable job driver.

The input document table is processed as P independent partitions (file
groups). Each partition runs the full extraction pipeline and writes

    out_root/part-<k>/           parquet rows (atomic: temp dir → rename)
    out_root/_manifests/<k>.json lineage manifest (inputs, counts, config
                                 hash, wall time)

A rerun with the same config skips every partition whose manifest is
present and compatible — kill the job anywhere and rerun to resume
(north_rule's "resumable from checkpoint with per-partition lineage +
metrics"). Because all randomness is keyed by (seed, doc_id), a resumed
run is bit-identical to an uninterrupted one.

Standalone use owns its Ray session::

    python -m chug_ray.run --docs DIR --media DIR --out DIR [--resume]

Library use (`run_job`) assumes Ray is already initialised by the caller
and never calls ray.init/shutdown itself.
"""

from __future__ import annotations

import hashlib
import os
import time

from chug_ray.config import ExtractConfig
from chug_ray.io import (
    PartitionManifest,
    media_store_fp,
    output_stats,
    read_table_dataset,
    table_has_column,
    write_output_partition,
)
from chug_ray.pipeline import broadcast_media_meta, build_extract_pipeline


def _config_hash(cfg: ExtractConfig) -> str:
    return hashlib.blake2b(cfg.to_json().encode(), digest_size=8).hexdigest()


def _pin_http_filesystem_check() -> None:
    """Make Ray's per-call ``fsspec.implementations.http`` probe safe
    under driver threads.

    ``path_util._is_http_filesystem`` re-attempts the import on every
    path resolution; when aiohttp is absent the import *fails* every
    time, and two overlapped partitions racing that failing import can
    observe a partially-initialized module (``ImportError: cannot
    import name 'HTTPFileSystem'``) that escapes Ray's
    ModuleNotFoundError guard and kills a partition. If the import
    cannot succeed in this environment, resolve the answer once: no
    HTTP filesystem is possible, so pin the check to False. A cluster
    with aiohttp installed imports fine and is left untouched."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        try:
            from ray.data.datasource import path_util

            path_util._is_http_filesystem = lambda fs: False
        except Exception:  # pragma: no cover - ray internals moved
            pass


def plan_partitions(docs_path: str, num_partitions: int | None) -> list[list[str]]:
    """Group input files into partitions (one file group per partition).

    ``docs_path`` may be a file, a directory, or a url *pattern*:
    ``::``-joined multi-source strings, ``${VAR}`` env substitution and
    bash-style ``{000..099}`` / ``{a,b}`` brace expansion are resolved
    by :mod:`chug_ray.urls` (the reference's M10 machinery)."""
    from chug_ray.urls import expand_urls, plan_files

    sources, _ = expand_urls(docs_path)
    files = []
    for src in sources:
        files.extend(plan_files(src))
    missing = [f for f in files if not os.path.isfile(f)]
    if missing:
        raise FileNotFoundError(f"input files not found: {missing[:5]}")
    if not files:
        raise FileNotFoundError(f"no parquet files under {docs_path}")
    p = min(num_partitions or len(files), len(files))
    groups: list[list[str]] = [[] for _ in range(p)]
    for i, f in enumerate(files):
        groups[i % p].append(f)
    return groups


def run_job(
    docs_path: str,
    out_root: str,
    cfg: ExtractConfig,
    num_partitions: int | None = None,
    resume: bool = True,
    overlap: int = 2,
) -> list[PartitionManifest]:
    """Run the extraction job partition-by-partition; returns manifests.

    Up to ``overlap`` partitions are in flight at once (driver threads,
    each owning its own streaming execution): partition k+1's read and
    classify run while k's write and manifest work drain, so the
    inter-partition driver gaps that would serialize a multi-node
    cluster disappear. Each partition stays an independent checkpoint
    unit — manifests are written per partition the moment it finishes,
    and a killed run resumes exactly as before. ``overlap=1`` restores
    the strictly sequential loop."""
    from concurrent.futures import ThreadPoolExecutor

    _pin_http_filesystem_check()
    os.makedirs(out_root, exist_ok=True)
    manifest_dir = os.path.join(out_root, "_manifests")
    cfg_hash = _config_hash(cfg)
    media_fp = media_store_fp(cfg.media_store_path)
    groups = plan_partitions(docs_path, num_partitions)
    # default path: the docs table carries span_pages, the classifier
    # reads cost from the batch, nothing O(n_media) sits on the driver.
    # Legacy tables (no column) fall back to the broadcast side data.
    # EVERY file must carry the column (footer-only probes): a corpus
    # mixing new- and legacy-format shards would otherwise null-fill
    # span_pages for the legacy rows and cost-classify them wrong —
    # mixed corpora take the broadcast fallback for all files.
    has_span_pages = all(
        table_has_column(f, "span_pages") for g in groups for f in g
    )
    meta_ref = (
        None if has_span_pages else broadcast_media_meta(cfg.media_store_path)
    )
    doc_cols = ["doc_id", "spans"] + (
        ["span_pages"] if has_span_pages else []
    )

    def run_partition(k: int, files: list[str]) -> PartitionManifest:
        pid = f"part-{k:05d}"
        t0 = time.perf_counter()
        docs = read_table_dataset(files, columns=doc_cols)
        out = build_extract_pipeline(docs, cfg, media_meta_ref=meta_ref)
        part_dir = os.path.join(out_root, pid)
        write_output_partition(out, part_dir)
        n_docs, n_err, n_spans = output_stats(part_dir)
        from chug_ray.metrics import stage_summaries

        manifest = PartitionManifest(
            partition_id=pid,
            input_files=files,
            config_hash=cfg_hash,
            n_docs=n_docs,
            n_err_docs=n_err,
            n_spans=n_spans,
            wall_time_sec=time.perf_counter() - t0,
            stage_metrics=stage_summaries(out),
            media_fp=media_fp,
        )
        manifest.write(manifest_dir)
        return manifest

    slots: list = []  # (k, manifest-or-future), submission order
    with ThreadPoolExecutor(max_workers=max(1, overlap)) as pool:
        for k, files in enumerate(groups):
            pid = f"part-{k:05d}"
            existing = PartitionManifest.load(manifest_dir, pid)
            if (
                resume
                and existing is not None
                and existing.config_hash == cfg_hash
                and existing.input_files == files
                and existing.media_fp == media_fp
            ):
                slots.append(existing)  # checkpoint hit — skip
                continue
            slots.append(pool.submit(run_partition, k, files))
        # .result() re-raises a partition's failure; completed manifests
        # stay on disk, so the rerun resumes past them
        return [s if isinstance(s, PartitionManifest) else s.result()
                for s in slots]


def main(argv: list[str] | None = None) -> None:
    import argparse

    import ray

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True)
    parser.add_argument("--media", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--page-sampling", default="all_valid")
    parser.add_argument(
        "--media-mode",
        default="auto",
        choices=["auto", "broadcast", "ranged"],
        help="payload store backend: broadcast (ray.put once), ranged "
        "(per-actor row-group reads + LRU over a ref-sorted store), or "
        "auto (default: footer-stats pick — broadcast for small stores, "
        "ranged when uncompressed payload bytes exceed the threshold)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument(
        "--prev-docs", default=None,
        help="prior snapshot's docs table: with --prev-out, run an "
        "INCREMENTAL job (extract only new/changed docs, copy the rest)",
    )
    parser.add_argument(
        "--prev-out", default=None,
        help="prior snapshot's output root (see --prev-docs)",
    )
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    # faster actor-pool ramp: the default policy (upscale at 2x util,
    # 4 queued tasks/actor) leaves most of the cluster idle on short
    # batch streams.
    from ray.data.context import AutoscalingConfig, DataContext

    ctx = DataContext.get_current()
    ctx.max_tasks_in_flight_per_actor = 2
    ctx.autoscaling_config = AutoscalingConfig(
        actor_pool_util_upscaling_threshold=0.8,
        actor_pool_util_downscaling_threshold=0.3,
    )
    # per-operator resource reservation (default 50%) caps the dominant
    # stage at half the cluster when idle ops hold reservations; the
    # extract topology wants the busy op to absorb all slots.
    ctx.op_resource_reservation_enabled = False
    try:
        cfg = ExtractConfig(
            page_sampling=args.page_sampling,
            seed=args.seed,
            media_store_path=args.media,
            media_store_mode=args.media_mode,
        )
        if bool(args.prev_docs) != bool(args.prev_out):
            parser.error(
                "--prev-docs and --prev-out must be given together "
                "(half-specified incremental would silently run a full job)"
            )
        if args.prev_docs and args.prev_out:
            from chug_ray.incremental import run_incremental
            from chug_ray.urls import expand_urls, plan_files

            def _expand(path: str):
                # the full-run path expands url patterns in
                # plan_partitions; the incremental path must accept the
                # same --docs strings (::-joins, ${VAR}, {a..b} braces)
                sources, _ = expand_urls(path)
                files: list[str] = []
                for src in sources:
                    files.extend(plan_files(src))
                return files if len(files) > 1 else (files or [path])[0]

            s = run_incremental(
                _expand(args.docs), _expand(args.prev_docs),
                args.prev_out, args.out, cfg,
                num_out_partitions=args.partitions or 4,
            )
            print(
                f"done (incremental): {len(s['partitions'])} partitions, "
                f"{s['n_docs']} docs ({s['n_extracted']} extracted, "
                f"{s['n_copied']} copied)"
            )
            return
        manifests = run_job(
            args.docs,
            args.out,
            cfg,
            num_partitions=args.partitions,
            resume=not args.no_resume,
        )
        total = sum(m.n_docs for m in manifests)
        errs = sum(m.n_err_docs for m in manifests)
        spans = sum(m.n_spans for m in manifests)
        print(f"done: {len(manifests)} partitions, {total} docs ({errs} errored), {spans} spans")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
