"""Benchmark driver (the per-round feedback loop; see BASELINE.md).

Default mode: one Ray session (``address="local"``, ``num_cpus`` from
``$RAY_GRAFT_CPUS``, default 32), runs the headline extraction pipeline
plus every ``queries()`` entry over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) and prints ONE JSON line::

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ...}

``--scaling``: runs the headline extraction job twice in FRESH child
processes (num_cpus=8 then 32 — the sandbox stand-in for N vs 4N nodes
via ``ray job submit``) on the identical cached corpus, prints one JSON
line with both throughputs + efficiency, and records the table in
BASELINE.md under "## Measured scaling results".

This script OWNS its Ray session (init + shutdown); the library never
does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


def _consume(result) -> int:
    """Fully execute a query result; return row count.

    Datasets are consumed with count() (executes the plan, no driver
    transfer of the data itself); tables/frames are already materialized.
    """
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pa.Table, pd.DataFrame)):
        return len(result)
    return result.count()


# samples taken above this 1-min load average are auto-flagged: on this
# shared box external load is the dominant variance source (BASELINE.md
# control table), and a flagged sample documents itself instead of
# needing prose caveats
LOAD_FLAG_THRESHOLD = 0.5 * (os.cpu_count() or 32)


def _load_avg() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return -1.0


def _run_headline(sf_dir: str, seed: int = 0, limit: int | None = None) -> dict:
    """The headline job: full extraction pipeline (all_valid) over the
    synthetic interleaved corpus for this sf, consumed to completion.
    ``limit`` runs a prefix slice (used as a cheap warm-up on big corpora)."""
    import ray.data

    from chug_ray.config import ExtractConfig
    from chug_ray.io import table_has_column
    from chug_ray.pipeline import broadcast_media_meta, build_extract_pipeline
    from chug_ray.synth import corpus_for_sf_dir

    docs_path, media_path, ccfg = corpus_for_sf_dir(sf_dir)
    cfg = ExtractConfig(page_sampling="all_valid", seed=seed, media_store_path=media_path)
    load0 = _load_avg()
    t0 = time.perf_counter()
    docs = ray.data.read_parquet(docs_path)
    if limit is not None:
        docs = docs.limit(limit)
    out = build_extract_pipeline(
        docs,
        cfg,
        # span_pages-carrying corpora classify from the batch itself;
        # only legacy tables need the media-meta broadcast
        media_meta_ref=(
            None
            if table_has_column(docs_path, "span_pages")
            else broadcast_media_meta(media_path)
        ),
    )
    n = out.count()
    secs = time.perf_counter() - t0
    return {
        "n_docs": n,
        "secs": secs,
        "docs_per_sec": n / secs if secs else 0.0,
        "load_avg": load0,
        "load_flagged": bool(load0 > LOAD_FLAG_THRESHOLD),
    }


def _bench_queries(
    sf_dir: str, only: set[str] | None, repeats: int = 2
) -> dict[str, float]:
    import __ray_entry__ as entrymod

    # untimed setup: build the corpus-vocab artifact once so the
    # tokenize queries measure the production shape (per-worker file
    # load), not the one-time distributed vocab derivation
    from chug_ray.ops.tokenize import ensure_vocab_file

    ensure_vocab_file(sf_dir)

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        time.sleep(3)  # let the previous query's worker teardown settle
        # (measured: the same query runs 1.8s after a 10s settle vs 3-4s
        # right after a heavy query's actor pools wind down; 3 s keeps
        # the 132-query sweep under the round driver's time box)
        best = None
        try:
            # min-of-N: this VM's external noise moves identical queries
            # 3x between runs (BASELINE.md control table); noise is
            # strictly additive, so the min is the capability estimate
            for _ in range(max(1, repeats)):
                t0 = time.perf_counter()
                _consume(fn(sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            timings[name] = round(best, 3)
        except Exception as e:  # keep the bench line intact; flag the query
            print(f"bench: query {name} FAILED: {e!r}", file=sys.stderr)
            timings[name] = -1.0
    return timings


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    # actor pools default to slow ramp (upscale at 2x utilization, 4
    # queued tasks per actor) — tuned here so short-batch pools actually
    # reach the cluster's parallelism.
    from ray.data.context import AutoscalingConfig, DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False  # measured runs, no TTY overhead
    ctx.max_tasks_in_flight_per_actor = 2
    ctx.autoscaling_config = AutoscalingConfig(
        actor_pool_util_upscaling_threshold=0.8,
        actor_pool_util_downscaling_threshold=0.3,
    )
    # per-operator resource reservation (default 50%) caps the dominant
    # stage at half the cluster when idle ops hold reservations; the
    # extract topology wants the busy op to absorb all slots.
    ctx.op_resource_reservation_enabled = False


def _child_main(sf_dir: str, num_cpus: int) -> None:
    """Fresh-process scaling probe: headline job only, one JSON line."""
    import ray

    from chug_ray.synth import corpus_for_sf_dir

    _init_ray(num_cpus)
    try:
        # warm-up pass amortizes one-time costs (worker imports, store
        # broadcast put, read cache) out of the measurement — a real
        # 100 TB job runs hours, so these are noise there. On big corpora
        # the warm-up runs a small prefix slice: same warming, no double
        # full pass.
        _, _, ccfg = corpus_for_sf_dir(sf_dir)
        _run_headline(sf_dir, limit=4000 if ccfg.n_docs >= 50_000 else None)
        time.sleep(5)  # let warm-up actor teardown settle off the scheduler
        res = _run_headline(sf_dir)
        res["num_cpus"] = num_cpus
        print(json.dumps(res))
    finally:
        ray.shutdown()


def _scaling_main(sf_dir: str, lo: int, hi: int, repeats: int = 2) -> None:
    import ray

    from chug_ray.synth import corpus_for_sf_dir

    corpus_for_sf_dir(sf_dir)  # build the cache once so children just read
    if ray.is_initialized():
        ray.shutdown()  # big-corpus build owned a session; free it for children
    results = {}
    # hi first, then a settle pause: a freshly-shut-down Ray cluster's
    # teardown measurably slows the next child on this box. Each level
    # runs `repeats` children and keeps the best throughput: this VM has
    # noisy neighbors (same child binary measured 1296 vs 1878 docs/s
    # minutes apart), and external load is strictly additive noise, so
    # max-of-N at BOTH levels is the honest capability estimate.
    for n in (hi, lo):
        best = None
        for _ in range(max(1, repeats)):
            time.sleep(15)
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--child",
                 str(n), "--sf-dir", sf_dir],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
            )
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr)
                raise RuntimeError(f"scaling child (num_cpus={n}) failed")
            res = json.loads(proc.stdout.strip().splitlines()[-1])
            if best is None or res["docs_per_sec"] > best["docs_per_sec"]:
                best = res
        results[n] = best
    thr_lo, thr_hi = results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo) if thr_lo else 0.0
    line = {
        "metric": f"scaling efficiency {lo}->{hi} cpus (headline extraction)",
        "value": round(eff, 4),
        "unit": "efficiency",
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "docs_per_sec": {str(lo): round(thr_lo, 2), str(hi): round(thr_hi, 2)},
        "secs": {str(lo): round(results[lo]["secs"], 2),
                 str(hi): round(results[hi]["secs"], 2)},
        "load_avg": {str(lo): results[lo].get("load_avg"),
                     str(hi): results[hi].get("load_avg")},
        "load_flagged": {str(lo): results[lo].get("load_flagged"),
                         str(hi): results[hi].get("load_flagged")},
        "n_docs": results[hi]["n_docs"],
    }
    print(json.dumps(line))
    _record_scaling(line, lo, hi)
    # machine-readable artifact: the efficiency claim as a data file
    # (VERDICT r3 task #5), not BASELINE.md prose
    out_json = os.environ.get(
        "GRAFT_SCALING_OUT", os.path.join(REPO, "SCALING_r05.json")
    )
    with open(out_json, "w") as f:
        json.dump(line, f, indent=1)


def _record_scaling(line: dict, lo: int, hi: int) -> None:
    marker = "## Measured scaling results"
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    section = (
        f"{marker}\n\n"
        f"(auto-written by `bench.py --scaling`; sf={line['sf']}, "
        f"{line['n_docs']} docs, fresh `ray.init` per level)\n\n"
        "| metric | value |\n|---|---|\n"
        f"| docs/sec @ {lo} cpus | {line['docs_per_sec'][str(lo)]} |\n"
        f"| docs/sec @ {hi} cpus | {line['docs_per_sec'][str(hi)]} |\n"
        f"| scaling efficiency (thr{hi}/thr{lo})/({hi}/{lo}) | "
        f"{line['value']} (target ≥ 0.8) |\n"
    )
    if marker in text:
        text = text[: text.index(marker)] + section
    else:
        text = text.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(text)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--num-cpus", type=int,
                        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--scaling-cpus", default="2,8",
                        help="lo,hi cpu counts for --scaling")
    parser.add_argument("--scaling-repeats", type=int, default=2,
                        help="children per level for --scaling; best "
                        "throughput kept (noisy-neighbor robustness)")
    parser.add_argument("--scaling-dir", default="/tmp/chug_ray_corpus/scaling",
                        help="corpus tag dir for --scaling (basename keys the synth)")
    parser.add_argument("--queries", default=None,
                        help="comma-separated subset of query names")
    parser.add_argument("--query-repeats", type=int, default=2,
                        help="runs per query; min kept (noise robustness)")
    parser.add_argument("--no-queries", action="store_true",
                        help="headline pipeline only")
    parser.add_argument("--child", type=int, default=None, help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.child is not None:
        _child_main(args.sf_dir, args.child)
        return
    if args.scaling:
        lo, hi = (int(x) for x in args.scaling_cpus.split(","))
        # the scaling probe uses its own (bigger) corpus tag so compute
        # dominates per-run fixed costs; see synth.corpus_for_sf_dir
        _scaling_main(args.scaling_dir, lo, hi, repeats=args.scaling_repeats)
        return

    import ray

    _init_ray(args.num_cpus)
    try:
        _run_headline(args.sf_dir)  # warm-up: actor pools + corpus cache
        # min-of-3: this VM's noisy neighbors moved the identical
        # headline binary between 1.9 s and 15.5 s within one hour;
        # external load is strictly additive, so the min is the honest
        # capability estimate (all samples are reported).
        samples = [_run_headline(args.sf_dir) for _ in range(3)]
        head = min(samples, key=lambda r: r["secs"])
        only = set(args.queries.split(",")) if args.queries else None
        timings = {} if args.no_queries else _bench_queries(
            args.sf_dir, only, repeats=args.query_repeats
        )
        print(json.dumps({
            "metric": "headline extraction wall time (all_valid, full corpus)",
            "value": round(head["secs"], 3),
            "unit": "sec",
            "queries": timings,
            "sf": os.path.basename(os.path.normpath(args.sf_dir)),
            "num_cpus": args.num_cpus,
            "docs_per_sec": round(head["docs_per_sec"], 2),
            "n_docs": head["n_docs"],
            "headline_samples_sec": [round(s["secs"], 3) for s in samples],
            "headline_samples_load_avg": [s["load_avg"] for s in samples],
            "headline_samples_load_flagged": [
                s["load_flagged"] for s in samples
            ],
            "load_flag_threshold": round(LOAD_FLAG_THRESHOLD, 1),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
