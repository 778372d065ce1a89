"""Full-query sweep — the builder's own driver-style correctness pass
over EVERY ``queries()`` entry (not just the driver's 50-entry window).

For each entry: run the Ray pipeline at ``--sf-dir``; if an
``oracle_sql()`` entry exists, compare against DuckDB exactly as the
graft driver does (row count + sorted-column schema + exact values);
otherwise record a rows-only check. Writes one machine-readable JSON
(default ``SWEEP_r05.json``) with per-query ok/fail + wall seconds.

Usage: ``python sweep.py [--sf-dir /root/testdata/sf0.01] [--out F]``
Owns its Ray session (scripts only — never __ray_entry__/library code).
"""

from __future__ import annotations

import argparse
import json
import os
import time
import traceback

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", default="SWEEP_r05.json")
    parser.add_argument(
        "--num-cpus",
        type=int,
        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    )
    parser.add_argument("--only", default=None, help="comma-sep subset")
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = dict(entrymod.oracle_sql())
    sqls.update(entrymod._extract_parity_oracles(args.sf_dir))
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    con = _connect(args.sf_dir)
    results: dict[str, dict] = {}
    n_ok = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        row: dict = {"oracle": name in sqls}
        try:
            ray_df = _canon(_to_pandas(fn(args.sf_dir)))
            if name in sqls:
                duck_df = _canon(con.execute(sqls[name]).fetchdf())
                row["rows_match"] = len(ray_df) == len(duck_df)
                row["schema_match"] = list(ray_df.columns) == list(
                    duck_df.columns
                )
                try:
                    pd.testing.assert_frame_equal(
                        ray_df,
                        duck_df,
                        check_dtype=False,
                        check_exact=True,
                        obj=name,
                    )
                    row["hash_match"] = True
                except AssertionError as e:
                    row["hash_match"] = False
                    row["err"] = str(e)[:400]
                row["ok"] = bool(
                    row["rows_match"]
                    and row["schema_match"]
                    and row["hash_match"]
                )
                row["oracle_rows"] = len(duck_df)
            else:
                # rows-only: a well-formed result must still carry its
                # declared schema — a zero-COLUMN frame (e.g. an untyped
                # empty-batch degradation) is a failure even at 0 rows
                row["ok"] = ray_df is not None and len(ray_df.columns) > 0
            row["ray_rows"] = len(ray_df)
        except Exception:
            row["ok"] = False
            row["err"] = traceback.format_exc()[-400:]
        row["secs"] = round(time.time() - t0, 3)
        results[name] = row
        n_ok += row["ok"]
        n_fail += not row["ok"]
        print(
            f"[{n_ok + n_fail}/{len(qs)}] {name}: "
            f"{'ok' if row['ok'] else 'FAIL'} ({row['secs']}s)",
            flush=True,
        )

    try:
        la = os.getloadavg()
    except OSError:
        la = (None,) * 3
    payload = {
        "sf_dir": args.sf_dir,
        "num_cpus": args.num_cpus,
        "n_queries": len(qs),
        "n_oracled": sum(1 for r in results.values() if r["oracle"]),
        "n_ok": n_ok,
        "n_fail": n_fail,
        "load_avg_end": la[0],
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}: {n_ok} ok / {n_fail} fail of {len(qs)}")
    ray.shutdown()


if __name__ == "__main__":
    main()
