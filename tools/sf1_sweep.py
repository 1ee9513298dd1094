#!/usr/bin/env python
"""Full-registry sf1 sweep: driver-gate replica AND bit-exact float audit
in ONE pass over the 10× build.

The two scale-dependent bugs of r11/r12 (neyman LongType wrap, unigram
oracle length bound) were invisible at the driver's sf0.01 gate and
surfaced only by scaling the sweep up; r12 certified the registry at
sf0.1. This tool certifies it at sf1 (100× the gate scale): it runs every
registered query on Spark and its oracle on DuckDB against /tmp/sf1 (built
by tools/sf1_bench.build_sf1 — honest-join GLOBAL_SHIFT sharding), then
applies BOTH verdicts to the SAME result pair:

- the check_oracles comparison (columns, int/float dtype drift through the
  driver's pandas canonicalization, row count, order-insensitive 10-digit
  rowset) — what the driver's CORRECTNESS gate would say at sf1;
- the strict_float_audit comparison (every float cell bit-exact after
  row alignment) — immunity to any future tightening of the driver hash.

One pass instead of two because at sf1 each engine run is ~10× the sf0.1
cost; the two legacy tools compute their verdicts from identical inputs,
so running them separately would just re-execute every query.

Writes SF1_SWEEP.json {query: {status, rows, strict, sec, [detail]}} and
prints a per-query line + summary. Queries with no oracle get the
rows-only check (status ok*), like the driver.

Usage: python tools/sf1_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

from tools.check_oracles import dtype_drift, norm  # noqa: E402

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import (  # noqa: E402
    QUERY_REGISTRY,
    TABLES,
)

SF1_DEFAULT = "/tmp/sf1"
# Overridable so the sweep can run as parallel shards over disjoint query
# lists (tools/merge_sf1_sweep.py merges the shard artifacts).
OUT = os.environ.get("SF1_SWEEP_OUT", "SF1_SWEEP.json")


def _aligned_rowset(cols, rows):
    """[(norm_key_tuple, raw_tuple)] sorted by key, columns sorted by name
    — the check_oracles rowset with the raw values kept alongside so the
    bit-exact pass can reuse the alignment."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm(r[i]) for i in order), tuple(r[i] for i in order))
        for r in rows
    )


def _bit_exact(srows, drows):
    """(n_drifting_cells, worst_rel, example) over aligned float cells.
    pandas float32 widens exactly through float(); non-floats skip."""
    worst, n_cells, example = 0.0, 0, ""
    for (_, sv), (_, dv) in zip(srows, drows):
        for a, b in zip(sv, dv):
            if isinstance(a, float) and isinstance(b, float):
                a, b = float(a), float(b)
                if math.isnan(a) and math.isnan(b):
                    continue
                if a == b and math.copysign(1, a) == math.copysign(1, b):
                    continue
                n_cells += 1
                denom = max(abs(a), abs(b), 1e-300)
                rel = abs(a - b) / denom
                if rel > worst:
                    worst, example = rel, f"{a!r} vs {b!r}"
    return n_cells, worst, example


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else SF1_DEFAULT
    only = set(args[1:])
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        print(
            f"{sf_dir} missing — build it first: python tools/sf1_bench.py "
            "(or import tools.sf1_bench and call build_sf1)",
            file=sys.stderr,
        )
        return 2
    spark = get_spark("sf1-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # Per-process spill dir: concurrent shards sharing the default cwd
    # ".tmp" delete each other's temp files (observed: a shard died on
    # duckdb::IOException removing another's duckdb_temp_storage file).
    con.execute(f"SET temp_directory='/tmp/duckdb_tmp_{os.getpid()}'")
    for t in TABLES:
        # Spark writes each sf1 table as a DIRECTORY of part files; DuckDB
        # needs the explicit glob for that layout (a single-file path, as
        # in /root/testdata, also works un-globbed).
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    report: dict[str, dict] = {}
    failures: list[str] = []
    drifted: list[str] = []
    for name, spec in QUERY_REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()

        def fail(msg: str, **extra) -> None:
            failures.append(name)
            report[name] = {
                "status": "FAIL",
                "detail": msg,
                "sec": round(time.time() - t0, 1),
                **extra,
            }
            print(f"FAIL  {name}: {msg}", flush=True)

        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = list(spdf.itertuples(index=False, name=None))
        except Exception as exc:  # noqa: BLE001
            fail(f"spark error: {exc}")
            continue
        if spec.oracle is None:
            report[name] = {
                "status": "ok*",
                "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            print(
                f"ok*   {name}: rows-only ({len(srows)} rows, "
                f"{time.time() - t0:.1f}s)",
                flush=True,
            )
            continue
        try:
            ddf = con.execute(spec.oracle).df()
            dcols = list(ddf.columns)
            drows = list(ddf.itertuples(index=False, name=None))
        except Exception as exc:  # noqa: BLE001
            fail(f"duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(dcols):
            fail(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        dd = dtype_drift(scols, spdf, ddf)
        if dd:
            fail(f"int/float dtype drift: {dd}")
            continue
        s = _aligned_rowset(scols, srows)
        d = _aligned_rowset(dcols, drows)
        if len(s) != len(d):
            fail(f"rowcount spark={len(s)} duck={len(d)}")
            continue
        if [k for k, _ in s] != [k for k, _ in d]:
            bad = [
                (a, b)
                for (a, _), (b, _) in zip(s, d)
                if a != b
            ][:3]
            fail(f"value mismatch, first diffs: {bad}")
            continue
        n_cells, worst, example = _bit_exact(s, d)
        strict = "bit-exact" if n_cells == 0 else f"drift {worst:.3e}"
        report[name] = {
            "status": "ok",
            "rows": len(s),
            "strict": strict,
            "sec": round(time.time() - t0, 1),
        }
        if n_cells:
            drifted.append(name)
            report[name]["drift_cells"] = n_cells
            report[name]["drift_example"] = example
            print(
                f"ok~   {name}: {len(s)} rows match, FLOAT DRIFT "
                f"{n_cells} cells max rel {worst:.3e} ({example}) "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        else:
            print(
                f"ok    {name}: {len(s)} rows match, bit-exact "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )

    n_ok = sum(1 for r in report.values() if r["status"] == "ok")
    n_rows_only = sum(1 for r in report.values() if r["status"] == "ok*")
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "n_ok": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": len(failures),
        "failures": failures,
        "n_float_drift": len(drifted),
        "float_drift": drifted,
    }
    with open(OUT, "w") as fh:
        json.dump({"summary": summary, "queries": report}, fh, indent=1,
                  sort_keys=True)
    print(
        f"\n{n_ok} ok + {n_rows_only} rows-only, {len(failures)} failures"
        + (f": {failures}" if failures else "")
        + f"; {len(drifted)} with float drift"
        + (f": {drifted}" if drifted else "")
        + f" -> {OUT}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
