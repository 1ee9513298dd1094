#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB against the
same parquet tables, then compares row count, column names, and
order-insensitive values (rows sorted after sorting columns by name).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY, TABLES  # noqa: E402


def norm(v):
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        # Spark DATE surfaces as datetime.date through toPandas while DuckDB
        # DATE surfaces as a midnight Timestamp through .df(); the driver
        # treats those as equal (string_date_functions is driver-green), so
        # canonicalize both to the timestamp form.
        return f"{v.isoformat()} 00:00:00"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        s = f"{v:.10g}"
        # Keep float-ness visible: an integral float must NOT collapse to the
        # int form.  DuckDB widens SUM(BIGINT) to HUGEINT, which pandas
        # materializes as float64 (279.0) while Spark returns int64 (279) —
        # the driver hashes those as different values (round-4 red row), so
        # the local gate must too.
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    return str(v)


_INT_KINDS = frozenset("iu")


def dtype_drift(scols, spdf, ddf):
    """Columns whose pandas dtype *kind* disagrees between Spark and DuckDB
    in the int-vs-float dimension — the exact drift the driver's
    pandas-based canonicalizer hashes as a mismatch."""
    bad = []
    for c in scols:
        sk, dk = spdf[c].dtype.kind, ddf[c].dtype.kind
        s_int, d_int = sk in _INT_KINDS, dk in _INT_KINDS
        s_flt, d_flt = sk == "f", dk == "f"
        if (s_int and d_flt) or (s_flt and d_int):
            bad.append((c, str(spdf[c].dtype), str(ddf[c].dtype)))
    return bad


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if vanilla:
        # replicate the driver: a stock session with none of our confs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in QUERY_REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            # Canonicalize through pandas exactly like the driver does —
            # collect() would hand back Python ints where toPandas() yields
            # the dtype the driver actually hashes.
            spdf = sdf.toPandas()
            srows = list(spdf.itertuples(index=False, name=None))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        # Driver-compat guard: the driver canonicalizes through pandas, which
        # cannot hash/sort list- or dict-typed cells (round-1 failure mode of
        # array_agg_order_years) — flag any such output column as a failure
        # even though our own str()-based comparison would survive it.
        # Checked on the SCHEMA, not the first row: a column that is NULL in
        # row 0 but list-typed later would slip a row-based probe.
        bad_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
            or f.dataType.typeName() == "binary"
        ]
        if bad_cols:
            failures.append(name)
            print(f"FAIL  {name}: complex-typed output column(s) {bad_cols} "
                  f"(driver's pandas canonicalizer would crash)")
            continue
        if spec.oracle is None:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time() - t0:.1f}s, no oracle)")
            continue
        try:
            # .df(), not fetchall(): fetchall() returns Python ints for
            # HUGEINT while the driver's pandas path sees float64.
            ddf = con.execute(spec.oracle).df()
            dcols = list(ddf.columns)
            drows = list(ddf.itertuples(index=False, name=None))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        drift = dtype_drift(scols, spdf, ddf)
        if drift:
            failures.append(name)
            print(f"FAIL  {name}: int/float dtype drift (spark vs duck): {drift}")
            continue
        s, d = rowset(scols, srows), rowset(dcols, drows)
        if len(s) != len(d):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(s)} duck={len(d)}")
            continue
        if s != d:
            failures.append(name)
            bad = [(a, b) for a, b in zip(s, d) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {bad}")
            continue
        print(f"ok    {name}: {len(s)} rows match ({time.time() - t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
