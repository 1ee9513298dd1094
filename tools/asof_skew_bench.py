#!/usr/bin/env python
"""Measure the asof_join salt_buckets knob on a genuinely skewed fixture.

The knob's claim (operators/asof.py): one dominant key serializes its
whole partition in the unsalted keyed window — O(hot rows) on one core —
and salting by N time buckets cuts that to O(rows/N + N). This script
builds a 2M-row left / 50K-row right fixture where ONE key holds 95% of
the rows, times unsalted vs salted (several N) with bench.py methodology
(median of 3, cache-cold), asserts the outputs are value-identical
(count + full checksum), and prints a markdown table for SCALING.md.

Usage: python tools/asof_skew_bench.py
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from autonomus_datapipeline_spark.operators.asof import asof_join  # noqa: E402
from autonomus_datapipeline_spark.session import get_spark  # noqa: E402

N_LEFT = 2_000_000
N_RIGHT = 50_000
HOT_SHARE = 0.95  # fraction of left rows on the single hot key
N_RUNS = 3


def build(spark):
    # 95% of left rows on key 0, the rest spread over 1..63; ts is a
    # deterministic shuffle of the range so buckets are evenly filled.
    left = spark.range(N_LEFT).select(
        F.when(
            (F.col("id") % 100) < int(HOT_SHARE * 100), F.lit(0)
        ).otherwise(F.col("id") % 63 + 1).alias("k"),
        ((F.col("id") * 2654435761) % N_LEFT).alias("lts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(N_RIGHT).select(
        F.when(
            (F.col("id") % 100) < int(HOT_SHARE * 100), F.lit(0)
        ).otherwise(F.col("id") % 63 + 1).alias("k"),
        # distinct per (k, ts): spread rights over the same ts domain
        ((F.col("id") * 40503) % N_LEFT).alias("rts"),
        F.concat(F.lit("v"), F.col("id")).alias("rv"),
    ).dropDuplicates(["k", "rts"])
    # write/read parquet so every timed run starts from a real scan
    left.write.mode("overwrite").parquet("/tmp/asof_skew/left.parquet")
    right.write.mode("overwrite").parquet("/tmp/asof_skew/right.parquet")


def checksum(df):
    return df.select(
        # decimal accumulator: a bigint sum of 2M raw xxhash64 values
        # overflows long under ANSI
        F.sum(
            F.xxhash64("k", "lts", "lid", "rts", "rv").cast("decimal(38,0)")
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def main() -> None:
    spark = get_spark("asof-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    left = spark.read.parquet("/tmp/asof_skew/left.parquet")
    right = spark.read.parquet("/tmp/asof_skew/right.parquet")

    def run(buckets):
        return asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            direction="backward", salt_buckets=buckets,
        )

    base = checksum(run(None))  # also warms the JVM/scan path
    rows = []
    for buckets in (None, 8, 32, 128):
        times = []
        got = None
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            # time the CHECKSUM, not count(): count() lets Catalyst prune
            # the unused match columns and with them the whole window —
            # the checksum consumes every column, so the running-last
            # window (the thing being measured) must execute
            got = checksum(run(buckets))
            times.append(time.time() - t0)
        n = got.n
        assert (got.h, got.n) == (base.h, base.n), (buckets, got, base)
        rows.append((buckets, n, round(statistics.median(times), 2)))
        print(f"salt_buckets={buckets}: median {rows[-1][2]}s "
              f"({n} rows, checksum ok)", file=sys.stderr)

    unsalted = rows[0][2]
    print("| salt_buckets | median s | speedup | values |")
    print("|---|---|---|---|")
    for buckets, n, t in rows:
        print(f"| {buckets or 'off'} | {t} | "
              f"{unsalted / t:.2f}x | identical ({n} rows) |")


if __name__ == "__main__":
    main()
