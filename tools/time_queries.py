#!/usr/bin/env python
"""Quick per-query timing probe: median of N runs at a given sf_dir, same
warm-up as bench.py, for iterating on individual queries without paying the
full-suite wall. Usage: python tools/time_queries.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    QUERY_REGISTRY["distinct_counts"].fn(spark, sf_dir).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    QUERY_REGISTRY["embedding_norm_stats"].fn(spark, sf_dir).count()
    for name in names:
        runs = []
        for _ in range(n_runs):
            # cache-cold per run, matching bench.py (CacheManager would
            # otherwise resurrect the previous run's cache()d subtrees)
            spark.catalog.clearCache()
            t0 = time.time()
            QUERY_REGISTRY[name].fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: median={statistics.median(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
