#!/usr/bin/env python
"""Benchmark harness: runs the registered workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count of the result) — results are not
collected to the driver, matching how a production job would materialize.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footer caches once so per-query numbers measure
    # the query, not session startup.
    QUERY_REGISTRY["distinct_counts"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, spec in QUERY_REGISTRY.items():
        t0 = time.time()
        try:
            spec.fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "workload_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
