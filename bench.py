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


def _run_medallion(spark, sf_dir: str, warehouse: str) -> int:
    from autonomus_datapipeline_spark.catalog import Catalog
    from autonomus_datapipeline_spark.engine import Pipeline

    pipe = Pipeline(spark, Catalog(warehouse), "bench_orders")
    pipe.silver_chain.add_step(
        "filter_bucket",
        "from pyspark.sql import functions as F\n"
        "def transform(df, spark):\n"
        "    bucket = (F.when(F.col('o_totalprice') < 50000, 'small')\n"
        "               .when(F.col('o_totalprice') < 150000, 'medium')\n"
        "               .when(F.col('o_totalprice') < 300000, 'large')\n"
        "               .otherwise('jumbo'))\n"
        "    return (df.filter(F.col('o_orderstatus') != 'P')\n"
        "              .withColumn('price_bucket', bucket))\n",
    )
    pipe.gold_chain.add_step(
        "agg",
        "from pyspark.sql import functions as F\n"
        "def transform(df, spark):\n"
        "    return df.groupBy('price_bucket', 'o_orderpriority').agg(\n"
        "        F.count('*').alias('n_orders'),\n"
        "        F.sum('o_totalprice').alias('total_price'))\n",
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    results = pipe.run_all(orders)
    return results["bronze"].row_count


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

    # Medallion pipeline end-to-end (Bronze ingest + Silver chain + Gold chain
    # on the orders table) — the direct comparable to BASELINE.md's CSV
    # case-study E2E rows (reference: 33s @ 50K rows, 218s @ 500K rows).
    import shutil
    import tempfile

    warehouse = tempfile.mkdtemp(prefix="bench_medallion_")
    try:
        t0 = time.time()
        n_orders = _run_medallion(spark, sf_dir, warehouse)
        timings["medallion_e2e_orders"] = round(time.time() - t0, 3)
        print(
            f"medallion e2e: {n_orders} orders through bronze→silver→gold "
            f"in {timings['medallion_e2e_orders']}s",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        print(f"bench error in medallion_e2e: {exc}", file=sys.stderr)
        timings["medallion_e2e_orders"] = -1.0
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)

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
