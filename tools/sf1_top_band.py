#!/usr/bin/env python
"""sf1 sidecar of the top bench band (r15, verdict item 8).

Times the slowest-N queries (by the current BENCH_SIDECAR.json medians) at
/tmp/sf1 with bench.py's methodology (session warm-up, cache-cold runs,
median-of-3, cpu+mp canaries bracketing the run) and writes
plans/r15/BENCH_SF1_top54.json. NOT driver-facing — additions only; the
point is to make data-proportional wins (bounds=, materialize ties)
measurable at a scale where the avoided pass costs something.

Usage: python tools/sf1_top_band.py [n_queries] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse canaries + _time_query + warm-up)
from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 54
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    with open(os.path.join(REPO, "BENCH_SIDECAR.json")) as fh:
        base = json.load(fh)
    names = [
        n
        for n, t in sorted(base["queries"].items(), key=lambda kv: -kv[1])
        if n != "medallion_e2e_orders"
    ][:n_top]

    spark = get_spark("sf1-top-band")
    spark.sparkContext.setLogLevel("ERROR")
    cpu_before = bench._cpu_canary()
    mp_before = bench._mp_canary()
    bench._warm(spark, sf_dir)

    detail: dict[str, dict] = {}
    for i, name in enumerate(names):
        detail[name] = bench._time_query(spark, name, sf_dir, n_runs)
        print(
            f"[{i + 1}/{len(names)}] {name}: med {detail[name]['median']} "
            f"min {detail[name]['min']} runs {detail[name]['runs']}",
            flush=True,
        )
    medians = {n: d["median"] for n, d in detail.items()}
    out = {
        "metric": "sf1_top_band_wall_time",
        "value": round(sum(t for t in medians.values() if t >= 0), 3),
        "min_sum": round(
            sum(d["min"] for d in detail.values() if d["min"] >= 0), 3
        ),
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        "n_queries": len(names),
        "cpu_canary_before": cpu_before,
        "cpu_canary_after": bench._cpu_canary(),
        "mp_canary_before": mp_before,
        "mp_canary_after": bench._mp_canary(),
        "queries": medians,
        "detail": detail,
    }
    path = os.path.join(REPO, "plans", "r15", "BENCH_SF1_top54.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"value": out["value"], "min_sum": out["min_sum"],
                      "n": len(names), "sidecar": path}))


if __name__ == "__main__":
    main()
