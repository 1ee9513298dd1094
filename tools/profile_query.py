#!/usr/bin/env python
"""Per-stage profile of one or more registered queries (guide §1/§7).

Runs each named query once (after the bench.py warm-up) in a session with
the UI enabled, then pulls the stage metrics from the UI REST API and
prints the top stages by executor-summed task time plus shuffle bytes —
the "where is the time actually going" view that bench medians cannot
give. Per-run job isolation comes from job-group tagging.

Usage: python tools/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as resp:
        return json.load(resp)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    QUERY_REGISTRY["distinct_counts"].fn(spark, sf_dir).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    QUERY_REGISTRY["embedding_norm_stats"].fn(spark, sf_dir).count()
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        QUERY_REGISTRY[name].fn(spark, sf_dir).count()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        tot_run = sum(s.get("executorRunTime") or 0 for s in stages)
        print(f"  total executorRunTime {tot_run/1000:.2f}s  "
              f"(parallelism ~{tot_run/1000/max(wall,1e-9):.1f}x)")
        for s in stages[:14]:
            rt = (s.get("executorRunTime") or 0) / 1000
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            sr = (s.get("shuffleReadBytes") or 0) / 1e6
            sw = (s.get("shuffleWriteBytes") or 0) / 1e6
            inp = (s.get("inputBytes") or 0) / 1e6
            nm = (s.get("name") or "")[:70]
            print(
                f"  stage {s['stageId']:>4} run {rt:7.2f}s cpu {cpu:7.2f}s "
                f"tasks {s.get('numCompleteTasks', 0):>3} in {inp:8.1f}MB "
                f"sr {sr:7.1f}MB sw {sw:7.1f}MB  {nm}"
            )


if __name__ == "__main__":
    main()
