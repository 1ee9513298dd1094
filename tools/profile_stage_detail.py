#!/usr/bin/env python
"""Deep-dive one query: per-stage task metric breakdown (guide §7.1's
summary-metrics view, via the REST API since the sandbox has no browser).

Usage: python tools/profile_stage_detail.py [sf_dir] query
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
    name = args[1] if args and os.path.isdir(args[0]) else args[0]
    spark = get_spark("profile-detail", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    QUERY_REGISTRY["distinct_counts"].fn(spark, sf_dir).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    # one warm run, then the measured run
    QUERY_REGISTRY[name].fn(spark, sf_dir).count()
    spark.catalog.clearCache()
    jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
    t0 = time.time()
    QUERY_REGISTRY[name].fn(spark, sf_dir).count()
    wall = time.time() - t0
    jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in jobs_before]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = []
    for sid in stage_ids:
        try:
            stages.extend(_api(base, f"/stages/{sid}?details=false"))
        except Exception:
            pass
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"=== {name}: wall {wall:.2f}s ===")
    for s in stages[:8]:
        rt = (s.get("executorRunTime") or 0) / 1000
        cpu = (s.get("executorCpuTime") or 0) / 1e9
        if rt < 0.3:
            continue
        print(
            f"stage {s['stageId']} run {rt:.2f}s cpu {cpu:.2f}s "
            f"tasks {s.get('numCompleteTasks')}"
        )
        for k in (
            "shuffleFetchWaitTime", "shuffleWriteTime", "jvmGcTime",
            "executorDeserializeTime", "resultSerializationTime",
            "memoryBytesSpilled", "diskBytesSpilled",
        ):
            v = s.get(k)
            if v:
                unit = "ms" if "Time" in k else "B"
                if k == "shuffleWriteTime":
                    v = v / 1e6  # ns -> ms
                print(f"    {k}: {v:.0f}{unit}")
        # first few task attempts with their longest components
        try:
            tasks = _api(
                base,
                f"/stages/{s['stageId']}/0/taskList?length=500&sortBy=-runtime",
            )
            for t in tasks[:3]:
                tm = t.get("taskMetrics") or {}
                print(
                    f"    task dur {t.get('duration', 0)/1000:.2f}s "
                    f"run {tm.get('executorRunTime', 0)/1000:.2f}s "
                    f"cpu {tm.get('executorCpuTime', 0)/1e9:.2f}s "
                    f"gc {tm.get('jvmGcTime', 0)/1000:.2f}s "
                    f"deser {tm.get('executorDeserializeTime', 0)/1000:.2f}s "
                    f"fetchwait "
                    f"{(tm.get('shuffleReadMetrics') or {}).get('fetchWaitTime', 0)/1000:.2f}s"
                )
        except Exception as exc:
            print(f"    (taskList failed: {exc})")


if __name__ == "__main__":
    main()
