#!/usr/bin/env python
"""Interleaved, canary-checked A/B for r14 optimization candidates.

Same discipline as tools/ab_bench.py (r11): variants run STRICTLY
INTERLEAVED in one session so both see identical box weather; a
single-core CPU canary before each pair flags drift; per-variant walls
are medians over n_pairs runs, cache-cold (clearCache before each run).

Usage: python tools/ab_r14.py <experiment> [n_pairs] [query ...]

Experiments:
  edges     — graph_common._EDGE_BUILD "join" vs "collect" over the
              co-purchase consumer queries
  conf:K=V[,K=V...]A vs B session conf (requires fresh session per
              variant — NOT interleaved within one session; two sessions
              alternated is impossible in one JVM, so this mode runs
              variant blocks and reports canaries per block)

Writes AB_r14_<experiment>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import (  # noqa: E402
    QUERY_REGISTRY,
    graph_common,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EDGE_QUERIES = [
    "pagerank_copurchase",
    "label_propagation_communities",
    "lpa_modularity_score",
    "kcore_peeling_summary",
    "adamic_adar_link_prediction",
    "bfs_hops_from_hub",
]


def cpu_canary() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    return time.perf_counter() - t0


def run_query(spark, name: str) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    QUERY_REGISTRY[name].fn(spark, SF_DIR).count()
    return time.perf_counter() - t0


def main() -> None:
    exp = sys.argv[1] if len(sys.argv) > 1 else "edges"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or EDGE_QUERIES

    spark = get_spark("ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up: JVM/codegen + parquet footers + python workers (bench.py's
    # warm-up trio).
    QUERY_REGISTRY["distinct_counts"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    assert exp == "edges", f"unknown experiment {exp}"
    variants = ["join", "collect"]
    walls: dict[str, dict[str, list[float]]] = {
        v: {q: [] for q in names} for v in variants
    }
    canaries = []
    for p in range(n_pairs):
        for v in variants:
            graph_common._EDGE_BUILD = v
            c = cpu_canary()
            canaries.append(c)
            for q in names:
                w = run_query(spark, q)
                walls[v][q].append(w)
                print(f"pair {p} {v:8s} {q:32s} {w:6.2f}s  (canary {c:.3f})",
                      flush=True)
    graph_common._EDGE_BUILD = "collect"
    out = {
        "experiment": exp,
        "sf_dir": SF_DIR,
        "n_pairs": n_pairs,
        "canaries": canaries,
        "medians": {
            v: {q: round(statistics.median(ws), 3) for q, ws in d.items()}
            for v, d in walls.items()
        },
        "all": walls,
    }
    out["delta"] = {
        q: round(
            out["medians"]["collect"][q] - out["medians"]["join"][q], 3
        )
        for q in names
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"AB_r14_{exp}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"medians": out["medians"], "delta": out["delta"]},
                     indent=1))


if __name__ == "__main__":
    main()
