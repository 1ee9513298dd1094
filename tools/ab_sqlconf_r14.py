#!/usr/bin/env python
"""Interleaved A/B for RUNTIME SQL confs (r14).

Unlike tools/ab_conf_r14.py (fresh session per block — needed for
session-startup confs), AQE/SQL confs are settable per query via
spark.conf.set, so variants can run STRICTLY INTERLEAVED in one session:
both see identical JIT state and box weather, and the min over pairs is
stall-robust (host stalls only inflate).

Usage:
  python tools/ab_sqlconf_r14.py "k=v[,k=v]" [n_pairs] [query ...]

Writes AB_r14_sqlconf_<slug>.json. Variant "base" restores the session
default for each key (captured before the first override).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "label_propagation_communities",
    "lpa_modularity_score",
    "adamic_adar_link_prediction",
    "bfs_hops_from_hub",
    "kcore_peeling_summary",
    "pagerank_copurchase",
]


def cpu_canary() -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i * i
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    overrides = dict(kv.split("=", 1) for kv in sys.argv[1].split(","))
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or DEFAULT_QUERIES

    spark = get_spark("ab-sqlconf")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {k: spark.conf.get(k, None) for k in overrides}
    QUERY_REGISTRY["distinct_counts"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # Per-query JIT warm for BOTH variants before any timing.
    for q in names:
        QUERY_REGISTRY[q].fn(spark, SF_DIR).count()
        spark.catalog.clearCache()

    variants = {"base": defaults, "conf": overrides}
    walls: dict[str, dict[str, list[float]]] = {
        v: {q: [] for q in names} for v in variants
    }
    canaries = []
    for p in range(n_pairs):
        for v, conf in variants.items():
            for k, val in conf.items():
                if val is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, val)
            c = cpu_canary()
            canaries.append(round(c, 4))
            for q in names:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERY_REGISTRY[q].fn(spark, SF_DIR).count()
                w = round(time.perf_counter() - t0, 3)
                walls[v][q].append(w)
                print(f"pair {p} {v:5s} {q:34s} {w:6.2f}s (canary {c:.3f})",
                      flush=True)
    for k, val in defaults.items():
        if val is not None:
            spark.conf.set(k, val)
    agg = {
        v: {
            q: {"min": min(r), "median": round(statistics.median(r), 3)}
            for q, r in d.items()
        }
        for v, d in walls.items()
    }
    delta_min = {
        q: round(agg["conf"][q]["min"] - agg["base"][q]["min"], 3)
        for q in names
    }
    slug = "_".join(
        k.rsplit(".", 1)[-1] + "-" + v for k, v in overrides.items()
    )[:60].replace("/", "-")
    out = {
        "overrides": overrides,
        "sf_dir": SF_DIR,
        "n_pairs": n_pairs,
        "canaries": canaries,
        "agg": agg,
        "delta_min_conf_minus_base": delta_min,
        "all": walls,
    }
    with open(f"AB_r14_sqlconf_{slug}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"agg": agg, "delta_min": delta_min}, indent=1))


if __name__ == "__main__":
    main()
