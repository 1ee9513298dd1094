#!/usr/bin/env python
"""Interleaved, canary-checked A/B for r15 optimization candidates.

Discipline unchanged from r14 (OPTIMIZATION_r14.md, box-weather section):
variants run STRICTLY INTERLEAVED in one session so both see identical box
weather; variant order alternates between pairs; a CPU canary brackets each
pair; per-query MIN is the noise-robust decision statistic, medians
reported alongside.

Usage: python tools/ab_r15.py <experiment> [n_pairs] [query ...]

Experiments (variant A = the candidate, variant B = the alternative):
  edges    — graph_common._EDGE_BUILD "collect" vs "join" over the six
             co-purchase consumers (NOTE: flips the MODULE default, so it
             measures the default-form consumers; the two call sites that
             pin build="collect" per the r15 A/Bs are unaffected by the
             flip)
  madhist  — audit_ops._MAD_FORM "hist" (r15 count-weighted histogram) vs
             "rawrank" (pre-r15 raw-row ranks) on robust_outlier_mad
  theilsen — stats_ops._THEIL_SEN_FORM "hist" (r13/r14 histogram+cache)
             vs "fold" (r15 shipped raw-slope form) on theil_sen

Writes AB_r15_<experiment>[_$AB_TAG].json.
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
    audit_ops,
    graph_common,
    stats_ops,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EXPERIMENTS = {
    # name -> (A_label, B_label, set_variant(is_B), default_queries)
    "edges": (
        "collect",
        "join",
        lambda b: setattr(graph_common, "_EDGE_BUILD", "join" if b else "collect"),
        [
            "pagerank_copurchase",
            "label_propagation_communities",
            "lpa_modularity_score",
            "kcore_peeling_summary",
            "adamic_adar_link_prediction",
            "bfs_hops_from_hub",
        ],
    ),
    "madhist": (
        "hist",
        "rawrank",
        lambda b: setattr(audit_ops, "_MAD_FORM", "rawrank" if b else "hist"),
        ["robust_outlier_mad"],
    ),
    # A = "fold" (the shipped r15 default); the committed sf1/sf0.1
    # artifacts predate the flip and carry A = "hist" labels.
    "theilsen": (
        "fold",
        "hist",
        lambda b: setattr(stats_ops, "_THEIL_SEN_FORM", "hist" if b else "fold"),
        ["theil_sen_daily_trend"],
    ),
}


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
    exp = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    a_label, b_label, set_variant, default_q = EXPERIMENTS[exp]
    names = sys.argv[3:] or default_q

    spark = get_spark(f"ab-r15-{exp}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERY_REGISTRY["distinct_counts"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # Warm codegen for BOTH variants once so neither pays first-compile.
    for is_b in (False, True):
        set_variant(is_b)
        for q in names:
            run_query(spark, q)
    set_variant(False)

    runs: dict[str, dict[str, list[float]]] = {
        q: {a_label: [], b_label: []} for q in names
    }
    canaries: list[float] = []
    for pair in range(n_pairs):
        canaries.append(cpu_canary())
        order = [a_label, b_label] if pair % 2 == 0 else [b_label, a_label]
        for q in names:
            for variant in order:
                set_variant(variant == b_label)
                spark.sparkContext.setJobDescription(f"ab:{q}:{variant}")
                runs[q][variant].append(run_query(spark, q))
        set_variant(False)
        print(f"pair {pair + 1}/{n_pairs} done (canary {canaries[-1]:.3f})",
              flush=True)

    out = {
        "experiment": exp,
        "variants": [a_label, b_label],
        "sf_dir": SF_DIR,
        "n_pairs": n_pairs,
        "canaries": canaries,
        "queries": {},
        "sum_min": {a_label: 0.0, b_label: 0.0},
        "sum_median": {a_label: 0.0, b_label: 0.0},
    }
    for q in names:
        row = {}
        for v in (a_label, b_label):
            ts = runs[q][v]
            row[v] = {
                "runs": [round(t, 3) for t in ts],
                "median": round(statistics.median(ts), 3),
                "min": round(min(ts), 3),
            }
            out["sum_min"][v] += min(ts)
            out["sum_median"][v] += statistics.median(ts)
        out["queries"][q] = row
        print(
            f"{q}: {a_label} med {row[a_label]['median']} min "
            f"{row[a_label]['min']} | {b_label} med {row[b_label]['median']} "
            f"min {row[b_label]['min']}",
            flush=True,
        )
    for k in ("sum_min", "sum_median"):
        out[k] = {v: round(t, 3) for v, t in out[k].items()}
    print(json.dumps({"sum_min": out["sum_min"],
                      "sum_median": out["sum_median"]}))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = os.environ.get("AB_TAG", "")
    fname = f"AB_r15_{exp}_{tag}.json" if tag else f"AB_r15_{exp}.json"
    with open(os.path.join(repo, fname), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
