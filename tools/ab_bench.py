#!/usr/bin/env python
"""Interleaved, canary-normalized A/B for the r10 bench-regression cluster.

The r10 driver bench showed label_propagation_communities 4.19→6.04 s,
lpa_modularity_score 4.54→5.26, dbscan_grid_clusters 4.51→5.24 and
quantile_normalize_deciles 2.13→3.05 vs r9 — while the box's CPU canary
drifted ×1.26 within the run. Single-shot walls cannot separate "the code
got slower" from "the box got slower", so this tool does what the verdict
asked for:

- For queries with a PLAN VARIANT (the LPA family's hash-aggregate argmax
  vs the r9 window argmax) it runs A and B strictly INTERLEAVED in one
  session — A,B,A,B,... — so both variants see the same box weather, and
  times each run with a single-core CPU canary immediately before it.
- For queries with no code change since r9 (dbscan_grid_clusters,
  quantile_normalize_deciles regressed in the driver bench without any
  touch) it runs HEAD repeatedly with per-run canaries and compares the
  canary-normalized median against the r9 wall.

Normalization: norm_wall = wall * (CANARY_REF / canary_run). CANARY_REF is
the best canary ever recorded on this box by a same-code bench run
(BENCH_SIDECAR.json r10: 0.118 s) — i.e. the box's unthrottled speed, which
is the condition under which the r9 walls were recorded (r9 predates the
canary, so its exact box state is unrecorded; 0.118 is the conservative
choice because any r9 throttling would only make the r9 targets easier).

Writes AB_r11.json. Usage: python tools/ab_bench.py [n_pairs]
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
from autonomus_datapipeline_spark.workloads import stats_ops  # noqa: E402

CANARY_REF = 0.118  # best same-code canary on this box (BENCH_SIDECAR r10)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# r9 driver-bench walls (BENCH_r09.json) — the targets to come in at-or-under
# after canary normalization.
R9_WALLS = {
    "label_propagation_communities": 4.192,
    "lpa_modularity_score": 4.544,
    "dbscan_grid_clusters": 4.506,
    "quantile_normalize_deciles": 2.129,
}

# (query, variant-name, setup-callable). Variants of one query run
# interleaved; a query with a single variant is a stability re-measure.
def _set_argmax(form: str):
    def setup():
        stats_ops._LPA_ARGMAX = form

    return setup


TARGETS: list[tuple[str, str, object]] = [
    ("label_propagation_communities", "hash", _set_argmax("hash")),
    ("label_propagation_communities", "window", _set_argmax("window")),
    ("lpa_modularity_score", "hash", _set_argmax("hash")),
    ("lpa_modularity_score", "window", _set_argmax("window")),
    ("dbscan_grid_clusters", "head", None),
    ("quantile_normalize_deciles", "head", None),
]


def _canary() -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        _ = acc
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py warm-up: JVM/JIT, parquet footers, python workers
    QUERY_REGISTRY["distinct_counts"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    QUERY_REGISTRY["embedding_norm_stats"].fn(spark, SF_DIR).count()
    # one untimed pass per target: plan-cache/codegen warm-up is identical
    # treatment for every variant
    for name, _label, setup in TARGETS:
        if setup:
            setup()
        QUERY_REGISTRY[name].fn(spark, SF_DIR).count()
    stats_ops._LPA_ARGMAX = "hash"

    runs: dict[tuple[str, str], list[dict]] = {t[:2]: [] for t in TARGETS}
    for _ in range(n_pairs):
        for name, label, setup in TARGETS:  # strict interleave per sweep
            if setup:
                setup()
            spark.catalog.clearCache()
            c = _canary()
            t0 = time.perf_counter()
            QUERY_REGISTRY[name].fn(spark, SF_DIR).count()
            wall = round(time.perf_counter() - t0, 3)
            runs[(name, label)].append(
                {"wall": wall, "canary": c,
                 "norm": round(wall * CANARY_REF / c, 3)}
            )
    stats_ops._LPA_ARGMAX = "hash"

    out = {"canary_ref": CANARY_REF, "sf_dir": SF_DIR, "n_pairs": n_pairs,
           "r9_walls": R9_WALLS, "results": {}}
    for (name, label), rs in runs.items():
        med = statistics.median(r["wall"] for r in rs)
        med_norm = statistics.median(r["norm"] for r in rs)
        key = f"{name}::{label}"
        out["results"][key] = {
            "median_wall": round(med, 3),
            "median_norm": round(med_norm, 3),
            "r9_wall": R9_WALLS.get(name),
            "le_r9_normalized": med_norm <= R9_WALLS.get(name, float("inf")),
            "runs": rs,
        }
        print(f"{key}: wall={med:.3f} norm={med_norm:.3f} "
              f"r9={R9_WALLS.get(name)} runs={[r['wall'] for r in rs]}",
              flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AB_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote AB_r11.json")


if __name__ == "__main__":
    main()
