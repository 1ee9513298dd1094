#!/usr/bin/env python
"""Interleaved, canary-normalized A/B for the r10 bench-regression cluster.

The r10 driver bench showed label_propagation_communities 4.19→6.04 s,
lpa_modularity_score 4.54→5.26, dbscan_grid_clusters 4.51→5.24 and
quantile_normalize_deciles 2.13→3.05 vs r9 — while the box's CPU canary
drifted ×1.26 within the run. Single-shot walls cannot separate "the code
got slower" from "the box got slower", so this tool runs variant plans
STRICTLY INTERLEAVED in one session (every variant sees the same box
weather) with a single-core CPU canary before each timed run.

r11 findings this tool produced (see AB_r11.json):

- The LPA-family regression was the r10 edge-builder change (dropping the
  per-(order, part) pre-distinct, commit 28a971f), NOT the hash argmax:
  full LPA measured pre+hash 4.08 / pre+window 4.93 / nopre+hash 5.05 /
  nopre+window 5.03 at stable load. Fix: pre-distinct restored, hash
  argmax kept (graph_common._EDGE_PRE_DISTINCT governs the A/B).
- quantile_normalize_deciles and dbscan_grid_clusters regressed from the
  r10 load_table fan-out shuffling raw text/vectors ahead of LIGHT
  projections (2.2 vs 3.7 s, 4.8 vs 5.3 s). Fix: per-call-site
  fan_out=False opt-out.

Normalization: norm_wall = wall * (CANARY_REF / canary_run). CANARY_REF is
the best canary recorded by a same-code bench run on this box
(BENCH_SIDECAR r10: 0.118 s) — the unthrottled box speed, the condition
the r9 walls were presumably recorded under (r9 predates the canary).

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
from autonomus_datapipeline_spark.workloads import (  # noqa: E402
    QUERY_REGISTRY,
    curation_ops,
    graph_common,
    registry,
    search_ops,
    stats_ops,
)

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

_REAL_LOAD_TABLE = registry.load_table


def _forced_fanout(spark, sf_dir, name, fan_out=None):
    """r10 behavior: ignore the call site's fan_out=False opt-out."""
    return _REAL_LOAD_TABLE(
        spark, sf_dir, name,
        fan_out=True if name in ("documents", "embeddings") else None,
    )


def _state(pre_distinct=True, argmax="hash", force_fanout=False):
    """Stateless variant setup: every knob set explicitly per variant."""

    def setup():
        graph_common._EDGE_PRE_DISTINCT = pre_distinct
        stats_ops._LPA_ARGMAX = argmax
        lt = _forced_fanout if force_fanout else _REAL_LOAD_TABLE
        curation_ops.load_table = lt
        search_ops.load_table = lt

    return setup


# (query, variant-name, setup). "head" is the shipped r11 configuration;
# the other variants re-create the r10 / r9 plans for the same query.
TARGETS: list[tuple[str, str, object]] = [
    ("label_propagation_communities", "head_pre+hash", _state()),
    ("label_propagation_communities", "pre+window", _state(argmax="window")),
    ("label_propagation_communities", "r10_nopre+hash",
     _state(pre_distinct=False)),
    ("label_propagation_communities", "nopre+window",
     _state(pre_distinct=False, argmax="window")),
    ("lpa_modularity_score", "head_pre+hash", _state()),
    ("lpa_modularity_score", "r10_nopre+hash", _state(pre_distinct=False)),
    ("dbscan_grid_clusters", "head_no_fanout", _state()),
    ("dbscan_grid_clusters", "r10_fanout", _state(force_fanout=True)),
    ("quantile_normalize_deciles", "head_no_fanout", _state()),
    ("quantile_normalize_deciles", "r10_fanout", _state(force_fanout=True)),
]


def _burn(n: int) -> int:
    acc = 0
    for i in range(n):
        acc += i * i
    return acc


def _mp_canary(nproc: int = 8) -> float:
    """Multi-core availability canary (see bench.py._mp_canary): external
    load can halve 32-way stage throughput while the single-core canary
    stays flat — this one sees the stolen cores."""
    from multiprocessing import Pool

    t0 = time.perf_counter()
    with Pool(nproc) as pool:
        pool.map(_burn, [1_000_000] * nproc)
    return round(time.perf_counter() - t0, 4)


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
    # one untimed pass per variant: plan-cache/codegen warm-up is identical
    # treatment for every variant
    for name, _label, setup in TARGETS:
        setup()
        QUERY_REGISTRY[name].fn(spark, SF_DIR).count()
    _state()()

    runs: dict[tuple[str, str], list[dict]] = {t[:2]: [] for t in TARGETS}
    for sweep in range(n_pairs):
        # PERMUTE the sweep order (seeded, deterministic): each timed run
        # inherits its PREDECESSOR's ContextCleaner/GC/shuffle-file backlog
        # (~0.3-2 s measured), and a rotation preserves cyclic neighbors —
        # the same variant always pays the same predecessor's tax (r11:
        # head_pre+hash glued after the fan-out variant's full-text shuffle
        # read +1 s across every sweep). A fresh permutation per sweep
        # decorrelates predecessors from variants.
        import random as _random

        order = list(TARGETS)
        _random.Random(sweep).shuffle(order)
        for name, label, setup in order:
            setup()
            spark.catalog.clearCache()
            c = _canary()
            mc = _mp_canary()
            t0 = time.perf_counter()
            QUERY_REGISTRY[name].fn(spark, SF_DIR).count()
            wall = round(time.perf_counter() - t0, 3)
            runs[(name, label)].append(
                {"wall": wall, "canary": c, "mp_canary": mc,
                 "norm": round(wall * CANARY_REF / c, 3)}
            )
    _state()()  # restore the shipped configuration

    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover
        loadavg = None
    out = {"canary_ref": CANARY_REF, "sf_dir": SF_DIR, "n_pairs": n_pairs,
           "loadavg_after": loadavg, "r9_walls": R9_WALLS, "results": {}}
    for (name, label), rs in runs.items():
        med = statistics.median(r["wall"] for r in rs)
        med_norm = statistics.median(r["norm"] for r in rs)
        # best run = the quietest window the box offered; the r9 walls were
        # single medians under unknown load, so the best-normalized wall is
        # the fair "can the code still do r9's number" comparison while the
        # medians answer "which variant is faster" (interleaved, same
        # weather). mp_canary flags multi-core theft the 1-core canary
        # cannot see (loadavg 17 with a flat 1-core canary, r11 finding).
        best_norm = min(r["norm"] for r in rs)
        key = f"{name}::{label}"
        out["results"][key] = {
            "median_wall": round(med, 3),
            "median_norm": round(med_norm, 3),
            "best_norm": round(best_norm, 3),
            "r9_wall": R9_WALLS.get(name),
            "le_r9_normalized": best_norm <= R9_WALLS.get(name, float("inf")),
            "runs": rs,
        }
        print(f"{key}: wall={med:.3f} norm={med_norm:.3f} best={best_norm:.3f} "
              f"r9={R9_WALLS.get(name)} runs={[r['wall'] for r in rs]}",
              flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "AB_r11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote AB_r11.json")


if __name__ == "__main__":
    main()
