#!/usr/bin/env python
"""Interleaved, canary-checked A/B for the r14 `bounds=` fast-path batch.

Variant "bounds" runs the tree as committed (callers pass bounds= so the
prefix-sum operator skips its min/max scan of the input); variant "scan"
monkeypatches the three prefix-sum entry points to STRIP the bounds kwarg,
restoring the data-derived min/max scan — i.e. the pre-change plan — in
the SAME session, so the two variants interleave under identical box
weather (the only measurement this box's burst stalls permit; see
OPTIMIZATION_r14.md "Box-weather characterization").

Usage: python tools/ab_r14_bounds.py [n_pairs] [query ...]

Writes AB_r14_bounds[_$AB_TAG].json.
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
from autonomus_datapipeline_spark.operators import prefix_sum as ps  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BOUNDS_QUERIES = [
    "trend_seasonal_decompose",
    "interval_overlap_count",
    "pareto_frontier_orders",
    "reorder_interval_quantiles",
    "hazard_table_monthly",
    "quality_threshold_filter",
    "token_budget_select",
    "durbin_watson_trend_residuals",
]

from autonomus_datapipeline_spark.workloads import registry  # noqa: E402

_ORIG = {
    "with_global_running": ps.with_global_running,
    "with_global_shift": ps.with_global_shift,
    "with_global_ntile": ps.with_global_ntile,
}
_ORIG_MATERIALIZE_INPUT = registry.materialize_input

# AB_STRIP selects WHICH optimization the "scan" variant reverts:
#   bounds (default) — strip the bounds= kwarg (re-enable min/max scans)
#   inputs           — make materialize_input identity AND strip the
#                      materialize= kwarg (revert the input-checkpoint
#                      batch; bounds stay, matching the committed baseline)
_STRIP_MODE = os.environ.get("AB_STRIP", "bounds")


def _stripped(fn):
    def wrapper(*a, **kw):
        if _STRIP_MODE == "bounds":
            kw.pop("bounds", None)
        # inputs mode: the strip is registry.materialize_input ONLY (see
        # set_variant) — popping materialize= here would also revert
        # pre-existing r13 materialize="cache" baselines (e.g.
        # trend_seasonal_decompose) and misattribute their delta to the
        # r14 input-checkpoint batch (r15 ADVICE item 4).
        return fn(*a, **kw)

    return wrapper


def set_variant(strip: bool) -> None:
    """Swap the prefix-sum entry points in EVERY module that imported them
    by name (workloads use `from ... import with_global_running`), plus the
    defining module itself (with_global_shift/ntile call with_global_running
    through prefix_sum's module globals)."""
    mods = [
        m
        for n, m in list(sys.modules.items())
        if n.startswith("autonomus_datapipeline_spark") and m is not None
    ]
    for name, orig in _ORIG.items():
        repl = _stripped(orig) if strip else orig
        for m in mods:
            if hasattr(m, name):
                setattr(m, name, repl)
    if _STRIP_MODE == "inputs":
        repl_mi = (lambda df: df) if strip else _ORIG_MATERIALIZE_INPUT
        for m in mods:
            if hasattr(m, "materialize_input"):
                setattr(m, "materialize_input", repl_mi)


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
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or BOUNDS_QUERIES

    spark = get_spark("ab-r14-bounds")
    spark.sparkContext.setLogLevel("ERROR")
    QUERY_REGISTRY["distinct_counts"].fn(spark, SF_DIR).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # Warm codegen for BOTH variants once so neither pays first-compile.
    for strip in (False, True):
        set_variant(strip)
        for q in names:
            run_query(spark, q)
    set_variant(False)

    runs: dict[str, dict[str, list[float]]] = {
        q: {"bounds": [], "scan": []} for q in names
    }
    canaries: list[float] = []
    for pair in range(n_pairs):
        canaries.append(cpu_canary())
        # Alternate which variant goes first within each pair so slow-phase
        # bursts cannot systematically tax one variant.
        order = ["bounds", "scan"] if pair % 2 == 0 else ["scan", "bounds"]
        for q in names:
            for variant in order:
                set_variant(variant == "scan")
                spark.sparkContext.setJobDescription(f"ab:{q}:{variant}")
                runs[q][variant].append(run_query(spark, q))
        set_variant(False)
        print(f"pair {pair + 1}/{n_pairs} done (canary {canaries[-1]:.3f})",
              flush=True)

    out = {
        "experiment": "bounds",
        "n_pairs": n_pairs,
        "canaries": canaries,
        "queries": {},
        "sum_min": {"bounds": 0.0, "scan": 0.0},
        "sum_median": {"bounds": 0.0, "scan": 0.0},
    }
    for q in names:
        row = {}
        for v in ("bounds", "scan"):
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
            f"{q}: bounds med {row['bounds']['median']} min "
            f"{row['bounds']['min']} | scan med {row['scan']['median']} "
            f"min {row['scan']['min']}",
            flush=True,
        )
    for k in ("sum_min", "sum_median"):
        out[k] = {v: round(t, 3) for v, t in out[k].items()}
    print(json.dumps({"sum_min": out["sum_min"],
                      "sum_median": out["sum_median"]}))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = os.environ.get("AB_TAG", "")
    fname = f"AB_r14_bounds_{tag}.json" if tag else "AB_r14_bounds.json"
    with open(os.path.join(repo, fname), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
