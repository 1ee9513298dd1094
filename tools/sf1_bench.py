#!/usr/bin/env python
"""sf1 headline benchmark: the measured 10×-data point behind the 100×
scaling claims.

Builds /tmp/sf1 — a 10× derivation of the driver's sf0.1 parquet (never
written into /root/testdata): id columns shifted per copy so key and join
cardinalities scale realistically, and document TEXTS perturbed per copy
(deterministic vowel/consonant rotation) so the corpus grows 10× WITHOUT
fabricating a 10-way duplicate cluster for every doc — the duplicated-corpus
stress case is measured separately by tools/scale_probe.py.

Measures the four headline operators (q1 scan+agg, broadcast join+agg,
MinHash LSH dedup, medallion e2e pipeline) with bench.py's methodology
(median of 3 runs after warm-up), appends the table to SCALE_PROBE.md and
writes BENCH_SF1.json.

Usage: python tools/sf1_bench.py
"""

from __future__ import annotations

import json

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402
from autonomus_datapipeline_spark.workloads.registry import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
COPIES = 10
N_RUNS = 3
GLOBAL_SHIFT = 10**6  # shared by all id columns; see build_sf1

SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STATIC = ["region", "nation", "supplier", "part"]

# Per-copy deterministic text perturbation: rotate these letters by the copy
# index. Copy 0 is the identity, so the sf0.1 corpus is a subset; other
# copies keep realistic token statistics but share almost no shingles with
# their source doc.
_ROT = "aeiounrst"


def _rot_alpha(i: int) -> str:
    k = i % len(_ROT)
    return _ROT[k:] + _ROT[:k]


def build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    for table, id_cols in SHIFTS.items():
        out = f"{SF1}/{table}.parquet"
        if os.path.exists(out):
            continue
        df = load_table(spark, BASE, table)
        n = df.count()
        # ONE global shift for every id column in every table: r12 found
        # the old per-table shift (derived from each table's own row
        # count) gave orders.o_custkey 1e7 but customer.c_custkey 1e6, so
        # customer joins matched only in copy 0 and sf1 factors for
        # customer-join queries measured a 10× scan over a 1× join. With
        # a shared shift each copy is an internally consistent shard and
        # join output scales 10× like the input. TPC-H keys are SPARSE —
        # o_orderkey/l_orderkey reach 600,000 at sf0.1 (not the ~1.5e5
        # dense row count) — so shard disjointness is asserted per column
        # rather than assumed (r12 ADVICE).
        shift = GLOBAL_SHIFT
        maxima = df.agg(
            *[F.max(F.col(c)).alias(c) for c in id_cols]
        ).collect()[0]
        for col in id_cols:
            assert maxima[col] < shift, (
                f"{table}.{col} max {maxima[col]} >= GLOBAL_SHIFT {shift}: "
                "copies would collide; raise GLOBAL_SHIFT"
            )
        copies = []
        for i in range(COPIES):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * shift))
            if table == "documents":
                c = c.withColumn("text", F.translate("text", _ROT, _rot_alpha(i)))
            copies.append(c)
        merged = copies[0]
        for c in copies[1:]:
            merged = merged.unionByName(c)
        merged.write.mode("overwrite").parquet(out)
        print(f"built {table}: {n} -> {n * COPIES} rows", file=sys.stderr)
    for table in STATIC:
        out = f"{SF1}/{table}.parquet"
        if not os.path.exists(out):
            load_table(spark, BASE, table).write.mode("overwrite").parquet(out)


def _medallion(spark, sf_dir: str) -> int:
    from bench import _run_medallion

    warehouse = tempfile.mkdtemp(prefix="sf1_medallion_")
    try:
        return _run_medallion(spark, sf_dir, warehouse)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


def _curation(spark, sf_dir: str) -> int:
    """Spec-driven corpus-curation flagship end-to-end (bronze ingest +
    7-stage silver chain + funnel gold) — the training-data twin of the
    medallion row."""
    from autonomus_datapipeline_spark.catalog import Catalog
    from autonomus_datapipeline_spark.plans.spec import run_spec
    from autonomus_datapipeline_spark.workloads.curation_pipeline import (
        curation_spec,
    )

    warehouse = tempfile.mkdtemp(prefix="sf1_curation_")
    try:
        results = run_spec(
            spark,
            Catalog(warehouse),
            curation_spec(f"{sf_dir}/documents.parquet"),
        )
        return results["bronze"].row_count
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


HEADLINE = [
    "q1_pricing_summary",
    "market_segment_revenue",
    "minhash_lsh_pairs",
    "medallion_e2e_orders",
    # round-5: a deep multi-join and a semi-join-on-aggregate at sf1
    "q8_market_share",
    "q18_large_volume_customers",
    # round-10: the corpus-curation flagship (spec-driven 7-stage chain)
    "curation_e2e_documents",
]

# round-11 (r10 verdict item 8): the 15 most expensive registry queries by
# the r10 driver bench — the graph/dedup/ANN heavy tail — so the
# 100×-posture claim is MEASURED at sf1 for exactly the queries where an
# accidental super-linearity would hurt most, not extrapolated from sf0.1.
HEAVY_TAIL = [
    "label_propagation_communities",
    "lpa_modularity_score",
    "dbscan_grid_clusters",
    "simhash_hamming_dedup_first",
    "kcore_peeling_summary",
    "curation_pipeline_funnel",
    "pagerank_copurchase",
    "dedup_keep_best_quality",
    "dedup_apply_minhash",
    "dedup_connected_components",
    "robust_outlier_mad",
    "bfs_hops_from_hub",
    "ann_recall_report",
    "hits_copurchase_2iter",
    "ann_mrr_report",
]

# round-12 (r11 verdict item 9): every r11-new capability family gets a
# measured sf1 factor — the as-of joins, the mergeable sketch family, the
# JL projection and the Neyman planner (adamic/ppjoin were certified in
# r11's session; they stay covered by the heavy tail above as needed).
R12_SET = [
    "asof_view_purchase_attribution",
    "asof_next_error_latency",
    "hll_portable_cardinality",
    "kmv_set_intersection",
    "ams_f2_sketch",
    "jl_projection_distortion",
    "neyman_allocation_plan",
    "adamic_adar_link_prediction",
    "ppjoin_prefix_filter_pairs",
    "als_rank2_implicit",
]


def _time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    runs = []
    n_rows = -1
    for _ in range(N_RUNS):
        t0 = time.time()
        if name == "medallion_e2e_orders":
            n_rows = _medallion(spark, sf_dir)
        elif name == "curation_e2e_documents":
            n_rows = _curation(spark, sf_dir)
        else:
            n_rows = QUERY_REGISTRY[name].fn(spark, sf_dir).count()
        runs.append(time.time() - t0)
    return statistics.median(runs), n_rows


def main() -> None:
    spark = get_spark("sf1-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    # warm (bench.py methodology): JVM + footers + python workers
    QUERY_REGISTRY["distinct_counts"].fn(spark, BASE).count()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    results = []
    for name, qset in (
        [(n, "headline") for n in HEADLINE]
        + [(n, "heavy_tail") for n in HEAVY_TAIL]
        + [(n, "r12") for n in R12_SET]
    ):
        t1, n1 = _time_query(spark, name, BASE)
        t10, n10 = _time_query(spark, name, SF1)
        factor = round(t10 / t1, 2) if t1 > 0 else float("nan")
        results.append({
            "query": name,
            "set": qset,
            "rows_sf01": n1,
            "sec_sf01": round(t1, 2),
            "rows_sf1": n10,
            "sec_sf1": round(t10, 2),
            "factor": factor,
        })
        print(f"{name}: sf0.1 {t1:.2f}s ({n1}) | sf1 {t10:.2f}s ({n10}) "
              f"| factor {factor}", file=sys.stderr)

    from bench import _cpu_canary

    with open("BENCH_SF1.json", "w") as fh:
        json.dump({
            "metric": "sf1_headline_median_sec",
            "n_runs": N_RUNS,
            "sf1_dir": SF1,
            "cpu_canary_sec": _cpu_canary(),
            "results": results,
        }, fh, indent=1)

    lines = [
        "",
        "## sf1 headline measurement (tools/sf1_bench.py)",
        "",
        "10× data with a NON-duplicated documents corpus (per-copy vowel/",
        "consonant rotation keeps token statistics but breaks cross-copy",
        "shingle overlap) — the fair linear-scaling point; the duplicated",
        "corpus above is the dup-cluster stress case. Medians of "
        f"{N_RUNS} runs",
        "after warm-up (bench.py methodology). Reference baseline for the",
        "medallion row: 218 s at 500K rows e2e (BASELINE.md Table 3); here",
        "1.5M orders run the same bronze→silver→gold chain.",
        "",
        "| query | set | rows @sf0.1 | s @sf0.1 | rows @sf1 | s @sf1 | factor |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['query']} | {r['set']} | {r['rows_sf01']} | {r['sec_sf01']} "
            f"| {r['rows_sf1']} | {r['sec_sf1']} | {r['factor']} |"
        )
    with open("SCALE_PROBE.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote BENCH_SF1.json and appended SCALE_PROBE.md")


if __name__ == "__main__":
    main()
