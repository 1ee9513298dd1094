#!/usr/bin/env python
"""Cold-vs-warm audit over BENCH_SIDECAR.json (r11 verdict item 2).

The sidecar already records every per-run time, so the cold-start question
is answerable without re-running anything: for each query, run 1 executed
that plan's generated code for the first time in the session (JIT /
whole-stage-codegen compilation, plus Python-worker spin-up for the first
mapInPandas after idle), while runs 2..n_runs hit warmed code paths. This
script quantifies:

  cold_excess(q)  = runs[0] - min(runs[1:])      (absolute seconds)
  cold_ratio(q)   = runs[0] / min(runs[1:])      (dimensionless)

and aggregates both per family. Two different walls matter:

  - the REPORTED suite wall = sum of per-query MEDIANS. With n_runs=3 the
    median excludes the cold run whenever runs 2-3 are faster, so the
    committed number is already a warm number.
  - the bench PROCESS wall = sum of all runs + warmup + canaries. Cold
    excess lands here; it is the per-round driver cost, not the metric.

Usage: python tools/coldstart_audit.py [BENCH_SIDECAR.json]
Prints a markdown table (paste into NOTES_BUILD.md).
"""

from __future__ import annotations

import json
import sys

FAMILIES = [
    ("ann/similarity", ("ann_", "jl_projection", "mmr_", "hybrid_rrf", "knn_", "jaccard_knn", "semdedup")),
    ("dedup/minhash", ("dedup_", "minhash", "simhash", "neardup", "ppjoin", "ngram_jaccard", "ngram_containment", "incremental_dedup")),
    ("graph", ("pagerank", "hits_", "lpa_", "label_prop", "kcore", "bfs_", "adamic", "degree_", "copurchase", "market_basket", "neardup_triangle")),
    ("model/stats", ("naive_bayes", "logistic_", "decision_stump", "dbscan", "theil_sen", "kaplan", "poisson", "bh_fdr", "neyman", "brown_", "spearman", "robust_outlier", "seq_ab", "mcnemar")),
    ("sketch", ("hll_", "kmv_", "ams_", "approx_")),
    ("text/tokenize", ("bpe_", "unigram_", "token", "lang_id", "text_quality", "char_entropy", "bm25", "bigram_lm", "lm_score", "burrows", "pii_", "contamination", "stylometry")),
    ("tpch/relational", ("q1", "q2_", "q3", "q5", "q7", "q8", "q9", "q10", "q11", "q12", "q14", "q16", "q17", "q18", "q19", "q20", "market_segment", "nation_region", "order_priority", "ship_delay", "top_orders", "running_customer", "lag_value", "daily_revenue", "rfm_", "cube_", "events_hourly", "event_type", "topk_users", "unit_convert", "distinct_counts", "customer_set", "local_supplier")),
    ("pipeline/e2e", ("medallion", "curation", "sequence_packing", "content_hash_split", "stratified", "weighted_reservoir", "ipf_", "dsir", "source_token", "mix_")),
    ("asof/window", ("asof_",)),
    ("multimodal", ("multimodal_",)),
]


def family(name: str) -> str:
    for fam, pats in FAMILIES:
        if any(name.startswith(p) or p in name for p in pats):
            return fam
    return "other"


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SIDECAR.json"
    side = json.load(open(path))
    rows = []
    for name, d in side["detail"].items():
        runs = [t for t in d["runs"] if t >= 0]
        if len(runs) < 2:
            continue
        warm = min(runs[1:])
        rows.append((name, runs[0], warm, runs[0] - warm,
                     runs[0] / warm if warm > 0 else float("nan")))

    fams: dict[str, list] = {}
    for name, cold, warm, excess, ratio in rows:
        fams.setdefault(family(name), []).append((name, cold, warm, excess, ratio))

    print("| family | n | sum cold s | sum warm s | cold excess s | median ratio |")
    print("|---|---|---|---|---|---|")
    tot_c = tot_w = 0.0
    import statistics
    for fam in sorted(fams, key=lambda f: -sum(r[3] for r in fams[f])):
        rs = fams[fam]
        c = sum(r[1] for r in rs)
        w = sum(r[2] for r in rs)
        tot_c += c
        tot_w += w
        mr = statistics.median(r[4] for r in rs)
        print(f"| {fam} | {len(rs)} | {c:.1f} | {w:.1f} | {c - w:.1f} | {mr:.2f} |")
    print(f"| TOTAL | {len(rows)} | {tot_c:.1f} | {tot_w:.1f} | {tot_c - tot_w:.1f} | |")

    print("\nTop 12 by absolute cold excess:")
    for name, cold, warm, excess, ratio in sorted(rows, key=lambda r: -r[3])[:12]:
        print(f"  {name}: {cold:.2f} cold vs {warm:.2f} warm (+{excess:.2f}s, x{ratio:.1f})")


if __name__ == "__main__":
    main()
