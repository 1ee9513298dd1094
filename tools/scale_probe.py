#!/usr/bin/env python
"""Scale probe: run headline operators at sf0.1 and at a derived 10× copy,
record wall times and the observed scaling exponent → SCALE_PROBE.md.

The 10× tables are derived from the driver's sf0.1 parquet (never written
into /root/testdata): each copy shifts the id columns so keys stay distinct
and join/group cardinalities scale realistically. This is the empirical
check behind SCALING.md's claims — an operator whose time grows ~10× (or
less, for fixed-output aggregations) at 10× data is shuffle-structured
correctly; super-linear growth exposes an accidental quadratic.

NOTE: this tool REWRITES SCALE_PROBE.md; tools/sf1_bench.py APPENDS its
sf1 table to it. Regeneration order: scale_probe first, sf1_bench second.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from autonomus_datapipeline_spark.session import get_spark  # noqa: E402
from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY  # noqa: E402
from autonomus_datapipeline_spark.workloads.registry import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/scale10"
COPIES = 10

# (table, id columns to shift, shift unit)
SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STATIC = ["region", "nation", "supplier", "part"]

PROBE_QUERIES = [
    "q1_pricing_summary",
    "market_segment_revenue",
    "topk_users_per_hour",
    "asof_join_last_order",
    "running_customer_spend",
    "dedup_exact",
    "simhash_fingerprints",
    "minhash_lsh_pairs",
    "content_hash_split",
    "text_quality_scores",
    "winnowing_fingerprints",
    "embedding_cosine_topk",
    "tumbling_window_1h",
    "upsert_latest_wins",
    "simhash_hamming_pairs",
    "simhash_hamming_dedup_first",
    "contamination_ngram_overlap",
    "sequence_packing_bins",
    "local_supplier_volume",
    "trade_volume_pairs",
    "dup_span_strip",
    "zonemap_pruned_scan",
    "incremental_agg_merge",
    # round-5 additions
    "dedup_connected_components",
    "funnel_conversion",
    "neardup_triangle_count",
    "bpe_merge_candidates",
    "domain_cap_sample",
    "embedding_gram_block",
    "minhash_jaccard_error",
    "dedup_keep_best_quality",
    "ann_ivf_incremental_assign",
    # round-5 analytics/search batch
    "retention_cohort_matrix",
    "rolling_zscore_anomaly",
    "pareto_frontier_orders",
    "pagerank_copurchase",
    "ngram_containment_pairs",
    "bm25_doc_ranking",
    "boilerplate_coverage_scores",
    "source_token_tvd_matrix",
    "knn_label_classifier",
    "market_basket_lift",
    "interval_overlap_count",
    "jaccard_knn_graph",
    "kmeans_2iter_clusters",
    # round-5 TPC-H widening + collocations
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q8_market_share",
    "q10_returned_item_customers",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    "bigram_collocations",
    # round-5 governance/diagnostics audits
    "k_anonymity_audit",
    "event_transition_matrix",
    "ngram_diversity_report",
    # round-5 stats/sketch/graph + diagnostics batches
    "ks_two_sample_order_value",
    "countmin_heavy_hitters",
    "flesch_reading_buckets",
    "label_propagation_communities",
    "kcore_peeling_summary",
    "bigram_lm_source_scores",
    "inverted_index_postings",
    "market_basket_triples",
    "purchase_attribution_last_touch",
    "gini_revenue_concentration",
    "bloom_filter_fpr_audit",
    "hits_copurchase_2iter",
    "grid_epsilon_neighbors",
    "event_trigram_support",
    # round-5 waves 7-12
    "snapshot_diff_report",
    "table_profile_orders",
    "dbscan_grid_clusters",
    "lm_score_quality_buckets",
    # round-6: prefix-sum rewrites (the old single-partition-window family),
    # distributed NTILEs, TPC-H partsupp shapes, reshaped ANN/fingerprint
    "kendall_tau_b_qty_price",
    "order_value_decile_calibration",
    "rfm_segmentation",
    "cumulative_share_pareto80",
    "abc_part_classification",
    "key_skew_gini",
    "trimmed_mean_order_value",
    "vocab_zipf_stats",
    "sorted_neighborhood_pairs",
    "daily_revenue_peaks",
    "quantile_normalize_deciles",
    "brown_forsythe_variance_test",
    "ann_lsh_topk",
    "multimodal_payload_neardup",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
    "temperature_mix_weights",
    "cohort_ltv_matrix",
    "twap_event_value",
    "ab_conversion_ztest",
    "sla_latency_quantiles",
    "bfs_hops_from_hub",
    "markov_transition_accuracy",
    "kmeans_elbow_inertia",
    "oov_rate_report",
    "ols_price_quantity_fit",
    # round-5 waves 13-18
    "purchase_attribution_linear",
    "cuped_adjusted_ab",
    "hhi_supplier_concentration",
    "burrows_delta_stylometry",
    "lpa_modularity_score",
    "winnowing_match_pairs",
    "churn_label_table",
    "anova_f_order_value",
    "degree_assortativity",
    "content_defined_chunks",
    # round-5 waves 19-27
    "session_top_paths",
    "stratified_kfold_assignment",
    "embedding_centroid_drift",
    "temporal_consistency_audit",
    "trending_users_report",
    "laspeyres_price_index",
    "reorder_interval_quantiles",
    "new_vs_returning_revenue",
    "spearman_rho_qty_price",
    "partial_correlation_qty_price",
    "durbin_watson_trend_residuals",
    "mcnemar_conversion_shift",
    "poisson_rate_shift",
    "chow_test_revenue_break",
    "jackknife_mean_variance",
    # round-7: cluster-bucketed semantic dedup (Σ cell² within-cell stage)
    # + hashed-n-gram importance selection (bucket-sized fitted state)
    "semdedup_cell_prune",
    "dsir_importance_select",
    # round-8: MinHash gate batch mirror (band equi-join admission) —
    # dedup_connected_components above now rides bucket stars, so its
    # probe factor doubles as the star-path check
    "minhash_gate_admission",
    # round-8: vocab-sized Python encode + corpus re-attach — the factor
    # checks the vocab-not-corpus claim (10x corpus, ~same vocab)
    "bpe_encode_tokens",
    # round-9: PQ code-domain ANN (corpus-linear LUT scoring), privacy-trio
    # EMD audit (classes x bands grid), blocked FS linkage (pattern-sized
    # classification over a block-bounded pair join), vocab-sized Viterbi
    # segmentation, domain-bounded PAVA minimax, query-side-broadcast RRF
    # fusion, and the 3-way-split conformal calibration
    "ann_pq_adc_topk",
    "t_closeness_audit",
    "fellegi_sunter_part_linkage",
    "unigram_viterbi_tokens",
    "isotonic_calibration_fit",
    "hybrid_rrf_fusion",
    "conformal_interval_calibration",
    # round-9 second batch: greedy MMR over cogrouped candidate lists
    # (q-parallel, k²-bounded) and the PQ recall evaluation
    "mmr_diversified_topk",
    "ann_pq_recall_report",
    # round-9 third batch: one-aggregate K-fold target encoding, the
    # sampled-pair LSH evaluation (the unsampled truth join is the
    # documented Σdf² pathology), and margin-sized IPF rounds
    "target_encode_oof",
    "minhash_lsh_pr_report",
    "ipf_raking_weights",
    # round-9 fourth batch: optimizer-statistics DP on the domain-bounded
    # bucket table (one data-sized aggregate, O(B^3) dimension work)
    "voptimal_histogram",
    # round-9 fifth batch: one user-mask aggregate + constant coalition work
    "shapley_channel_attribution",
    # round-10: the corpus-curation flagship chain
    "curation_pipeline_funnel",
    # round-10 second wave: in-engine model fitting (token-class groupBy
    # NB, domain-bounded stump histogram, 3-scan Newton logistic + IPW),
    # map-side Poisson-bootstrap resampling, one-scan BH-FDR cell family,
    # calendar-bounded sequential monitor, bin-table Kaplan-Meier,
    # integer Morton-key layout audit, per-char entropy rollup, and the
    # composed constant-kernel Brown smoother
    "naive_bayes_lang_classifier",
    "decision_stump_split",
    "logistic_ipw_ate",
    "poisson_bootstrap_ci",
    "bh_fdr_segment_tests",
    "seq_ab_spending_monitor",
    "kaplan_meier_second_order",
    "zorder_layout_audit",
    "char_entropy_buckets",
    "brown_double_smoothing_forecast",
    "weighted_reservoir_sample",
]


def build_scaled(spark) -> None:
    os.makedirs(SCALED, exist_ok=True)
    for table, id_cols in SHIFTS.items():
        out = f"{SCALED}/{table}.parquet"
        if os.path.exists(out):
            continue
        df = load_table(spark, BASE, table)
        n = df.count()
        shift = 10 ** math.ceil(math.log10(max(n * 10, 10)))
        copies = []
        for i in range(COPIES):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * shift))
            copies.append(c)
        merged = copies[0]
        for c in copies[1:]:
            merged = merged.unionByName(c)
        merged.write.mode("overwrite").parquet(out)
        print(f"built {table}: {n} -> {n * COPIES} rows", file=sys.stderr)
    for table in STATIC:
        out = f"{SCALED}/{table}.parquet"
        if not os.path.exists(out):
            load_table(spark, BASE, table).write.mode("overwrite").parquet(out)


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)

    rows = []
    for name in PROBE_QUERIES:
        spec = QUERY_REGISTRY[name]
        t0 = time.time()
        n1 = spec.fn(spark, BASE).count()
        t1 = time.time() - t0
        t0 = time.time()
        n10 = spec.fn(spark, SCALED).count()
        t10 = time.time() - t0
        factor = round(t10 / t1, 2) if t1 > 0 else float("nan")
        rows.append((name, n1, round(t1, 2), n10, round(t10, 2), factor))
        print(f"{name}: sf0.1 {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s "
              f"({n10} rows) | factor {factor}", file=sys.stderr)

    with open("SCALE_PROBE.md", "w") as fh:
        fh.write(
            "# SCALE PROBE — measured 10× scaling of headline operators\n\n"
            "Derived 10× copies of the sf0.1 tables (ids shifted per copy so\n"
            "key cardinalities scale realistically; dims static). `factor` is\n"
            "wall(10×)/wall(1×) on local[32] — ≤~10 indicates shuffle-linear\n"
            "behavior; fixed-output aggregations should sit well below 10.\n"
            "Generated by tools/scale_probe.py.\n\n"
            "Notes on reading the numbers:\n"
            "- local[32] is underutilized at 1×, so healthy operators show\n"
            "  factors ≈1 (extra data fills idle cores); ≈10 would mean\n"
            "  CPU-bound linear work; super-linear exposes an accidental\n"
            "  quadratic.\n"
            "- q1's sub-1 factor is a warmup artifact (its 1× run pays\n"
            "  first-query codegen).\n"
            "- The 10× documents corpus duplicates every text 10× → LSH\n"
            "  candidate counts legitimately explode (real dup clusters):\n"
            "  minhash_lsh_pairs absorbs a ~175× pair blow-up at ~1.3× wall.\n"
            "- dup_span_strip on the duplicated corpus marks EVERY span\n"
            "  duplicated (each doc exists 10×) — maximal coverage work, rows\n"
            "  stay one-per-doc and the factor stays ~1: the O(dup_occ × n)\n"
            "  coverage explode is shuffle-linear, not quadratic.\n"
            "- simhash_hamming_pairs on the duplicated corpus is the measured\n"
            "  pathology (100× candidates): exact copies collide in every\n"
            "  block. Its production-shaped twin simhash_hamming_dedup_first\n"
            "  collapses exact duplicates BEFORE fingerprinting — identical\n"
            "  output rows at 1× and 10×, factor <1, duplication-proof by\n"
            "  construction. Always order exact-dedup → near-dup.\n"
            "- The PAIR-scoring graph operators (neardup_triangle_count,\n"
            "  minhash_jaccard_error) inherit the dup-saturated candidate\n"
            "  blow-up: 175× edges means legitimately more wedges/\n"
            "  intersections per pair, and clique-shaped dup clusters are\n"
            "  their worst case — the production mitigation is exact-dedup\n"
            "  first. The COMPONENT-path dedup queries no longer inherit it\n"
            "  (r8): they feed bucket STARS (operators/dedup.\n"
            "  lsh_bucket_stars), whose edge count is band-table-linear in\n"
            "  the duplicate count — a 10-way dup cluster costs 9 star\n"
            "  edges, not 45 pair rows, so dedup_keep_best_quality and\n"
            "  dedup_connected_components hold shuffle-linear factors on\n"
            "  the duplicated corpus by construction.\n"
            "- curation_pipeline_funnel inherits the duplicated corpus's\n"
            "  legitimate extra work LINEARLY: its near-dedup stage is the\n"
            "  bucket-min ADMISSION rule (window over band buckets, no pair\n"
            "  join), so 10-way dup cliques cost 10 flag rows, not 45\n"
            "  candidate pairs; the decontamination gram probe scales with\n"
            "  the (10×-duplicated) eval slice. Factor ~3-4 = 10× work\n"
            "  absorbed on idle cores, the lsh-PR-report signature.\n"
            "- ann_ivf_incremental_assign's flat ~12 s is Python-worker\n"
            "  spin-up + the 16-cell codebook broadcast dominating a tiny\n"
            "  batch; the data-dependent part is sub-second at both scales.\n\n"
            "| query | rows @1× | s @1× | rows @10× | s @10× | factor |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            fh.write("| " + " | ".join(str(x) for x in r) + " |\n")
    print("wrote SCALE_PROBE.md")


if __name__ == "__main__":
    main()
