"""Query registry: every implemented operator gets a named (Spark fn, oracle SQL) pair.

The driver runs each Spark query and its DuckDB oracle side-by-side at sf0.01
and compares row-count + schema + order-insensitive value hash. Determinism
rules used throughout the workloads (so a Spark plan and a DuckDB plan produce
bit-identical values regardless of partitioning / parallelism / summation
order):

- **Sums and averages of doubles** go through an exact decimal accumulator:
  per-row math stays in IEEE double (deterministic per row), the row value is
  snapped to DECIMAL(38,6), summed exactly (order-free), and the total is cast
  back to double. Helpers: :func:`dsum` / :func:`davg` (Spark side) and
  :func:`sql_dsum` / :func:`sql_davg` (oracle side).
- **Top-k / rankings** always carry a total tiebreak order.
- **Hashes** use md5 hex (identical in Spark and DuckDB), never engine-native
  hash functions.

This module is engine code, not test code: `bench.py` and `__spark_entry__.py`
both feed from the same registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable SQL over the same tables; None → rows-only check
    doc: str


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a workload query. ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERY_REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan — columnar, so Catalyst prunes columns and pushes filters.

    The driver's ``events`` table stores ``ts`` as Parquet TIMESTAMP(NANOS),
    which Spark has no native type for: we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to a microsecond
    TimestampType — a narrow, codegen'd projection with zero scan overhead.
    """
    if name == "events":
        # Without this flag Spark cannot read a TIMESTAMP(NANOS) parquet
        # column at all (hard AnalysisException), so setting it session-wide
        # turns an error into a long — it cannot change the semantics of any
        # query that worked without it. The session time zone is NOT touched:
        # the nanos→NTZ conversion below is built from an NTZ epoch literal
        # via timestampadd, which is session-TZ-independent by construction.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # idempotent: derived copies of the table may already carry a
        # converted timestamp column
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Deterministic aggregation helpers (Spark side)
# ---------------------------------------------------------------------------

_DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double expression, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg = exact-decimal sum / count, evaluated in double (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).alias(alias)


# ---------------------------------------------------------------------------
# Deterministic aggregation helpers (oracle SQL side)
# ---------------------------------------------------------------------------


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# Driver contract surface
# ---------------------------------------------------------------------------

# Queries that already have a fully-green (rows+schema+hash) row in a driver
# CORRECTNESS_r*.json snapshot. The driver's correctness file caps at 50 rows
# taken in queries() iteration order, so we emit *unproven* queries first and
# park the already-proven ones at the back of the dict. Newly-registered
# queries are unproven by definition and therefore also land in the front
# block (in registration order, after the older unproven ones).
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        # CORRECTNESS_r03.json: hash_match == true (48 rows).
        "contamination_ngram_overlap", "content_hash_split",
        "dedup_apply_minhash", "dedup_cluster_size_stats",
        "dedup_connected_components", "doc_fingerprints", "dup_span_strip",
        "edit_distance_pairs", "embedding_centroid_dist",
        "embedding_norm_stats", "incremental_dedup_new_batch",
        "lang_id_stopword_voting", "local_supplier_volume",
        "multimodal_decode_features", "multimodal_frame_sample",
        "pii_redaction", "promo_revenue_ratio", "quality_filter_chain",
        "range_join_value_bands", "repetition_scores",
        "sequence_packing_bins", "simhash_hamming_dedup_first",
        "simhash_hamming_pairs", "sql_text_revenue", "stratified_sample",
        "text_cleaning", "text_quality_scores", "tfidf_top_keywords",
        "token_count_regex", "token_rarity_scores", "trade_volume_pairs",
        "udaf_group_median", "winnowing_fingerprints", "zonemap_pruned_scan",
        # CORRECTNESS_r02.json: hash_match == true (49 rows).
        "approx_aggregates", "array_agg_order_years",
        "array_functions_suite", "asof_join_last_order",
        "brand_quantity_lookup", "cube_event_stats",
        "customer_set_ops", "dedup_exact", "dedup_keep_latest",
        "distinct_counts", "embedding_neardup_pairs",
        "event_type_hourly_stats", "events_hourly_user_counts",
        "incremental_agg_merge", "json_props_extract", "lag_value_diff",
        "market_segment_revenue", "minhash_lsh_pairs", "nation_region_rollup",
        "ngram_jaccard_capped", "ngram_jaccard_top_pairs", "null_safe_join",
        "order_priority_bucket", "orders_above_customer_avg",
        "pivot_status_counts", "q1_pricing_summary", "quantity_percentiles",
        "running_customer_spend", "salted_grouped_count",
        "semi_anti_join_customers", "session_windows_30m", "ship_delay_bucket",
        "simhash_fingerprints", "sliding_window_6h_1h", "stats_correlation",
        "string_date_functions", "timeseries_gap_fill",
        "top_orders_by_revenue", "topk_users_per_hour", "tumbling_window_1h",
        "union_missing_columns", "unit_convert_anomaly", "upsert_latest_wins",
        "value_histogram", "window_ranking_suite", "zscore_normalize",
        # CORRECTNESS_r04.json: hash_match == true (49 of 50 rows; the one
        # red row, token_length_histogram, had a DuckDB-HUGEINT oracle type
        # bug — fixed in r5, left unproven here so it leads the r5 file).
        "corpus_mix_sampling",
        "doc_chunking_overlap", "embedding_int8_quantization",
        "grouped_token_quantiles",
        # hard_negative_mining: r4-proven but re-touched by the r7 ANN
        # re-rank restructure — dropped here until driver re-proof (it
        # rides _R7_TOUCHED at the front of the contract).
        "scd2_user_value_history",
        # CORRECTNESS_r06.json: hash_match == true (50 rows sampled; only
        # the 6 below remain untouched by the r7 prefix-sum/ANN
        # restructure — the other 44 r6-proven names were re-touched in r7
        # and live in _R7_TOUCHED until re-proven).
        "neardup_gate_admission", "q2_min_cost_supplier",
        "q9_product_type_profit", "q11_important_stock",
        "q16_supplier_part_counts", "q20_excess_stock_suppliers",
    }
)


# Queries whose PLANS changed in round 7 (prefix-sum core restructure:
# grand-totals from the bucket rollup + single merged broadcast + bounds
# fast path; window-free ranked_head; ANN re-rank phase-2 re-attach from
# base tables + fast-norm phase 1; shift-caller caching; robust_outlier_mad
# med/mad caching) plus the round-6 names the r6 driver sample missed.
# The driver's correctness file caps at 50 rows in queries() order, so
# these lead the contract: a rewritten query needs driver re-proof before
# its name re-enters _DRIVER_VERIFIED. Never-driver-proven names go first.
_R7_TOUCHED: tuple[str, ...] = (
    # new in r7 (never driver-proven)
    "semdedup_cell_prune", "dsir_importance_select",
    # never driver-proven (r6 sample missed them; multimodal + ivf-assign
    # are r6-shaped and unchanged in r7)
    "multimodal_payload_neardup", "ann_ivf_incremental_assign",
    # ANN re-rank restructure (phase-2 base-table re-attach, fast norms)
    "ann_lsh_topk", "ann_ivf_frozen_topk", "ann_ivf_portable_topk",
    "ann_recall_report", "ann_mrr_report", "embedding_cosine_topk",
    "robust_outlier_mad", "hard_negative_mining", "knn_label_classifier",
    # prefix-sum core restructure touches every caller
    "categorical_encode", "orders_yoy_growth", "quality_threshold_filter",
    "winnowing_match_pairs", "sorted_neighborhood_pairs", "vocab_zipf_stats",
    "concordance_keyword_context", "burrows_delta_stylometry",
    "lm_score_quality_buckets", "quantile_normalize_deciles",
    "abc_part_classification", "domain_cap_sample",
    "embedding_dim_clip_report", "key_skew_gini", "pareto_frontier_orders",
    "hits_copurchase_2iter", "daily_revenue_peaks", "session_top_paths",
    "trending_users_report", "reorder_interval_quantiles",
    "funnel_time_to_conversion", "interval_overlap_count",
    "cumulative_share_pareto80", "rfm_segmentation",
    "order_value_decile_calibration", "event_bigram_support",
    "event_trigram_support", "ks_two_sample_order_value",
    "mann_whitney_order_value", "countmin_heavy_hitters",
    "label_propagation_communities", "inverted_index_postings",
    "trimmed_mean_order_value", "hazard_table_monthly",
    "spearman_rho_qty_price", "kendall_tau_b_qty_price",
    "durbin_watson_trend_residuals", "theil_sen_daily_trend",
    "winsorized_mean_order_value", "brown_forsythe_variance_test",
    "cusum_changepoint_daily_orders", "trend_seasonal_decompose",
    "gini_revenue_concentration", "market_basket_triples",
)


def _contract_order() -> list[str]:
    """Registry names: r7-touched first, then other driver-unproven names,
    then the driver-proven tail (stable within each block). A touched name
    never rides the verified tail even if an older round proved its
    pre-rewrite shape."""
    names = list(QUERY_REGISTRY)
    touched = [n for n in _R7_TOUCHED if n in QUERY_REGISTRY]
    tset = set(touched)
    rest_unproven = [
        n for n in names
        if n not in _DRIVER_VERIFIED and n not in tset
    ]
    verified = [
        n for n in names if n in _DRIVER_VERIFIED and n not in tset
    ]
    return touched + rest_unproven + verified


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERY_REGISTRY[name].fn for name in _contract_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERY_REGISTRY[name].oracle
        for name in _contract_order()
        if QUERY_REGISTRY[name].oracle is not None
    }
