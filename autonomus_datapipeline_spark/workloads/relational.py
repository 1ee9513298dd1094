"""Relational workload queries — SURVEY.md §2.B/§2.C operator coverage.

Each query re-expresses, Spark-first, an operator class the reference system
sanctions in its transform surface (reference: backend/app/services/
ai_service.py:30-69) or demonstrates in its published case studies
(reference: benchmarks/results/auto_pipeline_benchmark_paper.tex), plus the
§2.D gap operators (rollup, set ops, exact percentiles, session windows,
as-of join) that a full analytics engine needs.

Scale notes are in each docstring: these run on /root/testdata locally but are
written for a 1000-executor cluster — dimension tables are broadcast, windows
carry total orders, and no query collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.workloads.registry import (
    davg,
    dsum,
    load_table,
    query,
    sql_davg,
    sql_dsum,
)

# ---------------------------------------------------------------------------
# Multi-metric grouped aggregation (reference tex:161-163, C6; TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + multi-metric grouped aggregation (C1+C6).

    Scale: the shipdate predicate is pushed to the Parquet scan; the groupBy
    key has tiny cardinality (RF×LS ≈ 6 groups) so map-side partial
    aggregation collapses ~all rows before the shuffle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Join + aggregate (reference tex:138-139, C8)
# ---------------------------------------------------------------------------


@query(
    "market_segment_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_mktsegment
    """,
)
def market_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact-dim join + aggregate (C8, the reference's Gold-layer shape).

    Scale: customer is the small side → explicit broadcast avoids a shuffle
    of lineitem on custkey; the lineitem⋈orders join shuffles once on
    orderkey and AQE handles skew.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_lines"))
    )


@query(
    "top_orders_by_revenue",
    oracle=f"""
    SELECT o_orderkey, revenue FROM (
        SELECT l_orderkey AS o_orderkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem GROUP BY l_orderkey
    ) t
    ORDER BY revenue DESC, o_orderkey
    LIMIT 20
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tiebreak.

    Scale: Spark's TakeOrderedAndProject computes per-partition top-20 and
    merges on the driver — no full sort, no full shuffle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(dsum(rev, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "nation_region_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum('o_totalprice', 'total_price')},
           COUNT(*) AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation (SURVEY §2.D gap operator).

    Scale: the three dims (region/nation/customer) are broadcast so the only
    shuffle is the rollup aggregation itself, and rollup re-aggregates the
    already-partial per-(r,n) results.
    """
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    return (
        o.join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .rollup("r_name", "n_name")
        .agg(dsum("o_totalprice", "total_price"), F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Filter + conditional bucketing (reference tex:128, C1+C3)
# ---------------------------------------------------------------------------

_BUCKET_SQL = """
    CASE WHEN o_totalprice < 50000 THEN 'small'
         WHEN o_totalprice < 150000 THEN 'medium'
         WHEN o_totalprice < 300000 THEN 'large'
         ELSE 'jumbo' END
"""


@query(
    "order_priority_bucket",
    oracle=f"""
    SELECT {_BUCKET_SQL} AS price_bucket,
           o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY 1, 2
    """,
)
def order_priority_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + chained-`when` bucketing + aggregate — the reference's
    canonical Silver query (delay categories, tex:128; status filter C1).

    Scale: pure narrow op + one low-cardinality aggregation; predicate pushed
    to the scan.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.filter(F.col("o_orderstatus") != "P")
        .withColumn("price_bucket", bucket)
        .groupBy("price_bucket", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


# ---------------------------------------------------------------------------
# Time arithmetic + bucketing (reference tex:128-133, C2+C3)
# ---------------------------------------------------------------------------


@query(
    "ship_delay_bucket",
    oracle="""
    SELECT CASE WHEN delay_days <= 30 THEN 'On Time'
                WHEN delay_days <= 60 THEN 'Minor'
                WHEN delay_days <= 90 THEN 'Moderate'
                ELSE 'Severe' END AS delay_category,
           COUNT(*) AS n_lines,
           MIN(delay_days) AS min_days,
           MAX(delay_days) AS max_days
    FROM (
        SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ) t
    GROUP BY 1
    """,
)
def ship_delay_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp arithmetic → delay categories (the flight-delay case study
    shape, reference tex:128-133: delay = actual − scheduled, bucketed).

    Scale: join shuffles on orderkey only; the bucket/agg is map-side.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "delay_days",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")),
    )
    cat = (
        F.when(F.col("delay_days") <= 30, "On Time")
        .when(F.col("delay_days") <= 60, "Minor")
        .when(F.col("delay_days") <= 90, "Moderate")
        .otherwise("Severe")
    )
    return j.groupBy(cat.alias("delay_category")).agg(
        F.count("*").alias("n_lines"),
        F.min("delay_days").alias("min_days"),
        F.max("delay_days").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Unit conversion + anomaly flag (reference tex:156-158, C4)
# ---------------------------------------------------------------------------


@query(
    "unit_convert_anomaly",
    oracle="""
    SELECT event_id,
           ROUND((value - 32) * 5.0 / 9.0, 4) AS value_c,
           CASE WHEN (value - 32) * 5.0 / 9.0 < -20
                  OR (value - 32) * 5.0 / 9.0 > 50 THEN TRUE ELSE FALSE END AS is_anomaly
    FROM events
    """,
)
def unit_convert_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fahrenheit→Celsius conversion + range-anomaly flag (sensor case study,
    reference tex:156-158). Pure narrow projection — whole-stage codegen,
    no shuffle at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    celsius = (F.col("value") - 32) * 5.0 / 9.0
    return e.select(
        "event_id",
        F.round(celsius, 4).alias("value_c"),
        ((celsius < -20) | (celsius > 50)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Grouped counts + hourly stats (reference tex:161-163,188; C6, C7, C9)
# ---------------------------------------------------------------------------


@query(
    "events_hourly_user_counts",
    oracle="""
    SELECT user_id, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edits-per-user-per-hour grouped count (C9, wiki case study tex:188)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "topk_users_per_hour",
    oracle="""
    SELECT hour_ts, user_id, n_events, rk FROM (
        SELECT hour_ts, user_id, n_events,
               CAST(ROW_NUMBER() OVER (PARTITION BY hour_ts
                                       ORDER BY n_events DESC, user_id) AS INT) AS rk
        FROM (
            SELECT user_id, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ) c
    ) r WHERE rk <= 5
    """,
)
def topk_users_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window (C10, reference tex:188-190:
    top 10 editors per hour). Deterministic tiebreak on user_id.

    Scale: count agg shuffles on (user, hour); the ranking window shuffles on
    hour only. Both keys are high-cardinality → no hotspot; AQE coalesces.
    """
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("hour_ts").orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("hour_ts", "user_id", "n_events", "rk")
    )


@query(
    "event_type_hourly_stats",
    oracle=f"""
    SELECT * FROM (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               COUNT(*) AS n_events,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               {sql_davg('value', 'avg_value')},
               CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM events GROUP BY 1, 2
    ) t WHERE n_events > 1
    """,
)
def event_type_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-sensor min/max/mean + anomaly count + post-aggregation
    predicate (C6+C7, reference tex:161-163: 'flag hours with more than 3
    anomalies')."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            davg("value", "avg_value"),
            F.sum(F.when(F.col("value") > 400, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .filter(F.col("n_events") > 1)
    )


# ---------------------------------------------------------------------------
# Per-row derived diff via lag window (reference tex:183, C12)
# ---------------------------------------------------------------------------


@query(
    "lag_value_diff",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS value_change
    FROM events
    """,
)
def lag_value_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revision-size-change analog (C12, reference tex:183: newlen − oldlen)
    computed as an ordered per-key lag diff.

    Scale: one shuffle on user_id; within-partition sort. Skewed users are the
    risk at 100 TB → mitigated by AQE skew handling; ordering carries a total
    tiebreak (ts, event_id) for determinism.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_change"),
    )


# ---------------------------------------------------------------------------
# Broadcast lookup join (reference ai_service.py:44-46 routes.csv pattern)
# ---------------------------------------------------------------------------


@query(
    "brand_quantity_lookup",
    oracle=f"""
    SELECT p_brand,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_price')},
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_quantity_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension lookup join (the reference's routes.csv enrichment
    pattern, ai_service.py:44-46) with explicit broadcast — zero shuffle on
    the fact side for the join itself.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Union of heterogeneous schemas (reference bronze_ingestion.py:184-187, A9)
# ---------------------------------------------------------------------------


@query(
    "union_missing_columns",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice) AS n_with_price,
           COUNT(o_orderpriority) AS n_with_priority
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_totalprice >= 200000
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders WHERE o_totalprice < 100000
    ) u
    GROUP BY o_orderstatus
    """,
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-tolerant union (A9 — the reference folds heterogeneous files
    with unionByName(allowMissingColumns=True), bronze_ingestion.py:184-187).
    Missing columns null-fill; the aggregate proves which side carried which
    column."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") >= 200000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    lo = o.filter(F.col("o_totalprice") < 100000).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return (
        hi.unionByName(lo, allowMissingColumns=True)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("o_totalprice").alias("n_with_price"),
            F.count("o_orderpriority").alias("n_with_priority"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.D gap operators)
# ---------------------------------------------------------------------------


@query(
    "customer_set_ops",
    oracle="""
    WITH y95 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT
        (SELECT COUNT(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96) t1) AS n_both,
        (SELECT COUNT(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96) t2) AS n_only_1995
    """,
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (absent from the reference, SURVEY §2.D; free in
    Spark). Cross-join of two scalar aggregates keeps it fully distributed —
    no driver-side collect."""
    o = load_table(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year_custs(1995), year_custs(1996)
    n_both = y95.intersect(y96).agg(F.count("*").alias("n_both"))
    n_only = y95.exceptAll(y96).distinct().agg(F.count("*").alias("n_only_1995"))
    return n_both.crossJoin(n_only)


@query(
    "distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (A24 field-statistics analog). At 100 TB
    the approx variant (approx_count_distinct / HLL) is the default path —
    exposed separately since its output is engine-specific."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (SURVEY §2.D gap operator)
# ---------------------------------------------------------------------------


@query(
    "quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. At 100 TB the engine swaps
    this for approx_percentile with a bounded error — exact percentile is a
    full sort per group."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", 0.9), 4).alias("p90_qty"),
    )


# ---------------------------------------------------------------------------
# Tumbling window aggregation (streaming-shaped batch; SURVEY §2.D)
# ---------------------------------------------------------------------------


@query(
    "tumbling_window_1h",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the batch twin of the
    streaming Bronze rollup (same code shape runs under readStream with a
    watermark; see autonomus_datapipeline_spark.streaming)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "session_windows_30m",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n, MIN(ts) AS t0, MAX(ts) AS t1
        FROM sessions GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(date_diff('second', t0, t1)) AS BIGINT) AS total_span_s
    FROM per_session GROUP BY user_id
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-min inactivity gap) — Spark-native
    F.session_window (also valid under Structured Streaming with a
    watermark), oracled by a gaps-and-islands SQL formulation.

    Scale: session_window is a single shuffle on user_id + in-partition sort;
    no cross-partition state.
    """
    e = load_table(spark, sf_dir, "events")
    per_session = (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n"), F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").cast("bigint").alias("n_events"),
        # timestampdiff over second-truncated endpoints: boundary-crossing
        # counting (= DuckDB date_diff('second')), in pure NTZ arithmetic.
        # unix_timestamp matches the boundary semantics but converts
        # NTZ->LTZ through the session time zone (DST-dependent spans on a
        # non-UTC driver); raw timestampdiff is TZ-free but counts FULL
        # elapsed seconds (off by one across sub-second phases).
        F.sum(
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', t0),"
                " date_trunc('second', t1))"
            )
        )
        .cast("bigint")
        .alias("total_span_s"),
    )


# ---------------------------------------------------------------------------
# As-of join (SURVEY §2.D gap operator; Spark lacks a native one)
# ---------------------------------------------------------------------------


@query(
    "asof_join_last_order",
    oracle="""
    WITH ord AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, o.o_orderkey
    FROM events e
    ASOF LEFT JOIN ord o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order at or
    before the event time. Spark has no native as-of join; this is the
    scalable union-merge formulation — tag both streams, single shuffle on
    the key, one ordered window pass with last(ignorenulls) — O(n log n) per
    partition, no per-row subqueries, no broadcast of the big side.

    Ties: an order exactly at the event timestamp matches (is_order sorts
    first); duplicate (custkey, orderdate) orders resolve to max orderkey.
    """
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    # Deduplicate the right side to one order per (custkey, date): max orderkey.
    ord_dedup = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    left = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(0).alias("is_order"),
    )
    right = ord_dedup.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        F.lit(1).alias("is_order"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc("t"), F.desc("is_order"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = left.unionByName(right).withColumn(
        "matched_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_order") == 0).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("matched_orderkey").alias("o_orderkey"),
    )


# ---------------------------------------------------------------------------
# Running total (cumulative window; C12-adjacent)
# ---------------------------------------------------------------------------


@query(
    "running_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer over order date (running-total window).
    Frame order carries a total tiebreak so the sequential double sum is
    engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )
