"""Extended relational coverage — SURVEY.md §2.D gap operators and the wider
``pyspark.sql.functions`` surface the reference sanctions wholesale in its
transform sandbox (reference: backend/app/services/sandbox.py:48-56 admits
all of pyspark.sql.functions; ai_service.py:30-69).

Semi/anti joins, pivot, CUBE, sliding event-time windows, the ranking-window
family, string/date scalar functions, and approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.workloads.registry import (
    descale6,
    dsum,
    fsum,
    load_table,
    query,
    sql_dsum,
    sql_fsum,
)

# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------


@query(
    "semi_anti_join_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN has_order THEN 1 END) AS n_with_orders,
           COUNT(CASE WHEN NOT has_order THEN 1 END) AS n_without_orders
    FROM (
        SELECT c.c_mktsegment,
               EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                   AS has_order
        FROM customer c
    ) t
    GROUP BY c_mktsegment
    """,
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins (EXISTS / NOT EXISTS): customers with and
    without orders per segment. The anti join is the workhorse of
    blocklist-style dedup at scale (drop rows whose key appears in a
    reject set) — one shuffle, no row duplication.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------


@query(
    "pivot_status_counts",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit values keep the plan
    single-pass; unlisted-value pivot needs an extra distinct job)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["P", "O", "F"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce("P", F.lit(0)).alias("status_P"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("F", F.lit(0)).alias("status_F"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE
# ---------------------------------------------------------------------------


@query(
    "cube_event_stats",
    oracle=f"""
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY CUBE (event_type, CAST(EXTRACT(hour FROM ts) AS INT))
    """,
)
def cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour-of-day) — all four grouping sets in one
    pass (§2.D gap operator; free in Spark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("hour_of_day", F.hour("ts"))
        .cube("event_type", "hour_of_day")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# Sliding event-time windows
# ---------------------------------------------------------------------------


@query(
    "sliding_window_6h_1h",
    oracle="""
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM (
        SELECT date_trunc('hour', ts) - k * INTERVAL '1 hour' AS window_start,
               event_type
        FROM events, range(0, 6) t(k)
    ) w
    GROUP BY 1, 2
    """,
)
def sliding_window_6h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (6h length, 1h slide): each event lands in
    6 overlapping windows (§2.D — the reference has no sliding windows; the
    same expression runs under Structured Streaming with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


# ---------------------------------------------------------------------------
# Ranking-window family
# ---------------------------------------------------------------------------


@query(
    "window_ranking_suite",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS biggest_order,
           LEAD(o_orderkey, 1) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile / first_value / lead in one
    window pass — the full ranking family over a single shuffle+sort."""
    o = load_table(spark, sf_dir, "orders")
    # Spark forbids explicit frames on ranking/offset functions; the framed
    # window is only for first_value. Same shuffle+sort serves both.
    wo = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(wo).alias("rn"),
        F.rank().over(wo).alias("rnk"),
        F.dense_rank().over(wo).alias("drnk"),
        F.ntile(4).over(wo).alias("quartile"),
        F.first("o_orderkey").over(wf).alias("biggest_order"),
        F.lead("o_orderkey", 1).over(wo).alias("next_orderkey"),
    )


# ---------------------------------------------------------------------------
# String / date scalar-function suite
# ---------------------------------------------------------------------------


@query(
    "string_date_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS pri_upper,
           substr(o_orderpriority, 1, 1) AS pri_code,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key,
           replace(o_orderpriority, '-', '_') AS pri_snake,
           concat(o_orderstatus, ':', o_orderpriority) AS status_pri,
           CAST(length(o_orderpriority) AS INT) AS pri_len,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS order_dow,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def string_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/date function coverage (the sandbox whitelists ALL of
    pyspark.sql.functions — this pins the everyday subset): upper, substr,
    lpad, replace, concat, length, year/month/dayofweek extraction, date
    arithmetic, month truncation. Pure codegen'd projection.

    Note dow: Spark dayofweek is 1=Sunday; DuckDB EXTRACT(dow) is 0=Sunday —
    normalized here to DuckDB's convention (dayofweek - 1).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("pri_snake"),
        F.concat("o_orderstatus", F.lit(":"), "o_orderpriority").alias("status_pri"),
        F.length("o_orderpriority").alias("pri_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


# ---------------------------------------------------------------------------
# Array / higher-order function suite (SURVEY §1.2 capability extension:
# the reference downgraded complex values to strings; Spark has native
# ArrayType + higher-order functions)
# ---------------------------------------------------------------------------


@query(
    "array_functions_suite",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1e12) AS DECIMAL(38,0)))
                AS DOUBLE) / 1e12 AS sum_all,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val
    FROM (SELECT vec_id, embedding, unnest(embedding) AS e FROM embeddings) t
    GROUP BY vec_id, embedding
    """,
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native array-column operations (size / element_at / filter / exact
    fold) — the complex-type support the reference lacked (it stringified
    lists, SURVEY §1.2). All higher-order functions run JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    # fsum rule (registry.fsum) applied array-side: each float is floored
    # to exact pico-units (floats are O(1), so units stay ~1e12 — exact
    # in int64 and in double) and folded as an exact integer sum; one
    # final cast+divide matches the oracle bit-for-bit. The previous
    # DECIMAL(30,12) snap rounded each element, and Spark and DuckDB
    # round a double into a decimal quantum differently.
    dec_sum = (
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * F.lit(1e12)).cast(
                    "decimal(38,0)"
                ),
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(1e12)
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        dec_sum.alias("sum_all"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
    )


# ---------------------------------------------------------------------------
# Array aggregation (collect_set → sorted array)
# ---------------------------------------------------------------------------


@query(
    "array_agg_order_years",
    oracle="""
    SELECT o_custkey,
           array_to_string(
               list_sort(list(DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS INT))),
               ',') AS order_years_csv,
           CAST(len(list(DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS INT))) AS INT)
               AS n_years
    FROM orders GROUP BY o_custkey
    """,
)
def array_agg_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: distinct order years per customer as a SORTED
    array (collect_set is unordered — always sort before emitting an array
    that anything downstream compares or hashes).

    The sorted array is emitted in a portable scalar form
    (``concat_ws(",", ...)``) so downstream row-hash comparators that cannot
    hash list cells (e.g. pandas-based canonicalizers) still get a hard
    value check; the array itself stays available upstream of the select.
    """
    o = load_table(spark, sf_dir, "orders")
    years = F.sort_array(F.collect_set(F.year("o_orderdate")))
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", years).alias("order_years_csv"),
        F.size(F.collect_set(F.year("o_orderdate"))).alias("n_years"),
    )


# ---------------------------------------------------------------------------
# Histogram (fixed-width buckets, portable arithmetic)
# ---------------------------------------------------------------------------


@query(
    "value_histogram",
    oracle="""
    SELECT bucket,
           bucket * CAST(25.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_events
    FROM (
        SELECT CAST(least(floor(value / CAST(25.0 AS DOUBLE)), 19) AS INT) AS bucket
        FROM events
    ) t
    GROUP BY bucket
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 buckets of 25.0, top bucket clamps the
    tail) via portable floor arithmetic — the one-pass distribution profile
    every DQ/EDA layer needs; map-side combine collapses rows to 20 groups
    before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        e.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_events"))
        .select("bucket", (F.col("bucket") * 25.0).alias("bucket_lo"), "n_events")
    )


# ---------------------------------------------------------------------------
# Null-safe join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------


@query(
    "null_safe_join",
    oracle="""
    WITH e AS (
        SELECT event_id, nullif(event_type, 'error') AS etype FROM events
    ),
    d AS (
        SELECT DISTINCT nullif(event_type, 'error') AS etype,
               coalesce(nullif(event_type, 'error'), '<null>') AS label
        FROM events
    )
    SELECT label, COUNT(*) AS n_events
    FROM e JOIN d ON e.etype IS NOT DISTINCT FROM d.etype
    GROUP BY label
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `eqNullSafe` ≡ SQL IS NOT DISTINCT
    FROM): NULL keys match each other instead of dropping — required when a
    'missing' category is itself a join key (here 'error' is nulled out and
    still joins to its dimension row)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", F.nullif("event_type", F.lit("error")).alias("etype")
    )
    d = (
        load_table(spark, sf_dir, "events")
        .select(F.nullif("event_type", F.lit("error")).alias("etype"))
        .distinct()
        .withColumn("label", F.coalesce("etype", F.lit("<null>")))
    )
    return (
        e.join(F.broadcast(d), e.etype.eqNullSafe(d.etype))
        .groupBy("label")
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Statistical aggregates, deterministic (moments via exact decimal sums)
# ---------------------------------------------------------------------------


@query(
    "stats_correlation",
    oracle=f"""
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
           sy / n AS mean_price,
           sqrt((n * syy - sy * sy) / (n * (n - 1))) AS stddev_price
    FROM (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               {sql_fsum('l_quantity', 'sx')},
               {sql_fsum('l_extendedprice', 'sy')},
               {sql_fsum('l_quantity * l_quantity', 'sxx')},
               {sql_fsum('l_extendedprice * l_extendedprice', 'syy')},
               {sql_fsum('l_quantity * l_extendedprice', 'sxy')}
        FROM lineitem GROUP BY l_returnflag
    ) m
    """,
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + mean + sample stddev per group, built from
    floor-quantized exact integer moment sums combined in double
    arithmetic — deterministic under any parallelism (built-in
    corr()/stddev() are summation-order dependent and engine-divergent)
    AND bit-identical across engines (fsum: the moments are exact sums of
    FLOOR-quantized units, so no per-row rounding-mode difference can
    leak in; the decimal-snap variant drifted ~1e-12 through the
    cancellation in n·sxy − sx·sy — strict_float_audit r9). One
    aggregation pass for all moments.
    """
    l = load_table(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    m = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        fsum(qty, "sx"),
        fsum(price, "sy"),
        fsum(qty * qty, "sxx"),
        fsum(price * price, "syy"),
        fsum(qty * price, "sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        ((n * sxy - sx * sy)
         / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
         ).alias("corr_qty_price"),
        (sy / n).alias("mean_price"),
        F.sqrt((n * syy - sy * sy) / (n * (n - 1))).alias("stddev_price"),
    )


# ---------------------------------------------------------------------------
# Approximate aggregates (sketches bounded by hard error-check booleans)
# ---------------------------------------------------------------------------


@query(
    "approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS orders_within_5pct,
           TRUE AS median_within_5pct,
           TRUE AS p95_within_5pct
    FROM lineitem GROUP BY 1
    """,
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + approx_percentile — the 100 TB
    default for distinct counts and quantiles (bounded error, one pass, no
    sort) — bounded by deterministic error-check booleans: Spark computes
    BOTH the sketch estimate and the exact value in one aggregation and
    emits |approx−exact|/exact ≤ 5% flags (plus the exact distinct count),
    all of which the oracle can check hard. The sketches are deterministic
    for fixed data, so the booleans are stable; the raw estimates stay out
    of the output because their exact values are engine-specific.
    """
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.percentile_approx("l_quantity", 0.5, 1000).alias("approx_median_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_median_qty"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("approx_p95_price"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p95_price"),
    )

    def within(approx, exact):
        return (F.abs(F.col(approx) - F.col(exact)) / F.col(exact)) <= 0.05

    return agg.select(
        "l_returnflag",
        "exact_orders",
        within("approx_orders", "exact_orders").alias("orders_within_5pct"),
        within("approx_median_qty", "exact_median_qty").alias("median_within_5pct"),
        within("approx_p95_price", "exact_p95_price").alias("p95_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Ordered conversion funnel (sequential event-pattern analytics)
# ---------------------------------------------------------------------------


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY 1
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: per user, the first view, the
    first click AT-OR-AFTER that view, and the first purchase at-or-after
    that click (the MATCH_RECOGNIZE-ish sequential pattern every product
    analytics stack needs, without a per-user sort or UDF).

    Each stage is one filtered min-aggregation joined back on user_id —
    three shuffles, ALL on the same key, so at 100 TB the stages reuse one
    hash partitioning (AQE keeps the co-partitioned exchanges); nothing is
    ever ordered globally and no per-user event list is materialized."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


# ---------------------------------------------------------------------------
# Time-RANGE window frame (rolling 1-hour per-user aggregate)
# ---------------------------------------------------------------------------


@query(
    "rolling_1h_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_1h_value,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
               AS rolling_1h_events
    FROM events
    """,
)
def rolling_1h_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour aggregate via a time-RANGE window frame —
    the frame is defined by the TIMESTAMP DISTANCE, not a row count, so
    bursty users and quiet users both get exactly 'the last hour' (a
    ROWS-frame approximation silently mixes timescales). Spark evaluates
    range frames per partition in one pass over the user-sorted events —
    one shuffle on user_id, no self-join against a time band.

    Ties on ts: a RANGE frame includes ALL peer rows with equal ts on both
    engines, so the result is deterministic without a unique-ts assumption.
    The sum is exact-decimal (cast per element) so accumulation order
    cannot drift the double."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    # Epoch MICROSECONDS via an NTZ timestampdiff — session-TZ-independent
    # (a unix_timestamp() cast would re-interpret the NTZ value in the
    # driver's local zone; repo pattern, cf. load_table's nanos handling).
    # Whole seconds + the sub-second part from extract(SECOND) (a
    # DECIMAL(8,6), exact): ordering on truncated SECONDS drifted vs the
    # oracle's microsecond-exact INTERVAL frame at sf0.1 density — an event
    # 3600.4 s back truncates to a 3600 s distance and sneaks into the
    # frame (caught by the sf0.1 full-gate run, round 5).
    secs = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    subsec = F.expr("extract(SECOND FROM ts)")  # ss.ffffff, DECIMAL(8,6)
    micros = (
        secs * F.lit(1_000_000)
        + ((subsec - F.floor(subsec)) * 1_000_000).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        descale6(F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w))
        .alias("rolling_1h_value"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("rolling_1h_events"),
    )


# ---------------------------------------------------------------------------
# SLA latency quantiles per priority (exact grouped quantiles)
# ---------------------------------------------------------------------------


@query(
    "sla_latency_quantiles",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    hist AS (
        SELECT priority, days AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM lat GROUP BY 1, 2
    ),
    cum AS (
        SELECT priority, v, c,
               SUM(c) OVER (PARTITION BY priority ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY priority) AS n
        FROM hist
    )
    SELECT priority,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MIN(v) AS BIGINT) AS min_days,
           CAST(MIN(CASE WHEN 2 * cum >= n THEN v END) AS BIGINT)
               AS median_days,
           CAST(MIN(CASE WHEN 20 * cum >= 19 * n THEN v END) AS BIGINT)
               AS p95_days,
           CAST(MAX(v) AS BIGINT) AS max_days
    FROM cum GROUP BY 1 ORDER BY 1
    """,
)
def sla_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA distribution per priority class: exact
    min/median/p95/max of the whole-day latency via the per-group
    value-histogram method (grouped_token_quantiles' trick — cumulative
    counts over the bounded latency-day domain, quantile thresholds as
    integer cross-multiplications, no approx sketch and no per-group
    sort of raw rows). The operational check that '1-URGENT' actually
    ships faster.

    Scale: the join shuffles once on orderkey; the histogram collapses to
    (priority × distinct-days) rows before the windows — bounded by the
    calendar, not the fact table.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("bigint")
        .alias("days"),
    )
    hist = lat.groupBy("priority", F.col("days").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "v",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    return (
        cum.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n_lines"),
            F.min("v").cast("bigint").alias("min_days"),
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("v")))
            .cast("bigint")
            .alias("median_days"),
            F.min(F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("v")))
            .cast("bigint")
            .alias("p95_days"),
            F.max("v").cast("bigint").alias("max_days"),
        )
        .orderBy("priority")
    )
