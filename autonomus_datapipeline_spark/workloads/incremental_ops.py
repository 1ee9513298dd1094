"""Incremental / semi-structured / skew workload queries.

Covers: JSON column extraction (events.props), SCD keep-latest dedup,
correlated scalar subqueries, skew-salted aggregation (oracle proves exact
equivalence with the plain plan), and CDC upsert merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.operators import cdc, skew
from autonomus_datapipeline_spark.operators.prefix_sum import (
    with_global_running,
    with_global_shift,
)
from autonomus_datapipeline_spark.workloads.registry import (
    descale6,
    ORDER_YEAR_BOUNDS,
    load_table,
    materialize_input,
    query,
    sql_dsum,
)


@query(
    "json_props_extract",
    oracle=f"""
    SELECT k_bucket,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM (
        SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket, value
        FROM events
    ) t
    GROUP BY k_bucket
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (events.props is a JSON
    string). get_json_object stays JVM-side; at scale prefer from_json with
    an explicit schema once the shape is confirmed (single parse, typed
    columns)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            descale6(F.sum(F.col("value").cast("decimal(38,6)"))).alias("sum_value"),
        )
    )


@query(
    "dedup_keep_latest",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-style dedup: keep the latest row per (user, event_type) — the
    ordered variant of dropDuplicates (which is order-nondeterministic and
    therefore unsuitable for versioned data). One shuffle + ranking window."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           o_totalprice - cust_avg AS above_avg_by
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders
    ) t
    WHERE o_totalprice > cust_avg
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (each order vs its customer's average),
    decorrelated into a window aggregate — one shuffle instead of a
    self-join, which is how the pattern must run at scale."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        descale6(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w))
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") - F.col("cust_avg")).alias("above_avg_by"),
        )
    )


@query(
    "salted_grouped_count",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def salted_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase count over a genuinely hot key (5 event types ×
    ~12k rows each): groupBy(key, salt) → groupBy(key). The oracle is the
    PLAIN group-count — proving salting changes the physical plan, never the
    answer."""
    e = load_table(spark, sf_dir, "events")
    return skew.salted_count(e, ["event_type"], n_salts=16)


@query(
    "timeseries_gap_fill",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS mn, date_trunc('hour', MAX(ts)) AS mx
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour_ts
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               {sql_dsum('value', 'sum_value')}
        FROM events GROUP BY 1, 2
    ),
    joined AS (
        SELECT t.event_type, g.hour_ts, h.sum_value
        FROM grid g CROSS JOIN types t
        LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hour_ts = g.hour_ts
    )
    SELECT event_type, hour_ts,
           LAST_VALUE(sum_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS UNBOUNDED PRECEDING) AS value_ffill,
           sum_value IS NULL AS is_gap
    FROM joined
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: project hourly sums onto a dense hour grid
    (min→max) per series and forward-fill gaps (last non-null over the
    ordered window).

    Scale: the grid is generated (sequence/explode — rows ∝ series × hours,
    never a data shuffle) and the fill is one ordered window per series key;
    no driver-side loops, no per-gap lookups.
    """
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 hour"))
        ).alias("hour_ts")
    )
    types = e.select("event_type").distinct()
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(descale6(F.sum(F.col("value").cast("decimal(38,6)"))).alias("sum_value"))
    joined = (
        grid.crossJoin(F.broadcast(types))
        .join(hourly, ["event_type", "hour_ts"], "left")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        "hour_ts",
        F.last("sum_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("sum_value").isNull().alias("is_gap"),
    )


@query(
    "zscore_normalize",
    oracle="""
    SELECT event_id,
           (value - mu) / sigma AS value_z
    FROM (
        SELECT event_id, value,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS mu,
               sqrt((COUNT(*) OVER w
                     * CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                     - CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                       * CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE))
                    / (CAST(COUNT(*) OVER w AS DOUBLE) * (COUNT(*) OVER w - 1)))
                   AS sigma
        FROM events
        WINDOW w AS (PARTITION BY event_type)
    ) t
    """,
)
def zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score feature normalization ((x − μ)/σ within
    event_type), with μ/σ built from exact-decimal moment sums so every row
    is engine-identical. One window pass over the group — the standard ML
    feature-scaling shape, no collect of per-group stats to the driver."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    n = F.count(F.lit(1)).over(w)
    sx = descale6(F.sum(F.col("value").cast("decimal(38,6)")).over(w))
    sxx = (
        descale6(F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .over(w))
    )
    mu = sx / n
    sigma = F.sqrt((n * sxx - sx * sx) / (n.cast("double") * (n - 1)))
    return e.select(
        "event_id", ((F.col("value") - mu) / sigma).alias("value_z")
    )


@query(
    "categorical_encode",
    oracle="""
    WITH ids AS (
        SELECT event_type,
               CAST(DENSE_RANK() OVER (ORDER BY event_type) - 1 AS INT) AS type_id
        FROM (SELECT DISTINCT event_type FROM events) d
    )
    SELECT e.event_id, e.event_type, ids.type_id
    FROM events e JOIN ids USING (event_type)
    """,
)
def categorical_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical label encoding: category → contiguous int id via
    dense_rank over the SORTED distinct values (deterministic, unlike
    hash-based or first-seen encoders), broadcast-joined back — the
    distributed StringIndexer shape."""
    e = load_table(spark, sf_dir, "events")
    # dense_rank over DISTINCT values == row_number — computed as a
    # distributed prefix-sum rank (string leading key buckets on its
    # order-preserving 7-byte prefix proxy), never an unpartitioned window.
    # The distinct value set has no spec envelope (string key), so the
    # rank's min/max proxy scan cannot be skipped — materialize the tiny
    # distinct rollup once instead of re-running the events distinct per
    # prefix-sum branch.
    ids = with_global_running(
        materialize_input(e.select("event_type").distinct()),
        [("event_type", True)],
        row_number="_rn",
    ).select("event_type", (F.col("_rn") - 1).cast("int").alias("type_id"))
    return e.join(F.broadcast(ids), "event_type").select(
        "event_id", "event_type", "type_id"
    )


@query(
    "upsert_latest_wins",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice, is_update,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                  ORDER BY o_orderdate DESC, is_update DESC) AS rn
        FROM (
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 0 AS is_update
            FROM orders
            UNION ALL
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   o_totalprice * 1.1 AS o_totalprice,
                   o_orderdate + INTERVAL '1 day' AS o_orderdate,
                   1 AS is_update
            FROM orders WHERE o_orderkey % 7 = 0
        ) u
    ) r WHERE rn = 1
    """,
)
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert merge: a synthetic updates batch (every 7th order, bumped
    price ×1.1, +1 day) merged into the base — latest (order_col, update-flag)
    wins per key. Union + one ranking window: single shuffle, no join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.date_add(F.col("o_orderdate"), 1).cast("timestamp").alias("o_orderdate"),
        )
    )
    merged = cdc.upsert_latest_wins(o, updates, ["o_orderkey"], ["o_orderdate"])
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# Incremental aggregation: mergeable partial-aggregate state
# ---------------------------------------------------------------------------

_IAGG_SPLIT = "2024-01-15 00:00:00"


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT user_id,
           (CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DOUBLE) / 1e6) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup via mergeable partial-aggregate state: history
    (ts < split) is reduced to per-user (decimal partial sum, count) state —
    what a production pipeline PERSISTS — and the new batch (ts ≥ split) is
    reduced the same way; merging is a re-aggregation of two state tables,
    never a rescan of history. The oracle aggregates everything flat, so
    the gate proves merge(state, delta) == full recompute exactly (decimal
    partials are order- and grouping-free).

    At 100 TB this is THE aggregation pattern: sum/count/min/max (and
    sketches) are re-aggregatable, so daily state + daily delta replaces
    full-history scans; the same algebra is what map-side partial
    aggregation exploits inside a single job."""
    split = F.lit(_IAGG_SPLIT).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.sum(F.col("value").cast("decimal(38,6)")).alias("psum"),
            F.count(F.lit(1)).alias("pcnt"),
        )

    # NULL ts fails both predicates and would silently vanish from the
    # merge while the oracle's flat COUNT(*) keeps it — bucket NULLs into
    # state so every row lands in exactly one partial.
    state = partial(ev.filter((F.col("ts") < split) | F.col("ts").isNull()))
    delta = partial(ev.filter(F.col("ts") >= split))
    return (
        state.unionByName(delta)
        .groupBy("user_id")
        .agg(
            descale6(F.sum("psum")).alias("total_value"),
            F.sum("pcnt").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 history build (validity intervals from a change stream)
# ---------------------------------------------------------------------------


@query(
    "scd2_user_value_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, value, ts, event_id,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
        FROM events
    ),
    changes AS (
        SELECT user_id, value, ts, event_id FROM ordered
        WHERE value IS DISTINCT FROM prev
    )
    SELECT user_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM changes
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history from a change stream: per key
    (user_id), no-op updates are collapsed (null-safe change detection
    against the previous value) and each surviving version gets a
    [valid_from, valid_to) interval via lead(), with the open-ended row
    flagged current — the classic warehouse history build, the batch twin
    of the CDC upsert operator.

    Scale: two window passes over the SAME (user_id; ts, event_id)
    partitioning — one shuffle total; no self-join, no global sort.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev", F.lag("value").over(w))
        .filter(~F.col("value").eqNullSafe(F.col("prev")))
        .select("user_id", "value", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff report (CDC reconciliation)
# ---------------------------------------------------------------------------


@query(
    "snapshot_diff_report",
    oracle="""
    WITH old AS (
        SELECT o_orderkey AS k,
               md5(CAST(o_orderstatus AS VARCHAR) || '|'
                   || CAST(o_orderpriority AS VARCHAR)) AS h
        FROM orders WHERE o_orderkey % 3 <> 0
    ),
    new_ AS (
        SELECT o_orderkey AS k,
               md5(CAST(o_orderstatus AS VARCHAR) || '|'
                   || CASE WHEN o_orderkey % 5 = 0 THEN 'TOUCHED'
                           ELSE CAST(o_orderpriority AS VARCHAR) END) AS h
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    joined AS (
        SELECT COALESCE(o.k, n.k) AS k,
               CASE WHEN o.k IS NULL THEN 'added'
                    WHEN n.k IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM old o FULL OUTER JOIN new_ n ON n.k = o.k
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(k) AS BIGINT) AS sample_key
    FROM joined GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the CDC audit between two table versions:
    rows are classified added / removed / changed / unchanged by a
    full-outer join on the key with an md5 attribute fingerprint (the
    cheap column-set comparator — one hash per side instead of N column
    equality checks). The two versions are deterministic slices of the
    orders table (old drops key%3=0, new drops key%7=0 and perturbs
    key%5=0), so both engines diff identical inputs.

    Scale: one shuffled full-outer join on the key — the canonical
    reconciliation shape; the fingerprint collapses arbitrarily wide
    attribute sets to 16 bytes before the shuffle, and the report is a
    4-row rollup. The production twin diffs two stored snapshots with
    the same plan (cf. incremental_dedup_new_batch for the narrow-hash
    discipline).
    """
    o = load_table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus").cast("string"),
                F.col("o_orderpriority").cast("string"),
            )
        ).alias("h_old"),
    )
    new = o.where(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus").cast("string"),
                F.when(F.col("o_orderkey") % 5 == 0, "TOUCHED").otherwise(
                    F.col("o_orderpriority").cast("string")
                ),
            )
        ).alias("h_new"),
    )
    joined = old.join(new, "k", "full_outer").select(
        "k",
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return (
        joined.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("k").cast("bigint").alias("sample_key"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Year-over-year growth report
# ---------------------------------------------------------------------------


@query(
    "orders_yoy_growth",
    oracle="""
    WITH yearly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT yr, n_orders,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(prev_rev AS DOUBLE) AS prev_revenue,
           CASE WHEN prev_rev IS NOT NULL
                THEN CAST(revenue - prev_rev AS DOUBLE)
                     / CAST(prev_rev AS DOUBLE) END AS yoy_growth
    FROM (
        SELECT yr, n_orders, revenue,
               LAG(revenue) OVER (ORDER BY yr) AS prev_rev
        FROM yearly
    ) t
    ORDER BY yr
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth report: yearly order counts and exact-decimal
    revenue with the LAG-based growth ratio — the standard finance rollup
    (the monthly twin with share-of-total is
    monthly_priority_share_shift). The growth ratio divides two
    decimal-exact totals once in double; the first year's growth is NULL
    by construction on both engines.

    Scale: a map-side-combinable yearly rollup (single-digit rows at any
    corpus size), then one trivial window over the year grid.
    """
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("revenue"),
    )
    return (
        with_global_shift(
            yearly, [("yr", True)], {"prev_rev": ("revenue", 1)},
            materialize="cache",
            # dbgen year envelope is fixed — skips the min/max scan job
            bounds=ORDER_YEAR_BOUNDS,
        )
        .select("yr", "n_orders", "revenue", "prev_rev")
        .select(
            "yr",
            "n_orders",
            F.col("revenue").cast("double").alias("revenue"),
            F.col("prev_rev").cast("double").alias("prev_revenue"),
            F.when(
                F.col("prev_rev").isNotNull(),
                (F.col("revenue") - F.col("prev_rev")).cast("double")
                / F.col("prev_rev").cast("double"),
            ).alias("yoy_growth"),
        )
        .orderBy("yr")
    )
