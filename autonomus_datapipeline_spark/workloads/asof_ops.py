"""As-of (point-in-time) join workloads over the events stream.

Two registered queries exercise :mod:`operators/asof` in both directions
against DuckDB's NATIVE ``ASOF JOIN`` as the oracle — a genuinely
independent algorithm (DuckDB plans a specialized sort-merge asof; the
engine composes union + keyed window), so a hash match here is strong
evidence the operator's semantics are exactly the standard ones.

Determinism: timestamps are reduced to exact epoch MICROSECOND integers
on both engines (the repo's NTZ idiom — session-TZ-independent), the right
side is deduped per (key, ts) with an integer argmax before the join, gaps
are exact bigint differences, and every mean is one division of exact
integer/decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators.asof import asof_join
from autonomus_datapipeline_spark.workloads.registry import (
    descale6,
    load_table,
    query,
)

# Epoch microseconds for an NTZ timestamp column named ts (exact: whole
# seconds via timestampdiff + the DECIMAL(8,6) sub-second part).
_UTS = (
    "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000000"
    " + CAST((extract(SECOND FROM ts) - floor(extract(SECOND FROM ts)))"
    "        * 1000000 AS LONG)"
)

_ATTR_TOL_US = 6 * 3600 * 1_000_000  # attribute purchases within 6 hours
_NEXT_TOL_US = 24 * 3600 * 1_000_000  # error follow-up window: 24 hours


_ATTR_ORACLE = f"""
WITH ev AS (
    SELECT event_id, user_id, epoch_us(ts) AS uts, event_type, value
    FROM events
),
p AS (
    SELECT user_id, event_id AS purchase_id, uts AS p_ts, value
    FROM ev WHERE event_type = 'purchase'
),
s0 AS (
    SELECT user_id, uts AS r_ts, event_id AS src_id, event_type AS src_type
    FROM ev WHERE event_type IN ('view', 'click')
),
s AS (
    SELECT user_id, r_ts, MAX(src_id) AS src_id,
           arg_max(src_type, src_id) AS src_type
    FROM s0 GROUP BY 1, 2
),
j AS (
    SELECT p.value, p.p_ts, s.r_ts, s.src_type
    FROM p ASOF LEFT JOIN s
      ON p.user_id = s.user_id AND p.p_ts >= s.r_ts
),
g AS (
    SELECT CASE WHEN r_ts IS NOT NULL AND p_ts - r_ts <= {_ATTR_TOL_US}
                THEN src_type ELSE 'none' END AS attributed_type,
           value,
           CASE WHEN r_ts IS NOT NULL AND p_ts - r_ts <= {_ATTR_TOL_US}
                THEN p_ts - r_ts END AS gap_us
    FROM j
)
SELECT attributed_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       (CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) * CAST(1000000 AS DECIMAL(7,0))
            AS DECIMAL(38,0)) AS DOUBLE) / 1e6) AS total_value,
       CAST(CAST(SUM(gap_us) AS DECIMAL(38,0)) AS DOUBLE)
         / COUNT(gap_us) / 1e6 AS avg_gap_seconds
FROM g GROUP BY 1 ORDER BY 1
"""


@query("asof_view_purchase_attribution", oracle=_ATTR_ORACLE)
def asof_view_purchase_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution as a BACKWARD as-of join: every purchase is
    attributed to the same user's most recent view-or-click within 6
    hours (else 'none') — the point-in-time lookup pandas calls
    merge_asof and DuckDB calls ASOF JOIN, which Spark lacks natively.
    The engine composes it shuffle-minimally (operators/asof.py: one
    union, one keyed window, no range fan-out); the oracle runs DuckDB's
    NATIVE ASOF JOIN, so the two engines cross-check the operator's exact
    semantics, not a shared formulation.

    Scale: one shuffle of |purchases| + |sources| rows on user_id and a
    per-user sort — the keyed-window envelope; no pair explosion for
    bursty users (a range-join formulation would fan out every purchase ×
    every prior view before an argmax).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.expr(_UTS).alias("uts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("uts").alias("p_ts"),
        "value",
    )
    s = (
        ev.where(F.col("event_type").isin("view", "click"))
        .select(
            "user_id",
            F.col("uts").alias("r_ts"),
            F.col("event_id").alias("src_id"),
            F.col("event_type").alias("src_type"),
        )
        # unique per (user, ts): integer argmax on src_id (event ids are
        # unique, so this is a total tiebreak), mirrored in the oracle
        .groupBy("user_id", "r_ts")
        .agg(F.max(F.struct("src_id", "src_type")).alias("m"))
        .select(
            "user_id",
            "r_ts",
            F.col("m.src_id").alias("src_id"),
            F.col("m.src_type").alias("src_type"),
        )
    )
    j = asof_join(
        p, s, on="user_id", left_ts="p_ts", right_ts="r_ts",
        direction="backward", tolerance=_ATTR_TOL_US,
    )
    g = j.select(
        F.coalesce("src_type", F.lit("none")).alias("attributed_type"),
        "value",
        F.col("_asof_gap").alias("gap_us"),
    )
    return (
        g.groupBy("attributed_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            descale6(
                F.sum(F.col("value").cast("decimal(38,6)"))
            ).alias("total_value"),
            (
                F.sum("gap_us").cast("decimal(38,0)").cast("double")
                / F.count("gap_us")
                / F.lit(1e6)
            ).alias("avg_gap_seconds"),
        )
        .orderBy("attributed_type")
    )


_NEXT_ORACLE = f"""
WITH ev AS (
    SELECT event_id, user_id, epoch_us(ts) AS uts, event_type,
           CAST(hour(ts) AS INT) AS hh
    FROM events
),
s AS (
    SELECT user_id, event_id AS signup_id, uts AS s_ts, hh
    FROM ev WHERE event_type = 'signup'
),
r0 AS (
    SELECT user_id, uts AS e_ts, event_id AS err_id
    FROM ev WHERE event_type = 'error'
),
r AS (SELECT user_id, e_ts, MAX(err_id) AS err_id FROM r0 GROUP BY 1, 2),
j AS (
    SELECT s.hh, s.s_ts, r.e_ts
    FROM s ASOF LEFT JOIN r
      ON s.user_id = r.user_id AND s.s_ts <= r.e_ts
),
g AS (
    SELECT hh,
           CASE WHEN e_ts IS NOT NULL AND e_ts - s_ts <= {_NEXT_TOL_US}
                THEN e_ts - s_ts END AS gap_us
    FROM j
)
SELECT hh AS signup_hour,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(COUNT(gap_us) AS BIGINT) AS n_with_error_24h,
       CAST(CAST(SUM(gap_us) AS DECIMAL(38,0)) AS DOUBLE)
         / COUNT(gap_us) / 1e6
           AS avg_latency_seconds
FROM g GROUP BY 1 ORDER BY 1
"""


@query("asof_next_error_latency", oracle=_NEXT_ORACLE)
def asof_next_error_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-next-failure as a FORWARD as-of join: for every signup, the
    same user's NEXT error event within 24 hours, rolled up by signup
    hour-of-day — the forward direction of the point-in-time operator
    (operators/asof.py traverses the keyed window descending, so the
    running last-right is the smallest right_ts >= left_ts). Oracled by
    DuckDB's native forward ASOF JOIN (``s_ts <= e_ts``).

    Scale: identical envelope to the backward query — one shuffle on
    user_id, one per-user sort, zero fan-out.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.hour("ts").cast("int").alias("hh"),
        F.expr(_UTS).alias("uts"),
    )
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("uts").alias("s_ts"),
        "hh",
    )
    r = (
        ev.where(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("uts").alias("e_ts"),
            F.col("event_id").alias("err_id"),
        )
        .groupBy("user_id", "e_ts")
        .agg(F.max("err_id").alias("err_id"))
    )
    j = asof_join(
        s, r, on="user_id", left_ts="s_ts", right_ts="e_ts",
        direction="forward", tolerance=_NEXT_TOL_US,
    )
    return (
        j.groupBy(F.col("hh").alias("signup_hour"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.count("_asof_gap").cast("bigint").alias("n_with_error_24h"),
            (
                F.sum("_asof_gap").cast("decimal(38,0)").cast("double")
                / F.count("_asof_gap")
                / F.lit(1e6)
            ).alias("avg_latency_seconds"),
        )
        .orderBy("signup_hour")
    )
