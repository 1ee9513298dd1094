"""Portable mergeable sketches: HyperLogLog, KMV (theta-style) set algebra,
and AMS F2 — the distinct-count / set-overlap / join-size estimators every
100 TB pipeline runs BEFORE committing to an exact plan.

The engine already exposes Spark's native approximate aggregates
(approx_aggregates); this family implements the sketches themselves as
plain hash aggregates so they are (a) PORTABLE — registers/minima derive
from md5, so DuckDB builds the bit-identical sketch and the driver's
oracle gate hash-checks the whole estimator, not just its output shape —
and (b) MERGEABLE by construction: every sketch here is a groupBy-max /
groupBy-min / sum over row-local values, which is exactly the shape whose
partial aggregates combine losslessly across 100 TB of partitions (the
map-side combiner IS the sketch union).

Determinism: all register/rank/sign material is integer (md5 nibbles,
leading-zero positions via string ops, dyadic terms in 2^-49 units); the
few transcendental steps (HLL's ln correction) are identical-input IEEE
doubles floor-quantized to integer units before any aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.workloads.registry import load_table, query

# ---------------------------------------------------------------------------
# HyperLogLog (m = 256 registers, 48-bit rho stream)
# ---------------------------------------------------------------------------

_HLL_M = 256
# alpha_256 = 0.7213 / (1 + 1.079/256) — fixed literal shared verbatim with
# the oracle so both engines multiply by the same double.
_HLL_ALPHA = "0.7182725932495458"
# register terms 2^-rho accumulated in integer units of 2^-49
_HLL_UNIT_POW = 49

# (output key name, table, column) — three cardinality regimes: ~n rows
# distinct, mid-cardinality dimension key, small hot-key set.
_HLL_KEYS = (
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
)


def _hll_sql_one(label: str, table: str, col: str) -> str:
    return f"""
    SELECT '{label}' AS key_name, est, exact FROM (
        WITH h AS (
            SELECT md5(CAST({col} AS VARCHAR)) AS hx FROM {table}
        ),
        rr AS (
            SELECT CAST(('0x' || substr(hx, 1, 2)) AS INT) AS bucket,
                   CASE WHEN CAST(('0x' || substr(hx, 3, 12)) AS BIGINT) = 0
                        THEN {_HLL_UNIT_POW}
                        ELSE strpos(lpad(bin(CAST(('0x' || substr(hx, 3, 12))
                                                  AS BIGINT)), 48, '0'), '1')
                   END AS rho
            FROM h
        ),
        regs AS (SELECT bucket, MAX(rho) AS mr FROM rr GROUP BY 1),
        s AS (
            SELECT CAST(SUM(CAST(1 AS BIGINT)
                            << ({_HLL_UNIT_POW} - mr)) AS BIGINT) AS pres,
                   CAST(COUNT(*) AS BIGINT) AS nregs
            FROM regs
        ),
        raw AS (
            SELECT CAST(FLOOR(
                       CAST({_HLL_ALPHA} AS DOUBLE) * {_HLL_M} * {_HLL_M}
                       * CAST({2 ** _HLL_UNIT_POW} AS DOUBLE)
                       / (pres + ({_HLL_M} - nregs)
                                 * CAST({2 ** _HLL_UNIT_POW} AS BIGINT))
                       * 1e6) AS BIGINT) AS raw_u,
                   {_HLL_M} - nregs AS zeros
            FROM s
        )
        SELECT CAST(CASE WHEN raw_u <= {int(2.5 * _HLL_M * 1e6)}
                          AND zeros > 0
                         THEN CAST(FLOOR(
                             {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / zeros)
                             * 1e6) AS BIGINT)
                         ELSE raw_u END AS DOUBLE) / 1e6 AS est,
               (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT)
                FROM {table}) AS exact
        FROM raw
    ) z
    """


@query(
    "hll_portable_cardinality",
    oracle=" UNION ALL ".join(
        _hll_sql_one(label, table, col) for label, table, col in _HLL_KEYS
    )
    + " ORDER BY key_name",
)
def hll_portable_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality (m = {_HLL_M} registers, Flajolet et al.
    2007, with the linear-counting small-range correction) built as a
    PLAIN HASH AGGREGATE over md5-derived (bucket, rho) pairs — so the
    identical sketch materializes in DuckDB and the driver's oracle gate
    checks the estimator end-to-end, unlike engine-native
    approx_count_distinct whose sketch is opaque. Three key columns in
    one result: near-unique, mid-cardinality, and hot-key regimes.

    Determinism: bucket = first md5 byte; rho = leading-zero position of
    the next 48 bits via string ops (no float log); register terms 2^-rho
    are summed in exact integer 2^-{_HLL_UNIT_POW} units; the one ln()
    in the small-range branch is identical-input IEEE floor-quantized to
    1e-6 before the comparison-free select.

    Scale: per key column, one md5 projection + one 256-group max
    aggregate — the groupBy-max IS the sketch union, so the same code
    merges per-partition sketches losslessly at any width; the register
    table is 256 rows regardless of input size. Exact distinct counts
    ride alongside for the error report (at 100 TB you would drop them;
    they are the oracle's ground truth here).
    """
    parts = []
    for label, table, col in _HLL_KEYS:
        t = load_table(spark, sf_dir, table)
        hx = F.md5(F.col(col).cast("string"))
        v48 = F.conv(F.substring(hx, 3, 12), 16, 10).cast("bigint")
        rho = F.when(v48 == 0, F.lit(_HLL_UNIT_POW)).otherwise(
            F.locate("1", F.lpad(F.bin(v48), 48, "0"))
        )
        rr = t.select(
            F.conv(F.substring(hx, 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        regs = rr.groupBy("bucket").agg(F.max("rho").alias("mr"))
        s = regs.agg(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {_HLL_UNIT_POW} - mr)"
                )
            )
            .cast("bigint")
            .alias("pres"),
            F.count(F.lit(1)).cast("bigint").alias("nregs"),
        )
        raw_u = F.floor(
            F.lit(float(_HLL_ALPHA))
            * _HLL_M
            * _HLL_M
            * F.lit(float(2**_HLL_UNIT_POW))
            / (
                F.col("pres")
                + (F.lit(_HLL_M) - F.col("nregs"))
                * F.lit(2**_HLL_UNIT_POW).cast("bigint")
            )
            * F.lit(1e6)
        ).cast("bigint")
        zeros = (F.lit(_HLL_M) - F.col("nregs")).cast("bigint")
        lc_u = F.floor(
            F.lit(_HLL_M)
            * F.log(F.lit(float(_HLL_M)) / zeros.cast("double"))
            * F.lit(1e6)
        ).cast("bigint")
        est = (
            F.when(
                (raw_u <= int(2.5 * _HLL_M * 1e6)) & (zeros > 0), lc_u
            )
            .otherwise(raw_u)
            .cast("double")
            / 1e6
        )
        exact = t.agg(F.countDistinct(col).cast("bigint").alias("exact"))
        parts.append(
            s.select(F.lit(label).alias("key_name"), est.alias("est"))
            .crossJoin(F.broadcast(exact))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_name")


# ---------------------------------------------------------------------------
# KMV (k minimum hash values) set algebra: union / intersection / Jaccard
# ---------------------------------------------------------------------------

_KMV_K = 128
_KMV_SPACE = 2**48  # 48-bit hash space


_KMV_ORACLE = f"""
WITH ua AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
ub AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
ha AS (
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                AS BIGINT) AS h
    FROM ua
),
hb AS (
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                AS BIGINT) AS h
    FROM ub
),
ka AS (
    SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM ha) z
    WHERE rk <= {_KMV_K}
),
kb AS (
    SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM hb) z
    WHERE rk <= {_KMV_K}
),
ku AS (
    SELECT h, rk FROM (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk
        FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
    ) z WHERE rk <= {_KMV_K}
),
stats AS (
    SELECT (SELECT MAX(h) FROM ku) AS hk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ku) AS nu,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM ku JOIN ka ON ka.h = ku.h JOIN kb ON kb.h = ku.h) AS ninter
)
SELECT CAST((SELECT COUNT(*) FROM ua) AS BIGINT) AS n_click_exact,
       CAST((SELECT COUNT(*) FROM ub) AS BIGINT) AS n_purchase_exact,
       CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT user_id FROM ua UNION SELECT user_id FROM ub) x)
           AS BIGINT) AS union_exact,
       CAST((SELECT CAST(COUNT(*) AS BIGINT)
             FROM ua JOIN ub ON ub.user_id = ua.user_id) AS BIGINT)
           AS inter_exact,
       CAST(CASE WHEN nu < {_KMV_K} THEN CAST(nu * 1000000 AS BIGINT)
                 ELSE CAST(FLOOR(CAST({_KMV_K - 1} AS DOUBLE)
                                 * {_KMV_SPACE} / hk * 1e6) AS BIGINT)
            END AS DOUBLE) / 1e6 AS union_est,
       CAST(ninter * 1000000 // nu AS DOUBLE) / 1e6 AS jaccard_est
FROM stats
"""


@query("kmv_set_intersection", oracle=_KMV_ORACLE)
def kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta-sketch) set algebra over the click
    vs purchase user sets: union cardinality from the k-th smallest hash
    ((k−1)·space/h_k, Bar-Yossef et al. 2002) and Jaccard from the
    k-combined sketch overlap — the sketch family behind DataSketches'
    theta union/intersection, built as plain min-k aggregates so DuckDB
    constructs the bit-identical sketch (md5-derived 48-bit hashes).
    Exact counts ride alongside as the error report.

    Determinism: hashes are integers; ranks carry a total order (hashes
    of DISTINCT user ids under md5 — collision-free at this scale); the
    two estimate divisions are fixed IEEE expressions floor-quantized to
    1e-6 units.

    Scale: per set, a distinct + a top-k-smallest-hash aggregate (k = 128
    rows out regardless of input); the union/intersection is set algebra
    on 128-row tables. The min-k shape is losslessly mergeable across
    partitions — the same property theta sketches are built on.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")

    def uset(etype: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .select(F.col("user_id"))
            .distinct()
        )

    # Keep the raw ids: the *exact* columns must be computed on user_id
    # (the oracle does), not on 48-bit hash prefixes where a single
    # collision above ~1e6 distinct users would misreport a column
    # labeled exact. Only the sketch itself lives in hash space.
    ua_ids, ub_ids = uset("click"), uset("purchase")
    ua, ub = ua_ids.select(h.alias("h")), ub_ids.select(h.alias("h"))

    def topk(df: DataFrame) -> DataFrame:
        return df.orderBy("h").limit(_KMV_K)

    ka, kb = topk(ua), topk(ub)
    ku = topk(ka.union(kb).distinct())
    stats = ku.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("bigint").alias("nu")
    )
    ninter = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ninter"))
    )
    n_a = ua_ids.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_click_exact")
    )
    n_b = ub_ids.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchase_exact")
    )
    n_u = (
        ua_ids.union(ub_ids)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("union_exact"))
    )
    n_i = ua_ids.join(ub_ids, "user_id", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("inter_exact")
    )
    union_est = (
        F.when(
            F.col("nu") < _KMV_K, (F.col("nu") * 1000000).cast("bigint")
        )
        .otherwise(
            F.floor(
                F.lit(float(_KMV_K - 1))
                * F.lit(_KMV_SPACE)
                / F.col("hk")
                * F.lit(1e6)
            ).cast("bigint")
        )
        .cast("double")
        / 1e6
    )
    # Integer floor division on both engines (oracle uses `//`): no
    # double-division-then-truncate round-trip to reason about.
    jacc = (
        F.expr("ninter * 1000000L div nu").cast("bigint").cast("double")
        / 1e6
    )
    return (
        stats.crossJoin(F.broadcast(ninter))
        .crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_u))
        .crossJoin(F.broadcast(n_i))
        .select(
            "n_click_exact",
            "n_purchase_exact",
            "union_exact",
            "inter_exact",
            union_est.alias("union_est"),
            jacc.alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# AMS F2 (second frequency moment / self-join size) sketch
# ---------------------------------------------------------------------------

_AMS_EST = 16  # estimators = 16 sign bits from ONE md5 per key


_AMS_ORACLE = f"""
WITH f AS (
    SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
    FROM orders GROUP BY 1
),
sgn AS (
    SELECT k, c, e,
           CASE WHEN substr(md5(CAST(k AS VARCHAR)), e + 1, 1)
                     IN ('0','2','4','6','8','a','c','e')
                THEN 1 ELSE -1 END AS s
    FROM f, range(0, {_AMS_EST}) t(e)
),
x AS (
    SELECT e, CAST(SUM(s * c) AS BIGINT) AS z FROM sgn GROUP BY 1
),
est AS (
    SELECT e, CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)) AS x2,
           ROW_NUMBER() OVER (
               ORDER BY CAST(z AS DECIMAL(19,0)) * CAST(z AS DECIMAL(19,0)),
                        e
           ) AS rk
    FROM x
)
SELECT CAST((SELECT SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
             FROM f) AS BIGINT) AS f2_exact,
       CAST((SELECT CAST(SUM(x2) AS BIGINT) FROM est
             WHERE rk IN ({_AMS_EST // 2}, {_AMS_EST // 2 + 1})) // 2
           AS BIGINT) AS ams_median_est,
       CAST((SELECT CAST(SUM(x2) AS BIGINT) FROM est) // {_AMS_EST}
           AS BIGINT) AS ams_mean_est
"""


@query("ams_f2_sketch", oracle=_AMS_ORACLE)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996) for
    the orders-per-customer distribution: F2 = Σ f_k² is the SELF-JOIN
    SIZE, the number every join planner wants before picking a strategy
    on a skewed key. {_AMS_EST} independent ±1 estimators come from the
    16 hex nibbles of ONE md5 per key (one hash, not {_AMS_EST}); each
    estimator is (Σ_k s_e(k)·f_k)², and the sketch reports both the
    median-rank and mean combinations next to the exact F2.

    Determinism: the entire sketch is INTEGER arithmetic — signs, counts,
    sums, squares; the only divisions are exact integer div by 2 and
    {_AMS_EST}. Bit-identical across engines by construction.

    Scale: one count aggregate over the fact table, a constant
    {_AMS_EST}× fan-out of the (key, count) table into a 16-group sum
    (map-side combinable), and a 16-row rank — the linear-sketch shape:
    per-partition partial sums merge by addition, which is why AMS
    sketches stream. Exact F2 rides alongside as ground truth.
    """
    o = load_table(spark, sf_dir, "orders")
    f = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ests = spark.range(_AMS_EST).select(F.col("id").cast("int").alias("e"))
    sgn = (
        f.crossJoin(F.broadcast(ests))
        .select(
            "e",
            "c",
            F.when(
                F.substring(
                    F.md5(F.col("k").cast("string")), F.col("e") + 1, 1
                ).isin(*"02468ace"),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    x = sgn.groupBy("e").agg(F.sum(F.col("s") * F.col("c")).cast("bigint").alias("z"))
    # z² as an exact DECIMAL product: |z| is bounded by the stream length,
    # so a bigint square wraps silently past |z| ≈ 3e9 (the r11 neyman
    # class); the decimal product is exact for any bigint z.
    est = x.select(
        "e",
        (
            F.col("z").cast("decimal(19,0)") * F.col("z").cast("decimal(19,0)")
        ).alias("x2"),
    )
    # median of 16 = mean of ranks 8 and 9 under the (x2, e) total order —
    # ranked via the window-free triangular rank (ranked_head), keeping the
    # registry's no-unpartitioned-window invariant.
    from autonomus_datapipeline_spark.operators.prefix_sum import ranked_head

    ranked = ranked_head(
        est, [("x2", True), ("e", True)], _AMS_EST // 2 + 1, "rk"
    )
    med = ranked.where(
        F.col("rk").isin(_AMS_EST // 2, _AMS_EST // 2 + 1)
    ).agg(F.expr("CAST(SUM(x2) AS BIGINT) div 2").alias("ams_median_est"))
    # integer div on BOTH engines: a double-division + bigint cast drifts
    # (Spark casts by truncation, DuckDB by rounding — caught at sf0.001).
    mean = est.agg(
        F.expr(f"CAST(SUM(x2) AS BIGINT) div {_AMS_EST}").alias(
            "ams_mean_est"
        )
    )
    # Same decimal-product discipline for the exact F2: a heavy-hitter key
    # with c ≈ 3e9 orders wraps c·c in bigint; Σc² saturates visibly (null
    # at the final bigint cast) instead of wrapping.
    f2 = f.agg(
        F.sum(
            F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)")
        )
        .cast("bigint")
        .alias("f2_exact")
    )
    return (
        f2.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mean))
        .select("f2_exact", "ams_median_est", "ams_mean_est")
    )
