"""Deep multi-join relational workloads (TPC-H Q5/Q7/Q14 shapes) and
embedding-column analytics.

The join queries exercise the planner paths that matter most at 100 TB:
dimension broadcast chains (region→nation→customer/supplier are KBs–MBs
next to a TBs fact table), join reordering, and conditional aggregation
over a joined fact. The embedding queries profile an `array<float>` column
with exact-decimal reductions so the numbers are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.workloads.registry import (
    davg,
    dsum,
    load_table,
    query,
    sql_davg,
    sql_dsum,
)

_REVENUE = "l_extendedprice * (1.0 - l_discount)"


# ---------------------------------------------------------------------------
# Q5 shape: local supplier volume (customer and supplier in the same nation)
# ---------------------------------------------------------------------------


@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum(_REVENUE, "revenue")},
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    WHERE c.c_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue shipped by suppliers located in the
    customer's own nation. Five-way join where every non-fact side
    (orders keys, customer, supplier, nation) is dimension-sized →
    Spark broadcasts the dims and the only corpus-scale shuffle is
    lineitem⋈orders; the same-nation predicate is applied as a join-time
    filter, never materializing cross-nation rows."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(revenue, "revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: cross-nation trade volume by year
# ---------------------------------------------------------------------------


@query(
    "trade_volume_pairs",
    oracle=f"""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
           {sql_dsum(_REVENUE, "revenue")}
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3
    """,
)
def trade_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: international trade volume between every
    (customer nation, supplier nation) pair per ship year. Same broadcast
    dimension chain as Q5 but with TWO independent nation lookups (aliased
    broadcast joins) and an inequality predicate — the group key is
    dimension² × years, still tiny, so map-side partial aggregation
    collapses the fact table before the final shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nations = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nations.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nations.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum(revenue, "revenue"))
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share (conditional aggregation over a join)
# ---------------------------------------------------------------------------


@query(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
           {sql_dsum(f"CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REVENUE} ELSE 0.0 END", "promo_revenue")},
           {sql_dsum(_REVENUE, "total_revenue")},
           CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REVENUE} ELSE 0.0 END
                    AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST({_REVENUE} AS DECIMAL(38,6))) AS DOUBLE)
             AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo-typed parts per ship
    year. Part is a broadcast dim; the CASE folds into the partial
    aggregate, so the fact table is read once and reduced map-side —
    the canonical conditional-aggregation-over-join pattern."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(0.0)
    dec = "decimal(38,6)"
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            dsum(promo, "promo_revenue"),
            dsum(revenue, "total_revenue"),
            (
                F.sum(promo.cast(dec)).cast("double")
                / F.sum(revenue.cast(dec)).cast("double")
            ).alias("promo_share"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-column analytics: norm profile per label
# ---------------------------------------------------------------------------


@query(
    "embedding_norm_stats",
    oracle=f"""
    WITH norms AS (
        SELECT label,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
        FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           {sql_davg("l2", "avg_norm")},
           MIN(l2) AS min_norm,
           MAX(l2) AS max_norm
    FROM norms GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene profile: per-label L2-norm count/avg/min/max —
    the check that catches unnormalized or degenerate vectors before any
    similarity pass. The norm is a JVM higher-order `aggregate` over the
    float array (per-row IEEE, deterministic), reduced with exact-decimal
    avg; no explode, no shuffle beyond the label agg."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norms = e.select("label", F.sqrt(sq).alias("l2"))
    return norms.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        davg("l2", "avg_norm"),
        F.min("l2").alias("min_norm"),
        F.max("l2").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# Embedding centroid geometry (exact-decimal per-dimension means)
# ---------------------------------------------------------------------------


@query(
    "embedding_centroid_dist",
    oracle="""
    WITH dims AS (
        SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    label_cent AS (
        SELECT label, pos,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS c
        FROM dims GROUP BY label, pos
    ),
    global_cent AS (
        SELECT pos,
               CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS g
        FROM dims GROUP BY pos
    )
    SELECT l.label,
           sqrt(CAST(SUM(CAST((l.c - g.g) * (l.c - g.g) AS DECIMAL(38,12)))
                AS DOUBLE)) AS dist_to_global
    FROM label_cent l JOIN global_cent g ON l.pos = g.pos
    GROUP BY l.label
    """,
)
def embedding_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-geometry report: L2 distance from each label's centroid to
    the global centroid. Centroids are per-dimension means computed with
    exact-decimal sums (order-free → engine-portable); the dimension
    explode is bounded by n_vectors × dim and both aggregations collapse to
    |labels| × dim rows, so the final join is trivially broadcast.

    This is the drift/imbalance diagnostic for embedding spaces (e.g.
    detecting that one source's vectors sit far from the corpus center)."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("pos", "xf")
    ).select("label", "pos", F.col("xf").cast("double").alias("x"))
    dec = "decimal(38,12)"
    label_cent = dims.groupBy("label", "pos").agg(
        (F.sum(F.col("x").cast(dec)).cast("double") / F.count("*")).alias("c")
    )
    global_cent = dims.groupBy("pos").agg(
        (F.sum(F.col("x").cast(dec)).cast("double") / F.count("*")).alias("g")
    )
    diff2 = (F.col("c") - F.col("g")) * (F.col("c") - F.col("g"))
    return (
        label_cent.join(F.broadcast(global_cent), "pos")
        .groupBy("label")
        .agg(
            F.sqrt(F.sum(diff2.cast(dec)).cast("double")).alias("dist_to_global")
        )
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization audit (embedding-store scale path)
# ---------------------------------------------------------------------------

_QDIM = 64  # embedding dimensionality of the test tables


@query(
    "embedding_int8_quantization",
    oracle=f"""
    WITH q AS (
        SELECT e.vec_id,
               CAST(e.embedding[t.p] AS DOUBLE) AS x,
               floor(least(greatest(CAST(e.embedding[t.p] AS DOUBLE), -1.0), 1.0)
                     * 127 + 0.5) AS qv
        FROM embeddings e, range(1, {_QDIM + 1}) t(p)
    )
    SELECT vec_id,
           CAST(SUM(CASE WHEN x < -1.0 OR x > 1.0 THEN 1 ELSE 0 END) AS INT)
               AS n_clipped,
           ROUND(MAX(abs(x - qv / 127.0)), 6) AS max_abs_err,
           ROUND(CAST(SUM(CAST((x - qv / 127.0) * (x - qv / 127.0)
                               AS DECIMAL(38,12))) AS DOUBLE) / {_QDIM}, 9)
               AS mse
    FROM q GROUP BY vec_id
    """,
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization audit: quantize each embedding to 127-scale
    ints (floor(x*127 + 0.5) — floor-of-shifted, so tie behavior is
    identical on every engine, unlike round()) with clipping to [-1, 1],
    and report per-vector reconstruction error (clipped-element count, max
    abs error, MSE). This is the go/no-go report before switching an
    embedding store to int8 — 4× memory and bandwidth at 100 TB.

    Scale: pure JVM higher-order array math (transform/zip_with/aggregate)
    fused into the scan projection — no explode, no shuffle except the
    final vec_id-grouped... none at all: the whole report is per-row."""
    e = load_table(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    qv = F.transform(
        xd,
        lambda v: F.floor(
            F.least(F.greatest(v, F.lit(-1.0)), F.lit(1.0)) * 127 + F.lit(0.5)
        ),
    )
    err = F.zip_with(xd, qv, lambda x, q: x - q / F.lit(127.0))
    n_clipped = F.aggregate(
        xd,
        F.lit(0),
        lambda acc, v: acc
        + F.when((v < -1.0) | (v > 1.0), F.lit(1)).otherwise(F.lit(0)),
    ).cast("int")
    max_abs_err = F.round(F.array_max(F.transform(err, F.abs)), 6)
    mse = F.round(
        F.aggregate(
            F.transform(err, lambda d: (d * d).cast("decimal(30,12)")),
            F.lit(0).cast("decimal(30,12)"),
            lambda acc, v: (acc + v).cast("decimal(30,12)"),
        ).cast("double")
        / _QDIM,
        9,
    )
    return e.select(
        "vec_id",
        n_clipped.alias("n_clipped"),
        max_abs_err.alias("max_abs_err"),
        mse.alias("mse"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of customers by order count (agg of agg)
# ---------------------------------------------------------------------------


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY 1
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N (non-urgent)
    orders — including the zero-order customers a plain inner join would
    silently drop. The two-level aggregation (per-customer count → count of
    counts) is the canonical agg-of-agg plan: the first agg shuffles on
    custkey, the second on the COUNT VALUE (~small domain), so the second
    exchange is tiny regardless of corpus size."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (semi join on aggregated subquery)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 150.0
_Q18_TOPK = 50


@query(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY 1 HAVING SUM(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_dsum("l.l_quantity", "total_qty")}
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    SEMI JOIN big ON big.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT {_Q18_TOPK}
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders — a semi
    join against an AGGREGATED subquery (orders whose line quantities sum
    past a threshold), then re-aggregation over the joined fact and a
    bounded top-k. The `big` set is filtered to a tiny fraction of orders
    before it ever joins, and the final ordering is TakeOrdered with a
    total tiebreak — never a global sort of the joined fact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > _Q18_MIN_QTY)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(_Q18_TOPK)
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: sole-late-supplier (correlated EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q21_LATE_DAYS = 60
_Q21_TOPK = 30


@query(
    "q21_sole_late_supplier",
    oracle=f"""
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait FROM (
        SELECT DISTINCT a.l_orderkey, a.l_suppkey
        FROM lo a
        WHERE a.late
          AND EXISTS (SELECT 1 FROM lo b
                      WHERE b.l_orderkey = a.l_orderkey
                        AND b.l_suppkey <> a.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo c
                          WHERE c.l_orderkey = a.l_orderkey
                            AND c.l_suppkey <> a.l_suppkey AND c.late)
    ) w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT {_Q21_TOPK}
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on
    multi-supplier finished orders — the classic correlated EXISTS +
    NOT-EXISTS pair. Decorrelated into ONE per-order aggregate (supplier
    count, late-supplier count, distinct late set) instead of two
    correlated self-joins: an order qualifies iff n_suppliers > 1 and
    n_late_suppliers == 1, and the blamed supplier is the single late one.
    One shuffle on orderkey replaces both EXISTS probes — the
    decorrelation Catalyst cannot always find on its own.

    (l_commitdate/l_receiptdate are absent from this dataset; 'late' is
    shipdate > orderdate + {60} days, same plan shape.)"""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.timestamp_add("DAY", F.lit(_Q21_LATE_DAYS), F.col("o_orderdate"))
            ).alias("late"),
        )
        .distinct()
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    blamed = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    ).select("l_orderkey", F.col("late_supp").alias("l_suppkey"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(_Q21_TOPK)
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: idle rich customers (scalar subquery + anti join)
# ---------------------------------------------------------------------------


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           COUNT(*) AS numcust,
           {sql_dsum("c.c_acctbal", "totacctbal")}
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ANTI JOIN (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
      ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
    GROUP BY 1
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    RECENT orders (none since 2001) — a scalar aggregate subquery (global positive-balance mean,
    broadcast as a 1-row cross join) feeding a filter, then an anti join
    against the fact table and a per-nation rollup. The anti join shuffles
    on custkey; the scalar mean never forces a second fact scan.

    The mean is compared in DOUBLE on both engines; customers AT the mean
    are excluded (strict >), so the boundary is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
