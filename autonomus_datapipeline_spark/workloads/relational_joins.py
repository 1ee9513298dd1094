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
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.operators.prefix_sum import with_global_running
from autonomus_datapipeline_spark.workloads.registry import (
    descale,
    descale6,
    davg,
    dsum,
    fsum,
    load_table,
    materialize_input,
    query,
    sql_davg,
    sql_dsum,
    sql_fsum,
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
           (CAST(CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REVENUE} ELSE 0.0 END
                    AS DECIMAL(38,6))) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DOUBLE) / 1e6)
             / (CAST(CAST(SUM(CAST({_REVENUE} AS DECIMAL(38,6))) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DOUBLE) / 1e6)
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
                descale6(F.sum(promo.cast(dec)))
                / descale6(F.sum(revenue.cast(dec)))
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
               (CAST(CAST(SUM(CAST(x AS DECIMAL(38,12)))
                          * CAST(1000000000000 AS DECIMAL(13,0))
                          AS DECIMAL(38,0)) AS DOUBLE) / 1e12)
                   / COUNT(*) AS c
        FROM dims GROUP BY label, pos
    ),
    global_cent AS (
        SELECT pos,
               (CAST(CAST(SUM(CAST(x AS DECIMAL(38,12)))
                          * CAST(1000000000000 AS DECIMAL(13,0))
                          AS DECIMAL(38,0)) AS DOUBLE) / 1e12)
                   / COUNT(*) AS g
        FROM dims GROUP BY pos
    )
    SELECT l.label,
           sqrt(CAST(CAST(SUM(CAST((l.c - g.g) * (l.c - g.g)
                                   AS DECIMAL(38,12)))
                          * CAST(1000000000000 AS DECIMAL(13,0))
                          AS DECIMAL(38,0)) AS DOUBLE) / 1e12)
               AS dist_to_global
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
        (descale(F.sum(F.col("x").cast(dec)), 12) / F.count("*")).alias("c")
    )
    global_cent = dims.groupBy("pos").agg(
        (descale(F.sum(F.col("x").cast(dec)), 12) / F.count("*")).alias("g")
    )
    diff2 = (F.col("c") - F.col("g")) * (F.col("c") - F.col("g"))
    return (
        label_cent.join(F.broadcast(global_cent), "pos")
        .groupBy("label")
        .agg(
            F.sqrt(descale(F.sum(diff2.cast(dec)), 12)).alias(
                "dist_to_global"
            )
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


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier by quarterly revenue (max-over-aggregate)
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST({_REVENUE} AS DECIMAL(38,6))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
          AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue over one
    quarter — the max-over-aggregate pattern (CREATE VIEW revenue0 + scalar
    MAX subquery in the spec). Decorrelated as: per-supplier decimal
    revenue, a 1-row global MAX broadcast back as a cross join, equality
    filter, then a broadcast supplier lookup. The fact table is scanned
    ONCE (the per-supplier aggregate feeds both the MAX and the filter via
    plan reuse); revenue stays DECIMAL(38,6) through the equality so a
    last-ulp double drift can never drop/duplicate the argmax — ties are
    exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    revenue = (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity-order revenue (per-part AVG subquery)
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#11"


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH bl AS (
        SELECT l.l_partkey,
               CAST(l.l_quantity AS BIGINT) AS qty,
               l.l_extendedprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{_Q17_BRAND}'
    ),
    pa AS (
        SELECT l_partkey,
               COUNT(*) AS n_li,
               CAST(SUM(qty) AS BIGINT) AS sum_qty
        FROM bl GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           {sql_dsum("bl.l_extendedprice", "total_revenue")},
           {sql_dsum("bl.l_extendedprice", "x").replace(" AS x", "")} / 7.0
               AS avg_yearly
    FROM bl JOIN pa ON pa.l_partkey = bl.l_partkey
    WHERE bl.qty * 5 * pa.n_li < pa.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — lineitems
    of one brand whose quantity is under 20% of that part's average
    quantity. The correlated AVG subquery is decorrelated into one
    per-part aggregate joined back to the same filtered fact; the brand
    filter lands FIRST via a broadcast part join, so the partkey shuffle
    only carries ~1/25th of the fact table, and plan reuse shares that
    shuffle between the aggregate and the probe side.

    The 20% threshold is integer-exact: quantities are integral, so
    ``qty * 5 * n < sum`` replaces ``qty < 0.2 * avg`` with pure BIGINT
    arithmetic — no division, no float boundary to drift between engines."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    bl = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_extendedprice",
    )
    pa = bl.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum("qty").alias("sum_qty"),
    )
    joined = bl.join(pa, bl.l_partkey == pa.pa_key).where(
        F.col("qty") * 5 * F.col("n_li") < F.col("sum_qty")
    )
    total = F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        total.cast("double").alias("total_revenue"),
        (total.cast("double") / 7.0).alias("avg_yearly"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive predicate revenue (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

_Q19_ARMS = (
    ("Brand#3", 1, 15, 1, 11),
    ("Brand#12", 10, 30, 10, 20),
    ("Brand#21", 20, 50, 20, 30),
)


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum(_REVENUE, "revenue")}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in _Q19_ARMS
    )}
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size-range,
    quantity-range) arm predicates — the disjunctive-pushdown stress test.
    Catalyst cannot split an OR across the join, so the plan hoists the
    DERIVED single-table residuals by hand: the quantity arms union to
    ``l_quantity BETWEEN 1 AND 30`` (pushed into the fact scan, pruning
    ~40% of lineitem before the join) and the part side keeps only rows
    matching SOME arm's (brand, size) — dimension-sized either way, but the
    pre-filter shrinks the broadcast. The full OR is re-checked join-time,
    so the residuals are a pure bandwidth win, never a semantics change."""
    qty_lo = min(a[3] for a in _Q19_ARMS)
    qty_hi = max(a[4] for a in _Q19_ARMS)
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(qty_lo, qty_hi)
    )
    part_arm = [
        (F.col("p_brand") == b) & F.col("p_size").between(slo, shi)
        for b, slo, shi, _, _ in _Q19_ARMS
    ]
    p_any = part_arm[0] | part_arm[1] | part_arm[2]
    p = load_table(spark, sf_dir, "part").where(p_any).select(
        "p_partkey", "p_brand", "p_size"
    )
    arm = [
        (F.col("p_brand") == b)
        & F.col("p_size").between(slo, shi)
        & F.col("l_quantity").between(qlo, qhi)
        for b, slo, shi, qlo, qhi in _Q19_ARMS
    ]
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(arm[0] | arm[1] | arm[2])
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(revenue, "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region, by order year
# ---------------------------------------------------------------------------

_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_2"


@query(
    "q8_market_share",
    oracle=f"""
    WITH t AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               {_REVENUE} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = '{_Q8_REGION}'
    )
    SELECT o_year,
           {sql_dsum(f"CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume ELSE 0.0 END", "nation_volume")},
           {sql_dsum("volume", "total_volume")},
           {sql_dsum(f"CASE WHEN supp_nation = '{_Q8_NATION}' THEN volume ELSE 0.0 END", "x").replace(" AS x", "")}
               / {sql_dsum("volume", "y").replace(" AS y", "")} AS mkt_share
    FROM t GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of supplier revenue into a
    region's customers, per order year — conditional aggregation over a
    six-way join. Every non-fact side is dimension-sized and broadcast
    (customer-nation→region chain prunes to 1/5 of customers BEFORE the
    fact join); the share is numerator/denominator of two exact decimal
    sums, divided once in double — both engines divide the same two exact
    values, so the ratio is bit-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nations = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = (
        load_table(spark, sf_dir, "region")
        .where(F.col("r_name") == _Q8_REGION)
        .select("r_regionkey")
    )
    cn = nations.join(F.broadcast(r), nations.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nations.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == _Q8_NATION, volume).otherwise(0.0)
    t = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    num = descale6(F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.col("volume"))
        .otherwise(0.0)
        .cast("decimal(38,6)")
    ))
    den = descale6(F.sum(F.col("volume").cast("decimal(38,6)")))
    return t.groupBy("o_year").agg(
        num.alias("nation_volume"),
        den.alias("total_volume"),
        (num / den).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority top-10 (join + group + bounded top-k)
# ---------------------------------------------------------------------------

_Q3_SEGMENT = "BUILDING"
_Q3_CUT = "1997-06-15"
_Q3_TOPK = 10


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum(_REVENUE, "revenue")},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_CUT}'
      AND l.l_shipdate  > TIMESTAMP '{_Q3_CUT}'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT {_Q3_TOPK}
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the 10 unshipped orders with the highest revenue for
    one market segment — the canonical filter-join-aggregate-topk. Both
    date predicates and the segment predicate are pushed into their scans
    (the segment filter prunes customers BEFORE the broadcast); the top-10
    is TakeOrderedAndProject over the per-order aggregate with an orderkey
    tiebreak, never a global sort. Revenue is the exact-decimal sum, so the
    k-boundary cannot drift between engines."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(_Q3_CUT).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(_Q3_CUT).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(_Q3_TOPK)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority checking (EXISTS → semi join)
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1997-01-01", "1997-04-01"


@query(
    "q4_order_priority_check",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    SEMI JOIN (
        SELECT l_orderkey FROM lineitem
        WHERE l_shipdate > TIMESTAMP '{_Q4_HI}'
    ) l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q4_HI}'
    GROUP BY 1
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of one quarter's orders that had
    at least one late-shipping lineitem — the correlated EXISTS expressed
    as a LEFT SEMI join (each order counted once no matter how many
    qualifying lineitems — a plain inner join would over-count). Both date
    filters push into the scans; the semi join shuffles on orderkey and
    the final rollup is 5 groups, collapsed map-side.

    (l_commitdate/l_receiptdate are absent from this dataset; 'late' is
    shipdate past the quarter end, same plan shape.)"""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    late = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(_Q4_HI).cast("timestamp")
    ).select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting (top-20 customers by lost revenue)
# ---------------------------------------------------------------------------

_Q10_LO, _Q10_HI = "1997-01-01", "1997-07-01"
_Q10_TOPK = 20


@query(
    "q10_returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum(_REVENUE, "revenue")},
           c.c_acctbal, n.n_name
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q10_HI}'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c.c_custkey
    LIMIT {_Q10_TOPK}
    """,
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue in
    one half-year — returnflag filter on the fact scan, a half-year window
    on orders, dimension broadcasts for customer and nation, then a
    per-customer aggregate and bounded top-k (TakeOrdered with custkey
    tiebreak). The returnflag + date predicates prune ~7/8 of the joined
    fact before the custkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(_Q10_TOPK)
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecasting revenue change (pure scan-level filter + agg)
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"
_Q6_DISC_LO, _Q6_DISC_HI = 0.05, 0.07
_Q6_MAX_QTY = 24.0


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
      AND l_shipdate <  TIMESTAMP '{_Q6_HI}'
      AND l_discount BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
      AND l_quantity < {_Q6_MAX_QTY}
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would have been gained by eliminating
    small discounts — the pure scan-rate benchmark: every predicate (date
    window, discount band, quantity cap) pushes into the Parquet scan, the
    aggregate is a single exact-decimal sum with map-side partials, and the
    whole plan is one WholeStageCodegen span over the scan with a 1-row
    exchange. If this query is not scan-bound, the storage path is broken."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
        & F.col("l_discount").between(_Q6_DISC_LO, _Q6_DISC_HI)
        & (F.col("l_quantity") < _Q6_MAX_QTY)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-mode priority counts (join + conditional agg)
# ---------------------------------------------------------------------------

_Q12_LO, _Q12_HI = "1997-01-01", "1998-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@query(
    "q12_priority_shipping",
    oracle=f"""
    SELECT l.l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN
                         ('{_Q12_HIGH[0]}', '{_Q12_HIGH[1]}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                         ('{_Q12_HIGH[0]}', '{_Q12_HIGH[1]}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO}'
      AND l.l_shipdate <  TIMESTAMP '{_Q12_HI}'
    GROUP BY 1
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many critical-priority vs
    other orders it carried in one year — join + CASE-conditional counts,
    the pattern for any "cross-tab after a fact join" report. The date
    window pushes into the lineitem scan, the join shuffles on orderkey
    (orders' priority column is the only payload), and the grouped output
    is category-sized, collapsed map-side.

    (This dataset has no l_shipmode column; l_linestatus is the grouping
    proxy — identical plan shape, two groups instead of seven.)"""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier concentration per nation
# ---------------------------------------------------------------------------


@query(
    "hhi_supplier_concentration",
    oracle=f"""
    WITH srev AS (
        SELECT s.s_nationkey AS nation, l.l_suppkey,
               {sql_fsum('l.l_extendedprice', 'r')}
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT nation,
               {sql_fsum('r', 'total_r')},
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM srev GROUP BY 1
    )
    SELECT n.n_name AS nation_name,
           t.n_suppliers,
           {sql_fsum('(s.r / t.total_r) * (s.r / t.total_r)', 'hhi', '1e12')}
    FROM srev s
    JOIN tot t ON t.nation = s.nation
    JOIN nation n ON n.n_nationkey = s.nation
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation: HHI = Σ share² — the antitrust-style concentration metric
    (1/n_suppliers = perfectly even, → 1 = monopoly; the Gini query
    measures the customer side). Bit-exact across engines by the fsum
    rule: revenue and nation totals are floor-quantized exact sums, each
    share is one IEEE division of identical doubles, and Σ share² is a
    floor-quantized picounit sum — shares are ≤ 1, so the quantized
    units never overflow at ANY scale factor (the earlier Σr² form
    would overflow 64-bit floor units on r² ≈ 10¹⁸ at sf1).

    Scale: supplier revenue shuffles on suppkey (map-side combinable);
    nation totals are a |nations|-row broadcast; HHI is a second bounded
    rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    srev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation_k"), "l_suppkey")
        .agg(fsum(F.col("l_extendedprice"), "r"))
    )
    tot = srev.groupBy("nation_k").agg(
        fsum(F.col("r"), "total_r"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    share = F.col("r") / F.col("total_r")
    return (
        srev.join(F.broadcast(tot), "nation_k")
        .groupBy("nation_k", "n_suppliers")
        .agg(fsum(share * share, "hhi", grain=1e12))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("nation_k"), "n_name")),
            "nation_k",
        )
        .select(F.col("n_name").alias("nation_name"), "n_suppliers", "hhi")
        .orderBy("nation_name")
    )


# ---------------------------------------------------------------------------
# Laspeyres price index (year-over-year, base-year basket)
# ---------------------------------------------------------------------------

_LPI_BASE_YR = 1995
_LPI_CUR_YR = 1996


@query(
    "laspeyres_price_index",
    oracle=f"""
    WITH py AS (
        SELECT l_partkey,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
               SUM(CAST(FLOOR(l_extendedprice * 1e6) AS DECIMAL(38,0))) AS rev,
               SUM(CAST(FLOOR(l_quantity * 1e6) AS DECIMAL(38,0))) AS qty
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE EXTRACT(year FROM o.o_orderdate)
              IN ({_LPI_BASE_YR}, {_LPI_CUR_YR})
        GROUP BY 1, 2
    ),
    paired AS (
        SELECT b.l_partkey,
               CAST(b.rev AS DOUBLE) / CAST(b.qty AS DOUBLE) AS p0,
               CAST(c.rev AS DOUBLE) / CAST(c.qty AS DOUBLE) AS p1,
               CAST(b.qty AS DOUBLE) / 1e6 AS q0
        FROM py b JOIN py c ON c.l_partkey = b.l_partkey
        WHERE b.yr = {_LPI_BASE_YR} AND c.yr = {_LPI_CUR_YR}
          AND b.qty > 0 AND c.qty > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(FLOOR((p1 * q0) * 1e6) AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(SUM(CAST(FLOOR((p0 * q0) * 1e6) AS DECIMAL(38,0))) AS DOUBLE)
               AS laspeyres_index
    FROM paired
    """,
)
def laspeyres_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index {_LPI_CUR_YR} vs {_LPI_BASE_YR}: Σp₁q₀/Σp₀q₀
    over the parts traded in BOTH years (base-year basket weights) — the
    CPI-style inflation measure for the catalog, and the index-number
    family's entry in the registry (unit prices are revenue/quantity per
    part-year). Both basket sums ride the decimal accumulator; unit
    prices are per-row IEEE divisions of decimal-exact sums.

    Scale: one join + (part, year) rollup (map-side combinable), a
    self-join on the part key restricted to the two years, and a scalar
    reduction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    dec0 = "decimal(38,0)"
    py = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate").isin(_LPI_BASE_YR, _LPI_CUR_YR))
        .groupBy("l_partkey", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * F.lit(1e6)).cast(dec0))
            .alias("rev"),
            F.sum(F.floor(F.col("l_quantity") * F.lit(1e6)).cast(dec0))
            .alias("qty"),
        )
    )
    b = py.where(F.col("yr") == _LPI_BASE_YR).select(
        "l_partkey",
        (F.col("rev").cast("double") / F.col("qty").cast("double")).alias("p0"),
        (F.col("qty").cast("double") / F.lit(1e6)).alias("q0"),
    )
    c = py.where(F.col("yr") == _LPI_CUR_YR).select(
        "l_partkey",
        (F.col("rev").cast("double") / F.col("qty").cast("double")).alias("p1"),
        F.col("qty").alias("cqty"),
    )
    paired = b.where(F.col("q0") > 0).join(
        c.where(F.col("cqty") > 0), "l_partkey"
    )
    # fsum-style floor quantization on both basket sums (not a decimal
    # snap): p·q is a genuine double product, and the two engines round a
    # double into a decimal quantum differently — floor units are
    # bit-identical by construction (registry.fsum).
    fl = lambda c: F.sum(F.floor(c * F.lit(1e6)).cast("decimal(38,0)")).cast(  # noqa: E731
        "double"
    )
    return paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (
            fl(F.col("p1") * F.col("q0")) / fl(F.col("p0") * F.col("q0"))
        ).alias("laspeyres_index"),
    )


# ---------------------------------------------------------------------------
# ABC inventory classification (cumulative revenue classes)
# ---------------------------------------------------------------------------


@query(
    "abc_part_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS r
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_partkey, r,
               SUM(r) OVER (ORDER BY r DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(r) OVER () AS tot
        FROM rev
    ),
    classed AS (
        SELECT r,
               CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                    WHEN 20 * cum <= 19 * tot THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(r) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY 1 ORDER BY 1
    """,
)
def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    while cumulative share ≤ 80 %, B to 95 %, C after — the inventory-
    policy partition (count A parts daily, B weekly, C quarterly), and
    the 3-class refinement of cumulative_share_pareto80's single cut.
    Class boundaries are integer cross-multiplications on EXACT DECIMAL
    cumulative revenue (5·cum ≤ 4·tot, 20·cum ≤ 19·tot), so boundary
    parts classify identically on both engines.

    Scale: per-part rollup (map-side combinable), a distributed
    prefix-sum over |parts| for the ranked cumulative revenue (an
    unpartitioned window would serialize the part table), a 3-row report.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("r")
    )
    # per-part revenue has no spec envelope, so the rank's min/max scan
    # cannot be skipped — materialize the |parts|-sized rollup once instead
    # of re-running the lineitem rollup per prefix-sum branch.
    rev = materialize_input(rev)
    ranked = with_global_running(
        rev,
        [("r", False), ("l_partkey", True)],
        sums={"cum": "r"},
        totals={"tot": "r"},
    ).select("r", "cum", "tot")
    abc = (
        F.when(5 * F.col("cum") <= 4 * F.col("tot"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        ranked.select("r", abc.alias("abc_class"))
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )
