"""Synthesized ``partsupp`` + the five TPC-H shapes that need it
(Q2, Q9, Q11, Q16, Q20) — closing the 17/22 → 22/22 TPC-H coverage gap.

The driver's test data has no partsupp table, so one is SYNTHESIZED
deterministically from part × supplier with arithmetic both engines compute
bit-identically — every query below is value-checked against its DuckDB
oracle end-to-end, partsupp included.

Derivation (0-based keys, S = |supplier|, 4 suppliers per part — the
public TPC-H dbgen supplier-assignment idea, made collision-free for
arbitrary S):

    ps_suppkey(p, i) = (p + p div S + i · (S div 4)) mod S,  i ∈ 0..3

    (i · (S div 4) < S for i ≤ 3 and the four offsets are pairwise
    distinct mod S, so a part never repeats a supplier; the p div S term
    rotates assignment across part blocks like dbgen's (p-1)/S term.)

    h        = md5('ps:' || p || ':' || ps_suppkey)
    nib(j)   = strpos('0123456789abcdef', substr(h, j, 1)) − 1
    v6(a)    = Σ_{k=0..5} nib(a+k) · 16^(5−k)        (24-bit uniform)
    ps_availqty         = v6(1) mod 9999 + 1          (1 .. 9999)
    ps_supplycost_cents = v6(7) mod 99900 + 100       (¢100 .. ¢99999)

Costs stay in integer CENTS through every join/aggregate (exact in both
engines at any scale); division by 100 happens once per query at the
output edge. The md5→nibble trick is the same cross-engine hash-integer
idiom the count-min sketch query uses.

Scale: partsupp is 4·|part| rows built from one part scan and a broadcast
1-row supplier count — map-side only, no shuffle to synthesize. Every
query joins it on its keys like a real table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.workloads.registry import (
    dsum,
    load_table,
    query,
    sql_dsum,
)

_PS_PER_PART = 4


def _nib(fn: str, j: int) -> str:
    """1 hex nibble of column ``h`` as an int, via position-in-alphabet —
    portable (Spark ``instr`` / DuckDB ``strpos``), no hex-parse builtin
    needed."""
    return f"({fn}('0123456789abcdef', substr(h, {j}, 1)) - 1)"


def _v6(fn: str, start: int) -> str:
    """24-bit integer from 6 hex nibbles of ``h`` starting at ``start``."""
    terms = " + ".join(
        f"{_nib(fn, start + k)} * {16 ** (5 - k)}" for k in range(6)
    )
    return f"({terms})"


def build_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp table:
    (ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    s_total = (
        load_table(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("s_total"))
    )
    base = (
        part.crossJoin(F.broadcast(s_total))
        .select(
            "p_partkey",
            "s_total",
            F.explode(
                F.array(*[F.lit(i) for i in range(_PS_PER_PART)])
            ).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (
                    F.col("p_partkey")
                    + F.expr("p_partkey div s_total")
                    + F.col("i") * F.expr("s_total div 4")
                )
                % F.col("s_total")
            ).alias("ps_suppkey"),
        )
    )
    hashed = base.withColumn(
        "h",
        F.md5(
            F.concat_ws(
                ":",
                F.lit("ps"),
                F.col("ps_partkey").cast("string"),
                F.col("ps_suppkey").cast("string"),
            )
        ),
    )
    return hashed.select(
        "ps_partkey",
        "ps_suppkey",
        (F.expr(_v6("instr", 1)) % 9999 + 1).cast("int").alias("ps_availqty"),
        (F.expr(_v6("instr", 7)) % 99900 + 100)
        .cast("bigint")
        .alias("ps_supplycost_cents"),
    )


_SQL_PARTSUPP_CTE = f"""
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_total FROM supplier),
    ps_base AS (
        SELECT p.p_partkey AS ps_partkey,
               (p.p_partkey + p.p_partkey // sc.s_total
                + i.i * (sc.s_total // 4)) % sc.s_total AS ps_suppkey
        FROM part p
        CROSS JOIN sc
        CROSS JOIN (SELECT unnest(generate_series(0, {_PS_PER_PART - 1}))
                    AS i) i
    ),
    ps_hash AS (
        SELECT ps_partkey, ps_suppkey,
               md5('ps:' || CAST(ps_partkey AS VARCHAR) || ':'
                   || CAST(ps_suppkey AS VARCHAR)) AS h
        FROM ps_base
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST({_v6('strpos', 1)} % 9999 + 1 AS INT) AS ps_availqty,
               CAST({_v6('strpos', 7)} % 99900 + 100 AS BIGINT)
                   AS ps_supplycost_cents
        FROM ps_hash
    )"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_SIZE_LO, _Q2_SIZE_HI = 10, 25
_Q2_TYPE = "STANDARD"


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_SQL_PARTSUPP_CTE},
    eligible AS (
        SELECT ps.ps_partkey, ps.ps_supplycost_cents,
               s.s_name, s.s_acctbal, n.n_name
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = '{_Q2_REGION}'
    ),
    mins AS (
        SELECT ps_partkey, MIN(ps_supplycost_cents) AS min_cents
        FROM eligible GROUP BY 1
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           CAST(e.ps_supplycost_cents AS DOUBLE) / 100 AS ps_supplycost
    FROM part p
    JOIN eligible e ON e.ps_partkey = p.p_partkey
    JOIN mins m ON m.ps_partkey = p.p_partkey
               AND e.ps_supplycost_cents = m.min_cents
    WHERE p.p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
      AND p.p_type = '{_Q2_TYPE}'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every {_Q2_TYPE} part in the size band [{_Q2_SIZE_LO}, {_Q2_SIZE_HI}], the
    {_Q2_REGION}-region supplier(s) offering the minimum supply cost —
    the correlated-scalar-subquery decorrelated into a per-part MIN +
    equality re-join (exact on integer cents, so ties resolve
    identically in both engines). Output fully tie-broken and limited.

    Scale: dimensions (supplier/nation/region) broadcast; the per-part
    MIN is one map-side-combinable aggregate over the region-filtered
    partsupp; the re-join is a partkey equi-join. No correlated
    subquery execution per part.
    """
    ps = build_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == _Q2_REGION)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(_Q2_SIZE_LO, _Q2_SIZE_HI)
        & (F.col("p_type") == _Q2_TYPE)
    )
    eligible = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name")
    )
    mins = eligible.groupBy(
        F.col("ps_partkey").alias("mins_partkey")
    ).agg(F.min("ps_supplycost_cents").alias("min_cents"))
    return (
        p.join(eligible, p.p_partkey == eligible.ps_partkey)
        .join(
            mins,
            (F.col("p_partkey") == F.col("mins_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("ps_supplycost_cents").cast("double") / 100).alias(
                "ps_supplycost"
            ),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit by nation and year
# ---------------------------------------------------------------------------

_Q9_WORD = "red"


@query(
    "q9_product_type_profit",
    oracle=f"""
    WITH {_SQL_PARTSUPP_CTE},
    profit AS (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - CAST(ps.ps_supplycost_cents AS DOUBLE) / 100 * l.l_quantity
                   AS amount
        FROM lineitem l
        JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                        AND ps.ps_suppkey = l.l_suppkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%{_Q9_WORD}%'
    )
    SELECT nation, o_year, {sql_dsum("amount", "sum_profit")}
    FROM profit GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (discounted revenue − supply cost) on
    '%{_Q9_WORD}%' parts, grouped by supplier nation and order year.
    The per-row amount is one fixed IEEE expression (cents→double ÷100
    before the quantity multiply, written identically in both engines);
    the group sum rides the decimal accumulator.

    Scale: lineitem joins partsupp on its (partkey, suppkey) composite —
    a shuffle equi-join on the fact table's own keys; part/supplier/
    nation/orders broadcast or shuffle by size; a bounded
    nation × year rollup.
    """
    ps = build_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(f"%{_Q9_WORD}%")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost_cents"
    ).cast("double") / 100 * F.col("l_quantity")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock in a nation
# ---------------------------------------------------------------------------

_Q11_NATION = "NATION_7"
_Q11_FRAC_DEN = 200  # keep parts holding > 1/200 of the nation's stock value


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_SQL_PARTSUPP_CTE},
    nat_ps AS (
        SELECT ps.ps_partkey,
               ps.ps_supplycost_cents * ps.ps_availqty AS v
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = '{_Q11_NATION}'
    ),
    per_part AS (
        SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
        FROM nat_ps GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(v) AS BIGINT) AS total_cents FROM nat_ps)
    SELECT pp.ps_partkey,
           CAST(pp.value_cents AS DOUBLE) / 100 AS stock_value
    FROM per_part pp CROSS JOIN tot t
    WHERE pp.value_cents * {_Q11_FRAC_DEN} > t.total_cents
    ORDER BY pp.value_cents DESC, pp.ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value (cost × availqty) at
    {_Q11_NATION} suppliers exceeds 1/{_Q11_FRAC_DEN} of the nation's
    total — the HAVING-against-global-scalar pattern. The threshold is
    the integer cross-multiplication value·{_Q11_FRAC_DEN} > total on
    exact cents, so boundary parts classify identically in both engines.

    Scale: nation-filtered partsupp aggregates map-side; the grand total
    is a 1-row broadcast; no window, no sort until the bounded output.
    """
    ps = build_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == _Q11_NATION
    )
    nat_ps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("v").cast("bigint").alias("value_cents")
    )
    tot = nat_ps.agg(F.sum("v").cast("bigint").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * _Q11_FRAC_DEN > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100).alias("stock_value"),
        )
        .orderBy(F.desc(F.col("stock_value")), "ps_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship counts
# ---------------------------------------------------------------------------

_Q16_BRAND = "Brand#5"
_Q16_TYPE = "PROMO"
_Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


@query(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {_SQL_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> '{_Q16_BRAND}'
      AND p.p_type <> '{_Q16_TYPE}'
      AND p.p_size IN {_Q16_SIZES}
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    over filtered parts, excluding blacklisted suppliers (negative
    account balance stands in for dbgen's '%Customer%Complaints%'
    comment filter) — the NOT-IN becomes a broadcast anti-join.

    Scale: the anti-join list is |bad suppliers| (broadcast-tiny); the
    distinct count shuffles once on the bounded (brand, type, size) grid.
    """
    ps = build_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != _Q16_BRAND)
        & (F.col("p_type") != _Q16_TYPE)
        & (F.col("p_size").isin(*_Q16_SIZES))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess stock of promoted parts
# ---------------------------------------------------------------------------

_Q20_PREFIX = "red"
_Q20_LO = "1996-01-01 00:00:00"
_Q20_HI = "1997-01-01 00:00:00"
_Q20_REGION = "ASIA"


@query(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_SQL_PARTSUPP_CTE},
    red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_PREFIX}%'
    ),
    shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q20_LO}'
          AND l_shipdate <  TIMESTAMP '{_Q20_HI}'
          AND l_partkey IN (SELECT p_partkey FROM red_parts)
        GROUP BY 1, 2
    ),
    excess AS (
        SELECT DISTINCT ps.ps_suppkey
        FROM partsupp ps
        JOIN red_parts rp ON rp.p_partkey = ps.ps_partkey
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        WHERE CAST(ps.ps_availqty * 2 AS DECIMAL(38,6)) > sh.qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM excess e
    JOIN supplier s ON s.s_suppkey = e.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{_Q20_REGION}'
    ORDER BY s.s_suppkey
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: {_Q20_REGION} suppliers holding more than half a
    year's shipped quantity of '{_Q20_PREFIX}%' parts — the nested
    IN/scalar-subquery chain decorrelated into aggregate + equi-joins.
    The half threshold is the cross-multiplication 2·availqty > Σqty on
    exact decimal, no 0.5 float anywhere.

    Scale: the shipped rollup shuffles lineitem once on its own
    (partkey, suppkey); red_parts broadcasts into both the rollup filter
    and the partsupp join; DISTINCT is |suppliers|-bounded.
    """
    ps = build_partsupp(spark, sf_dir)
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"{_Q20_PREFIX}%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp"))
        )
        .join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("qty"))
    )
    excess = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey, "left_semi")
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(
            (F.col("ps_availqty") * 2).cast("decimal(38,6)") > F.col("qty")
        )
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q20_REGION
    )
    return (
        excess.join(F.broadcast(s), excess.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )
