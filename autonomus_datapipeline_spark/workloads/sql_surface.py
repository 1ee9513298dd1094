"""SQL-text and user-function (UDAF) query surfaces.

SURVEY §2.D lists SQL parsing and UDAF/UDTF registration among the
capabilities the reference declared but never built (its user_functions
table is schema-only, reference db/init.sql:209-220). Here both are
first-class:

- ``sql_text_revenue`` feeds raw ANSI SQL through ``spark.sql`` over
  registered views — Catalyst parses, optimizes and broadcasts exactly as
  for the DataFrame API (same plan), which is the point: SQL is a frontend,
  not a separate engine.
- ``udaf_group_median`` routes a user-registered aggregate through the
  sandbox + test-case gate of functions/udf_registry, materialized as a
  grouped-aggregate pandas UDF (Arrow-batched per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.functions.udf_registry import UdfRegistry
from autonomus_datapipeline_spark.workloads.registry import (
    load_table,
    query,
    sql_dsum,
)

# ---------------------------------------------------------------------------
# Raw-SQL surface: one text, two engines
# ---------------------------------------------------------------------------

# Portable ANSI SQL: runs unmodified on Spark (over temp views) and DuckDB
# (over the driver's registered views). The decimal-snapped sum keeps the
# double aggregate bit-identical across engines (see workloads/registry.py).
_REVENUE_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice", "total_revenue")}
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
"""


@query("sql_text_revenue", oracle=_REVENUE_SQL)
def sql_text_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text entry point: the same ANSI string is handed verbatim to
    ``spark.sql`` and to the DuckDB oracle. Catalyst plans it identically
    to the DataFrame form (filter pushdown onto the customer scan,
    broadcast hash join, partial aggregation) — demonstrating that the
    engine's query language IS Spark SQL, with no reference-style
    template/codegen layer in between."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_REVENUE_SQL)


# ---------------------------------------------------------------------------
# UDAF through the user-function registry
# ---------------------------------------------------------------------------

_MEDIAN_CODE = """
def lower_median(v):
    s = sorted(list(v))
    return float(s[(len(s) - 1) // 2])
"""

_MEDIAN_CASES = [
    {"input": [[3.0, 1.0, 2.0]], "expected_output": 2.0},
    {"input": [[4.0, 1.0, 3.0, 2.0]], "expected_output": 2.0},
    {"input": [[7.5]], "expected_output": 7.5},
]


@query(
    "udaf_group_median",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS median_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group lower median computed by a USER-registered aggregate: the
    function text goes through the sandbox compile + declared-test-case gate
    (reference's user_functions contract), then runs as a grouped-aggregate
    pandas UDF — one Arrow batch per group, scalar out. Lower-median (the
    element at index (n-1)//2 of the sorted group) is an order-free exact
    pick, so it is engine-deterministic and equals DuckDB's
    ``quantile_disc(0.5)``. Spark's native ``percentile_approx`` covers the
    approximate path (see quantity_percentiles); this query exists to prove
    the registered-UDAF path end-to-end."""
    reg = UdfRegistry()
    reg.register("lower_median", _MEDIAN_CODE, "double", test_cases=_MEDIAN_CASES)
    med = reg.as_grouped_agg_udf("lower_median")
    li = load_table(spark, sf_dir, "lineitem")
    # Spark disallows mixing a grouped-agg pandas UDF with native aggregates
    # in one agg() — the native count runs in its own (codegen'd) aggregation
    # and joins back on the tiny group key set.
    med_df = li.groupBy("l_returnflag").agg(med("l_quantity").alias("median_qty"))
    cnt_df = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return med_df.join(cnt_df, "l_returnflag")


# ---------------------------------------------------------------------------
# Raw-SQL surface #2: CTE + window function, one text, two engines
# ---------------------------------------------------------------------------

_WINDOW_SQL = """
WITH ranked AS (
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
           ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
           ) AS rk
    FROM customer
)
SELECT c_mktsegment, rk, c_custkey, c_name, c_acctbal
FROM ranked
WHERE rk <= 3
"""


@query("sql_window_top_customers", oracle=_WINDOW_SQL)
def sql_window_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface, modern-SQL edition: a CTE feeding a ranking window
    with a deterministic (balance DESC, custkey) tiebreak, handed VERBATIM
    to both ``spark.sql`` and the DuckDB oracle — no dialect translation
    layer. Catalyst compiles the rank-filter into a WindowGroupLimit
    (per-partition top-k during the sort, never materializing full ranks),
    the per-segment sorts run independently after one shuffle on the
    segment key, and the rk ≤ 3 output is segment-count-bounded."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_WINDOW_SQL)
