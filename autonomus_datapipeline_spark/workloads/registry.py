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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }
