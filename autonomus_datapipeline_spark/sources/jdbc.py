"""JDBC source/sink.

The reference *declared* a database source but never implemented it
(reference: backend/app/models/models.py:64-66, routers/schemas.py:54-55) and
exported Gold to Postgres via toPandas + psycopg2 COPY on the driver
(reference: gold_service.py:168-254) — a single-node bottleneck. Spark's JDBC
data source does both natively and distributes the write across executors;
mode mapping preserves the reference's replace/append/fail semantics
(gold_service.py:200-217).

Verified LIVE against embedded Apache Derby (the Derby jars ship inside the
Spark distribution): tests/test_sources.py round-trips replace/append/fail
modes, a 4-way partitioned parallel read, and a pushed-down aggregation
query through this exact code path. Production Postgres differs only in URL
and driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MODE_MAP = {"replace": "overwrite", "append": "append", "fail": "errorifexists"}


def jdbc_reader_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Build spark.read.format('jdbc') options.

    ``partition_column`` + bounds + num_partitions split the read into
    parallel range queries — required for any table that shouldn't be pulled
    through one connection (the 100 TB posture).
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts = {"url": url}
    if table:
        opts["dbtable"] = table
    if query:
        opts["query"] = query
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    if partition_column:
        if query is not None:
            raise ValueError("partitioned reads require dbtable, not query")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_reader_options(**kwargs)).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """Distributed JDBC write with the reference's replace/append/fail modes."""
    if mode not in MODE_MAP:
        raise ValueError(f"mode must be one of {sorted(MODE_MAP)}")
    opts = {"url": url, "dbtable": table, "batchsize": str(batch_size)}
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    df.write.format("jdbc").options(**opts).mode(MODE_MAP[mode]).save()
