"""Change-data-capture style merge operators.

The reference's incremental story is append-only (Kafka offset batches);
real pipelines also need *upsert* semantics: a base table merged with an
updates stream, latest version per key winning. Spark-first formulation:
union + one ranking window — a single shuffle on the key, no join, and it
degrades gracefully when the same key appears many times in one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_latest_wins(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Merge ``updates`` into ``base``: per key, keep the row with the
    greatest (order_cols, is_update) — updates beat base on ties.

    Deterministic: order_cols + the update flag form a total order per key
    (caller ensures order_cols are unique per key per side, e.g. a version
    or event timestamp + a sequence id).
    """
    b = base.withColumn("_is_update", F.lit(0))
    u = updates.withColumn("_is_update", F.lit(1))
    merged = b.unionByName(u, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(
        *[F.desc(c) for c in order_cols], F.desc("_is_update")
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )
