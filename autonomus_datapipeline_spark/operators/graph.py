"""Iterative graph operators: connected components for dedup clustering.

Near-dup pair lists (from MinHash-LSH / SimHash / cosine) are edges; the
dedup *clusters* are the connected components — every doc in a component is
a duplicate of the others, and the canonical representative is the minimum
id. This is the standard last step of corpus dedup at scale.

Implementation: join-based minimum-label propagation driven by a driver-side
loop — the legitimate pattern for iterative algorithms on Spark (each
iteration is a distributed join+agg; only the 1-row convergence check
touches the driver). Converges in O(graph diameter) rounds; the
alternating-star optimization (O(log n) rounds) is the drop-in upgrade for
adversarial chain graphs at extreme scale. Lineage is truncated per round
with localCheckpoint so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keep_representatives(
    df: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Apply dedup clustering: drop every row whose id belongs to a
    component but is not its canonical (minimum-id) representative.
    One broadcast-able anti join — components are near-dup clusters, tiny
    next to the corpus."""
    non_reps = components.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(non_reps, id_col, "left_anti")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    n_partitions: int | None = None,
) -> DataFrame:
    """(node, component_id) for every node in ``edges``; component_id is the
    minimum node id reachable. Deterministic at convergence.

    ``n_partitions`` sizes the per-round shuffles — candidate-pair graphs are
    orders of magnitude smaller than the corpus, and an iterative loop pays
    the per-task overhead every round, so default small and scale up only
    with the edge count.
    """
    if n_partitions is None:
        n_partitions = 8
    # The candidate-pair graph is orders of magnitude smaller than the
    # corpus, but every per-round join would still inherit the session's
    # corpus-sized spark.sql.shuffle.partitions — per-task overhead × rounds
    # dominates at that width. Scope the conf to the loop (saved/restored,
    # never a lasting session mutation).
    # Materialize the symmetric edge list FIRST, at the session's full
    # shuffle width — its lineage is the whole upstream candidate-generation
    # chain (shingles → signatures → LSH join), which is corpus-scale work.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition(n_partitions, "a")
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        return _cc_loop(sym, max_iter)
    finally:
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _cc_loop(sym: DataFrame, max_iter: int) -> DataFrame:
    """Label-propagation loop over a materialized symmetric edge list."""
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1-hop: pull the minimum label from graph neighbors
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        hop = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_changed"),
            )
        )
        # pointer jumping: follow my label's label (path compression) —
        # halves remaining path lengths, so total rounds are O(log diameter)
        # instead of O(diameter)
        parent = hop.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            hop.join(parent, hop.label == parent.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
                (
                    F.col("_changed") | (F.col("plabel") < F.col("label"))
                ).alias("_changed"),
            )
        )
        # Lazy checkpoint: the convergence count below is the first action,
        # so it materializes the checkpoint as a side effect — one job per
        # round instead of two (eager checkpoint + count). The count is NOT
        # limit(1): it must touch every partition so the checkpoint is fully
        # materialized, otherwise lineage chains across rounds.
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component_id"))
