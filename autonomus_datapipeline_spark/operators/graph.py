"""Iterative graph operators: connected components for dedup clustering.

Near-dup pair lists (from MinHash-LSH / SimHash / cosine) are edges; the
dedup *clusters* are the connected components — every doc in a component is
a duplicate of the others, and the canonical representative is the minimum
id. This is the standard last step of corpus dedup at scale.

Implementation: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC'14) driven by a driver-side loop — the
legitimate pattern for iterative algorithms on Spark (each round is two
distributed join+agg passes; only the 1-row convergence check touches the
driver). Worst-case O(log² n) rounds with O(log n) observed even on
adversarial chain graphs — unlike plain min-label propagation, whose round
count tracks the graph DIAMETER (a 10^6-long near-dup chain would need 10^6
rounds; star contraction needs ~20). Lineage is truncated per round with
localCheckpoint so plans don't grow unboundedly.
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
    rounds_out: list | None = None,
) -> DataFrame:
    """(node, component_id) for every node in ``edges``; component_id is the
    minimum node id reachable. Deterministic at convergence.

    ``n_partitions`` sizes the per-round shuffles — candidate-pair graphs are
    orders of magnitude smaller than the corpus, and an iterative loop pays
    the per-task overhead every round, so default small and scale up only
    with the edge count. ``rounds_out``, if given, receives the number of
    contraction rounds executed (tests assert the O(log n) bound on chains).
    """
    if n_partitions is None:
        n_partitions = 8
    # Materialize the symmetric edge list FIRST, at the session's full
    # shuffle width — its lineage is the whole upstream candidate-generation
    # chain (shingles → signatures → LSH join), which is corpus-scale work.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    # Scope the shuffle width to the loop (saved/restored, never a lasting
    # session mutation) — per-task overhead × rounds dominates at the
    # session's corpus-sized width.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        return _star_loop(sym, max_iter, rounds_out)
    finally:
        if prev_parts is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _star_loop(sym: DataFrame, max_iter: int, rounds_out: list | None) -> DataFrame:
    """Alternating large-star / small-star contraction over a materialized
    symmetric edge list. Edges are kept canonical (u > v, pointing down);
    the fixed point is a star per component centered at its minimum id."""
    # sym is distinct and checkpointed; the canonical projection is a
    # narrow filter over it — no extra distinct (a>b preserves sym's
    # distinctness) and no extra checkpoint (recompute is one cheap
    # filter of the materialized RDD).
    E = sym.filter(F.col("a") > F.col("b")).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    prev_count = E.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # --- large-star: every node u links its LARGER neighbors to
        # m = min(Γ(u) ∪ {u}) — long "up" chains collapse toward minima.
        sym_e = E.select("u", "v").union(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nbr_min = sym_e.groupBy("u").agg(F.min("v").alias("mv"))
        # No distinct here: duplicate rows don't disturb the downstream
        # min-aggregates, the final new_e distinct dedupes, and skipping it
        # removes a full (u, v) shuffle per round — the two consumers below
        # then share one shuffle-by-u via ReusedExchange.
        large = (
            sym_e.join(nbr_min, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mv")).alias("v"),
            )
        )
        # --- small-star: every node u links itself and its smaller
        # neighbors to m = min(Γ⁻(u)) — shallow trees flatten into stars.
        # large's output is already canonical (v = min(u', mv) < u-alias),
        # so Γ⁻(u) is just the v column grouped by u.
        down_min = large.groupBy("u").agg(F.min("v").alias("mv"))
        with_min = large.join(down_min, "u")
        new_e = (
            with_min.select("u", F.col("mv").alias("v"))
            .union(
                with_min.where(F.col("v") != F.col("mv")).select(
                    F.col("v").alias("u"), F.col("mv").alias("v")
                )
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # Lazy checkpoint: the count below is the first action, so it
        # materializes the checkpoint as a side effect — one job per round.
        new_count = new_e.count()
        if new_count == prev_count:
            # Counts alone can tie while the sets differ — confirm with an
            # anti join (cheap: only runs in the final round or on ties).
            if new_e.join(E, ["u", "v"], "left_anti").limit(1).count() == 0:
                E = new_e
                break
        E, prev_count = new_e, new_count
    if rounds_out is not None:
        rounds_out.append(rounds)
    # At the fixed point E is a function (one star edge per non-center
    # node); the groupBy is a no-op there and only guards a max_iter cutoff.
    star = E.groupBy("u").agg(F.min("v").alias("v"))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    return nodes.join(star, nodes.node == star.u, "left").select(
        "node", F.coalesce(star.v, nodes.node).alias("component_id")
    )
