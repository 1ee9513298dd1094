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
rounds; star contraction needs ~20). Lineage is truncated per round via
:func:`tuning.truncate_lineage` so plans don't grow unboundedly —
localCheckpoint on local mode, or a RELIABLE checkpoint when the session
sets ``spark.graft.reliableCheckpoint=true`` (executor-loss-safe for
production clusters with node churn; local checkpoint blocks die with
their executor mid-loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from autonomus_datapipeline_spark import tuning


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
    assume_symmetric: bool = False,
) -> DataFrame:
    """(node, component_id) for every node in ``edges``; component_id is the
    minimum node id reachable. Deterministic at convergence.

    ``n_partitions`` sizes the per-round shuffles — candidate-pair graphs are
    orders of magnitude smaller than the corpus, and an iterative loop pays
    the per-task overhead every round. When None (the default) the width is
    derived from the MEASURED edge count (known for free: the symmetric edge
    list is counted at materialization anyway), so a 2 000-edge sf0.1 graph
    runs 1-partition rounds while a 100 TB candidate graph gets the session's
    full width from the same call site. ``rounds_out``, if given, receives
    the number of contraction rounds executed (tests assert the O(log n)
    bound on chains).
    """
    # Materialize the symmetric edge list FIRST, at the session's full
    # shuffle width — its lineage is the whole upstream candidate-generation
    # chain (shingles → signatures → LSH join), which is corpus-scale work.
    # ``assume_symmetric``: the caller certifies ``edges`` is ALREADY
    # symmetric, distinct, and materialized (e.g. lsh_bucket_stars
    # symmetric=True fuses that into its own checkpoint job), so the
    # symmetrize-distinct-checkpoint pass here would be a pure re-copy.
    if assume_symmetric:
        sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        sym = tuning.truncate_lineage(
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .distinct(),
            eager=True,
        )
    n_edges = sym.count()  # reads the checkpoint, also warms it
    spark = edges.sparkSession
    if n_partitions is None:
        n_partitions = tuning.width_for_rows(spark, n_edges)
    # Scope the shuffle width + AQE byte-coalescing to the loop
    # (saved/restored, never a lasting session mutation) — per-task
    # overhead × rounds dominates at the session's corpus-sized width.
    # AQE is off inside the loop: the edge count is already measured and
    # the width derived from it, so runtime re-planning buys nothing and
    # its per-shuffle-stage materialization doubles the per-round wall.
    # The RESULT is materialized eagerly inside the scope: the final
    # star/nodes assembly would otherwise be planned lazily at the
    # CONSUMER's action, outside the scope, at corpus width — and every
    # registered consumer reads the full component table anyway.
    with tuning.scoped_shuffle(spark, n_partitions, aqe=False):
        return tuning.truncate_lineage(
            _star_loop(sym, n_edges, max_iter, rounds_out), eager=True
        )


# One large-star + small-star contraction round over a view named E(u, v)
# of canonical (u > v) edges. Expressed as ONE spark.sql() text rather than
# ~15 incremental DataFrame calls: plan construction through py4j measured
# 0.23-0.32 s PER ROUND (pure driver-side overhead, no job) vs ~0.1 s for
# the equivalent SQL — in an iterative loop on a small contracted edge list
# the py4j tax dominates the actual distributed work. No distinct on sym_e:
# duplicate rows don't disturb the min-aggregates and the final DISTINCT
# dedupes; large's output is already canonical (v = min(u', mv) < u-alias),
# so small-star's Γ⁻(u) is just the v column grouped by u.
_ROUND_SQL = """
WITH sym_e AS (SELECT u, v FROM E UNION ALL SELECT v AS u, u AS v FROM E),
nbr_min AS (SELECT u, MIN(v) AS mv FROM sym_e GROUP BY u),
large AS (
  SELECT s.v AS u, LEAST(s.u, n.mv) AS v
  FROM sym_e s JOIN nbr_min n ON n.u = s.u WHERE s.v > s.u
),
down_min AS (SELECT u, MIN(v) AS mv FROM large GROUP BY u),
with_min AS (SELECT l.u, l.v, d.mv FROM large l JOIN down_min d ON d.u = l.u)
SELECT DISTINCT u, v FROM (
  SELECT u, mv AS v FROM with_min
  UNION ALL
  SELECT v AS u, mv AS v FROM with_min WHERE v <> mv
)
"""


def _star_loop(
    sym: DataFrame, n_sym: int, max_iter: int, rounds_out: list | None
) -> DataFrame:
    """Alternating large-star / small-star contraction over a materialized
    symmetric edge list. Edges are kept canonical (u > v, pointing down);
    the fixed point is a star per component centered at its minimum id."""
    # sym is distinct and checkpointed; the canonical projection is a
    # narrow filter over it — no extra distinct (a>b preserves sym's
    # distinctness) and no extra checkpoint (recompute is one cheap
    # filter of the materialized RDD). Its count is exactly half the
    # symmetric count (each undirected edge appears in both directions),
    # so no extra count job is needed to seed convergence tracking.
    spark = sym.sparkSession
    E = sym.filter(F.col("a") > F.col("b")).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    prev_count = n_sym // 2
    rounds = 0
    view = f"_cc_star_E_{id(sym)}"
    round_sql = _ROUND_SQL.replace("FROM E", f"FROM {view}")
    try:
        for _ in range(max_iter):
            rounds += 1
            E.createOrReplaceTempView(view)
            new_e = tuning.truncate_lineage(spark.sql(round_sql), eager=False)
            # TWO cheap jobs per round, no standalone confirmation pass:
            # the anti-join diff (new \ old) is the first action, so it
            # materializes the lazy checkpoint as a side effect AND
            # decides set growth; the |new| count afterwards only reads
            # the already-materialized checkpoint. Set equality is
            # |new \ old| = 0 together with |new| = |old| (new ⊆ old with
            # equal cardinality). Counts alone can tie while the sets
            # differ — observed on LSH star graphs.
            n_fresh = new_e.join(E, ["u", "v"], "left_anti").limit(1).count()
            new_count = new_e.count()
            if n_fresh == 0 and new_count == prev_count:
                E = new_e
                break
            E, prev_count = new_e, new_count
    finally:
        spark.catalog.dropTempView(view)
    if rounds_out is not None:
        rounds_out.append(rounds)
    # At the fixed point E is a function (one star edge per non-center
    # node); the groupBy is a no-op there and only guards a max_iter cutoff.
    star = E.groupBy("u").agg(F.min("v").alias("v"))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    return nodes.join(star, nodes.node == star.u, "left").select(
        "node", F.coalesce(star.v, nodes.node).alias("component_id")
    )
