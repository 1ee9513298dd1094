"""Shared co-purchase edge-list builder for the graph workload family.

pagerank_copurchase, label_propagation_communities, lpa_modularity_score and
kcore_peeling_summary all operate on the same projected part-part graph
(parts co-purchased within an order). Each query builds it fresh — a
registered query must be self-contained — but they share THIS code path so
the construction is written (and optimized) once.

Construction shape, chosen by measurement at sf0.1:

- a per-(order, part) pre-distinct feeds the self-join: it dedupes the
  ~1e-4 reordered-part rows AND hash-clusters the join input, measured
  ~1 s faster end-to-end than joining the raw fact (AB_r11.json 2×2);
- the within-order pair fan-out joins on ``src < dst`` so only HALF the
  ordered pairs flow through the distinct (the expensive shuffle — pair
  volume is Σ C(lines_per_order, 2), ~12× the order count);
- the symmetric closure is a per-row ``explode`` of both directions AFTER
  the distinct — narrow, one pass, no second shuffle and no re-run of the
  distinct aggregate;
- degrees (when requested) come from ONE count-window over the symmetric
  list instead of a groupBy + join-back — same values (deg(src) = number
  of distinct neighbors), one shuffle fewer;
- the result is localCheckpoint()ed: every consumer is iterative and would
  otherwise re-execute the fan-out once per round/consumer (the r7
  pagerank lesson).

At 100 TB the same shape holds: everything is hash-shuffle relational
algebra, the fan-out is linear in Σ k², and the checkpoint becomes a
persisted table."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collections.abc import Callable

from autonomus_datapipeline_spark.workloads.registry import load_table

# Production form. tools/ab_bench.py flips this to False to re-measure the
# r10 no-pre-distinct variant; values are identical either way (the
# post-join (src, dst) distinct dedupes exactly). Only consulted by the
# legacy "join" builder (below).
_EDGE_PRE_DISTINCT = True

# r14 A/B switch: "collect" = per-order collect_set + array pair expansion
# (2 exchanges, no join); "join" = the r11 self-join form (the distinct's
# exchange + 2 join re-keys + SortMergeJoin). Same edge set either way —
# proven by exceptAll in both directions at sf0.001/sf0.01 and by the
# registry oracle gate on every consumer.
#
# Default stays "join": two interleaved canary-bracketed A/Bs
# (AB_r14_edges.json, 3+4 pairs) measured the collect form NET SLOWER
# over the six consumer queries (sum of per-query minima 27.9 s join vs
# 31.7 s collect; medians agree) despite its fewer exchanges — the
# collect build concentrates the C(k,2) pair fan-out into the handful of
# AQE-coalesced post-groupBy partitions (2-4 tasks on this 32-core box:
# the fan-out stage is CPU-dense but its INPUT shuffle is only a few MB,
# so size-based coalescing starves it), while the join form spreads pair
# generation across the SortMergeJoin's wider partitioning. The guide
# §1.1 gotcha in the flesh: the "ideal" fewer-shuffle plan loses to the
# measured one. Kept selectable for re-measurement on real clusters
# (where the fan-out shuffle is GBs and AQE would never coalesce below
# core count) via SPARK_GRAFT_EDGE_BUILD=collect.
_EDGE_BUILD = os.environ.get("SPARK_GRAFT_EDGE_BUILD", "join")


def copurchase_edges(
    spark: SparkSession,
    sf_dir: str,
    with_degrees: bool = False,
    load: Callable[[SparkSession, str, str], DataFrame] | None = None,
    build: str | None = None,
) -> DataFrame:
    """Symmetric distinct part-part co-purchase edge list (src, dst[, deg]),
    eagerly materialized. ``deg`` is the degree of ``src`` (= distinct
    neighbor count; the graph is symmetric).

    ``load`` lets a caller thread its OWN module's ``load_table`` binding
    through (tests monkeypatch that binding to inject synthetic graphs —
    resolving it here would silently bypass the patch).

    ``build`` pins the construction form for ONE call site ("join" /
    "collect"); None falls back to the module default (_EDGE_BUILD). r15:
    kcore_peeling_summary and pagerank_copurchase pin "collect" — across
    four independent interleaved A/Bs (AB_r14_edges.json, AB_r15_edges.json,
    AB_r15_edges_kcore_pr.json) those two consumers are consistently
    20-25% / 10% faster on the collect build while lpa/label_prop/bfs
    consistently prefer "join"; the per-query pattern is stable under
    different box weather, so the choice is pinned per consumer rather
    than globally."""
    li = (load or load_table)(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey")
    if (build or _EDGE_BUILD) == "collect":
        # r14 (guide §2.4, remove shuffles outright): fold each order's
        # distinct parts into ONE sorted array (collect_set dedups, so no
        # pre-distinct pass), then emit the x < y half-pairs with a narrow
        # array transform. One hash exchange on l_orderkey replaces the
        # old shape's distinct exchange on (l_orderkey, l_partkey) PLUS
        # both join re-keys on l_orderkey PLUS the SortMergeJoin itself:
        # 3 Exchanges -> 2 for the whole builder (plan in
        # plans/r14/pagerank_copurchase_*.txt), and the fact table's
        # bytes cross the wire once instead of three times. Skew-safe at
        # any scale: an order has at most a handful of parts (TPC-H <= 7),
        # so arrays are tiny and the fan-out stays Sigma C(k,2).
        # r15 re-measured the verdict-item-2 "starvation fix" (an explicit
        # width repartition between the groupBy agg and the explode, so the
        # C(k,2) fan-out cannot run in the 2-4 AQE-coalesced post-groupBy
        # tasks) and REVERTED it. Findings, in order (artifacts committed):
        # 1. repartition(n, l_orderkey) is ELIDED by EnsureRequirements —
        #    the agg output is already hashpartitioning(l_orderkey, n), so
        #    the plan silently reverts to the coalescible exchange
        #    (discovered via the builder plan dump; an A/B of this variant
        #    measures plain collect).
        # 2. The effective form — round-robin repartition(n),
        #    REPARTITION_BY_NUM, never elided/coalesced — made collect
        #    SLOWER or tied at every consumer (AB_r15_edges_fix2.json:
        #    summed min 31.3 vs join 27.3; AB_r15_edges_kcore_pr_fix2.json:
        #    kcore 2.84 vs 2.65, pagerank 3.50 vs 3.53): the extra
        #    exchange + sort-before-repartition over the grouped rows
        #    costs more than the coalesced fan-out at this scale, where
        #    C(k,2) ≤ 21 per order keeps per-task fan-out work tiny.
        # At 100 TB the repartition is ALSO unnecessary: the fan-out's
        # input shuffle is GBs there and AQE never coalesces below core
        # count (r14 note). So the lean 2-exchange collect build stays
        # repartition-free at every scale.
        half = (
            op.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
            .where(F.size("ps") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ps, (x, i) -> "
                        "transform(slice(ps, i + 2, size(ps) - i - 1), "
                        "y -> struct(x as src, y as dst))))"
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .distinct()
        )
    else:
        # Per-(order, part) pre-distinct RESTORED (r11): r10 dropped it on
        # the "one fewer fact shuffle" argument, but the interleaved
        # canary-normalized 2×2 A/B (tools/ab_bench.py, AB_r11.json)
        # measured the drop as the real cause of the co-purchase family's
        # r10 bench regression — full LPA 5.05 s without the pre-distinct
        # vs 4.08 s with it at stable load. The pre-distinct's aggregate
        # shrinks and ALREADY HASH-CLUSTERS the self-join input, which
        # more than pays for its own exchange on this join's key
        # distribution.
        if _EDGE_PRE_DISTINCT:
            op = op.distinct()
        a = op.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
        )
        b = op.select(
            F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("dst")
        )
        half = (
            a.join(b, (a.ok == b.ok2) & (F.col("src") < F.col("dst")))
            .select("src", "dst")
            .distinct()
        )
    edges = half.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
            )
        ).alias("e")
    ).select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
    if with_degrees:
        edges = edges.withColumn(
            "deg", F.count(F.lit(1)).over(Window.partitionBy("src")).cast("bigint")
        )
    return edges.localCheckpoint()
