"""Distributed as-of (point-in-time) join.

Spark has no native as-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics): attach to every left row the SINGLE right row with the greatest
``right_ts <= left_ts`` within the same key (backward; smallest
``right_ts >= left_ts`` forward), optionally within a tolerance. It is the
staple of point-in-time feature joins (trade→quote, event→last-state,
SCD2 dimension lookup) — and the naive formulations are scale-traps: a
range join explodes to every-prior-row pairs before a per-key argmax, and
a correlated subquery re-scans the right side per left row.

This implementation is the shuffle-minimal composition over DataFrame ops
(the standard MapReduce point-in-time recipe):

1. tag both sides and UNION them on (key, ts, side);
2. ONE window per key ordered by (ts, side) — right rows sort before left
   rows at equal ts, so the match is inclusive exactly like DuckDB's
   ``l.ts >= r.ts``;
3. ``last(<right payload>, ignorenulls=True)`` over the running frame
   carries the most recent right row forward to each left row;
4. keep left rows, apply the tolerance as a post-filter (null-out the
   match like a left join, never drop the left row).

Cost: one shuffle of |left| + |right| rows on the key, one per-partition
sort — the same envelope as any keyed window; no pair fan-out, no
re-scan. At 100 TB both sides stream through a single exchange; a hot key
serializes only its own partition (the usual keyed-window skew caveat —
pre-salt by coarse time bucket if one key dominates).

Reference parity note: the reference engine has no as-of operator; this is
one of the gap operators SURVEY.md §2.D demands as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join. Returns every ``left`` row with every ``right``
    column attached (null when no match) plus ``_asof_gap`` = the
    ``|left_ts - right_ts|`` distance for matched rows (null otherwise),
    in the same units as the ts columns.

    ``left_ts`` / ``right_ts`` may be any mutually comparable orderable
    type (timestamps, or pre-computed epoch integers for engine-exact
    arithmetic). ``right`` must be unique per (key, right_ts) — dedupe
    with an argmax upstream; this operator will not pick a deterministic
    winner among perfect ties. Column names must be disjoint apart from
    the join keys (rename upstream). ``tolerance`` null-outs matches
    farther than the given distance (same units as the ts columns).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    if right_ts not in payload_cols:
        raise ValueError(f"right_ts {right_ts!r} must be a right column")
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right columns clash with left: {sorted(clash)}")

    rp = F.struct(*[F.col(c) for c in payload_cols])
    rp_type = right.select(rp.alias("_p")).schema["_p"].dataType
    left_cols = [c for c in left.columns]
    l_rows = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(rp_type).alias("_r"),
    )
    r_rows = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*left_cols).alias("_s")).schema["_s"].dataType)
        .alias("_l"),
        rp.alias("_r"),
    )
    # backward: ascending ts, rights (0) before lefts (1) at equal ts →
    # the running last-right is the greatest right_ts <= left_ts.
    # forward: DESCENDING ts traversal, so the running last-right is the
    # smallest right_ts >= left_ts.
    order = (
        [F.col("_ats").asc(), F.col("_is_left").asc()]
        if direction == "backward"
        else [F.col("_ats").desc(), F.col("_is_left").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_rows.unionByName(r_rows)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )
    gap = (
        F.col("_ats") - F.col(f"_m.{right_ts}")
        if direction == "backward"
        else F.col(f"_m.{right_ts}") - F.col("_ats")
    )
    in_tol = (
        F.lit(True) if tolerance is None else gap <= F.lit(tolerance)
    )
    keep = F.col("_m").isNotNull() & in_tol
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[
            F.when(keep, F.col(f"_m.{c}")).alias(c)
            for c in payload_cols
        ],
        F.when(keep, gap).alias("_asof_gap"),
    )
