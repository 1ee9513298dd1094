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
serializes only its own partition (the usual keyed-window skew caveat).

``salt_buckets=N`` is the skew escape hatch: the time axis is cut into N
monotone ranges (bounds from one broadcast scalar aggregate over the left
side), the running-last window runs per (key, bucket) so a hot key's rows
spread across N partitions, and matches that cross a bucket boundary are
recovered by carrying ONE summary row per (key, bucket) — the latest
(backward) / earliest (forward) right payload, a map-side-combinable
``max_by`` — through a per-key prefix window over at most 2N rows per key
and seeding it into the next bucket. Value-identical to the unsalted plan
(bucketing a monotone axis preserves the as-of order) — PROVIDED both ts
columns are non-null (a NULL ts has no bucket; see ``asof_join``); the
hot key's serial cost drops from O(rows) to O(rows/N + N). Whether a key
is hot enough to warrant salting is a one-aggregate question —
``asof_skew_report`` answers it from a sample before you commit to the
knob.

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
    salt_buckets: int | None = None,
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

    ``salt_buckets``: opt-in hot-key mitigation — split the time axis
    into this many ranges so one dominant key no longer serializes its
    whole partition (see module docstring). Value-identical to the
    default plan; worth it only when a single key holds a large share of
    the rows. Requires the ts columns to cast to double (numerics and
    timestamps both do) and — PRECONDITION — to be NON-NULL on both
    sides: a NULL ts has no position on the time axis, so the salted
    plan cannot bucket it the way the unsalted window orders it (nulls
    first ascending), and the two plans would silently disagree on
    null-ts rows. Filter or impute null timestamps upstream before
    opting into salting; the default (unsalted) path is unaffected.
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
    backward = direction == "backward"
    if salt_buckets and int(salt_buckets) > 1:
        union, part_cols = _salted_union(
            l_rows, r_rows, keys, int(salt_buckets), backward
        )
    else:
        union, part_cols = l_rows.unionByName(r_rows), keys
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        union
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


def asof_skew_report(
    df: DataFrame,
    on: str | list[str],
    top_n: int = 5,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """One-aggregate skew probe for the ``salt_buckets`` decision: the
    top-``top_n`` join keys of ``df`` by row count, each with its share of
    the total. A pipeline author runs this on the larger as-of side before
    opting into salting instead of guessing — a top key holding more than
    a few percent of all rows will serialize its shuffle partition in the
    unsalted plan (the per-key window is sequential within a key), and
    ``salt_buckets`` ≈ the executor-core count is the usual response.

    Returns columns: the key column(s), ``n_rows`` (count within the
    probed sample), ``share`` (fraction of all sampled rows), ``n_keys``
    (distinct keys seen — context for whether the top share is skew or
    just few keys). Deterministic order: descending ``n_rows``, then the
    key columns as tiebreak.

    ``sample_fraction`` bounds probe cost on very large inputs (shares
    estimate the population within the usual Bernoulli-sampling error;
    counts are sample counts). Cost envelope: one scan + one
    map-side-combinable groupBy(key) + a scalar aggregate broadcast back
    — no window, no collect; ``top_n`` rows out.
    """
    keys = [on] if isinstance(on, str) else list(on)
    s = (
        df.sample(fraction=sample_fraction, seed=seed)
        if sample_fraction is not None
        else df
    )
    counts = s.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    totals = F.broadcast(
        counts.agg(
            F.sum("n_rows").alias("_tot"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        )
    )
    return (
        counts.crossJoin(totals)
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("_tot")).alias("share"),
            "n_keys",
        )
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(int(top_n))
    )


def _salted_union(
    l_rows: DataFrame,
    r_rows: DataFrame,
    keys: list[str],
    n_buckets: int,
    backward: bool,
) -> tuple[DataFrame, list[str]]:
    """Tag every tagged-side row with a monotone time bucket ``_b`` and
    add per-(key, bucket) seed rows that carry the best right payload
    across bucket boundaries, so the caller's running-last window can
    partition by (key, bucket) instead of key alone.

    Monotone bucketing (equal ts → equal bucket; larger ts → equal or
    larger bucket) is what makes this value-identical to the unsalted
    window: a backward match either lives in the left row's own bucket
    (found by the in-bucket window, rights still sorting before lefts at
    equal ts) or in a strictly earlier bucket (its bucket's best-right
    summary is carried forward as a seed whose ts is strictly below the
    bucket's lefts, so it sorts first and is overridden by any in-bucket
    right). Forward mirrors with min_by and a descending carry.
    """
    pos = F.col("_ats").cast("double")
    bounds = F.broadcast(
        l_rows.agg(F.min(pos).alias("_lo"), F.max(pos).alias("_hi"))
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
    bucket = (
        F.when(
            F.col("_lo").isNull() | (F.col("_hi") <= F.col("_lo")),
            F.lit(0),
        )
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((pos - F.col("_lo")) / width).cast("int"),
                ),
            )
        )
        .cast("int")
    )
    tag = lambda df: df.crossJoin(bounds).withColumn("_b", bucket).drop(
        "_lo", "_hi"
    )  # noqa: E731
    lt, rt = tag(l_rows), tag(r_rows)

    # One summary row per (key, bucket) of rights: the payload a later
    # (backward) / earlier (forward) bucket would need. max_by/min_by is
    # map-side combinable; right rows are unique per (key, ts) so the
    # winner is unique.
    best = F.struct(F.col("_ats").alias("_ats"), F.col("_r").alias("_r"))
    pick = F.max_by(best, "_ats") if backward else F.min_by(best, "_ats")
    bsum = rt.groupBy(*keys, "_b").agg(pick.alias("_best"))
    best_type = bsum.schema["_best"].dataType

    # Mini prefix pass over ≤ 2·n_buckets rows per key: at each LEFT
    # bucket marker (sorting before the same bucket's summary) the
    # running last summary is the best right from strictly earlier
    # (backward) / later (forward) buckets.
    lb = lt.select(*keys, "_b").distinct()
    marks = bsum.select(
        *keys, "_b", F.lit(1).alias("_mtag"), F.col("_best").alias("_best")
    ).unionByName(
        lb.select(
            *keys,
            "_b",
            F.lit(0).alias("_mtag"),
            F.lit(None).cast(best_type).alias("_best"),
        )
    )
    morder = [
        F.col("_b").asc() if backward else F.col("_b").desc(),
        F.col("_mtag").asc(),
    ]
    mw = (
        Window.partitionBy(*keys)
        .orderBy(*morder)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    l_struct_type = l_rows.schema["_l"].dataType
    seeds = (
        marks.withColumn("_carry", F.last("_best", ignorenulls=True).over(mw))
        .where((F.col("_mtag") == 0) & F.col("_carry").isNotNull())
        .select(
            *keys,
            F.col("_carry._ats").alias("_ats"),
            F.lit(0).alias("_is_left"),
            F.lit(None).cast(l_struct_type).alias("_l"),
            F.col("_carry._r").alias("_r"),
            F.col("_b"),
        )
    )
    return lt.unionByName(rt).unionByName(seeds), [*keys, "_b"]
