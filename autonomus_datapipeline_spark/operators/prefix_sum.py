"""Distributed prefix-sum / global-rank / NTILE — no single-partition windows.

An unpartitioned ``Window.orderBy(...)`` is the one construct in Spark that
silently serializes: ``WindowExec`` requires *all* rows in ONE partition
("No Partition Defined for Window operation" warning), so a global cumsum /
row_number / NTILE over a data-proportional input becomes a single-task sort
at 100 TB no matter how many executors exist.

This module provides the scale-correct plan shape for global ordered
statistics — the classic two-pass distributed prefix-sum:

1. bucket every row by an ORDER-PRESERVING coarse key (equi-width over the
   [min, max] of the leading sort key — deterministic, data-derived, never a
   physical partition id, so the result cannot depend on AQE or partition
   placement);
2. run the window PARTITIONED BY bucket (parallel local sorts — this is the
   heavy, data-proportional stage, and it scales with the bucket count);
3. roll up per-bucket totals (map-side combinable, ≤ n_buckets+2 rows),
   turn them into exclusive prefix offsets with a bucket² triangular join
   (bounded by the constant bucket count, not by data — and window-free, so
   nothing in this module ever hits WindowExec's unpartitioned path), and
   broadcast the offsets back.

``cum_global(row) = cum_local(row) + offset(bucket(row))`` — exactly the
answer of the single-partition window, at shuffle-parallel cost.

Equal leading keys always land in the same bucket (the bucket is a pure
function of the key value), so ties are ordered entirely inside one local
window by the caller's tiebreak columns — callers must pass a TOTAL order,
same as they already must for deterministic results anywhere in this repo.

``tests/test_plans.py`` enforces the invariant registry-wide: every Window
node in every registered query's optimized plan must carry a non-empty
partition spec.

Reference parity note: the reference engine is single-node and has no
distributed-window analog; this module exists so the same statistics keep
their semantics at cluster scale.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

# r15 (verdict item 4): clamp-rate instrumentation for `bounds=`. The
# envelope constants encode the data generator's spec; on a deployment with
# a different key distribution every row clamps into one edge bucket and
# the prefix-sum silently goes serial. Setting SPARK_GRAFT_PS_CLAMP_AUDIT=1
# makes every bounds= call run ONE extra scalar-aggregate job counting
# out-of-envelope keys, log a warning when any clamp, and record the counts
# in LAST_CLAMP_AUDIT (test/debug hook). Default path: env unset → no extra
# job, the query plan is byte-identical (the audit never touches the plan).
CLAMP_AUDIT_ENV = "SPARK_GRAFT_PS_CLAMP_AUDIT"
LAST_CLAMP_AUDIT: dict | None = None


def _audit_clamp_rate(df: DataFrame, bucket_key: Column, lo: float, hi: float) -> None:
    global LAST_CLAMP_AUDIT
    if os.environ.get(CLAMP_AUDIT_ENV, "") != "1":
        return
    kd = bucket_key.try_cast("double")
    row = df.agg(
        F.sum(
            F.when(kd.isNotNull() & ((kd < F.lit(lo)) | (kd > F.lit(hi))), 1).otherwise(0)
        ).alias("n_clamped"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    LAST_CLAMP_AUDIT = {
        "n_clamped": int(row["n_clamped"] or 0),
        "n_rows": int(row["n_rows"]),
        "bounds": (lo, hi),
    }
    if LAST_CLAMP_AUDIT["n_clamped"]:
        _LOG.warning(
            "prefix_sum bounds=(%s, %s): %d of %d rows fall outside the "
            "envelope and clamp into the edge buckets — values are "
            "unaffected but load balance degrades; re-derive the envelope "
            "constants for this deployment's data.",
            lo,
            hi,
            LAST_CLAMP_AUDIT["n_clamped"],
            LAST_CLAMP_AUDIT["n_rows"],
        )

__all__ = [
    "string_order_proxy",
    "with_global_running",
    "with_global_ntile",
    "with_global_shift",
    "ranked_head",
]

_DEFAULT_BUCKETS = 64


def string_order_proxy(col: Column | str) -> Column:
    """Order-preserving bigint proxy of a string's first 7 bytes.

    Spark compares strings by UTF-8 binary order, so the zero-right-padded
    first 7 bytes read as a big-endian integer sort exactly like the string
    prefix does. Use as ``bucket_by`` when a global order leads with a
    string column: the proxy is coarse (ties beyond 7 bytes share a
    bucket), which only affects load balance — the in-bucket window still
    orders by the true string.
    """
    c = F.col(col) if isinstance(col, str) else col
    hx = F.rpad(F.substring(F.hex(F.encode(c, "UTF-8")), 1, 14), 14, "0")
    return F.conv(hx, 16, 10).cast("bigint")


def _auto_bucket_key(df: DataFrame, lead_col: str) -> Column:
    """Order-preserving numeric bucket proxy for the leading sort column.

    Numeric/date-like leading keys bucket on their own value; date,
    timestamp, and string columns need a monotone numeric proxy because
    ``CAST(x AS DOUBLE)`` is NULL for them and a NULL bucket key would
    collapse everything into one bucket (correct but serial).
    """
    c = F.col(lead_col)
    try:
        dtype = dict(df.dtypes)[lead_col.split(".")[-1]]
    except KeyError:
        return c
    if dtype == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date"))
    if dtype.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp"))
    if dtype == "string":
        return string_order_proxy(c)
    return c


def _direction(col_name: str, asc: bool) -> Column:
    c = F.col(col_name)
    return c.asc() if asc else c.desc()


def _bucket_expr(
    key: Column, mn: Column, mx: Column, n_buckets: int, asc: bool
) -> Column:
    """Order-preserving equi-width bucket of ``key`` in [mn, mx].

    Monotone non-decreasing along the GLOBAL sort direction: ascending keys
    map to ascending buckets; for descending sorts the bucket is mirrored so
    bucket order is always ascending. NULL keys follow Spark's defaults
    (ASC → NULLS FIRST → bucket -1; DESC → NULLS LAST → bucket n_buckets).

    Bucketing happens in double — monotone (numeric→double casts preserve
    ≤), and only LOAD BALANCE depends on it, never values: rows sharing a
    bucket are fully ordered by the caller's total order inside the local
    window. Non-numeric keys (double cast → NULL) degrade to one bucket —
    correct, just serial; callers with string leading keys should pre-map
    them to a numeric proxy if the input is data-proportional.
    """
    kd = key.try_cast("double")
    span = mx - mn
    # Clamp BOTH edges: keys above mx pin to the top bucket (F.least) and
    # keys below mn pin to bucket 0 (F.greatest). The lower clamp matters
    # for caller-supplied bounds= — an unclamped key < mn would floor() to
    # a negative bucket that collides with the ASC NULL bucket (-1) / the
    # -2 non-castable sentinel (and, DESC-mirrored, lands past the NULL
    # bucket), corrupting offsets. With data-derived min/max the clamp is
    # a no-op.
    # Clamp in BIGINT (floor's native type) BEFORE the int cast: a key far
    # outside caller-supplied bounds= floors to a bucket index beyond int
    # range, and under ANSI the unclamped cast would ERROR instead of
    # clamping (F.floor(double) itself saturates silently at ±2^63, so the
    # bigint clamp is safe at any distance). In-range keys are unaffected.
    raw = F.when(span <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.lit(n_buckets - 1).cast("bigint"),
                F.floor((kd - mn) / span * n_buckets),
            ),
        ).cast("int")
    )
    if not asc:
        raw = F.lit(n_buckets - 1) - raw
    null_bucket = F.lit(-1 if asc else n_buckets)
    # The trailing -2 coalesce catches non-castable keys (see docstring); it
    # also keeps the bucket join null-safe.
    return F.coalesce(F.when(key.isNull(), null_bucket).otherwise(raw), F.lit(-2))


def with_global_running(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    *,
    sums: dict[str, Column | str] | None = None,
    row_number: str | None = None,
    totals: dict[str, Column | str] | None = None,
    total_count: str | None = None,
    maxes_excl: dict[str, Column | str] | None = None,
    bucket_by: Column | None = None,
    n_buckets: int = _DEFAULT_BUCKETS,
    partition_by: Sequence[str] = (),
    materialize: str | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Attach global running statistics over a total order, distributedly.

    ``order``
        total order as (column_name, ascending) pairs; the FIRST column
        should be numeric/date-castable (it drives bucketing) and the full
        list must break all ties (determinism contract, same as any ranked
        query in this repo).
    ``sums``
        out_name → expression: inclusive running sum over the order
        (``SUM(e) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``).
    ``row_number``
        name for the global 1-based row number, if wanted.
    ``totals``
        out_name → expression: grand total of the expression attached as a
        constant column (``SUM(e) OVER ()``).
    ``total_count``
        name for the grand row count constant column (``COUNT(*) OVER ()``).
    ``maxes_excl``
        out_name → expression: running max over STRICTLY PRECEDING rows
        (``MAX(e) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND
        1 PRECEDING)`` — NULL for the globally first row), the skyline /
        strict-improvement primitive.
    ``bucket_by``
        optional explicit bucket key — any expression monotone along the
        order's leading column (e.g. :func:`string_order_proxy` for string
        leading keys). Defaults to the leading order column itself, with
        automatic order-preserving numeric proxies for date (days since
        epoch), timestamp (epoch MICROseconds — so any ``bounds=`` for a
        timestamp key must be µs-scaled, not seconds or days), and string
        (first-7-byte integer) leading columns — those types don't cast to
        double, and without a proxy every row would fall into one bucket.
    ``partition_by``
        optional LOW-CARDINALITY partition columns: every statistic
        restarts per partition (``… OVER (PARTITION BY p ORDER BY …)``)
        while the heavy sort stays bucket-parallel WITHIN each partition —
        the fix for the "5 segments = 5 tasks" shape where a partitioned
        window's per-partition content is data-proportional. Min/max,
        offsets, and grand totals become per-partition tables joined back
        by broadcast, so the partition count must stay broadcast-small
        (≲10⁵ partitions × buckets); HIGH-cardinality keys (per-user
        windows) don't need this operator — they are already parallel.
        Partition keys must be non-null (the re-attach joins are plain
        equi-joins).
    ``materialize``
        ``"cache"`` or ``"localCheckpoint"``: persist the bucketed input
        before the window/rollup branches. The operator reads its input
        from several subplans and column pruning specializes each branch,
        so ReuseExchange cannot dedup them — an EXPENSIVE input (corpus
        scan + regex, a pair join) would re-execute ~4×. Opt in when the
        input costs more to recompute than to persist; small aggregate
        inputs should stay lazy (default). NOTE: ``"cache"`` pins an
        InMemoryRelation for the SESSION — the operator returns a lazy
        DataFrame, so it cannot know when to unpersist. One-job-per-
        application runs (production batch) and clearCache-per-run
        harnesses (bench.py) are unaffected; a long-lived interactive
        session re-invoking a caching caller should clear the cache
        between runs or prefer ``"localCheckpoint"`` (blocks are freed by
        GC once the result DataFrame is dropped).
    ``bounds``
        optional (min, max) of the bucket key as plain floats, when the
        caller already knows them (a bounded score, a fixed calendar
        range…). Skips the min/max scan of the input entirely — one fewer
        pass + one fewer broadcast-build job. The bounds need not be
        tight: looser bounds only skew load balance, never values
        (out-of-range keys clamp into the edge buckets). Composes with
        ``partition_by`` (r15): the literal envelope replaces the
        per-partition min/max groupBy AND its broadcast join-back — the
        envelope is a property of the key, identical in every partition.
        Set SPARK_GRAFT_PS_CLAMP_AUDIT=1 to count out-of-envelope rows
        per call (debug; one extra job, default path untouched).

    Plan shape: one scalar min/max aggregate of the leading key (broadcast;
    skipped entirely when ``bounds`` is supplied), one hash shuffle on the
    bucket for the local windows, one tiny map-side-combinable per-bucket
    rollup whose per-partition re-aggregate also yields the grand totals
    (the input is never re-scanned for ``totals``/``total_count``), a
    constant-size (≤ n_buckets²) triangular offset join, and ONE broadcast
    join back carrying offsets and grand totals together. Nothing
    single-partition is data-proportional, and no window anywhere has an
    empty partition spec.
    """
    sums = dict(sums or {})
    totals = dict(totals or {})
    maxes_excl = dict(maxes_excl or {})
    lead_col, lead_asc = order[0]

    def _as_col(e: Column | str) -> Column:
        return F.col(e) if isinstance(e, str) else e

    # Internal accumulators: the running sums, plus an implicit row counter
    # when a row number or grand count is requested.
    acc: dict[str, Column] = {f"_ps_s_{k}": _as_col(v) for k, v in sums.items()}
    if row_number is not None or total_count is not None:
        acc["_ps_s__rn"] = F.lit(1)
    mx_acc: dict[str, Column] = {f"_ps_m_{k}": _as_col(v) for k, v in maxes_excl.items()}
    tot_acc: dict[str, Column] = {f"_ps_t_{k}": _as_col(v) for k, v in totals.items()}

    pb = list(partition_by)
    bucket_key = (
        bucket_by
        if bucket_by is not None
        else _auto_bucket_key(df, lead_col)
    )
    if bounds is not None:
        # r15: bounds= now composes with partition_by. The envelope is a
        # property of the KEY (generator spec), not of any partition, and
        # bucketing is a pure per-row function of the key value — so the
        # same literal envelope applies in every partition, replacing the
        # per-partition min/max groupBy + broadcast join-back with zero
        # extra passes. Values unaffected for the same reason as the
        # unpartitioned case: buckets steer load balance only; each
        # (partition, bucket) window orders by the caller's total order and
        # out-of-range keys clamp into edge buckets.
        _audit_clamp_rate(df, bucket_key, float(bounds[0]), float(bounds[1]))
        mn_c = F.lit(float(bounds[0]))
        mx_c = F.lit(float(bounds[1]))
        d = df.withColumn(
            "_psb", _bucket_expr(bucket_key, mn_c, mx_c, n_buckets, lead_asc)
        )
    else:
        mn_agg = [
            F.min(bucket_key.try_cast("double")).alias("_ps_mn"),
            F.max(bucket_key.try_cast("double")).alias("_ps_mx"),
        ]
        if pb:
            mnmx = df.groupBy(*pb).agg(*mn_agg)
            ren = mnmx.select(
                *[F.col(c).alias(f"_psp_{c}") for c in pb], "_ps_mn", "_ps_mx"
            )
            cond = None
            for c in pb:
                eq = F.col(c).eqNullSafe(F.col(f"_psp_{c}"))
                cond = eq if cond is None else (cond & eq)
            d = df.join(F.broadcast(ren), cond).drop(*[f"_psp_{c}" for c in pb])
        else:
            mnmx = df.agg(*mn_agg)
            d = df.crossJoin(F.broadcast(mnmx))
        d = d.withColumn(
            "_psb",
            _bucket_expr(
                bucket_key, F.col("_ps_mn"), F.col("_ps_mx"), n_buckets, lead_asc
            ),
        ).drop("_ps_mn", "_ps_mx")
    if materialize == "cache":
        d = d.cache()
    elif materialize == "localCheckpoint":
        d = d.localCheckpoint()
    elif materialize is not None:
        raise ValueError(f"unknown materialize mode: {materialize!r}")

    order_cols = [_direction(c, a) for c, a in order]
    w_local = (
        Window.partitionBy(*pb, "_psb")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_local_excl = (
        Window.partitionBy(*pb, "_psb")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.select(
        "*",
        *[F.sum(e).over(w_local).alias(name) for name, e in acc.items()],
        *[F.max(e).over(w_local_excl).alias(name) for name, e in mx_acc.items()],
    )

    # ONE per-(partition, bucket) rollup carries everything downstream:
    # running-sum totals, exclusive-max totals, AND the grand-total
    # expressions (sums re-aggregate over buckets, so the input is never
    # re-scanned for `totals`/`total_count`). Offsets come from a
    # triangular self-join WITHIN each partition (partitions × bucket²
    # pairs — constant per partition), window-free by construction: a
    # lower bucket's FULL max is a valid exclusive-max contribution for
    # every row of a higher bucket of the same partition. Offsets and
    # grand totals ride back on a SINGLE broadcast join.
    bucket_tot = d.groupBy(*pb, "_psb").agg(
        *[F.sum(e).alias(name) for name, e in acc.items()],
        *[F.max(e).alias(name) for name, e in mx_acc.items()],
        *[F.sum(e).alias(name) for name, e in tot_acc.items()],
    )
    if acc or mx_acc:
        lower = bucket_tot.select(
            *[F.col(c).alias(f"_pso_{c}") for c in pb],
            F.col("_psb").alias("_psb_lo"),
            *[F.col(name).alias(f"_lo{name}") for name in acc],
            *[F.col(name).alias(f"_lo{name}") for name in mx_acc],
        )
        lo_cond = F.col("_psb_lo") < F.col("_psb")
        pb_eq = None
        for c in pb:
            eq = F.col(c).eqNullSafe(F.col(f"_pso_{c}"))
            pb_eq = eq if pb_eq is None else (pb_eq & eq)
        offsets = (
            bucket_tot.select(*pb, "_psb")
            .join(
                F.broadcast(lower),
                lo_cond if pb_eq is None else (pb_eq & lo_cond),
                "left",
            )
            .groupBy(*pb, "_psb")
            .agg(
                # Offsets stay NULL when no lower bucket holds a non-null
                # value (first bucket, or all-NULL predecessors): the
                # combine below needs to distinguish "no preceding values"
                # (window SUM → NULL) from "preceding values sum to 0".
                *[F.sum(f"_lo{name}").alias(f"_off{name}") for name in acc],
                *[F.max(f"_lo{name}").alias(f"_off{name}") for name in mx_acc],
            )
        )
    else:
        offsets = bucket_tot.select(*pb, "_psb")
    if acc or tot_acc:
        grand = bucket_tot.groupBy(*pb).agg(
            *[F.sum(name).alias(f"_tot{name}") for name in acc],
            *[F.sum(name).alias(f"_tot{name}") for name in tot_acc],
        )
        if pb:
            offsets = offsets.join(grand, pb)
        else:
            offsets = offsets.crossJoin(grand)
    out = local.join(F.broadcast(offsets), [*pb, "_psb"])
    for k in sums:
        # Window-SUM semantics: NULL iff the whole inclusive frame (lower
        # buckets + local prefix) holds no non-null value; otherwise the
        # sum of the non-nulls. A bare local+offset would go NULL whenever
        # the local bucket prefix is all-NULL (e.g. trailing NULL-key rows
        # under DESC), dropping the lower-bucket contribution.
        lo_c, off_c = F.col(f"_ps_s_{k}"), F.col(f"_off_ps_s_{k}")
        out = out.withColumn(
            k,
            F.when(
                lo_c.isNotNull() | off_c.isNotNull(),
                F.coalesce(lo_c, F.lit(0)) + F.coalesce(off_c, F.lit(0)),
            ),
        )
    if row_number is not None:
        out = out.withColumn(
            row_number,
            (
                F.col("_ps_s__rn")
                + F.coalesce(F.col("_off_ps_s__rn"), F.lit(0))
            ).cast("bigint"),
        )
    for k in maxes_excl:
        # greatest() skips NULLs: first row of a bucket has NULL local excl
        # max and inherits the lower-bucket offset; the global first row
        # (NULL both sides) stays NULL — exactly the unpartitioned frame.
        out = out.withColumn(
            k, F.greatest(F.col(f"_ps_m_{k}"), F.col(f"_off_ps_m_{k}"))
        )
    for k in totals:
        out = out.withColumn(k, F.col(f"_tot_ps_t_{k}"))
    if total_count is not None:
        out = out.withColumn(total_count, F.col("_tot_ps_s__rn").cast("bigint"))
    drop = ["_psb"] + [
        c
        for c in out.columns
        if c.startswith("_ps_s_")
        or c.startswith("_ps_t_")
        or c.startswith("_ps_m_")
        or c.startswith("_off_ps_")
        or c.startswith("_tot_ps_")
    ]
    return out.drop(*drop)


def with_global_ntile(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    n_tiles: int,
    out: str,
    *,
    n_buckets: int = _DEFAULT_BUCKETS,
    partition_by: Sequence[str] = (),
    materialize: str | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Global ``NTILE(n_tiles)`` over a total order, distributedly.
    ``bounds`` as in :func:`with_global_running` (skips the min/max scan
    when the caller knows the bucket-key range; composes with
    ``partition_by``).

    Reproduces Spark/DuckDB NTILE semantics exactly from the global row
    number rn and total count n: with q = n div k and r = n mod k, the
    first r tiles hold q+1 rows and the rest hold q —
    ``rn ≤ r(q+1) → ⌈rn/(q+1)⌉``, else ``r + ⌈(rn − r(q+1))/q⌉``. All
    arithmetic is integer (``div``), so tile boundaries are
    engine-identical.
    """
    d = with_global_running(
        df,
        order,
        row_number="_psrn",
        total_count="_psn",
        n_buckets=n_buckets,
        partition_by=partition_by,
        materialize=materialize,
        bounds=bounds,
    )
    k = int(n_tiles)
    tile = F.expr(
        f"CASE WHEN _psrn <= (_psn % {k}) * (_psn div {k} + 1) "
        f"THEN (_psrn - 1) div (_psn div {k} + 1) + 1 "
        f"ELSE (_psn % {k}) "
        f"   + (_psrn - (_psn % {k}) * (_psn div {k} + 1) - 1) "
        f"     div (_psn div {k}) + 1 END"
    )
    return d.withColumn(out, tile.cast("int")).drop("_psrn", "_psn")


def with_global_shift(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    shifts: dict[str, tuple[str, int]],
    *,
    bucket_by: Column | None = None,
    n_buckets: int = _DEFAULT_BUCKETS,
    partition_by: Sequence[str] = (),
    materialize: str | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Global ``LAG``/``LEAD`` over a total order, distributedly.
    ``bounds`` as in :func:`with_global_running` (skips the min/max scan
    when the caller knows the bucket-key range; composes with
    ``partition_by``).

    ``shifts``: out_name → (source_column, offset); offset +1 is
    ``LAG(src, 1)`` (value one row earlier in the order), -1 is
    ``LEAD(src, 1)``. Missing neighbors are NULL, matching the window
    functions. Implemented as global row number + an equi-join on shifted
    row numbers — ROWS semantics preserved even over sparse grids (a
    ``key - 1`` join would silently switch to RANGE semantics).

    All shifts of one source column ride ONE union + ONE aggregate + ONE
    left join keyed on the target row number (k chained joins would give
    each join the previous join's whole tree as input — plan size and
    recompute grow with k; measured 8.3 s → sub-second on the ±3-frame
    peak-detection query). ``F.max`` inside the pivot is identity: each
    (target_rn, out_name) pair occurs at most once.

    ``materialize="cache"`` persists the row-numbered input once: the
    shift legs AND the final join each read it, so without the cache the
    whole prefix-sum machinery re-executes per branch (~3×). Opt in when
    the input is bounded (a calendar grid, a yearly rollup) or costs more
    to recompute than to persist.
    """
    pb = list(partition_by)
    d = with_global_running(
        df,
        order,
        row_number="_ps_shift_rn",
        bucket_by=bucket_by,
        n_buckets=n_buckets,
        partition_by=pb,
        bounds=bounds,
    )
    if materialize == "cache":
        d = d.cache()
    elif materialize is not None:
        raise ValueError(f"unknown materialize mode: {materialize!r}")
    by_src: dict[str, list[tuple[str, int]]] = {}
    for out, (src, off) in shifts.items():
        by_src.setdefault(src, []).append((out, int(off)))
    for src, items in by_src.items():
        # The row number restarts per partition, so the join (and the
        # shifted-target key) carries the partition columns too.
        legs = [
            d.select(
                *[F.col(c).alias(f"_psg_{c}") for c in pb],
                (F.col("_ps_shift_rn") + off).alias("_ps_t"),
                F.lit(out).alias("_ps_o"),
                F.col(src).alias("_ps_v"),
            )
            for out, off in items
        ]
        u = legs[0]
        for leg in legs[1:]:
            u = u.unionByName(leg)
        agg = u.groupBy(*[f"_psg_{c}" for c in pb], "_ps_t").agg(
            *[
                F.max(F.when(F.col("_ps_o") == out, F.col("_ps_v"))).alias(out)
                for out, _ in items
            ]
        )
        cond = d["_ps_shift_rn"] == agg["_ps_t"]
        for c in pb:
            cond = cond & (d[c] == agg[f"_psg_{c}"])
        d = d.join(agg, cond, "left").drop(
            "_ps_t", *[f"_psg_{c}" for c in pb]
        )
    return d.drop("_ps_shift_rn")


def ranked_head(
    df: DataFrame,
    order: Sequence[tuple[str, bool]],
    k: int,
    rank_name: str,
    *,
    cast: str = "int",
) -> DataFrame:
    """Top-k with a 1-based rank column — the distributed replacement for
    ``row_number().over(Window.orderBy(...)) ... WHERE rk <= k``.

    ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject (per-partition
    heaps + one k-row merge — fully distributed, no global sort, no
    single-partition window); the rank is then re-derived over the ≤ k
    surviving rows. ``order`` must be a total order for the rank to be
    deterministic.

    Because the head is bounded at ≤ k rows, the rank does NOT need the
    full bucketed prefix-sum machinery (its min/max scan + bucket shuffle
    + offset rollup are pure constant overhead here). Instead the rank is
    a broadcast triangular count: ``rank(r) = 1 + |{s : s <_order r}|``,
    one ≤ k-row broadcast self-join + one aggregate over ≤ k² pairs —
    window-free, so the registry-wide no-unpartitioned-window invariant
    holds by construction (a literal-partitioned window would NOT work:
    Catalyst folds foldable partition expressions away, leaving an empty
    partition spec). The strictly-before predicate replays Spark's exact
    ordering semantics per direction: ASC → NULLS FIRST, DESC → NULLS
    LAST, ties broken by the next order column via null-safe equality.

    The ≤ k-row head is ``cache()``-ed: both the broadcast side and the
    probe side read it, and without the cache an expensive upstream (an
    iterative HITS loop, a corpus scan) would re-execute. Caching ≤ k rows
    is free at any scale, stays lazy, and keeps the upstream plan visible
    inside the InMemoryRelation for the plan regression tests.
    """
    top = (
        df.orderBy(*[_direction(c, a) for c, a in order])
        .limit(int(k))
        .cache()
    )
    ocols = [c for c, _ in order]
    earlier = top.select(
        *[F.col(c).alias(f"_rh_{c}") for c in ocols],
        F.lit(1).alias("_rh_one"),
    )
    # s strictly-before r, lexicographically over the order columns.
    before = None
    ties = None
    for c, asc in order:
        s, r = F.col(f"_rh_{c}"), F.col(f"_rhk_{c}")
        if asc:  # ASC NULLS FIRST
            strict = (s.isNull() & r.isNotNull()) | (s < r)
        else:  # DESC NULLS LAST
            strict = (r.isNull() & s.isNotNull()) | (s > r)
        clause = strict if ties is None else (ties & strict)
        before = clause if before is None else (before | clause)
        eq = s.eqNullSafe(r)
        ties = eq if ties is None else (ties & eq)
    # _rh_one is never NULL on the broadcast side, so the count sees every
    # matched earlier row even when order columns themselves hold NULLs
    # (counting an order column would silently skip NULLS FIRST rows).
    # The rank stays under the _rh prefix until after the broadcast join:
    # every column a ranked_head broadcast emits carries the prefix, which
    # is how the plan tests tell these ≤ k-row internals from a genuinely
    # unbounded broadcast.
    ranks = (
        top.select(*[F.col(c).alias(f"_rhk_{c}") for c in ocols])
        .join(F.broadcast(earlier), before, "left")
        .groupBy(*[f"_rhk_{c}" for c in ocols])
        .agg((F.count("_rh_one") + 1).cast(cast).alias("_rh_rank"))
    )
    on = None
    for c in ocols:
        eq = F.col(c).eqNullSafe(F.col(f"_rhk_{c}"))
        on = eq if on is None else (on & eq)
    return (
        top.join(F.broadcast(ranks), on)
        .withColumnRenamed("_rh_rank", rank_name)
        .drop(*[f"_rhk_{c}" for c in ocols])
    )
