"""Watermarked streaming aggregations (tumbling + session windows).

Capability extension over the reference (SURVEY.md §2.D lists
sliding/session windows + watermarks as absent). The same expressions run in
batch — `tumbling_window_1h` / `session_windows_30m` in the workload registry
are the batch twins these functions are oracle-checked through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) windowed counts with a
    watermark bounding state: late rows beyond the watermark are dropped and
    window state is evicted — mandatory for unbounded streams at scale."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), key_col, "n_events"
        )
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose key was already seen within
    the watermark horizon (dropDuplicatesWithinWatermark). State is bounded
    by the watermark — the at-scale contract for dedup-on-ingest (a key
    recurring after the horizon is a new row by definition)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    lower: str = "interval 0 seconds",
    upper: str = "interval 10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: right rows within
    [left_ts − upper … left_ts − lower] of a matching key. Both sides carry
    watermarks so the state store evicts rows once they can no longer match
    — unbounded-state stream joins are never acceptable at scale."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(upper))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") - F.expr(lower))
    )
    return lw.join(rw, cond)


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (broadcast) dimension — the streaming twin of the reference's
    routes.csv lookup joins (ai_service.py:44-46). The dim is re-resolved
    per batch, so slowly-changing dimensions pick up updates without
    restarting the query."""
    return stream.join(F.broadcast(dim), on, how)


def sessionized_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (F.session_window) — state closes
    when the watermark passes session end + gap."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
