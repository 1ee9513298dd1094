"""Storage-maintenance operators: zone-map file skipping and small-file
compaction.

The reference engine writes plain parquet and rescans it wholesale (its
pipeline layer has no file-statistics or compaction surface); at 100 TB both
operations are mandatory housekeeping:

- **Zone maps** (per-file min/max statistics) let a query skip files whose
  value range cannot match its predicate — the manifest-level analog of
  parquet row-group statistics, and the mechanism behind Delta/Iceberg data
  skipping. The manifest is metadata (one row per file, ~10^5 rows at
  100 TB), so a driver-side prune over it is bounded and is exactly how
  table formats plan scans; the data itself never leaves executors.
- **Compaction** bounds the small-file problem: streaming/incremental
  ingestion produces files far below the optimal scan size, and scan tasks,
  footer reads, and driver file listings all scale with file COUNT, not
  bytes. Rewriting to ~target-size files restores full-speed scans.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.fsutil import resolve_fs


def file_zone_map(df: DataFrame, stat_col: str) -> DataFrame:
    """Per-file min/max of ``stat_col`` for a file-backed DataFrame.

    One distributed scan, grouped on ``input_file_name`` — at ingest time
    this would be computed incrementally per written file (or read straight
    from parquet footers); a one-pass scan stands in for both here and is
    itself manifest-sized output.
    """
    return df.groupBy(F.input_file_name().alias("path")).agg(
        F.min(stat_col).alias("lo"), F.max(stat_col).alias("hi")
    )


def prune_manifest(zones: DataFrame, lo, hi) -> DataFrame:
    """Distributed zone-map prune: filter the manifest DataFrame to the
    paths whose [lo, hi] zone intersects the query range [lo, hi).

    The per-file stats never leave the executors — only the surviving path
    column is returned. At 100 TB (millions of files) the manifest is a
    table, not a driver list; the caller collects the *pruned* path set
    (strictly smaller, typically ~predicate-selectivity × file count),
    which is the bounded scan-planning step every table format (Delta,
    Iceberg) performs on the driver.

    ``lo``/``hi`` may be Columns (e.g. a string literal cast to timestamp,
    which parses in the pinned session zone) or plain Python values.
    Conservative like :func:`prune_files`: NULL-stat files are kept.
    """
    lo = lo if isinstance(lo, Column) else F.lit(lo)
    hi = hi if isinstance(hi, Column) else F.lit(hi)
    keep = (
        F.col("lo").isNull()
        | F.col("hi").isNull()
        | ((F.col("hi") >= lo) & (F.col("lo") < hi))
    )
    return zones.filter(keep).select("path")


def prune_files(zone_rows, lo, hi) -> list[str]:
    """File paths whose [lo, hi] zone intersects the query range [lo, hi).

    ``zone_rows`` is the collected zone-map manifest (bounded metadata, one
    row per file). Skipping is conservative: a file is kept whenever its
    range could contain a matching row — including files with NULL stats
    (an all-NULL column yields no min/max; such a file cannot be proven
    non-matching).
    """
    return [
        r["path"]
        for r in zone_rows
        if r["lo"] is None or r["hi"] is None or (r["hi"] >= lo and r["lo"] < hi)
    ]


def parquet_file_sizes(
    spark: SparkSession, path: str, fs=None
) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet data file under ``path``.

    Filesystem verbs go through the :mod:`..fsutil` seam: pure-Python for
    local paths (JVM-free — works under Spark Connect), the Hadoop bridge
    for HDFS/object-store schemes, or a caller-injected ``fs=``.
    """
    if fs is None:
        fs = resolve_fs(spark, path)
    return [
        (p, size)
        for p, size in fs.list_files(path)
        if p.endswith(".parquet")
    ]


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src`` parquet into ~``target_file_bytes`` files at ``dst``.

    File count is derived from actual on-disk bytes (not row counts), so a
    corpus of 10^5 drip-fed stream files becomes ceil(total/target) scan-
    sized files in one distributed rewrite. Returns before/after stats.
    ``dst`` must differ from ``src``: Spark cannot overwrite a path it is
    reading (use :func:`promote_directory` after the rewrite instead). The
    guard compares fully-qualified resolved paths, so aliases like
    ``dir/../dir`` or a ``file:`` prefix cannot sneak an in-place rewrite
    past it.
    """
    # qualified() pins scheme+authority and collapses '..'/'.' aliases, so
    # `dir/../dir` or a `file:` prefix cannot sneak an in-place rewrite by.
    if resolve_fs(spark, src).qualified(src) == resolve_fs(spark, dst).qualified(dst):
        raise ValueError("compact_parquet requires dst != src (write then swap)")
    sizes = parquet_file_sizes(spark, src)
    total = sum(s for _, s in sizes)
    n_out = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(dst)
    return {
        "files_before": len(sizes),
        "files_after": len(parquet_file_sizes(spark, dst)),
        "bytes_before": total,
        "target_files": n_out,
    }


def promote_directory(
    spark: SparkSession, staged: str, target: str, fs=None,
    allow_non_atomic: bool = False,
) -> str:
    """Promote a staged rewrite over ``target`` via two filesystem renames
    (the compact-then-swap step): the previous ``target`` is moved aside to
    ``<target>__replaced`` (returned, for deferred deletion once no reader
    can still hold its file list) and ``staged`` takes its place. Renames
    are metadata operations on HDFS-like filesystems; on object stores a
    table format's metadata commit replaces this. Filesystem verbs go
    through the :mod:`..fsutil` seam (JVM-free for local paths).

    The whole recipe is only crash-safe when the fs's rename IS a single
    metadata operation: a copy+delete emulation (``fs.atomic_rename`` is
    False, e.g. :class:`~..fsutil.BotoS3FS`) that dies mid-copy leaves
    ``target`` partially populated, and the retry's exists(dst) probe then
    wedges the swap with the live data already moved aside — so
    promote_directory REFUSES such filesystems unless the caller opts in
    with ``allow_non_atomic=True`` (accepting a visible-to-readers window
    and manual cleanup on crash); a table format's metadata commit is the
    real answer on object stores.
    """
    if fs is None:
        fs = resolve_fs(spark, target)
    if not getattr(fs, "atomic_rename", True) and not allow_non_atomic:
        raise ValueError(
            "promote_directory needs an atomic rename; "
            f"{type(fs).__name__} emulates rename as copy+delete, which can "
            "strand a half-promoted target on crash. Use a table-format "
            "metadata commit for object stores, or pass "
            "allow_non_atomic=True to accept the risk."
        )
    # Validate the staged side BEFORE touching target: a typo'd staged path
    # must not leave the live directory moved aside with nothing promoted.
    if not fs.exists(staged):
        raise IOError(f"staged path {staged} does not exist; target untouched")
    aside = target + "__replaced"
    if fs.exists(aside):
        fs.delete(aside)
    moved_aside = fs.exists(target)
    if moved_aside and not fs.rename(target, aside):
        raise IOError(f"could not move {target} aside")
    if not fs.rename(staged, target):
        # roll the previous data back into place before failing
        if moved_aside:
            fs.rename(aside, target)
        raise IOError(f"could not promote {staged} to {target}; target restored")
    return aside


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) on ``bucket_col``.

    Bucketing pre-shuffles the data ON DISK: two tables bucketed on the same
    key with the same bucket count equi-join with ZERO exchange (and zero
    sort, if sorted) — the pay-once-join-many layout for 100 TB fact tables
    that are repeatedly joined on the same key.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Equi-join two bucketed tables; Catalyst elides the shuffle when both
    sides are bucketed on the join key with equal bucket counts."""
    return spark.table(left_table).join(spark.table(right_table), on)
