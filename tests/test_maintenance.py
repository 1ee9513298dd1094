"""Storage-maintenance operators: zone-map skipping actually skips files,
compaction actually shrinks file counts without losing rows, and bucketed
tables join with zero exchange — asserted on real files and real plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import maintenance as mnt


def test_compact_parquet_shrinks_file_count(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(32).write.parquet(
        src
    )
    stats = mnt.compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == 10_000 * 9_999  # sum 2*i, i<10000


def test_zone_map_prunes_files_and_keeps_answers(spark, tmp_path):
    path = str(tmp_path / "zm")
    spark.range(1_000).withColumn("k", F.col("id")).repartitionByRange(
        10, "k"
    ).write.parquet(path)
    back = spark.read.parquet(path)
    zones = mnt.file_zone_map(back, "k").collect()
    keep = mnt.prune_files(zones, 0, 100)  # query range [0, 100)
    # skipping must actually skip: 10 range files over 0..999, ~1 overlaps
    assert 0 < len(keep) < len(zones)
    got = (
        spark.read.parquet(*keep)
        .filter((F.col("k") >= 0) & (F.col("k") < 100))
        .count()
    )
    assert got == 100


def test_bucketed_join_has_no_exchange(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1_000).select((F.col("id") % 100).alias("k"), F.col("id").alias("va"))
        b = spark.range(500).select((F.col("id") % 100).alias("k"), F.col("id").alias("vb"))
        mnt.write_bucketed(a, "t_bkt_a", "k", 4)
        mnt.write_bucketed(b, "t_bkt_b", "k", 4)
        joined = mnt.bucketed_join(spark, "t_bkt_a", "t_bkt_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing pre-paid the shuffle on disk
        # 100 distinct keys, 10 left rows x 5 right rows each
        assert joined.count() == 5_000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_prune_keeps_files_with_null_stats():
    zones = [
        {"path": "a", "lo": 1, "hi": 5},
        {"path": "b", "lo": None, "hi": None},  # all-NULL stat column
        {"path": "c", "lo": 50, "hi": 60},
    ]
    assert mnt.prune_files(zones, 0, 10) == ["a", "b"]


def test_compact_rejects_in_place_rewrite(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dst != src"):
        mnt.compact_parquet(spark, str(tmp_path / "x"), str(tmp_path / "x/"))


def test_compact_then_promote_swaps_directories(spark, tmp_path):
    target, staged = str(tmp_path / "t"), str(tmp_path / "staged")
    spark.range(1_000).repartition(16).write.parquet(target)
    mnt.compact_parquet(spark, target, staged, target_file_bytes=1 << 30)
    aside = mnt.promote_directory(spark, staged, target)
    out = spark.read.parquet(target)
    assert out.count() == 1_000
    assert len(mnt.parquet_file_sizes(spark, target)) == 1
    # the replaced data is parked, not destroyed
    assert spark.read.parquet(aside).count() == 1_000


def test_promote_refuses_non_atomic_rename_without_opt_in(spark, tmp_path):
    """A copy+delete rename emulation (atomic_rename=False, e.g. BotoS3FS)
    can strand a half-promoted target on crash, after which the retry's
    exists(dst) probe wedges the swap with the live data already moved
    aside — promote_directory must refuse it up front, before touching
    either directory, unless the caller opts in."""
    import pytest as _pytest

    from autonomus_datapipeline_spark.fsutil import LocalFS

    class _NonAtomicFS(LocalFS):
        atomic_rename = False

    target, staged = str(tmp_path / "t"), str(tmp_path / "staged")
    spark.range(10).write.parquet(target)
    spark.range(20).write.parquet(staged)
    with _pytest.raises(ValueError, match="atomic"):
        mnt.promote_directory(spark, staged, target, fs=_NonAtomicFS())
    # refused BEFORE any rename: both directories untouched
    assert spark.read.parquet(target).count() == 10
    assert spark.read.parquet(staged).count() == 20
    # explicit opt-in accepts the risk and performs the swap
    aside = mnt.promote_directory(
        spark, staged, target, fs=_NonAtomicFS(), allow_non_atomic=True
    )
    assert spark.read.parquet(target).count() == 20
    assert spark.read.parquet(aside).count() == 10


def test_ingest_compact_promote_zonemap_lifecycle(spark, tmp_path):
    """The storage lifecycle end-to-end: drip-fed appends accumulate small
    files -> compact to scan-sized files -> promote atomically -> zone-map
    pruning answers a range query from the compacted layout, exactly."""
    live = str(tmp_path / "events")
    # 12 drip appends of 500 rows each, one file apiece (a stream's output)
    for batch in range(12):
        (
            spark.range(batch * 500, (batch + 1) * 500)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .coalesce(1)
            .write.mode("append")
            .parquet(live)
        )
    assert len(mnt.parquet_file_sizes(spark, live)) >= 12

    staged = str(tmp_path / "events_compact")
    stats = mnt.compact_parquet(spark, live, staged, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    mnt.promote_directory(spark, staged, live)
    assert len(mnt.parquet_file_sizes(spark, live)) == 1

    # The compacted single file still zone-prunes correctly (trivially kept)
    # and the data survived both rewrites bit-for-bit.
    back = spark.read.parquet(live)
    zones = mnt.file_zone_map(back, "k").collect()
    keep = mnt.prune_files(zones, 1000, 2000)
    got = (
        spark.read.parquet(*keep)
        .filter((F.col("k") >= 1000) & (F.col("k") < 2000))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .first()
    )
    assert got.n == 1000
    assert got.s == sum(i % 7 for i in range(1000, 2000))


def test_prune_manifest_matches_prune_files(spark, tmp_path):
    """Distributed manifest prune (verdict-r4 item 3) keeps exactly the
    files the driver-side row prune keeps — stats never leave Spark."""
    path = str(tmp_path / "t")
    spark.range(0, 1000).withColumnRenamed("id", "k").repartitionByRange(
        8, "k"
    ).write.parquet(path)
    back = spark.read.parquet(path)
    zones = mnt.file_zone_map(back, "k")
    expected = sorted(mnt.prune_files(zones.collect(), 100, 400))
    got = sorted(r.path for r in mnt.prune_manifest(zones, 100, 400).collect())
    assert got == expected
    assert 0 < len(got) < zones.count()


def test_prune_manifest_keeps_null_stat_files(spark):
    zones = spark.createDataFrame(
        [("a", None, None), ("b", 5, 7), ("c", 20, 30)],
        "path string, lo int, hi int",
    )
    got = sorted(r.path for r in mnt.prune_manifest(zones, 0, 10).collect())
    assert got == ["a", "b"]
