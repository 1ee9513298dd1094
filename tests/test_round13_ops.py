"""Round-13 regression pins: the decimal→double descale seam and the
accumulator-audit scanner.

The r13 sf1 sweep caught dsum's old DECIMAL(38,6)→DOUBLE cast diverging
by one ulp between engines once the sum's integer unit count passes 2^53
(DuckDB descales in two steps — int128→double, /1e6 — Spark in one).
These tests pin the FIXED forms bit-exact across engines in exactly that
regime, so the seam cannot silently reopen.
"""

from __future__ import annotations

import subprocess
import sys

import duckdb
import pytest

from pyspark.sql import functions as F

from autonomus_datapipeline_spark.workloads.registry import (
    davg,
    descale,
    dsum,
    sql_davg,
    sql_dsum,
)

# 150k rows around this value put the scale-6 unit sum at ~1.65e16 > 2^53
# — the regime where the OLD formulation diverged. The odd cents keep the
# decimal→double casts from landing on exactly representable values.
_VAL = 110000.13
_N = 150_000


@pytest.fixture(scope="module")
def seam(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seam") / "t.parquet")
    spark.range(_N).select(
        (F.lit(_VAL) + (F.col("id") % 7) * 0.01).alias("v")
    ).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return con, path


def test_dsum_davg_bit_exact_past_2_53(spark, seam):
    con, path = seam
    s = (
        spark.read.parquet(path)
        .agg(dsum("v", "s"), davg("v", "a"))
        .collect()[0]
    )
    d = con.execute(
        f"SELECT {sql_dsum('v', 's')}, {sql_davg('v', 'a')} FROM t"
    ).fetchone()
    assert s.s * 1e6 > 2**53  # the regime under test
    assert s.s.hex() == d[0].hex()
    assert s.a.hex() == d[1].hex()


def test_descale_scale12_bit_exact(spark, seam):
    con, path = seam
    s = (
        spark.read.parquet(path)
        .agg(descale(F.sum(F.col("v").cast("decimal(38,12)")), 12).alias("s"))
        .collect()[0]
    )
    d = con.execute(
        "SELECT CAST(CAST(SUM(CAST(v AS DECIMAL(38,12)))"
        " * CAST(1000000000000 AS DECIMAL(13,0)) AS DECIMAL(38,0))"
        " AS DOUBLE) / 1e12 FROM t"
    ).fetchone()[0]
    assert s.s.hex() == d.hex()


def test_descale_matches_single_rounding_below_2_53(spark):
    # Below 2^53 units the descale form must equal the old plain cast —
    # the property that keeps every historical proof valid.
    df = spark.range(1000).select(
        (F.lit(12.34) + F.col("id") * 0.001).alias("v")
    )
    got = df.agg(
        dsum("v", "new"),
        F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("old"),
    ).collect()[0]
    assert got.new.hex() == got.old.hex()


def test_accumulator_audit_scanner_green():
    r = subprocess.run(
        [sys.executable, "tools/accumulator_audit.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout[-2000:]
