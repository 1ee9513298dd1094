"""operators/prefix_sum.py — distributed prefix-sum vs single-partition truth.

Every helper is pinned against the answer a plain unpartitioned window gives
on the same frame (the semantics we are replacing, kept correct), across the
tie/null/degenerate shapes that break naive bucketing.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import prefix_sum as ps


@pytest.fixture(scope="module")
def frame(spark):
    random.seed(7)
    rows = [(i, random.randint(0, 999), random.random() * 100) for i in range(3000)]
    # a fat tie run: 50 rows sharing the same leading key
    rows += [(10000 + i, 500, 3.25) for i in range(50)]
    return spark.createDataFrame(rows, "id long, k long, x double").cache()


def _ref(df, order_cols):
    w = Window.orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    return {
        r["id"]: r
        for r in df.select(
            "id",
            F.sum("k").over(wf).alias("cum"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.ntile(7).over(w).alias("t7"),
        ).collect()
    }


def test_running_matches_unpartitioned_window_asc(frame):
    ref = _ref(frame, ["x", "id"])
    got = ps.with_global_ntile(
        ps.with_global_running(
            frame,
            [("x", True), ("id", True)],
            sums={"cum": "k"},
            row_number="rn",
            totals={"tot_k": "k"},
            total_count="n",
            n_buckets=16,
        ),
        [("x", True), ("id", True)],
        7,
        "t7",
        n_buckets=16,
    )
    rows = got.collect()
    assert all(
        (r["cum"], r["rn"], r["t7"])
        == (ref[r["id"]]["cum"], ref[r["id"]]["rn"], ref[r["id"]]["t7"])
        for r in rows
    )
    # grand totals are constant columns equal to the plain aggregates
    tot = frame.agg(F.sum("k"), F.count(F.lit(1))).first()
    assert all((r["tot_k"], r["n"]) == (tot[0], tot[1]) for r in rows)


def test_running_desc_direction(frame):
    ref = {
        r["id"]: r["rn"]
        for r in frame.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.desc("x"), "id"))
            .cast("bigint")
            .alias("rn"),
        ).collect()
    }
    got = ps.with_global_running(
        frame, [("x", False), ("id", True)], row_number="rn", n_buckets=16
    )
    assert all(ref[r["id"]] == r["rn"] for r in got.select("id", "rn").collect())


def test_ranked_head_matches_rownumber_filter(frame):
    ref = {
        r["id"]: r["rk"]
        for r in frame.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.desc("x"), "id"))
            .cast("int")
            .alias("rk"),
        )
        .where(F.col("rk") <= 25)
        .collect()
    }
    got = {
        r["id"]: r["rk"]
        for r in ps.ranked_head(frame, [("x", False), ("id", True)], 25, "rk")
        .select("id", "rk")
        .collect()
    }
    assert got == ref


@pytest.mark.parametrize("k", [3, 7, 10])
def test_ntile_fewer_rows_than_tiles(spark, k):
    tiny = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(4)], "id long, x double"
    )
    ref = {
        r["id"]: r["t"]
        for r in tiny.select(
            "id", F.ntile(k).over(Window.orderBy("x", "id")).alias("t")
        ).collect()
    }
    got = {
        r["id"]: r["t"]
        for r in ps.with_global_ntile(tiny, [("x", True), ("id", True)], k, "t").collect()
    }
    assert got == ref


def test_constant_leading_key_single_bucket(spark):
    one = spark.createDataFrame([(i, 5.0) for i in range(9)], "id long, x double")
    ref = {
        r["id"]: r["rn"]
        for r in one.select(
            "id",
            F.row_number().over(Window.orderBy("x", "id")).cast("bigint").alias("rn"),
        ).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in ps.with_global_running(
            one, [("x", True), ("id", True)], row_number="rn"
        ).collect()
    }
    assert got == ref


def test_string_leading_key_degrades_correctly(spark):
    s = spark.createDataFrame(
        [(i, chr(65 + i % 5)) for i in range(20)], "id long, x string"
    )
    ref = {
        r["id"]: r["rn"]
        for r in s.select(
            "id",
            F.row_number().over(Window.orderBy("x", "id")).cast("bigint").alias("rn"),
        ).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in ps.with_global_running(
            s, [("x", True), ("id", True)], row_number="rn"
        ).collect()
    }
    assert got == ref


@pytest.mark.parametrize("asc", [True, False])
def test_null_keys_follow_spark_null_ordering(spark, asc):
    nl = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, None), (4, 1.0)], "id long, x double"
    )
    order = F.col("x").asc() if asc else F.col("x").desc()
    ref = {
        r["id"]: r["rn"]
        for r in nl.select(
            "id",
            F.row_number().over(Window.orderBy(order, "id")).cast("bigint").alias("rn"),
        ).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in ps.with_global_running(
            nl, [("x", asc), ("id", True)], row_number="rn"
        ).collect()
    }
    assert got == ref


def test_exclusive_running_max_matches_window(frame):
    w = Window.orderBy(F.desc("x"), "id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["id"]: r["m"]
        for r in frame.select("id", F.max("k").over(w).alias("m")).collect()
    }
    got = {
        r["id"]: r["m"]
        for r in ps.with_global_running(
            frame, [("x", False), ("id", True)], maxes_excl={"m": "k"}, n_buckets=16
        )
        .select("id", "m")
        .collect()
    }
    assert got == ref  # includes the NULL for the globally first row


def test_global_shift_matches_lag_lead(frame):
    w = Window.orderBy("x", "id")
    ref = {
        r["id"]: (r["lg"], r["ld"])
        for r in frame.select(
            "id",
            F.lag("k", 1).over(w).alias("lg"),
            F.lead("k", 2).over(w).alias("ld"),
        ).collect()
    }
    got = {
        r["id"]: (r["lg"], r["ld"])
        for r in ps.with_global_shift(
            frame,
            [("x", True), ("id", True)],
            {"lg": ("k", 1), "ld": ("k", -2)},
            n_buckets=16,
        )
        .select("id", "lg", "ld")
        .collect()
    }
    assert got == ref


def test_string_order_proxy_is_order_preserving(spark):
    vals = ["", "a", "aa", "a~", "b", "ab", "abc", "É", "zzzzzzzzzz", "zza"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s", ps.string_order_proxy("s").alias("p")
    ).collect()
    by_str = [r["p"] for r in sorted(rows, key=lambda r: r["s"].encode("utf-8"))]
    assert by_str == sorted(by_str)


def test_string_bucket_by_distributes_rank(spark):
    s = spark.createDataFrame(
        [(i, f"doc{i % 97:03d}") for i in range(500)], "id long, x string"
    )
    ref = {
        r["id"]: r["rn"]
        for r in s.select(
            "id",
            F.row_number().over(Window.orderBy("x", "id")).cast("bigint").alias("rn"),
        ).collect()
    }
    got_df = ps.with_global_running(
        s,
        [("x", True), ("id", True)],
        row_number="rn",
        bucket_by=ps.string_order_proxy("x"),
        n_buckets=8,
    )
    assert {r["id"]: r["rn"] for r in got_df.select("id", "rn").collect()} == ref


def test_no_empty_partition_windows_in_plan(frame):
    got = ps.with_global_ntile(
        ps.with_global_running(
            frame,
            [("x", True), ("id", True)],
            sums={"cum": "k"},
            row_number="rn",
        ),
        [("x", True), ("id", True)],
        10,
        "t",
    )
    empties = []

    def walk(p):
        if p.nodeName() == "Window":
            empties.append(p.partitionSpec().isEmpty())
        for i in range(p.children().size()):
            walk(p.children().apply(i))

    walk(got._jdf.queryExecution().optimizedPlan())
    assert empties and not any(empties)


# ---------------------------------------------------------------------------
# Partitioned variants: per-partition restart vs real partitioned windows
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def seg_frame(spark):
    random.seed(11)
    rows = [
        (i, ["A", "B", "C"][i % 3], random.randint(0, 99), random.random())
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "id long, seg string, k long, x double").cache()


def test_partitioned_running_matches_partitioned_window(seg_frame):
    w = Window.partitionBy("seg").orderBy("x", "id")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    wp = Window.partitionBy("seg")
    ref = {
        r["id"]: (r["cum"], r["rn"], r["tot"], r["n"])
        for r in seg_frame.select(
            "id",
            F.sum("k").over(wf).alias("cum"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.sum("k").over(wp).alias("tot"),
            F.count(F.lit(1)).over(wp).alias("n"),
        ).collect()
    }
    got = ps.with_global_running(
        seg_frame,
        [("x", True), ("id", True)],
        sums={"cum": "k"},
        row_number="rn",
        totals={"tot": "k"},
        total_count="n",
        n_buckets=8,
        partition_by=["seg"],
    )
    assert {
        r["id"]: (r["cum"], r["rn"], r["tot"], r["n"])
        for r in got.select("id", "cum", "rn", "tot", "n").collect()
    } == ref


def test_partitioned_ntile_matches_partitioned_window(seg_frame):
    w = Window.partitionBy("seg").orderBy(F.desc("x"), "id")
    ref = {
        r["id"]: r["t"]
        for r in seg_frame.select(
            "id", F.ntile(7).over(w).cast("int").alias("t")
        ).collect()
    }
    got = ps.with_global_ntile(
        seg_frame,
        [("x", False), ("id", True)],
        7,
        "t",
        n_buckets=8,
        partition_by=["seg"],
    )
    assert {r["id"]: r["t"] for r in got.select("id", "t").collect()} == ref


def test_partitioned_shift_matches_partitioned_lag_lead(seg_frame):
    w = Window.partitionBy("seg").orderBy("x", "id")
    ref = {
        r["id"]: (r["p"], r["nx"])
        for r in seg_frame.select(
            "id",
            F.lag("k").over(w).alias("p"),
            F.lead("k").over(w).alias("nx"),
        ).collect()
    }
    got = ps.with_global_shift(
        seg_frame,
        [("x", True), ("id", True)],
        {"p": ("k", 1), "nx": ("k", -1)},
        n_buckets=8,
        partition_by=["seg"],
    )
    assert {
        r["id"]: (r["p"], r["nx"]) for r in got.select("id", "p", "nx").collect()
    } == ref


def test_partitioned_windows_in_plan_carry_partition_spec(seg_frame):
    got = ps.with_global_running(
        seg_frame,
        [("x", True), ("id", True)],
        sums={"cum": "k"},
        partition_by=["seg"],
    )
    specs = []

    def walk(p):
        if p.nodeName() == "Window":
            specs.append(p.partitionSpec().size())
        for i in range(p.children().size()):
            walk(p.children().apply(i))

    walk(got._jdf.queryExecution().optimizedPlan())
    assert specs and all(sz >= 2 for sz in specs)  # (seg, _psb)


def test_bounds_fast_path_matches_unbounded(frame):
    """Supplying bounds= skips the min/max scan but must not change any
    value — even DELIBERATELY loose bounds only skew bucket balance."""
    base = ps.with_global_running(
        frame, [("x", True), ("id", True)],
        sums={"cum": "k"}, row_number="rn", total_count="n", n_buckets=16,
    )
    for lo, hi in [(0.0, 100.0), (-1e6, 1e6), (3.25, 3.25)]:
        fast = ps.with_global_running(
            frame, [("x", True), ("id", True)],
            sums={"cum": "k"}, row_number="rn", total_count="n",
            n_buckets=16, bounds=(lo, hi),
        )
        b = {r["id"]: r for r in base.collect()}
        got = fast.collect()
        assert len(got) == len(b)
        assert all(
            (r["cum"], r["rn"], r["n"]) == (b[r["id"]]["cum"], b[r["id"]]["rn"], b[r["id"]]["n"])
            for r in got
        )


@pytest.mark.parametrize("asc", [True, False])
def test_bounds_with_out_of_range_and_null_keys(spark, asc):
    """Keys strictly below bounds[0] / above bounds[1] must clamp into the
    edge buckets — never collide with the NULL bucket (ASC -1 / DESC
    n_buckets) or the -2 non-castable sentinel. Pin against the
    unpartitioned window on a frame with NULLs and data on both sides of
    the supplied range."""
    rows = [(i, float(v)) for i, v in enumerate([-50, -3, 0, 7, 12, 29, 30,
                                                 31, 44, 60, 61, 95, 1e6])]
    rows += [(100, None), (101, None)]
    nl = spark.createDataFrame(rows, "id long, x double")
    order = F.col("x").asc() if asc else F.col("x").desc()
    w = Window.orderBy(order, "id")
    ref = {
        r["id"]: (r["rn"], r["cum"])
        for r in nl.select(
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.sum("x").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
        ).collect()
    }
    got = {
        r["id"]: (r["rn"], r["cum"])
        for r in ps.with_global_running(
            nl, [("x", asc), ("id", True)], sums={"cum": "x"},
            row_number="rn", n_buckets=8, bounds=(30.0, 60.0),
        ).collect()
    }
    assert got == ref


def test_bounds_far_out_of_range_key_clamps_not_ansi_errors(spark):
    """A key astronomically far outside caller bounds= (e.g. an epoch-µs
    timestamp proxy against an epoch-day envelope — the exact r14
    pareto_frontier_orders mis-scale) floors to a bucket index beyond int
    range; the clamp must happen in BIGINT before the int cast or ANSI
    raises CAST_OVERFLOW instead of clamping into the edge bucket."""
    rows = [(0, 1.0), (1, 2.0), (2, 9.15e14), (3, -9.15e14)]
    nl = spark.createDataFrame(rows, "id long, x double")
    w = Window.orderBy(F.col("x").asc(), "id")
    ref = {
        r["id"]: (r["rn"], r["cum"])
        for r in nl.select(
            "id",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.sum("x").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
        ).collect()
    }
    got = {
        r["id"]: (r["rn"], r["cum"])
        for r in ps.with_global_running(
            nl, [("x", True), ("id", True)], sums={"cum": "x"},
            row_number="rn", n_buckets=8, bounds=(0.0, 2556.0),
        ).collect()
    }
    assert got == ref


def test_bounds_composes_with_partition_by(frame):
    # r15: bounds+partition_by is SUPPORTED (the envelope is a property of
    # the key, identical in every partition). Value parity is pinned by
    # tests/test_round15_ops.py::TestBoundsWithPartitionBy; here just assert
    # the combination no longer raises and returns the full frame.
    out = ps.with_global_running(
        frame, [("x", True), ("id", True)], sums={"cum": "k"},
        partition_by=["k"], bounds=(0.0, 100.0),
    )
    assert out.count() == frame.count()
