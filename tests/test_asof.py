"""As-of join operator: semantics vs a brute-force reference on small
frames — both directions, tolerance, equal-ts inclusivity, no-match nulls,
and the validation guards."""

from __future__ import annotations

import random

import pytest

from autonomus_datapipeline_spark.operators.asof import asof_join


def _brute(left, right, direction, tolerance):
    """left: (k, lts, lid); right: (k, rts, rv) unique per (k, rts)."""
    out = []
    for k, lts, lid in left:
        cands = [
            (rts, rv)
            for (rk, rts, rv) in right
            if rk == k
            and (rts <= lts if direction == "backward" else rts >= lts)
        ]
        if direction == "backward":
            best = max(cands, default=None)
        else:
            best = min(cands, default=None)
        if best is not None:
            gap = lts - best[0] if direction == "backward" else best[0] - lts
            if tolerance is not None and gap > tolerance:
                best = None
        if best is None:
            out.append((k, lts, lid, None, None, None))
        else:
            out.append((k, lts, lid, best[0], best[1], gap))
    return sorted(out)


def _run(spark, left, right, direction, tolerance=None):
    ldf = spark.createDataFrame(left, "k long, lts long, lid long")
    rdf = spark.createDataFrame(right, "k long, rts long, rv string")
    got = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        direction=direction, tolerance=tolerance,
    ).collect()
    return sorted(
        (r.k, r.lts, r.lid, r.rts, r.rv, r._asof_gap) for r in got
    )


def test_asof_backward_matches_brute_force(spark):
    rng = random.Random(11)
    left = [(rng.randrange(5), rng.randrange(100), i) for i in range(60)]
    rts = {(rng.randrange(5), rng.randrange(100)) for _ in range(40)}
    right = [(k, t, f"v{k}_{t}") for k, t in rts]
    for tol in (None, 10):
        assert _run(spark, left, right, "backward", tol) == _brute(
            left, right, "backward", tol
        )


def test_asof_forward_matches_brute_force(spark):
    rng = random.Random(13)
    left = [(rng.randrange(4), rng.randrange(80), i) for i in range(50)]
    rts = {(rng.randrange(4), rng.randrange(80)) for _ in range(30)}
    right = [(k, t, f"v{k}_{t}") for k, t in rts]
    for tol in (None, 7):
        assert _run(spark, left, right, "forward", tol) == _brute(
            left, right, "forward", tol
        )


def test_asof_equal_ts_is_inclusive_both_directions(spark):
    left = [(1, 50, 0)]
    right = [(1, 50, "same")]
    for d in ("backward", "forward"):
        rows = _run(spark, left, right, d)
        assert rows == [(1, 50, 0, 50, "same", 0)]


def test_asof_no_match_keeps_left_row_with_nulls(spark):
    rows = _run(spark, [(1, 10, 0)], [(2, 5, "otherkey")], "backward")
    assert rows == [(1, 10, 0, None, None, None)]


def test_asof_tolerance_nulls_out_far_matches(spark):
    rows = _run(spark, [(1, 100, 0)], [(1, 10, "old")], "backward",
                tolerance=50)
    assert rows == [(1, 100, 0, None, None, None)]
    rows = _run(spark, [(1, 100, 0)], [(1, 60, "near")], "backward",
                tolerance=50)
    assert rows == [(1, 100, 0, 60, "near", 40)]


def test_asof_validation_guards(spark):
    ldf = spark.createDataFrame([(1, 10, 2)], "k long, lts long, rv long")
    rdf = spark.createDataFrame([(1, 5, "a")], "k long, rts long, rv string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                  direction="nearest")
    with pytest.raises(ValueError, match="clash"):
        asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts")
    with pytest.raises(ValueError, match="right_ts"):
        asof_join(ldf.drop("rv"), rdf, on="k", left_ts="lts",
                  right_ts="nope")


def _run_salted(spark, left, right, direction, tolerance=None, buckets=8):
    ldf = spark.createDataFrame(left, "k long, lts long, lid long")
    rdf = spark.createDataFrame(right, "k long, rts long, rv string")
    got = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        direction=direction, tolerance=tolerance, salt_buckets=buckets,
    ).collect()
    return sorted(
        (r.k, r.lts, r.lid, r.rts, r.rv, r._asof_gap) for r in got
    )


def test_asof_salted_matches_brute_force_both_directions(spark):
    rng = random.Random(17)
    left = [(rng.randrange(5), rng.randrange(100), i) for i in range(80)]
    rts = {(rng.randrange(5), rng.randrange(100)) for _ in range(50)}
    right = [(k, t, f"v{k}_{t}") for k, t in rts]
    for d in ("backward", "forward"):
        for tol in (None, 9):
            for b in (2, 8, 64):
                assert _run_salted(spark, left, right, d, tol, b) == _brute(
                    left, right, d, tol
                ), (d, tol, b)


def test_asof_salted_hot_key_fixture(spark):
    # One key dominates (the scenario salt_buckets exists for): 500 of
    # 520 left rows share key 7, rights are sparse so most matches cross
    # bucket boundaries and exercise the carry seeds.
    rng = random.Random(23)
    left = [(7, rng.randrange(10_000), i) for i in range(500)] + [
        (rng.randrange(3), rng.randrange(10_000), 500 + i) for i in range(20)
    ]
    rts = {(7, rng.randrange(10_000)) for _ in range(12)} | {
        (rng.randrange(3), rng.randrange(10_000)) for _ in range(10)
    }
    right = [(k, t, f"v{k}_{t}") for k, t in rts]
    for d in ("backward", "forward"):
        got = _run_salted(spark, left, right, d, tolerance=None, buckets=16)
        assert got == _brute(left, right, d, None), d
        assert got == _run(spark, left, right, d), d


def test_asof_salted_edge_cases(spark):
    # all-equal timestamps (zero-width axis -> single bucket, no crash)
    left = [(1, 50, i) for i in range(5)]
    right = [(1, 50, "same")]
    assert _run_salted(spark, left, right, "backward", buckets=8) == _brute(
        left, right, "backward", None
    )
    # rights entirely outside the left ts range (clamped buckets)
    left = [(1, 100, 0), (1, 200, 1)]
    right = [(1, 5, "below"), (1, 900, "above")]
    for d in ("backward", "forward"):
        assert _run_salted(spark, left, right, d, buckets=4) == _brute(
            left, right, d, None
        ), d
    # salt_buckets=1 and None take the unsalted path
    assert _run_salted(spark, left, right, "backward", buckets=1) == _run(
        spark, left, right, "backward"
    )


def test_asof_salted_window_partitions_by_bucket(spark):
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, lts long, lid long")
    rdf = spark.createDataFrame([(1, 5, "a")], "k long, rts long, rv string")
    plan = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts", salt_buckets=8
    )._jdf.queryExecution().executedPlan().toString()
    import re

    main_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "_is_left" in ln
    ]
    assert main_windows, plan
    # the running-last window's partition spec must include the bucket:
    # windowspecdefinition(k#N, _b#M, ...) — _b before the ORDER BY cols
    assert all(
        re.search(r"windowspecdefinition\([^)]*_b#\d+", ln)
        for ln in main_windows
    ), main_windows


def test_asof_salted_negative_and_float_ts(spark):
    # negative and fractional positions exercise the bucket arithmetic
    # (floor of negative offsets, clamping below the left min)
    rng = random.Random(29)
    left = [(1, rng.uniform(-500.0, 500.0), i) for i in range(60)]
    right = [
        (1, t, f"v{t:.3f}")
        for t in {round(rng.uniform(-600.0, 600.0), 3) for _ in range(25)}
    ]
    ldf = spark.createDataFrame(left, "k long, lts double, lid long")
    rdf = spark.createDataFrame(right, "k long, rts double, rv string")

    def run(buckets):
        got = asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            direction="backward", salt_buckets=buckets,
        ).collect()
        return sorted((r.k, r.lts, r.lid, r.rts, r.rv) for r in got)

    assert run(8) == run(None) == run(16)


def test_asof_salted_timestamp_typed_ts(spark):
    # timestamp columns cast to double as epoch seconds — the salted
    # bucketing must work on them unchanged
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = [(1, base + dt.timedelta(minutes=m), m) for m in range(0, 600, 7)]
    right = [
        (1, base + dt.timedelta(minutes=m), f"r{m}") for m in range(0, 600, 95)
    ]
    ldf = spark.createDataFrame(left, "k long, lts timestamp, lid long")
    rdf = spark.createDataFrame(right, "k long, rts timestamp, rv string")

    def run(buckets):
        got = asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            direction="forward", salt_buckets=buckets,
        ).collect()
        return sorted((r.k, r.lts, r.lid, r.rts, r.rv) for r in got)

    assert run(6) == run(None)


def test_asof_skew_report_shares_and_order(spark):
    # 80 rows on key 1, 15 on key 2, 5 on key 3 — the report must surface
    # key 1 first with share 0.8 and count every distinct key.
    from autonomus_datapipeline_spark.operators.asof import asof_skew_report

    rows = (
        [(1, i) for i in range(80)]
        + [(2, i) for i in range(15)]
        + [(3, i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "k long, ts long")
    got = asof_skew_report(df, on="k", top_n=2).collect()
    assert [(r.k, r.n_rows, r.n_keys) for r in got] == [
        (1, 80, 3),
        (2, 15, 3),
    ]
    assert got[0].share == pytest.approx(0.8)
    assert got[1].share == pytest.approx(0.15)


def test_asof_skew_report_sampled_and_multikey(spark):
    from autonomus_datapipeline_spark.operators.asof import asof_skew_report

    rows = [(i % 4, "a" if i % 10 else "b", i) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, ts long")
    # multi-key grouping: shares sum to 1 over the returned top-N when
    # top_n covers every key pair
    full = asof_skew_report(df, on=["k", "g"], top_n=100).collect()
    assert sum(r.n_rows for r in full) == 400
    assert sum(r.share for r in full) == pytest.approx(1.0)
    # multiples of 10 are even, so (1,"b") and (3,"b") never occur
    assert len(full) == 6
    assert all(r.n_keys == 6 for r in full)
    # sampling path returns the same schema and a plausible subset size
    samp = asof_skew_report(df, on=["k", "g"], sample_fraction=0.5, seed=7)
    cols = samp.columns
    assert cols == ["k", "g", "n_rows", "share", "n_keys"]
    got = samp.collect()
    assert 0 < sum(r.n_rows for r in got) < 400
