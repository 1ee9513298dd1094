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
