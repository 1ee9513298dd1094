"""Round-11 additions: closed-form / structural pins for the sketch family,
JL projection, Neyman allocation, the as-of queries, and the brown
forecast's data-derived emit window (ADVICE r10: assert non-empty on the
real data path). Cross-engine value equality is proven by the oracle gate;
these tests pin the SEMANTICS the oracle can't see (estimator error
bounds, budget conservation, coverage arithmetic)."""

from __future__ import annotations

import pytest

from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return QUERY_REGISTRY[name].fn(spark, sf).collect()


def test_hll_estimates_within_error_bound(spark):
    # m = 256 → theoretical rel. std error 1.04/sqrt(256) ≈ 6.5%; allow 20%.
    rows = _rows(spark, "hll_portable_cardinality")
    assert len(rows) == 3
    for r in rows:
        assert r.exact > 0
        assert abs(r.est - r.exact) / r.exact < 0.20, (r.key_name, r.est, r.exact)


def test_kmv_set_algebra_invariants(spark):
    (r,) = _rows(spark, "kmv_set_intersection")
    assert r.inter_exact <= min(r.n_click_exact, r.n_purchase_exact)
    assert r.union_exact <= r.n_click_exact + r.n_purchase_exact
    assert 0.0 <= r.jaccard_est <= 1.0
    assert abs(r.union_est - r.union_exact) / r.union_exact < 0.30


def test_ams_f2_estimates_bracket_exact(spark):
    (r,) = _rows(spark, "ams_f2_sketch")
    assert r.f2_exact > 0
    # 16 estimators: median and mean are unbiased-ish with high variance;
    # a 5x bracket catches sign/units bugs without flaking.
    for est in (r.ams_median_est, r.ams_mean_est):
        assert r.f2_exact / 5 <= est <= r.f2_exact * 5, (est, r.f2_exact)


def test_jl_projection_distortion_bands_and_variance(spark):
    rows = _rows(spark, "jl_projection_distortion")
    assert rows, "no distortion bands emitted"
    total_pairs = sum(r.n_pairs for r in rows)
    assert total_pairs > 0
    for r in rows:
        assert 0 <= r.distortion_band <= 4
        assert 0.0 < r.mean_ratio < 3.0
    # E[variance retained] = 1 for a +/-1 JL matrix scaled by 1/sqrt(k)
    vr = rows[0].corpus_var_ratio
    assert 0.5 < vr < 1.5, vr
    # k=16 → ratio sd ≈ sqrt(2/k) ≈ 0.35, so P(|r−1| < 0.3) ≈ 0.6: the
    # majority of pairs must land within the first three bands (a 0.5 bar
    # on bands ≤1 would demand P(|r−1| < 0.2) > 0.5, which JL does NOT
    # promise at k=16 — measured 0.44, right on theory).
    low = sum(r.n_pairs for r in rows if r.distortion_band <= 2)
    assert low >= total_pairs * 0.5


def test_neyman_allocation_conserves_budget(spark):
    rows = _rows(spark, "neyman_allocation_plan")
    assert len(rows) >= 3
    total = sum(r.alloc_n for r in rows)
    # floor allocation: undershoots by < #strata, never overshoots
    assert 1000 - len(rows) < total <= 1000, total
    for r in rows:
        assert r.alloc_n >= 0
        assert r.nh_sh >= 0
    # allocation must be monotone in the weight
    by_w = sorted(rows, key=lambda r: r.nh_sh)
    allocs = [r.alloc_n for r in by_w]
    assert allocs == sorted(allocs)


def test_brown_forecast_non_empty_on_real_data(spark):
    # ADVICE r10: the old calendar-literal cutoff silently returned zero
    # rows on corpora ending before 2001; the emit window now derives from
    # max(o_orderdate), so the real-data path must be non-empty at every sf.
    rows = _rows(spark, "brown_double_smoothing_forecast")
    assert len(rows) > 0
    assert len(rows) <= 210


def test_asof_attribution_totals_cover_all_purchases(spark):
    rows = _rows(spark, "asof_view_purchase_attribution")
    kinds = {r.attributed_type for r in rows}
    assert kinds <= {"view", "click", "none"}
    n = sum(r.n_purchases for r in rows)
    ev = QUERY_REGISTRY["asof_view_purchase_attribution"].fn(
        spark, SF
    ).sparkSession.read.parquet(f"{SF}/events.parquet")
    n_purch = ev.where(ev.event_type == "purchase").count()
    assert n == n_purch  # left-join semantics: every purchase classified
    for r in rows:
        if r.attributed_type != "none":
            assert r.avg_gap_seconds is not None
            assert 0 <= r.avg_gap_seconds <= 6 * 3600


def test_asof_next_error_counts_bounded(spark):
    rows = _rows(spark, "asof_next_error_latency")
    assert 1 <= len(rows) <= 24
    for r in rows:
        assert 0 <= r.n_with_error_24h <= r.n_signups
        if r.n_with_error_24h > 0:
            assert 0 <= r.avg_latency_seconds <= 24 * 3600


@pytest.mark.parametrize("name", ["hll_portable_cardinality",
                                  "kmv_set_intersection",
                                  "ams_f2_sketch",
                                  "jl_projection_distortion",
                                  "neyman_allocation_plan"])
def test_round11_queries_deterministic(spark, name):
    a = sorted(map(tuple, _rows(spark, name)))
    b = sorted(map(tuple, _rows(spark, name)))
    assert a == b
