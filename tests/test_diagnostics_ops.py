"""Semantics unit tests for the round-5 diagnostics batch — boundary cases
the sf-scale oracle parity cannot isolate: the CUSUM split on a step
series, zero seasonal residuals on a constant series, Benford shares on a
uniform-digit sample, Gini = 0 under perfect equality, Apriori triple
support, the attribution window cutoff, and the Bloom no-false-negative
guarantee."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from autonomus_datapipeline_spark.workloads import diagnostics_ops


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _patch_tables(monkeypatch, tables: dict):
    monkeypatch.setattr(
        diagnostics_ops, "load_table", lambda spark, sf, name, **kw: tables[name]
    )


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def test_cusum_finds_step_change(spark, monkeypatch):
    """Counts [10,10,10,0,0,0] step down after day 3 → the |n·C_t − t·S|
    argmax is t = 3, with exact before/after means 10 and 0."""
    base = dt.date(2024, 1, 1)
    rows = []
    oid = 0
    for d in range(6):
        for _ in range(10 if d < 3 else 0):
            rows.append((oid, base + dt.timedelta(days=d)))
            oid += 1
    # day rows with zero orders don't exist — emit a 1-order day instead of
    # an empty one for days 4-6 so the series is [10,10,10,1,1,1]
    for d in range(3, 6):
        rows.append((oid, base + dt.timedelta(days=d)))
        oid += 1
    orders = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date")
    _patch_tables(monkeypatch, {"orders": orders})
    (row,) = _rows(diagnostics_ops.cusum_changepoint_daily_orders(spark, "x"))
    change_day, t, n_days, cusum_num, mean_before, mean_after = row
    assert (change_day, t, n_days) == (base + dt.timedelta(days=2), 3, 6)
    assert mean_before == 10.0 and mean_after == 1.0
    # n·C_t − t·S = 6·30 − 3·33 = 81
    assert cusum_num == 81


# ---------------------------------------------------------------------------
# Trend / seasonal decomposition
# ---------------------------------------------------------------------------


def test_seasonal_residuals_zero_on_constant_series(spark, monkeypatch):
    """Constant daily revenue → centered MA equals the value → residual 0
    for every full-window day; 13 days leave exactly one day per dow."""
    base = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(base + dt.timedelta(days=d), 100.0) for d in range(13)],
        "o_orderdate date, o_totalprice double",
    )
    _patch_tables(monkeypatch, {"orders": orders})
    rows = _rows(diagnostics_ops.trend_seasonal_decompose(spark, "x"))
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert all(r[1] == 1 for r in rows)
    assert all(r[2] == 0.0 for r in rows)


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------


def test_benford_uniform_digits(spark, monkeypatch):
    """One order per leading digit 1..9 → observed share 1/9 each; sub-1
    values are excluded; deviation matches the literal expectation."""
    orders = spark.createDataFrame(
        [(float(d) * 10 + 0.75,) for d in range(1, 10)] + [(0.5,)],
        "o_totalprice double",
    )
    _patch_tables(monkeypatch, {"orders": orders})
    rows = _rows(diagnostics_ops.benford_first_digit_audit(spark, "x"))
    assert len(rows) == 9
    for digit, n, obs, exp, dev in rows:
        assert n == 1
        assert obs == pytest.approx(1 / 9)
        assert exp == pytest.approx(math.log10(1 + 1 / digit))
        assert dev == pytest.approx(obs - exp)


# ---------------------------------------------------------------------------
# Gini
# ---------------------------------------------------------------------------


def test_gini_zero_under_perfect_equality(spark, monkeypatch):
    orders = spark.createDataFrame(
        [(c, 250.0) for c in range(1, 5)], "o_custkey long, o_totalprice double"
    )
    _patch_tables(monkeypatch, {"orders": orders})
    (row,) = _rows(diagnostics_ops.gini_revenue_concentration(spark, "x"))
    n, total, gini = row
    assert (n, total) == (4, 1000.0)
    assert gini == 0.0


def test_gini_concentration_increases(spark, monkeypatch):
    """[1,1,1,97] is far more concentrated than [25,25,25,25]."""
    orders = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0), (4, 97.0)],
        "o_custkey long, o_totalprice double",
    )
    _patch_tables(monkeypatch, {"orders": orders})
    (row,) = _rows(diagnostics_ops.gini_revenue_concentration(spark, "x"))
    # exact: (2*(1*1+2*1+3*1+4*97) - 5*100) / (4*100) = (2*394-500)/400
    assert row[2] == pytest.approx((2 * 394 - 500) / 400)


# ---------------------------------------------------------------------------
# Triples
# ---------------------------------------------------------------------------


def test_triple_support_threshold(spark, monkeypatch):
    """{1,2,3} twice → support 2 survives; {1,2,4} once → pruned."""
    li = spark.createDataFrame(
        [(1, p) for p in (1, 2, 3)]
        + [(2, p) for p in (1, 2, 3)]
        + [(3, p) for p in (1, 2, 4)],
        "l_orderkey long, l_partkey long",
    )
    _patch_tables(monkeypatch, {"lineitem": li})
    rows = _rows(diagnostics_ops.market_basket_triples(spark, "x"))
    assert rows == [(1, 2, 3, 2, 1)]


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------


def test_attribution_window_and_ordering(spark, monkeypatch):
    """A purchase credits the most recent preceding non-purchase event;
    purchases with no prior touch or a touch older than 7 days drop."""
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    events = spark.createDataFrame(
        [
            # user 1: view then click then purchase → credited to click, 5s
            (1, 1, "view", t0),
            (2, 1, "click", t0 + dt.timedelta(seconds=10)),
            (3, 1, "purchase", t0 + dt.timedelta(seconds=15)),
            # user 2: purchase with no preceding touch → dropped
            (4, 2, "purchase", t0),
            # user 3: touch 8 days before purchase → outside window
            (5, 3, "view", t0 - dt.timedelta(days=8)),
            (6, 3, "purchase", t0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    _patch_tables(monkeypatch, {"events": events})
    rows = _rows(diagnostics_ops.purchase_attribution_last_touch(spark, "x"))
    assert rows == [("click", 1, 5, 5.0)]


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark, monkeypatch):
    """A probe whose content hash IS in the corpus must be Bloom-positive
    (n_false_neg == 0 — the structural guarantee)."""
    docs = spark.createDataFrame(
        [(2, "shared text", "s"), (1, "shared text", "s"), (3, "only here", "s")],
        "doc_id long, text string, source string",
    )
    _patch_tables(monkeypatch, {"documents": docs})
    (row,) = _rows(diagnostics_ops.bloom_filter_fpr_audit(spark, "x"))
    n_probes, n_true, n_bloom, n_fp, n_fn = row
    assert n_probes == 2 and n_true == 1
    assert n_fn == 0
    assert n_bloom >= n_true
