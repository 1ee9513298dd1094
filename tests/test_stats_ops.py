"""Semantics unit tests for the round-5 stats/sketch/graph batch — boundary
cases the sf-scale oracle parity cannot isolate: KS complete separation,
Mann-Whitney tie handling (doubled-U exactness), count-min overestimate
guarantee, Flesch formula on a known sentence, LPA min-label convergence on
disjoint cliques, k-core peeling of a pendant vertex, ACF against a
Python-computed exact rational, EWMA on a constant series, add-one bigram
probabilities, and shingle posting lists."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

import pytest

from autonomus_datapipeline_spark.workloads import stats_ops


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _patch_tables(monkeypatch, tables: dict):
    monkeypatch.setattr(
        stats_ops, "load_table", lambda spark, sf, name, **kw: tables[name]
    )


# ---------------------------------------------------------------------------
# KS / Mann-Whitney
# ---------------------------------------------------------------------------


def _two_segment_tables(spark, a_vals, b_vals):
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")], "c_custkey long, c_mktsegment string"
    )
    orders = spark.createDataFrame(
        [(1, float(v)) for v in a_vals] + [(2, float(v)) for v in b_vals],
        "o_custkey long, o_totalprice double",
    )
    return {"orders": orders, "customer": cust}


def test_ks_complete_separation(spark, monkeypatch):
    """A = {1,2}, B = {3,4}: the empirical CDFs separate fully → D = 1."""
    _patch_tables(monkeypatch, _two_segment_tables(spark, [1, 2], [3, 4]))
    (row,) = _rows(stats_ops.ks_two_sample_order_value(spark, "unused"))
    n1, n2, d_num, ks = row
    assert (n1, n2) == (2, 2)
    assert d_num == n1 * n2
    assert ks == 1.0


def test_ks_identical_samples(spark, monkeypatch):
    """Identical samples → D = 0."""
    _patch_tables(monkeypatch, _two_segment_tables(spark, [5, 7], [5, 7]))
    (row,) = _rows(stats_ops.ks_two_sample_order_value(spark, "unused"))
    assert row[2] == 0 and row[3] == 0.0


def test_mann_whitney_tie_half_integral_u(spark, monkeypatch):
    """A = [1], B = [1]: U1 = ½ (pure tie) — exactly the half-integral case
    that forced the doubled-U output. u1_x2 = 1, auc = ¼... no: auc =
    2U1/(2n1n2) = 1/2 — a pure tie is a coin flip."""
    _patch_tables(monkeypatch, _two_segment_tables(spark, [1], [1]))
    (row,) = _rows(stats_ops.mann_whitney_order_value(spark, "unused"))
    n1, n2, u1_x2, auc = row
    assert (n1, n2, u1_x2) == (1, 1, 1)
    assert auc == 0.5


def test_mann_whitney_complete_dominance(spark, monkeypatch):
    """Every A value above every B value → U1 = n1·n2, auc = 1."""
    _patch_tables(monkeypatch, _two_segment_tables(spark, [10, 11], [1, 2, 3]))
    (row,) = _rows(stats_ops.mann_whitney_order_value(spark, "unused"))
    n1, n2, u1_x2, auc = row
    assert u1_x2 == 2 * n1 * n2
    assert auc == 1.0


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_countmin_never_underestimates(spark, monkeypatch):
    """The CM guarantee: estimate ≥ true count for every key, and with far
    fewer keys than cells the estimate is exact."""
    events = spark.createDataFrame(
        [(u,) for u in [1] * 5 + [2] * 3 + [3] * 2], "user_id long"
    )
    _patch_tables(monkeypatch, {"events": events})
    rows = _rows(stats_ops.countmin_heavy_hitters(spark, "unused"))
    assert [r[0] for r in rows] == [1, 2, 3]  # ranked by true count desc
    for _uid, true_n, est, over, _rk in rows:
        assert est >= true_n and over == est - true_n
    # 3 keys in 4×251 cells: collisions are impossible within a depth row
    # only probabilistically — but the MIN across 4 independent rows makes
    # an inflated estimate for all 4 simultaneously astronomically unlikely;
    # with this fixed seedless hash the expected result is exact.
    assert all(r[3] == 0 for r in rows)


# ---------------------------------------------------------------------------
# Flesch reading ease
# ---------------------------------------------------------------------------


def test_flesch_known_sentence(spark, monkeypatch):
    """'the cat sat.' → 3 words, 1 sentence, 3 vowel groups:
    206.835 − 1.015·3 − 84.6·1 = 119.19 → very_easy."""
    docs = spark.createDataFrame(
        [(1, "the cat sat.", "s")], "doc_id long, text string, source string"
    )
    _patch_tables(monkeypatch, {"documents": docs})
    (row,) = _rows(stats_ops.flesch_reading_buckets(spark, "unused"))
    band, n_docs, sum_score, total_words = row
    assert (band, n_docs, total_words) == ("very_easy", 1, 3)
    assert sum_score == pytest.approx(206.835 - 1.015 * 3 - 84.6, abs=1e-6)


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def test_lpa_disjoint_cliques_converge_to_min_label(spark, monkeypatch):
    """Two disjoint co-purchase triangles each collapse to their minimum
    part id after two rounds."""
    li = spark.createDataFrame(
        [(1, p) for p in (1, 2, 3)] + [(2, p) for p in (10, 11, 12)],
        "l_orderkey long, l_partkey long",
    )
    _patch_tables(monkeypatch, {"lineitem": li})
    rows = _rows(stats_ops.label_propagation_communities(spark, "unused"))
    assert rows == [(1, 3, 1), (10, 3, 2)]


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


def test_kcore_pendant_peeled_k4_survives(spark, monkeypatch):
    """K4 (all degrees 3) survives k=3 peeling; a pendant vertex hanging
    off it is removed without destabilizing the core."""
    li = spark.createDataFrame(
        [(1, p) for p in (1, 2, 3, 4)] + [(2, 4), (2, 5)],
        "l_orderkey long, l_partkey long",
    )
    _patch_tables(monkeypatch, {"lineitem": li})
    (row,) = _rows(stats_ops.kcore_peeling_summary(spark, "unused"))
    assert row == (4, 6, 3, 3)


def test_kcore_triangle_fully_peeled(spark, monkeypatch):
    """A triangle has max degree 2 < 3 — everything peels away."""
    li = spark.createDataFrame(
        [(1, p) for p in (1, 2, 3)], "l_orderkey long, l_partkey long"
    )
    _patch_tables(monkeypatch, {"lineitem": li})
    (row,) = _rows(stats_ops.kcore_peeling_summary(spark, "unused"))
    assert row == (0, 0, 0, 0)


# ---------------------------------------------------------------------------
# Autocorrelation
# ---------------------------------------------------------------------------


def test_acf_alternating_series_exact(spark, monkeypatch):
    """Hourly counts [2,1,2,1,2,1,2,1] → lag-1 ACF is strongly negative,
    lag-2 strongly positive; values must equal the exact rational
    n²c_k / n²c_0 computed independently in Python."""
    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = []
    eid = 0
    for h in range(8):
        for _ in range(2 if h % 2 == 0 else 1):
            rows.append((eid, base + dt.timedelta(hours=h)))
            eid += 1
    events = spark.createDataFrame(rows, "event_id long, ts timestamp")
    _patch_tables(monkeypatch, {"events": events})
    out = _rows(stats_ops.acf_hourly_events(spark, "unused"))

    x = [2, 1, 2, 1, 2, 1, 2, 1]
    n, s = len(x), sum(x)
    ssq = sum(v * v for v in x)
    den = n * n * ssq - n * s * s
    for lag, n_pairs, acf in out:
        pairs = [(x[t], x[t - lag]) for t in range(lag, n)]
        sp = sum(a * b for a, b in pairs)
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        num = n * n * sp - n * s * (sa + sb) + (n - lag) * s * s
        assert n_pairs == n - lag
        assert acf == pytest.approx(float(Fraction(num, den)), abs=1e-12)
    assert out[0][2] < -0.5 and out[1][2] > 0.5


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_constant_series_stays_constant(spark, monkeypatch):
    """Constant daily revenue → the renormalized EWMA equals the constant
    EXACTLY (the arithmetic is exact decimal up to one final division) and
    n_terms grows to the lookback cap."""
    base = dt.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(base + dt.timedelta(days=d), 100.0) for d in range(20)],
        "o_orderdate date, o_totalprice double",
    )
    _patch_tables(monkeypatch, {"orders": orders})
    rows = _rows(stats_ops.ewma_daily_revenue(spark, "unused"))
    assert len(rows) == 20
    assert [r[1] for r in rows] == [
        min(d + 1, stats_ops._EWMA_LOOKBACK) for d in range(20)
    ]
    for _day, _n, ewma in rows:
        assert ewma == 100.0


def test_ewma_bit_exact_vs_duckdb(spark, sf_dir):
    """The r8 driver-red row was a sub-1e-10 cross-engine float drift the
    10-sig-digit local gate couldn't see.  Pin the repaired design's claim
    at FULL precision: every ewma double out of Spark must be bit-identical
    (float.hex) to DuckDB's, because both operands of the one division are
    exactly representable and exactly converted."""
    import duckdb

    from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY, TABLES

    spec = QUERY_REGISTRY["ewma_daily_revenue"]
    srows = {r["day"]: (r["n_terms"], r["ewma"]) for r in spec.fn(spark, sf_dir).collect()}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    drows = {r[0]: (r[1], r[2]) for r in con.execute(spec.oracle).fetchall()}
    drows = {
        (k.date() if isinstance(k, dt.datetime) else k): v for k, v in drows.items()
    }
    assert set(srows) == set(drows)
    for day, (n, e) in srows.items():
        dn, de = drows[day]
        assert n == dn
        assert float(e).hex() == float(de).hex(), (day, e, de)


# ---------------------------------------------------------------------------
# Bigram LM
# ---------------------------------------------------------------------------


def test_bigram_lm_single_pattern_prob_one(spark, monkeypatch):
    """Two copies of 'a b': c(a,b)=2, c(a)=2, V=1 → P = (2+1)/(2+1) = 1.0
    per bigram, mean 1.0 per doc, source sum 2.0."""
    docs = spark.createDataFrame(
        [(1, "a b", "s"), (2, "a b", "s")],
        "doc_id long, text string, source string",
    )
    _patch_tables(monkeypatch, {"documents": docs})
    (row,) = _rows(stats_ops.bigram_lm_source_scores(spark, "unused"))
    assert row == ("s", 2, 2.0)


def test_bigram_lm_short_docs_excluded(spark, monkeypatch):
    """Single-token docs produce no bigrams and must not appear."""
    docs = spark.createDataFrame(
        [(1, "only", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    _patch_tables(monkeypatch, {"documents": docs})
    rows = _rows(stats_ops.bigram_lm_source_scores(spark, "unused"))
    assert [r[0] for r in rows] == ["s2"]


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_sorted_postings(spark, monkeypatch):
    """A 3-gram shared by docs 3 and 1 lists postings sorted ascending;
    df-1 shingles are excluded by the band."""
    docs = spark.createDataFrame(
        [
            (3, "x y z w", "s"),
            (1, "x y z", "s"),
            (2, "q r s t", "s"),
        ],
        "doc_id long, text string, source string",
    )
    _patch_tables(monkeypatch, {"documents": docs})
    rows = _rows(stats_ops.inverted_index_postings(spark, "unused"))
    assert rows == [("x y z", 2, "1,3", 1)]
