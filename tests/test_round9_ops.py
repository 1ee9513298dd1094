"""Round-9 operator internals: the Viterbi segmenter against brute-force
enumeration, the isotonic minimax fit against a sequential PAVA reference,
and the Fellegi-Sunter decision surface's invariants. Corpus-wide behavior
is pinned by the DuckDB oracles (tests/test_queries_oracle.py); these pin
the algorithmic cores on shapes the synthetic tables may never produce."""

from __future__ import annotations

import random

from autonomus_datapipeline_spark.workloads.training_prep import (
    _UVT_MAXP,
    _uvt_segment,
)


# ---------------------------------------------------------------------------
# Viterbi segmenter vs exhaustive enumeration
# ---------------------------------------------------------------------------


def _brute_force_best(word: str, cost: dict[str, int]):
    """Enumerate EVERY segmentation into dict pieces (length <= _UVT_MAXP)
    and return the (total_cost, ' '-joined-with-leading-space) minimum —
    the spec _uvt_segment must match, tiebreak included."""
    best = None
    def rec(i: int, acc_cost: int, acc_seg: str):
        nonlocal best
        if i == len(word):
            cand = (acc_cost, acc_seg)
            if best is None or cand < best:
                best = cand
            return
        for length in range(1, min(_UVT_MAXP, len(word) - i) + 1):
            piece = word[i:i + length]
            c = cost.get(piece)
            if c is not None:
                rec(i + length, acc_cost + c, acc_seg + " " + piece)
    rec(0, 0, "")
    return best


def test_viterbi_prefers_cheaper_multichar_pieces():
    cost = {"a": 10, "b": 10, "ab": 5, "ba": 1}
    # 'aba': [ab,a]=15 vs [a,ba]=11 → global optimum uses ba
    assert _uvt_segment("aba", cost) == ["a", "ba"]


def test_viterbi_tiebreak_is_lexicographic_on_joined_segmentation():
    # two optimal segmentations with equal cost: ' a bc' < ' ab c'
    cost = {"a": 1, "c": 1, "ab": 2, "bc": 2, "b": 100}
    assert _uvt_segment("abc", cost) == ["a", "bc"]
    # space sorts before any letter: the MORE-split candidate wins a tie
    cost2 = {"a": 1, "b": 1, "ab": 2}
    assert _uvt_segment("ab", cost2) == ["a", "b"]


def test_viterbi_matches_brute_force_on_random_inputs():
    rng = random.Random(909)
    alphabet = "abc"
    for _ in range(300):
        word = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 9))
        )
        # char coverage guaranteed; random multi-char pieces
        cost = {ch: rng.randint(1, 60) for ch in alphabet}
        for _ in range(rng.randint(0, 8)):
            ln = rng.randint(2, _UVT_MAXP)
            piece = "".join(rng.choice(alphabet) for _ in range(ln))
            cost[piece] = rng.randint(1, 60)
        got = _uvt_segment(word, cost)
        want_cost, want_seg = _brute_force_best(word, cost)
        assert got == want_seg.split()
        assert sum(cost[p] for p in got) == want_cost


# ---------------------------------------------------------------------------
# Isotonic minimax vs sequential PAVA
# ---------------------------------------------------------------------------


def _minimax_iso(buckets):
    """The query's formulation: iso(i) = max_{j<=i} min_{k>=j} pooled."""
    out = []
    B = len(buckets)
    for i in range(B):
        cands = []
        for j in range(i + 1):
            pools = []
            for k in range(j, B):
                sg = sum(g for g, _ in buckets[j:k + 1])
                sn = sum(n for _, n in buckets[j:k + 1])
                pools.append(sg / sn)
            cands.append(min(pools))
        out.append(max(cands))
    return out


def _pava(buckets):
    """Textbook sequential pool-adjacent-violators (weighted)."""
    blocks = [[g, n] for g, n in buckets]  # [sum_g, sum_n]
    idx = [1] * len(buckets)               # buckets per block
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            idx[i] += idx[i + 1]
            del blocks[i + 1], idx[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    out = []
    for (g, n), reps in zip(blocks, idx):
        out.extend([g / n] * reps)
    return out


def test_minimax_equals_sequential_pava_on_random_inputs():
    rng = random.Random(910)
    for _ in range(200):
        B = rng.randint(1, 10)
        buckets = [
            (rng.randint(0, 20), 0) for _ in range(B)
        ]
        buckets = [(g, g + rng.randint(1, 20)) for g, _ in buckets]
        mm = _minimax_iso(buckets)
        pv = _pava(buckets)
        assert all(abs(a - b) < 1e-12 for a, b in zip(mm, pv))
        # monotone non-decreasing by construction
        assert all(mm[i] <= mm[i + 1] + 1e-15 for i in range(len(mm) - 1))


def test_minimax_pools_a_single_violation():
    # rates 0.5, 0.2 → pooled (g=7,n=20)=0.35 on both buckets
    assert _minimax_iso([(5, 10), (2, 10)]) == [0.35, 0.35]


# ---------------------------------------------------------------------------
# Fellegi-Sunter decision surface invariants (on the live sf table)
# ---------------------------------------------------------------------------


def test_fellegi_sunter_invariants(spark, sf_dir):
    from autonomus_datapipeline_spark.workloads.mining_ops import (
        fellegi_sunter_part_linkage,
    )

    rows = fellegi_sunter_part_linkage(spark, sf_dir).collect()
    assert rows, "blocked pairs must exist"
    by_pat = {
        (r["agree_name2"], r["agree_type"], r["agree_size"], r["agree_price"]): r
        for r in rows
    }
    for r in rows:
        assert 0.0 < r["u_prob"] < 1.0
        assert 0.0 < r["m_prob"] < 1.0
        assert r["n_pairs"] > 0
        lr = r["likelihood_ratio"]
        assert lr == r["m_prob"] / r["u_prob"]
        want = (
            "match" if lr >= 1000.0
            else "possible" if lr >= 10.0
            else "non_match"
        )
        assert r["decision"] == want
    # full agreement is the strongest evidence: if present, it dominates
    # every other realized pattern's likelihood ratio
    full = by_pat.get((True, True, True, True))
    if full is not None:
        assert all(
            full["likelihood_ratio"] >= r["likelihood_ratio"] for r in rows
        )
    # patterns partition the blocked-pair set: totals must reconcile with
    # an independent pair count
    from autonomus_datapipeline_spark.workloads.registry import load_table
    from pyspark.sql import functions as F

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.split("p_name", " ").getItem(0).alias("w"),
        "p_brand",
    )
    a, b = p.alias("a"), p.alias("b")
    n_pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.w") == F.col("b.w"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs


# ---------------------------------------------------------------------------
# RRF fusion + conformal calibration invariants (oracle pins exact values)
# ---------------------------------------------------------------------------


def test_rrf_fusion_invariants(spark, sf_dir):
    from autonomus_datapipeline_spark.workloads.search_ops import (
        _RRF_K,
        _RRF_NQ,
        _RRF_TOP,
        hybrid_rrf_fusion,
    )

    rows = hybrid_rrf_fusion(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["query_id"] < _RRF_NQ
        assert r["doc_id"] != r["query_id"]
        assert 1 <= r["fused_rank"] <= _RRF_TOP
        want = (0.0 if r["lex_rank"] is None else 1.0 / (_RRF_K + r["lex_rank"])) + (
            0.0 if r["dense_rank"] is None else 1.0 / (_RRF_K + r["dense_rank"])
        )
        assert r["rrf_score"] == want
        assert r["lex_rank"] is not None or r["dense_rank"] is not None
        by_q.setdefault(r["query_id"], []).append(r)
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r["fused_rank"])
        # fused order must be (score desc, doc_id asc)
        for a, b in zip(lst, lst[1:]):
            assert (a["rrf_score"], -a["doc_id"]) >= (b["rrf_score"], -b["doc_id"])


def test_conformal_calibration_invariants(spark, sf_dir):
    from autonomus_datapipeline_spark.workloads.stats_ops import (
        conformal_interval_calibration,
    )

    rows = conformal_interval_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # k = ceil(0.9 * (n_cal + 1)), pure-integer form
        assert r["k"] == (9 * (r["n_cal"] + 1) + 9) // 10
        assert 1 <= r["k"] <= r["n_cal"]
        assert r["qhat"] >= 0.0
        assert 0 <= r["n_covered"] <= r["n_test"]
        assert r["coverage"] == r["n_covered"] / r["n_test"]


# ---------------------------------------------------------------------------
# MMR greedy loop
# ---------------------------------------------------------------------------


def test_mmr_diversity_beats_plain_topk():
    from autonomus_datapipeline_spark.workloads.search_ops import (
        _mmr_greedy_rows,
    )

    # candidate 2 is nearly as relevant as 1 but near-duplicates it;
    # candidate 3 is less relevant but diverse -> MMR picks 3 second
    rel = {1: 0.9, 2: 0.89, 3: 0.5}
    sim = {
        (1, 2): 0.95, (2, 1): 0.95,
        (1, 3): 0.0, (3, 1): 0.0,
        (2, 3): 0.0, (3, 2): 0.0,
    }
    rows = _mmr_greedy_rows(rel, 1, sim, 3)
    assert [r[0] for r in rows] == [1, 3, 2]
    assert [r[2] for r in rows] == [1, 2, 3]


def test_mmr_greedy_is_stepwise_optimal_on_random_inputs():
    import random

    from autonomus_datapipeline_spark.workloads.search_ops import (
        _mmr_greedy_rows,
    )

    rng = random.Random(911)
    for _ in range(100):
        n = rng.randint(1, 12)
        ids = list(range(n))
        rel = {i: round(rng.random(), 6) for i in ids}
        sim = {}
        for a in ids:
            for b in ids:
                if a != b and (b, a) in sim:
                    sim[(a, b)] = sim[(b, a)]
                elif a != b:
                    sim[(a, b)] = round(rng.random(), 6)
        seed = min(ids, key=lambda i: (-rel[i], i))
        k = rng.randint(1, n)
        rows = _mmr_greedy_rows(rel, seed, sim, k)
        assert rows[0][0] == seed
        picked = [r[0] for r in rows]
        assert len(picked) == min(k, n)
        assert len(set(picked)) == len(picked)
        # post-hoc stepwise optimality: at every step the chosen id had
        # the (score DESC, id ASC)-maximal objective among the remaining
        for step in range(1, len(picked)):
            sel = picked[:step]
            def key(c):
                ms = max(sim[(c, s)] for s in sel)
                return (-(0.5 * rel[c] - 0.5 * ms), c)
            remaining = [c for c in ids if c not in sel]
            assert picked[step] == min(remaining, key=key)


# ---------------------------------------------------------------------------
# IPF raking invariants
# ---------------------------------------------------------------------------


def test_ipf_raking_restores_margins(spark, sf_dir):
    from pyspark.sql import functions as F

    from autonomus_datapipeline_spark.workloads.curation_ops import (
        ipf_raking_weights,
    )
    from autonomus_datapipeline_spark.workloads.registry import load_table

    w = ipf_raking_weights(spark, sf_dir)
    rows = w.collect()
    assert rows
    for r in rows:
        assert r["w_pico"] > 0
        assert r["weight"] == r["w_pico"] / 1e12
    # the LAST adjustment scaled to the source margin: achieved source
    # totals must match targets to within the picounit-floor residual
    ach = {
        r["source"]: r["a"]
        for r in w.groupBy("source")
        .agg(F.sum("weighted_rows").alias("a"))
        .collect()
    }
    tgt = {
        r["source"]: r["count"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .collect()
    }
    for k, a in ach.items():
        # floor-quantization only ever under-shoots, by < n_cells ulps
        assert tgt[k] * (1 - 1e-9) - 1e-6 <= a <= tgt[k] + 1e-9


# ---------------------------------------------------------------------------
# V-optimal histogram: true-optimality check by exhaustive enumeration
# ---------------------------------------------------------------------------


def test_voptimal_histogram_is_truly_optimal(spark, sf_dir):
    import itertools
    import math

    from pyspark.sql import functions as F

    from autonomus_datapipeline_spark.workloads.registry import load_table
    from autonomus_datapipeline_spark.workloads.scale_ops import (
        _VOPT_BAND,
        _VOPT_K,
        voptimal_histogram,
    )

    out = {r["k"]: r for r in voptimal_histogram(spark, sf_dir).collect()}
    assert set(out) == set(range(1, _VOPT_K + 1))
    # SSE is non-increasing in k; boundaries well-formed
    for k in range(1, _VOPT_K + 1):
        bounds = [int(x) for x in out[k]["boundaries"].split(",")]
        assert len(bounds) == k
        assert bounds == sorted(bounds)
        if k > 1:
            assert out[k]["total_sse"] <= out[k - 1]["total_sse"] + 1e-9

    # brute force: enumerate EVERY k-partition of the base buckets from
    # the same integer moments and confirm the query found the optimum
    b = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.floor(F.col("o_totalprice") / F.lit(_VOPT_BAND))
            .cast("bigint")
            .alias("bucket"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("u"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("u").alias("s"),
            F.sum(F.col("u") * F.col("u")).alias("ss"),
        )
        .orderBy("bucket")
        .collect()
    )
    buckets = [(int(r["bucket"]), int(r["n"]), int(r["s"]), int(r["ss"])) for r in b]
    B = len(buckets)

    def sse(lo: int, hi: int) -> float:  # python floats = IEEE doubles
        n = sum(x[1] for x in buckets[lo:hi])
        s = sum(x[2] for x in buckets[lo:hi])
        ss = sum(x[3] for x in buckets[lo:hi])
        return float(ss) - (float(s) * float(s)) / float(n)

    for k in range(1, _VOPT_K + 1):
        best = math.inf
        for cuts in itertools.combinations(range(1, B), k - 1):
            edges = [0, *cuts, B]
            tot = 0.0
            for lo, hi in zip(edges, edges[1:]):
                tot = tot + sse(lo, hi)
            best = min(best, tot)
        # the query's DP adds per-segment SSEs left-to-right, same as the
        # enumeration; allow 1-ulp-scale slack for summation order
        assert abs(out[k]["total_sse"] - best) <= max(1e-6, abs(best) * 1e-12)


# ---------------------------------------------------------------------------
# Shapley attribution: efficiency axiom
# ---------------------------------------------------------------------------


def test_shapley_attribution_efficiency_axiom(spark, sf_dir):
    from pyspark.sql import functions as F

    from autonomus_datapipeline_spark.workloads.diagnostics_ops import (
        _SHAP_CHANNELS,
        shapley_channel_attribution,
    )
    from autonomus_datapipeline_spark.workloads.registry import load_table

    rows = shapley_channel_attribution(spark, sf_dir).collect()
    assert [r["channel"] for r in rows] == sorted(_SHAP_CHANNELS)
    total = sum(r["shapley_value"] for r in rows)

    # efficiency: sum of Shapley values = v(full set) - v(empty set),
    # up to the 32-term picounit floor error
    ev = load_table(spark, sf_dir, "events")
    bits = None
    for i, ch in enumerate(_SHAP_CHANNELS):
        t = F.max(F.when(F.col("event_type") == ch, F.lit(1 << i)).otherwise(0))
        bits = t if bits is None else bits + t
    ux = ev.groupBy("user_id").agg(
        bits.alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    vs = {
        r["mask"]: (r["c"], r["u"])
        for r in ux.groupBy("mask")
        .agg(F.sum("conv").alias("c"), F.count(F.lit(1)).alias("u"))
        .collect()
    }
    full = (1 << len(_SHAP_CHANNELS)) - 1
    v_full = vs[full][0] / vs[full][1] if full in vs else 0.0
    v_empty = vs[0][0] / vs[0][1] if 0 in vs else 0.0
    assert abs(total - (v_full - v_empty)) < 32e-12 + 1e-9
