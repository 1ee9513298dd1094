"""Similarity operator units: trained IVF (library path) and frozen IVF.

The registered query `ann_ivf_frozen_topk` carries the oracle check for the
frozen-codebook path; the trained KMeans path (`similarity.ivf_topk`) is the
online-training variant kept as library code — these tests pin its contract
so retiring its registry entry does not orphan it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import similarity

# Two tight clusters far apart: vectors 0-3 near +e1, vectors 10-13 near +e2.
_DIM = 4


def _clustered_df(spark):
    rows = []
    for i, eps in zip(range(4), (0.00, 0.01, 0.02, 0.03)):
        rows.append((i, [1.0, eps, 0.0, 0.0]))
    for i, eps in zip(range(10, 14), (0.00, 0.01, 0.02, 0.03)):
        rows.append((i, [eps, 1.0, 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_ivf_topk_trained_finds_cluster_neighbors(spark):
    emb = _clustered_df(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = similarity.ivf_topk(q, emb, k=3, n_clusters=2, n_probe=1).collect()
    assert [r["rk"] for r in out] == [1, 2, 3]
    # with 1 probe on 2 well-separated cells, all neighbors come from the
    # query's own cluster
    assert {r["neighbor_id"] for r in out} == {1, 2, 3}
    assert all(r["cosine"] > 0.99 for r in out)


def test_ivf_topk_frozen_matches_hand_centroids(spark):
    emb = _clustered_df(spark)
    q = emb.filter(F.col("vec_id").isin(0, 10))
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = similarity.ivf_topk_frozen(
        q, emb, k=3, centroids=centroids, n_probe=1
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q[0] == {1, 2, 3}
    assert by_q[10] == {11, 12, 13}


def test_ivf_frozen_probe_widening_reaches_other_cell(spark):
    emb = _clustered_df(spark)
    q = emb.filter(F.col("vec_id") == 0)
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = similarity.ivf_topk_frozen(
        q, emb, k=7, centroids=centroids, n_probe=2
    ).collect()
    # 2 probes cover both cells → all 7 other vectors are candidates
    assert {r["neighbor_id"] for r in out} == {1, 2, 3, 10, 11, 12, 13}


def test_frozen_codebook_module_shape():
    from autonomus_datapipeline_spark.workloads._ivf_centroids import IVF_CENTROIDS

    assert len(IVF_CENTROIDS) == 16
    assert all(len(c) == 64 for c in IVF_CENTROIDS)
    # literals must round-trip: repr() parses back to the identical double
    for c in IVF_CENTROIDS[:2]:
        for w in c:
            assert float(repr(w)) == w


def test_blocked_neardup_drops_zero_norm_vectors_like_oracle(spark):
    """A zero-norm vector yields a non-finite cosine; DuckDB's division by
    zero is NULL, so the oracle drops such pairs — the engine must drop
    them too (and must not raise ANSI DIVIDE_BY_ZERO)."""
    df = spark.createDataFrame(
        [
            (1, "b", [0.0, 0.0, 0.0, 0.0]),
            (2, "b", [1.0, 0.0, 0.0, 0.0]),
            (3, "b", [1.0, 0.0, 0.0, 1e-6]),
        ],
        "vec_id bigint, blk string, embedding array<double>",
    )
    got = similarity.blocked_neardup_pairs(df, "blk", 0.9).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(2, 3)]


def test_blocked_neardup_excludes_duplicate_id_self_pairs(spark):
    """Two rows sharing one id value must not emit an id_a == id_b pair
    (the oracle's a.id < b.id join excludes them)."""
    df = spark.createDataFrame(
        [
            (1, "b", [1.0, 0.0, 0.0, 0.0]),
            (1, "b", [1.0, 0.0, 0.0, 0.0]),
            (2, "b", [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, blk string, embedding array<double>",
    )
    got = similarity.blocked_neardup_pairs(df, "blk", 0.9).collect()
    assert all(r.id_a != r.id_b for r in got)


def test_gram_matrix_matches_numpy_full_dim(spark):
    """Batched-partial Gram (production path) equals the direct numpy Gram
    over the whole table, upper triangle, within float tolerance."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    ).repartition(4)
    got = {(r.i, r.j): r.dot for r in similarity.gram_matrix(df).collect()}
    g = vecs.astype("float64").T @ vecs.astype("float64")
    assert len(got) == 8 * 9 // 2
    for (i, j), v in got.items():
        assert abs(v - g[i - 1, j - 1]) < 1e-9


def test_pca_project_matches_numpy(spark):
    """Two-scan distributed PCA equals driver-side numpy PCA (same sign
    convention) on the full table."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(60, 6)) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.1, 0.05])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id bigint, embedding array<double>",
    ).repartition(5)
    got = {r.vec_id: np.array(r.components)
           for r in similarity.pca_project(df, 3).collect()}

    mu = base.mean(axis=0)
    cov = np.cov(base, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    w = vecs[:, order]
    flips = np.sign(w[np.abs(w).argmax(axis=0), np.arange(3)])
    w = w * flips
    expect = (base - mu) @ w
    assert len(got) == 60
    for i in range(60):
        assert np.allclose(got[i], expect[i], atol=1e-8), i
    # variance really concentrates in the leading components
    proj = np.stack([got[i] for i in range(60)])
    v = proj.var(axis=0)
    assert v[0] > v[1] > v[2]


# ---------------------------------------------------------------------------
# SemDeDup cell prune (workloads/pipeline_ops.semdedup_cell_prune)
# ---------------------------------------------------------------------------


def _semdedup_summary(spark, emb, centroids, tau):
    """Mirror of the semdedup_cell_prune query body over hand centroids."""
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell_id int, cvec array<double>",
    )
    clustered = similarity.nearest_cells_exact(
        emb, cent, 1, "embedding", "vec_id"
    ).select(
        F.col("id").alias("vec_id"), "cell_id", F.col("vec").alias("embedding")
    )
    pairs = similarity.blocked_neardup_pairs(clustered, "cell_id", tau)
    pruned = pairs.select(
        F.col("block").alias("cell_id"), F.col("id_b").alias("vec_id")
    ).distinct()
    return clustered, pruned


def test_semdedup_prunes_within_cell_keeps_lowest_id(spark):
    """Within a cell, every member cosine-close to a lower-id member is
    pruned — one representative (the lowest id) survives per dup group."""
    emb = _clustered_df(spark)  # ids 0-3 near +e1, ids 10-13 near +e2
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    clustered, pruned = _semdedup_summary(spark, emb, centroids, 0.99)
    got = {r.vec_id for r in pruned.collect()}
    # reps 0 and 10 survive; every other member is a near-dup of them
    assert got == {1, 2, 3, 11, 12, 13}


def test_semdedup_never_compares_across_cells(spark):
    """Two near-identical vectors assigned to DIFFERENT cells are not a
    candidate pair — SemDeDup's contract is within-cell pruning only."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    # both vectors sit on a cell boundary: 0 → cell 0, 1 → cell 1
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    clustered, pruned = _semdedup_summary(spark, emb, centroids, -1.0)
    cells = dict((r.vec_id, r.cell_id) for r in clustered.collect())
    assert cells == {0: 0, 1: 1}
    assert pruned.count() == 0  # tau=-1 would prune ANY same-cell pair


def test_semdedup_cell_prune_query_invariants(spark, sf_dir):
    """The registered query over the test tables: per-cell arithmetic holds
    and membership partitions the corpus."""
    from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY

    out = QUERY_REGISTRY["semdedup_cell_prune"].fn(spark, sf_dir).collect()
    assert len(out) >= 1
    assert all(r.n_kept == r.n_members - r.n_pruned for r in out)
    assert all(0 <= r.n_pruned <= r.n_members for r in out)
    cells = [r.cell_id for r in out]
    assert cells == sorted(cells) and len(set(cells)) == len(cells)
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in out) == n_emb


# ---------------------------------------------------------------------------
# DSIR importance selection (workloads/curation_ops.dsir_importance_select)
# ---------------------------------------------------------------------------


def test_dsir_prefers_target_like_documents(spark, monkeypatch):
    """Documents whose n-grams match the target slice's distribution rank
    above off-distribution documents — including target-LIKE docs outside
    the target source (the whole point of the selector)."""
    from autonomus_datapipeline_spark.workloads import curation_ops

    rows = []
    for i in range(3):  # the target slice
        rows.append((i, "alpha beta alpha beta alpha", "en", "src0", 0))
    for i in range(3, 6):  # target-like pool docs, different source
        rows.append((i, "alpha beta alpha beta alpha", "en", "srcX", 0))
    for i in range(6, 12):  # off-distribution pool docs
        rows.append((i, "gamma delta epsilon zeta eta theta", "en", "srcX", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(
        curation_ops, "load_table", lambda spark, sf, name, **kw: docs
    )
    out = curation_ops.dsir_importance_select(spark, "unused").collect()
    assert [r.rk for r in out] == list(range(1, len(out) + 1))
    # weights non-increasing in rank
    ws = [r.dsir_weight_q for r in out]
    assert ws == sorted(ws, reverse=True)
    by_rank = [r.doc_id for r in out]
    # all six alpha-beta docs (target + target-like) outrank every
    # gamma-family doc
    assert set(by_rank[:6]) == set(range(6))
    # a strict gap separates the target-like block from the rest (sign is
    # not guaranteed under add-1 smoothing with tiny counts; order is)
    assert ws[5] > ws[6]


def test_dsir_query_invariants(spark, sf_dir):
    from autonomus_datapipeline_spark.workloads import QUERY_REGISTRY

    out = QUERY_REGISTRY["dsir_importance_select"].fn(spark, sf_dir).collect()
    assert 0 < len(out) <= 50
    assert [r.rk for r in out] == list(range(1, len(out) + 1))
    ws = [r.dsir_weight_q for r in out]
    assert ws == sorted(ws, reverse=True)


# ---------------------------------------------------------------------------
# Product quantization: encode + ADC search
# ---------------------------------------------------------------------------

# 4-dim vectors, M=2 subspaces of 2 dims, K=2 centroids per subspace.
_PQ_BOOKS = [
    [[1.0, 0.0], [0.0, 1.0]],  # subspace 0: e1 vs e2
    [[1.0, 0.0], [0.0, 1.0]],  # subspace 1: e3 vs e4
]


def test_pq_encode_assigns_nearest_subspace_centroid(spark):
    emb = spark.createDataFrame(
        [
            (0, [0.9, 0.1, 0.1, 0.9]),  # -> codes (0, 1)
            (1, [0.1, 0.9, 0.9, 0.1]),  # -> codes (1, 0)
            (2, [0.9, 0.0, 0.8, 0.2]),  # -> codes (0, 0)
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = similarity.pq_encode(emb, _PQ_BOOKS).collect()
    codes = {(r["id"], r["m"]): r["code"] for r in out}
    assert len(out) == 6  # one row per (vector, subspace)
    assert codes[(0, 0)] == 0 and codes[(0, 1)] == 1
    assert codes[(1, 0)] == 1 and codes[(1, 1)] == 0
    assert codes[(2, 0)] == 0 and codes[(2, 1)] == 0


def test_pq_encode_tie_breaks_to_lower_code(spark):
    # Exactly equidistant from both centroids of each subspace.
    emb = spark.createDataFrame(
        [(0, [0.5, 0.5, 0.5, 0.5])], "vec_id bigint, embedding array<double>"
    )
    out = similarity.pq_encode(emb, _PQ_BOOKS).collect()
    assert {r["code"] for r in out} == {0}


def test_pq_adc_matches_numpy_lut_scores(spark):
    import numpy as np

    vecs = {
        0: [0.9, 0.1, 0.1, 0.9],
        1: [0.1, 0.9, 0.9, 0.1],
        2: [0.9, 0.0, 0.8, 0.2],
        3: [0.2, 0.8, 0.1, 0.7],
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = similarity.pq_adc_topk(q, emb, k=3, codebooks=_PQ_BOOKS).collect()

    books = np.array(_PQ_BOOKS)  # (M, K, dsub)

    def encode(v):
        v = np.array(v).reshape(2, 2)
        return [
            int(np.argmin(((books[m] - v[m]) ** 2).sum(axis=1)))
            for m in range(2)
        ]

    def adc(qv, codes):
        qv = np.array(qv).reshape(2, 2)
        return sum(float(qv[m] @ books[m][codes[m]]) for m in range(2))

    expected = {
        nid: round(adc(vecs[0], encode(v)), 6)
        for nid, v in vecs.items()
        if nid != 0
    }
    got = {r["neighbor_id"]: r["adc_score"] for r in out}
    assert got == pytest.approx(expected)
    # ranks follow score desc with id tiebreak
    order = sorted(expected, key=lambda n: (-expected[n], n))
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rk"])] == order


def test_pq_adc_never_reads_corpus_vectors_after_encode(spark):
    # The scoring join consumes ONLY the code table + broadcast LUT: scores
    # of two different vectors with the SAME codes must be identical.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 1.0, 0.0]),
            (1, [0.9, 0.1, 0.9, 0.1]),  # same cell assignments as vec 2
            (2, [0.8, 0.2, 0.8, 0.2]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = similarity.pq_adc_topk(q, emb, k=2, codebooks=_PQ_BOOKS).collect()
    scores = {r["neighbor_id"]: r["adc_score"] for r in out}
    assert scores[1] == scores[2]
