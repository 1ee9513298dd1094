"""Search and corpus-similarity workloads: BM25 ranking, boilerplate
coverage, asymmetric containment, cross-source distribution distance, and
a k-NN label-propagation evaluation.

These extend the LLM-curation families (pipeline_ops / curation_ops) with
the retrieval-side operators a training-data pipeline runs: scoring
documents against a query (BM25), measuring how much of a document is
corpus-boilerplate, finding subset-duplicates that Jaccard under-scores
(containment), comparing source token distributions (TVD), and sanity-
checking embedding quality via nearest-neighbor label agreement.

Determinism: the repo-wide log-free discipline (NOTES_BUILD.md) — BM25
uses the rational idf (N−df+0.5)/(df+0.5) instead of its log, TVD and
BM25 sums go through the exact decimal accumulator, ratios are quantized
to integer ten-thousandths with the half-up helper, and every ranking
carries a total tiebreak order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.operators import dedup, similarity, text
from autonomus_datapipeline_spark.operators.similarity import (
    dot_exact,
    norm_sq_exact,
)
from autonomus_datapipeline_spark.workloads.pipeline_ops import (
    _DIM,
    _NORM_CTE,
    _SQL_EXACT_CAND_CTE,
    _TOKS,
    _e4_sql,
    _sql_rerank_cte,
    _sql_shingles,
)
from autonomus_datapipeline_spark.workloads.registry import (
    dsum,
    load_table,
    query,
    sql_dsum,
)

# ---------------------------------------------------------------------------
# BM25 document ranking
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20

_BM25_TERMS_SQL = ", ".join(f"('{t}')" for t in _BM25_TERMS)


@query(
    "bm25_doc_ranking",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ),
    dl AS (SELECT doc_id, tk, CAST(len(tk) AS INT) AS dl FROM d),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    terms(term) AS (VALUES {_BM25_TERMS_SQL}),
    tf AS (
        SELECT dl.doc_id, dl.dl, t.term,
               CAST(len(list_filter(dl.tk, x -> x = t.term)) AS INT) AS tf
        FROM dl CROSS JOIN terms t
    ),
    tfpos AS (SELECT * FROM tf WHERE tf > 0),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfpos GROUP BY 1),
    scored AS (
        SELECT p.doc_id,
               ((s.nd - f.df + 0.5) / (f.df + 0.5))
                 * (p.tf * ({_BM25_K1} + 1.0)
                    / (p.tf + {_BM25_K1}
                       * (1.0 - {_BM25_B}
                          + {_BM25_B} * (CAST(p.dl AS DOUBLE) / s.avgdl))))
                 AS contrib
        FROM tfpos p
        JOIN df f ON f.term = p.term
        CROSS JOIN stats s
    )
    SELECT doc_id, score, n_terms FROM (
        SELECT doc_id,
               {sql_dsum("contrib", "score")},
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM scored GROUP BY doc_id
    ) z
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOP}
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus against a fixed term query — the
    classical sparse-retrieval scorer (k1={_BM25_K1}, b={_BM25_B}), with
    the rational idf (N−df+0.5)/(df+0.5) in place of its log (log is not
    engine-portable at the bit level; the ranking it induces is
    identical-in-order for any df < N/2 corpus, NOTES_BUILD.md).

    Scale: the term list is broadcast (a query has tens of terms); tf is
    one scan with a vectorized array filter per term; df and the
    doc-length stats are tiny aggregates. The per-(doc,term) score is a
    fixed IEEE expression; the per-doc sum is an exact decimal
    accumulator. One shuffle on doc_id, then a global top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("tk")
    )
    dl = tk.select("doc_id", "tk", F.size("tk").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    tfpos = (
        dl.crossJoin(F.broadcast(terms))
        .select(
            "doc_id",
            "dl",
            "term",
            F.size(
                F.filter("tk", lambda x: x == F.col("term"))
            ).alias("tf"),
        )
        .where(F.col("tf") > 0)
    )
    df = tfpos.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    ratio = F.col("dl").cast("double") / F.col("avgdl")
    idf = (F.col("nd") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    sat = (
        F.col("tf") * (F.lit(_BM25_K1) + F.lit(1.0))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * ratio)
        )
    )
    scored = (
        tfpos.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * sat).alias("contrib"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            dsum(F.col("contrib"), "score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_TOP)
    )


# ---------------------------------------------------------------------------
# Boilerplate coverage
# ---------------------------------------------------------------------------

_BOILER_SHINGLE = 3
_BOILER_DF = 20
_BOILER_TOP = 50


@query(
    "boilerplate_coverage_scores",
    oracle=f"""
    WITH {_sql_shingles(_BOILER_SHINGLE)},
    df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    per_doc AS (
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(CASE WHEN df.df >= {_BOILER_DF} THEN 1 END)
                    AS BIGINT) AS n_boiler
        FROM sh JOIN df ON df.shingle = sh.shingle
        GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_boiler,
           CAST({_e4_sql("n_boiler", "n_shingles")} AS DOUBLE) / 10000.0
               AS boiler_ratio
    FROM per_doc
    ORDER BY n_boiler DESC, doc_id
    LIMIT {_BOILER_TOP}
    """,
)
def boilerplate_coverage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate coverage per document: the fraction of a document's
    word-{_BOILER_SHINGLE}-grams that are corpus-frequent (df ≥
    {_BOILER_DF}) — the CCNet-style signal for template/boilerplate-heavy
    pages that survive exact dedup but add no training value. High-ratio
    docs are down-weighted or dropped by the curation chain.

    Scale: one shingle explosion + a df aggregate + a re-join on the
    shingle — all shuffle-linear in corpus size (the df table is
    vocabulary-bounded). The ratio is the integer half-up ten-thousandth
    (no engine-variant double rounding). Top-{_BOILER_TOP} by boilerplate
    mass with doc_id tiebreak.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_table(docs, "doc_id", "text", _BOILER_SHINGLE)
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count(F.when(F.col("df") >= _BOILER_DF, 1))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )
    ratio = (
        text._e4_half_up(F.col("n_boiler"), F.col("n_shingles"))
        .cast("double")
        / 10000.0
    )
    return (
        per_doc.select(
            "doc_id", "n_shingles", "n_boiler", ratio.alias("boiler_ratio")
        )
        .orderBy(F.desc("n_boiler"), "doc_id")
        .limit(_BOILER_TOP)
    )


# ---------------------------------------------------------------------------
# Asymmetric n-gram containment
# ---------------------------------------------------------------------------

_CONT_SHINGLE = 3
_CONT_MAX_DF = 25
_CONT_TAU = 0.6
_CONT_TOP = 30


@query(
    "ngram_containment_pairs",
    oracle=f"""
    WITH {_sql_shingles(_CONT_SHINGLE)},
    rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) <= {_CONT_MAX_DF}
    ),
    shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM shc a JOIN shc b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_common AS DOUBLE) / least(sa.n, sb.n) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / least(sa.n, sb.n) >= {_CONT_TAU}
    ORDER BY containment DESC, doc_a, doc_b
    LIMIT {_CONT_TOP}
    """,
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-containment: |A∩B| / min(|A|,|B|) over capped
    word-{_CONT_SHINGLE}-gram sets — the subset-duplicate detector.
    A short document pasted inside a long one scores near 1.0 here while
    its Jaccard (÷ union) stays low, so a Jaccard-only dedup pass ships
    the duplication to training; containment is the standard second pass
    (same signal family as the ExactSubstr span strip, operators/dedup).

    Scale: identical inverted-index plan to ngram_jaccard_capped — the
    document-frequency cap bounds the candidate join at Σ min(df,cap)²;
    the containment is one division of exact integers.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_table(docs, "doc_id", "text", _CONT_SHINGLE)
    shc = dedup.cap_document_frequency(sh, _CONT_MAX_DF)
    sizes = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shc.alias("a"), shc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    containment = F.col("n_common").cast("double") / F.least("n_a", "n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(containment >= _CONT_TAU)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            containment.alias("containment"),
        )
        .orderBy(F.desc("containment"), "doc_a", "doc_b")
        .limit(_CONT_TOP)
    )


# ---------------------------------------------------------------------------
# Cross-source token-distribution distance (total variation)
# ---------------------------------------------------------------------------

_TVD_TOP_TOKENS = 100


@query(
    "source_token_tvd_matrix",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_TOKS}) AS tok FROM documents
    ),
    top_tok AS (
        SELECT tok FROM (
            SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1
            ORDER BY c DESC, tok LIMIT {_TVD_TOP_TOKENS}
        ) t
    ),
    cnt AS (
        SELECT source, tok.tok, COUNT(*) AS c
        FROM tok JOIN top_tok USING (tok)
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.source, tt.tok, COALESCE(c.c, 0) AS c
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN top_tok tt
        LEFT JOIN cnt c ON c.source = s.source AND c.tok = tt.tok
    ),
    p AS (
        SELECT source, tok,
               CAST(c AS DOUBLE)
                 / SUM(c) OVER (PARTITION BY source) AS p
        FROM grid
    )
    SELECT a.source AS source_a, b.source AS source_b,
           0.5 * sum_abs AS tvd
    FROM (
        SELECT a.source, b.source AS source_b_,
               {sql_dsum("abs(a.p - b.p)", "sum_abs")}
        FROM p a JOIN p b ON b.tok = a.tok AND a.source < b.source
        GROUP BY 1, 2
    ) z(source, source_b_, sum_abs)
    JOIN (SELECT DISTINCT source FROM documents) a ON a.source = z.source
    JOIN (SELECT DISTINCT source FROM documents) b ON b.source = z.source_b_
    ORDER BY source_a, source_b
    """,
)
def source_token_tvd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between per-source token
    distributions (restricted to the global top-{_TVD_TOP_TOKENS} tokens,
    which bounds the profile size at any corpus scale) — the corpus-mixing
    diagnostic: sources whose TVD ≈ 0 are interchangeable; a high-TVD
    source shifts the training mixture (cf. corpus_mix_sampling and
    distribution_drift_tvd, which compare snapshots over time).

    Scale: token counts are one map-side-combinable aggregate; the
    profile grid is |sources|×{_TVD_TOP_TOKENS} — tiny — so the pair join
    is a broadcast of bounded profiles, never a corpus-sized shuffle.
    Per-token |Δp| is a fixed IEEE expression; the per-pair sum is the
    exact decimal accumulator.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    top_tok = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_TVD_TOP_TOKENS)
        .select("tok")
    )
    cnt = (
        tok.join(F.broadcast(top_tok), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sources = docs.select("source").distinct()
    grid = (
        sources.crossJoin(F.broadcast(top_tok))
        .join(cnt, ["source", "tok"], "left")
        .select("source", "tok", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("source")
    p = grid.select(
        "source",
        "tok",
        (F.col("c").cast("double") / F.sum("c").over(w)).alias("p"),
    )
    a = p.select(
        F.col("source").alias("source_a"), "tok", F.col("p").alias("pa")
    )
    b = p.select(
        F.col("source").alias("source_b"), "tok", F.col("p").alias("pb")
    )
    return (
        a.join(b, ["tok"])
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(dsum(F.abs(F.col("pa") - F.col("pb")), "sum_abs"))
        .select(
            "source_a",
            "source_b",
            (F.lit(0.5) * F.col("sum_abs")).alias("tvd"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# k-NN label-agreement evaluation
# ---------------------------------------------------------------------------

_KNN_EVAL_N = 50
_KNN_K = 5


@query(
    "knn_label_classifier",
    oracle=f"""
    WITH {_NORM_CTE},
    cand AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id < {_KNN_EVAL_N} AND a.vec_id <> b.vec_id
    ),
    {_sql_rerank_cte("cand", "knn", k=_KNN_K)},
    votes AS (
        SELECT k.query_id, e.label, COUNT(*) AS cnt
        FROM knn k JOIN embeddings e ON e.vec_id = k.neighbor_id
        GROUP BY 1, 2
    ),
    pred AS (
        SELECT query_id, label AS pred_label FROM (
            SELECT query_id, label,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cnt DESC, label) AS rn
            FROM votes
        ) v WHERE rn = 1
    )
    SELECT t.label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN p.pred_label = t.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
    GROUP BY 1 ORDER BY 1
    """,
)
def knn_label_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-agreement evaluation: for {_KNN_EVAL_N} probe vectors,
    predict each probe's label by majority vote of its {_KNN_K} exact
    cosine nearest neighbors (self excluded, ties broken count-desc then
    label-asc) and report per-label accuracy — the standard intrinsic
    check that an embedding space separates its classes, run before the
    embeddings are trusted for dedup/mixing decisions.

    Scale: the probe set is broadcast and the corpus scanned once (same
    two-phase exact-cosine plan as embedding_cosine_topk); voting and the
    accuracy rollup are k·probes-sized. All-integer output.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _KNN_EVAL_N)
    knn = similarity.cosine_topk(q, emb, _KNN_K)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("label")
    )
    votes = (
        knn.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cnt"), "label")
    pred = (
        votes.select(
            "query_id", "label", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("label")
    )
    return (
        pred.join(truth, "query_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(
                F.when(F.col("pred_label") == F.col("label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Grid-bucketed epsilon-neighborhood query (DBSCAN region query)
# ---------------------------------------------------------------------------

_GRID_EPS = 0.05
_GRID_MINPTS = 4


@query(
    "grid_epsilon_neighbors",
    oracle=f"""
    WITH pts AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) AS px,
               CAST(embedding[2] AS DOUBLE) AS py
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, px, py,
               CAST(FLOOR(px / {_GRID_EPS}) AS BIGINT) AS cx,
               CAST(FLOOR(py / {_GRID_EPS}) AS BIGINT) AS cy
        FROM pts
    ),
    probe AS (
        SELECT c.vec_id, c.px, c.py, c.cx + dx.d AS cx, c.cy + dy.d AS cy
        FROM cells c
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    neigh AS (
        SELECT a.vec_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors
        FROM probe a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
        WHERE b.vec_id <> a.vec_id
          AND (a.px - b.px) * (a.px - b.px)
              + (a.py - b.py) * (a.py - b.py) <= {_GRID_EPS} * {_GRID_EPS}
        GROUP BY 1
    )
    SELECT p.vec_id,
           COALESCE(n.n_neighbors, 0) AS n_neighbors,
           COALESCE(n.n_neighbors, 0) >= {_GRID_MINPTS} AS is_core
    FROM pts p LEFT JOIN neigh n ON n.vec_id = p.vec_id
    """,
)
def grid_epsilon_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-neighborhood counting on the first two embedding dimensions
    via GRID BUCKETING — the DBSCAN region query and the geohash-join
    pattern in one: each point lands in a ⌊x/ε⌋×⌊y/ε⌋ cell, probes only
    its 3×3 cell neighborhood, and exact-verifies the squared distance,
    so candidate pairs are bounded by cell occupancy instead of n². Marks
    core points (≥ {_GRID_MINPTS} neighbors within ε={_GRID_EPS}) — feed
    these into the connected-components operator (operators/graph.py) and
    the composition IS distributed DBSCAN.

    Scale: the expansion is a fixed 9× fan-out of the point set joined on
    cell keys — shuffle-linear with occupancy-bounded output; no
    broadcast of anything corpus-sized. Squared-distance verification is
    a fixed IEEE expression over two coordinates (float→double casts are
    exact), and the ε² comparison uses the same literal on both engines.
    """
    # fan_out=False: only 2 of the embedding dims are projected and the
    # cell join re-shuffles immediately — fanning out the raw vectors
    # first is pure overhead (measured +0.5 s at sf0.1, AB_r11.json).
    emb = load_table(spark, sf_dir, "embeddings", fan_out=False)
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("px"),
        F.element_at("embedding", 2).cast("double").alias("py"),
    )
    cells = pts.select(
        "vec_id",
        "px",
        "py",
        F.floor(F.col("px") / _GRID_EPS).cast("bigint").alias("cx"),
        F.floor(F.col("py") / _GRID_EPS).cast("bigint").alias("cy"),
    )
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    probe = cells.crossJoin(F.broadcast(offsets)).select(
        "vec_id",
        "px",
        "py",
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    b = cells.select(
        F.col("vec_id").alias("b_id"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        "cx",
        "cy",
    )
    dist2 = (F.col("px") - F.col("bx")) * (F.col("px") - F.col("bx")) + (
        F.col("py") - F.col("by")
    ) * (F.col("py") - F.col("by"))
    neigh = (
        probe.join(b, ["cx", "cy"])
        .where(
            (F.col("b_id") != F.col("vec_id"))
            & (dist2 <= F.lit(_GRID_EPS * _GRID_EPS))
        )
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neighbors"))
    )
    return pts.select("vec_id").join(neigh, "vec_id", "left").select(
        "vec_id",
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        (F.coalesce("n_neighbors", F.lit(0)) >= _GRID_MINPTS).alias("is_core"),
    )


# ---------------------------------------------------------------------------
# Full DBSCAN (grid region query + core/border/noise + CC clusters)
# ---------------------------------------------------------------------------

_DBSCAN_GRID_SQL = f"""
    pts AS (
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) AS px,
               CAST(embedding[2] AS DOUBLE) AS py
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, px, py,
               CAST(FLOOR(px / {_GRID_EPS}) AS BIGINT) AS cx,
               CAST(FLOOR(py / {_GRID_EPS}) AS BIGINT) AS cy
        FROM pts
    ),
    probe AS (
        SELECT c.vec_id, c.px, c.py, c.cx + dx.d AS cx, c.cy + dy.d AS cy
        FROM cells c
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    ),
    neigh_pairs AS (
        SELECT a.vec_id AS a, b.vec_id AS b
        FROM probe a JOIN cells b ON b.cx = a.cx AND b.cy = a.cy
        WHERE b.vec_id <> a.vec_id
          AND (a.px - b.px) * (a.px - b.px)
              + (a.py - b.py) * (a.py - b.py) <= {_GRID_EPS} * {_GRID_EPS}
    ),
    core AS (
        SELECT a AS vec_id FROM neigh_pairs GROUP BY a
        HAVING COUNT(*) >= {_GRID_MINPTS}
    )
"""


@query(
    "dbscan_grid_clusters",
    oracle=f"""
    WITH RECURSIVE {_DBSCAN_GRID_SQL},
    core_edges AS (
        SELECT np.a, np.b FROM neigh_pairs np
        JOIN core ca ON ca.vec_id = np.a
        JOIN core cb ON cb.vec_id = np.b
    ),
    reach(node, r) AS (
        SELECT a, b FROM core_edges
        UNION
        SELECT reach.node, ce.b FROM reach JOIN core_edges ce ON reach.r = ce.a
    ),
    rmin AS (SELECT node, MIN(r) AS mr FROM reach GROUP BY 1),
    comp AS (
        SELECT c.vec_id AS node,
               LEAST(c.vec_id, COALESCE(m.mr, c.vec_id)) AS cluster_id
        FROM core c LEFT JOIN rmin m ON m.node = c.vec_id
    ),
    border AS (
        SELECT np.a AS vec_id, MIN(comp.cluster_id) AS cluster_id
        FROM neigh_pairs np
        JOIN comp ON comp.node = np.b
        WHERE np.a NOT IN (SELECT vec_id FROM core)
        GROUP BY 1
    )
    SELECT p.vec_id,
           CASE WHEN c.node IS NOT NULL THEN 'core'
                WHEN b.vec_id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS label,
           CAST(COALESCE(c.cluster_id, b.cluster_id) AS BIGINT) AS cluster_id
    FROM pts p
    LEFT JOIN comp c ON c.node = p.vec_id
    LEFT JOIN border b ON b.vec_id = p.vec_id
    """,
)
def dbscan_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete distributed DBSCAN on the first two embedding dimensions
    (ε={_GRID_EPS}, minPts={_GRID_MINPTS}): the grid region query
    (grid_epsilon_neighbors) finds ε-neighbor pairs, points with ≥ minPts
    neighbors become cores, connected components over the core-core
    ε-graph (operators/graph.py — the alternating-star contraction, the
    same operator that clusters near-dup docs) form the clusters, border
    points attach to their MINIMUM-id core cluster (the deterministic
    variant of DBSCAN's order-dependent border assignment), and the rest
    is noise. Oracled by a DuckDB recursive-CTE transitive closure over
    the identical pair SQL.

    Scale: pair generation is cell-occupancy-bounded (9× fan-out join, no
    n² anywhere); the CC loop is O(log n) contraction rounds on the
    core-core edge list, which is ≤ the neighbor-pair list. This is the
    textbook MR-DBSCAN decomposition: region query → local core test →
    global merge via CC.
    """
    # fan_out=False: only 2 of the embedding dims are projected and the
    # cell join re-shuffles immediately — fanning out the raw vectors
    # first is pure overhead (measured +0.5 s at sf0.1, AB_r11.json).
    emb = load_table(spark, sf_dir, "embeddings", fan_out=False)
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("px"),
        F.element_at("embedding", 2).cast("double").alias("py"),
    )
    cells = pts.select(
        "vec_id",
        "px",
        "py",
        F.floor(F.col("px") / _GRID_EPS).cast("bigint").alias("cx"),
        F.floor(F.col("py") / _GRID_EPS).cast("bigint").alias("cy"),
    )
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    probe = cells.crossJoin(F.broadcast(offsets)).select(
        F.col("vec_id").alias("a"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    b = cells.select(
        F.col("vec_id").alias("b"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        "cx",
        "cy",
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    # The ε-pair list feeds FOUR subtrees (core test, both core-edge semi
    # sides via core, border attach) — without a materialization the
    # 9×-fan-out probe join (the query's dominant CPU) re-executes per
    # consumer (measured ~4-5× at sf0.1). Eager checkpoint, same rule as
    # the banded-candidate tables in the dedup family.
    neigh_pairs = (
        probe.join(b, ["cx", "cy"])
        .where(
            (F.col("b") != F.col("a"))
            & (dist2 <= F.lit(_GRID_EPS * _GRID_EPS))
        )
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    # core is itself read four times (both core-edge sides, isolated,
    # border anti); checkpointed (NOT cache()d — an InMemoryRelation pin
    # here would block AQE's replan of the downstream joins, NOTES r7b)
    # it is a point-count-bounded leaf.
    core = (
        neigh_pairs.groupBy("a")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= _GRID_MINPTS)
        .select(F.col("a").alias("vec_id"))
        .localCheckpoint(eager=True)
    )
    core_edges = (
        neigh_pairs.join(core.select(F.col("vec_id").alias("a")), "a", "left_semi")
        .join(core.select(F.col("vec_id").alias("b")), "b", "left_semi")
        .select("a", "b")
    )
    # Spanning contraction before CC — the DBSCAN densification guard: a
    # dense cluster makes the core-core ε-graph near-quadratic (159k edges
    # over ~2k cores at sf0.1), and the contraction loop pays per-edge
    # cost every round. Re-grid cores at ε/√2 so every same-fine-cell
    # pair is WITHIN ε by the diagonal bound (a genuine clique → one star
    # per cell, the lsh_bucket_stars argument), and keep ONE verified
    # representative edge per linked cell pair (cells are internally
    # connected, so one bridge preserves the closure exactly). CC input
    # shrinks from Σ occupancy² to #cells + #linked cell pairs; the
    # cluster ids (min reachable core) are invariant to WHICH spanning
    # subgraph feeds the loop, so the oracle's pairwise closure still
    # value-matches. Fine-cell floats are Spark-internal only — the
    # oracle never sees the grid.
    fine = float(_GRID_EPS) / math.sqrt(2.0)
    core_pts = cells.join(core, "vec_id", "left_semi").select(
        "vec_id",
        F.floor(F.col("px") / fine).cast("bigint").alias("fx"),
        F.floor(F.col("py") / fine).cast("bigint").alias("fy"),
    )
    w_cell = Window.partitionBy("fx", "fy")
    stars = (
        core_pts.withColumn("rep", F.min("vec_id").over(w_cell))
        .where(F.col("vec_id") != F.col("rep"))
        .select(F.col("rep").alias("a"), F.col("vec_id").alias("b"))
    )
    ca = core_pts.select(
        F.col("vec_id").alias("a"),
        F.col("fx").alias("fxa"),
        F.col("fy").alias("fya"),
    )
    cb = core_pts.select(
        F.col("vec_id").alias("b"),
        F.col("fx").alias("fxb"),
        F.col("fy").alias("fyb"),
    )
    bridges = (
        core_edges.join(ca, "a")
        .join(cb, "b")
        .where((F.col("fxa") != F.col("fxb")) | (F.col("fya") != F.col("fyb")))
        .groupBy("fxa", "fya", "fxb", "fyb")
        .agg(F.min(F.struct("a", "b")).alias("e"))
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    )
    from autonomus_datapipeline_spark.operators import graph as graph_ops

    cc = graph_ops.connected_components(
        stars.unionByName(bridges), "a", "b"
    ).select(F.col("node"), F.col("component_id").alias("cluster_id"))
    isolated = core.join(
        cc.select(F.col("node").alias("vec_id")), "vec_id", "left_anti"
    ).select(F.col("vec_id").alias("node"), F.col("vec_id").alias("cluster_id"))
    comp = cc.unionByName(isolated)
    border = (
        neigh_pairs.join(core.select(F.col("vec_id").alias("a")), "a", "left_anti")
        .join(comp.select(F.col("node").alias("b"), "cluster_id"), "b")
        .groupBy("a")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .select(F.col("a").alias("vec_id"), "cluster_id")
    )
    return (
        pts.select("vec_id")
        .join(
            comp.select(
                F.col("node").alias("vec_id"),
                F.col("cluster_id").alias("core_cluster"),
            ),
            "vec_id",
            "left",
        )
        .join(
            border.select(
                F.col("vec_id"), F.col("cluster_id").alias("border_cluster")
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.when(F.col("core_cluster").isNotNull(), "core")
            .when(F.col("border_cluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("label"),
            F.coalesce("core_cluster", "border_cluster")
            .cast("bigint")
            .alias("cluster_id"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding centroid drift between corpus halves (model/data drift monitor)
# ---------------------------------------------------------------------------


@query(
    "embedding_centroid_drift",
    oracle=f"""
    WITH halves AS (
        SELECT vec_id % 2 = 0 AS first_half, embedding
        FROM embeddings
    ),
    dims AS (
        SELECT first_half, t.p,
               CAST(SUM(CAST(CAST(embedding[t.p] AS DOUBLE) AS DECIMAL(38,12)))
                    AS DOUBLE) / COUNT(*) AS mu
        FROM halves, range(1, {_DIM + 1}) t(p)
        GROUP BY 1, 2
    ),
    paired AS (
        SELECT a.p, a.mu AS mu_a, b.mu AS mu_b
        FROM dims a JOIN dims b ON b.p = a.p
        WHERE a.first_half AND NOT b.first_half
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(CAST((mu_a - mu_b) * (mu_a - mu_b) AS DECIMAL(38,12)))
                AS DOUBLE) AS drift_sq,
           sqrt(CAST(SUM(CAST((mu_a - mu_b) * (mu_a - mu_b)
                              AS DECIMAL(38,12))) AS DOUBLE)) AS drift_l2
    FROM paired
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: the L2 distance between the per-dimension
    centroids of two corpus halves (even vs odd ids — the deterministic
    stand-in for 'last week vs this week') — the cheapest embedding-space
    drift alarm, run before trusting a frozen ANN codebook
    (ann_ivf_frozen_topk) on new data. Per-dim means are exact-decimal
    sums divided once; the squared-diff sum rides the decimal accumulator
    and sqrt is IEEE-exact.

    Scale: one posexplode-shaped aggregate to 2×{_DIM} rows (map-side
    combinable on (half, dim)), then a {_DIM}-row join — no pairwise
    anything.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    halves = emb.select(
        (F.col("vec_id") % 2 == 0).alias("first_half"),
        F.posexplode("embedding").alias("p0", "x"),
    )
    dims = halves.groupBy("first_half", "p0").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    a = dims.where("first_half").select("p0", F.col("mu").alias("mu_a"))
    b = dims.where(~F.col("first_half")).select("p0", F.col("mu").alias("mu_b"))
    paired = a.join(b, "p0")
    d2 = (F.col("mu_a") - F.col("mu_b")) * (F.col("mu_a") - F.col("mu_b"))
    return paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum(d2.cast("decimal(38,12)")).cast("double").alias("drift_sq"),
        F.sqrt(F.sum(d2.cast("decimal(38,12)")).cast("double")).alias("drift_l2"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of a lexical and a dense ranker
# ---------------------------------------------------------------------------

_RRF_K = 60          # the standard RRF damping constant (Cormack 2009)
_RRF_NQ = 5          # query documents: doc_id < _RRF_NQ
_RRF_LIST = 20       # per-ranker candidate list depth
_RRF_TOP = 10        # fused results kept per query
_RRF_SHINGLE = 3     # lexical ranker: word-trigram Jaccard
_RRF_DOT = (
    "SUM(CAST(CAST(a.embedding[p] AS DOUBLE) * CAST(b.embedding[p] AS DOUBLE)"
    " AS DECIMAL(38,12)))"
)

_RRF_ORACLE = f"""
WITH {_sql_shingles(_RRF_SHINGLE)},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
    SELECT q.doc_id AS query_id, d.doc_id AS doc_id, COUNT(*) AS n_common
    FROM sh q JOIN sh d ON q.shingle = d.shingle AND q.doc_id <> d.doc_id
    WHERE q.doc_id < {_RRF_NQ}
    GROUP BY 1, 2
),
lex AS (
    SELECT query_id, doc_id, rk FROM (
        SELECT query_id, i.doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY CAST(n_common AS DOUBLE)
                            / (sq.n + sd.n - n_common) DESC,
                            i.doc_id) AS INT) AS rk
        FROM inter i
        JOIN sizes sq ON sq.doc_id = query_id
        JOIN sizes sd ON sd.doc_id = i.doc_id
    ) r WHERE rk <= {_RRF_LIST}
),
{_NORM_CTE},
dots AS (
    SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
           CAST({_RRF_DOT} AS DOUBLE) AS dot
    FROM embeddings a, embeddings b, range(1, {_DIM + 1}) t(p)
    WHERE a.vec_id < {_RRF_NQ} AND a.vec_id <> b.vec_id
    GROUP BY 1, 2
),
dense AS (
    SELECT query_id, doc_id, rk FROM (
        SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(dot / (sqrt(nq.nsq) * sqrt(nc.nsq)), 6)
                                DESC,
                            doc_id) AS INT) AS rk
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = doc_id
    ) s WHERE rk <= {_RRF_LIST}
),
fused AS (
    SELECT COALESCE(l.query_id, d.query_id) AS query_id,
           COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.rk AS lex_rank, d.rk AS dense_rank,
           COALESCE(CAST(1 AS DOUBLE)
                    / CAST({_RRF_K} + l.rk AS DOUBLE), CAST(0 AS DOUBLE))
           + COALESCE(CAST(1 AS DOUBLE)
                      / CAST({_RRF_K} + d.rk AS DOUBLE), CAST(0 AS DOUBLE))
               AS rrf_score
    FROM lex l
    FULL OUTER JOIN dense d
      ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score, fused_rank
FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY rrf_score DESC, doc_id) AS INT) AS fused_rank
    FROM fused
) f WHERE fused_rank <= {_RRF_TOP}
ORDER BY query_id, fused_rank
"""


@query("hybrid_rrf_fusion", oracle=_RRF_ORACLE)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009): fuse a LEXICAL ranker (word-trigram Jaccard
    over an inverted-index probe) with a DENSE ranker (exact cosine over
    the embedding column) for the same {_RRF_NQ} query documents,
    RRF(d) = sum over rankers of 1/({_RRF_K} + rank_r(d)) over each
    ranker's top-{_RRF_LIST} list, keeping the fused top-{_RRF_TOP} per
    query. The standard hybrid-search pattern for RAG retrieval — BM25-
    family keyword recall plus embedding semantic recall, combined
    without score calibration (ranks only, which is RRF's point).

    Determinism: both rankers order by (score DESC, doc_id) where every
    score is a single correctly-rounded division of exact operands
    (integer Jaccard components; the 6-digit-snapped exact-decimal
    cosine), and the fused score is the pinned-order sum of two exact
    reciprocals — bit-identical across engines, no snapping needed.

    Scale: the lexical probe joins the (tiny) query-side shingles against
    the corpus inverted index — cost is sum of df over query shingles,
    never corpus-pairwise; the dense side broadcasts {_RRF_NQ} query
    vectors through the two-phase exact re-rank (double-fold prefilter,
    exact decimal on survivors — operators/similarity.py). Fusion itself
    touches only 2·{_RRF_LIST} rows per query.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    sh = dedup.shingle_table(docs, "doc_id", "text", _RRF_SHINGLE)
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    shq = (
        sh.where(F.col("doc_id") < _RRF_NQ)
        .select(F.col("doc_id").alias("query_id"), "shingle")
    )
    inter = (
        shq.join(sh, "shingle")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("doc_id", "query_id")
                        .withColumnRenamed("n", "nq")),
            "query_id",
        )
        .join(sizes.withColumnRenamed("n", "nd"), "doc_id")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("nq") + F.col("nd") - F.col("n_common")),
        )
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.desc("jaccard"), F.asc("doc_id")
    )
    lex = (
        jac.withColumn("rk", F.row_number().over(w_lex).cast("int"))
        .where(F.col("rk") <= _RRF_LIST)
        .select("query_id", "doc_id", F.col("rk").alias("lex_rank"))
    )

    dense = (
        similarity.cosine_topk(
            emb.filter(F.col("vec_id") < _RRF_NQ), emb, _RRF_LIST
        )
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rk").cast("int").alias("dense_rank"),
        )
    )

    contrib_lex = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")).cast("double"),
        F.lit(0.0),
    )
    contrib_dense = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")).cast("double"),
        F.lit(0.0),
    )
    fused = (
        lex.join(dense, ["query_id", "doc_id"], "full_outer")
        .withColumn("rrf_score", contrib_lex + contrib_dense)
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f).cast("int"))
        .where(F.col("fused_rank") <= _RRF_TOP)
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            "rrf_score",
            "fused_rank",
        )
        .orderBy("query_id", "fused_rank")
    )


# ---------------------------------------------------------------------------
# Diversified re-ranking: maximal marginal relevance (MMR)
# ---------------------------------------------------------------------------

_MMR_CAND = 20   # candidate list depth from the exact retriever
_MMR_K = 5       # diversified results kept per query
# lambda = 1/2 (dyadic, so 0.5*x is EXACT in IEEE double — the whole MMR
# objective stays bit-deterministic without any decimal snapping)

_MMR_PAIR_DOT = (
    "SUM(CAST(CAST(ea.embedding[p] AS DOUBLE) * CAST(eb.embedding[p] AS"
    " DOUBLE) AS DECIMAL(38,12)))"
)

_MMR_ORACLE = f"""
WITH RECURSIVE {_NORM_CTE},
{_SQL_EXACT_CAND_CTE},
{_sql_rerank_cte("exact_cand", "cand20", _MMR_CAND)},
csims AS (
    SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
           ROUND(CAST({_MMR_PAIR_DOT} AS DOUBLE)
                 / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS sim
    FROM cand20 a
    JOIN cand20 b ON b.query_id = a.query_id
                 AND b.neighbor_id <> a.neighbor_id
    JOIN embeddings ea ON ea.vec_id = a.neighbor_id
    JOIN embeddings eb ON eb.vec_id = b.neighbor_id
    JOIN norms na ON na.vec_id = a.neighbor_id
    JOIN norms nb ON nb.vec_id = b.neighbor_id,
         range(1, {_DIM + 1}) t(p)
    GROUP BY a.query_id, a.neighbor_id, b.neighbor_id, na.nsq, nb.nsq
),
rec(query_id, step, sel, pick) AS (
    SELECT query_id, 1, [neighbor_id], neighbor_id
    FROM cand20 WHERE rk = 1
    UNION ALL
    SELECT r.query_id, r.step + 1, list_append(r.sel, p.id), p.id
    FROM rec r
    JOIN LATERAL (
        SELECT c.neighbor_id AS id
        FROM cand20 c
        WHERE c.query_id = r.query_id
          AND NOT list_contains(r.sel, c.neighbor_id)
        ORDER BY CAST(0.5 AS DOUBLE) * c.cosine
                 - CAST(0.5 AS DOUBLE)
                   * (SELECT MAX(s.sim) FROM csims s
                      WHERE s.query_id = r.query_id
                        AND s.id_a = c.neighbor_id
                        AND list_contains(r.sel, s.id_b)) DESC,
                 c.neighbor_id
        LIMIT 1
    ) p ON true
    WHERE r.step < {_MMR_K}
)
SELECT r.query_id, r.pick AS neighbor_id, c.cosine AS relevance,
       CAST(r.step AS INT) AS mmr_rank
FROM rec r JOIN cand20 c
  ON c.query_id = r.query_id AND c.neighbor_id = r.pick
ORDER BY r.query_id, r.step
"""


def _mmr_greedy_rows(
    rel: dict, seed, sim: dict, k: int
) -> list[tuple]:
    """The MMR greedy loop on one query's candidate list: start from the
    top-relevance candidate, then repeatedly add argmax of
    0.5*rel - 0.5*max_sim_to_selected with (score DESC, id ASC) tiebreak —
    exactly the oracle's recursive step (0.5* is exact, so both engines
    compare identical doubles)."""
    sel = [seed]
    while len(sel) < k and len(sel) < len(rel):
        best = None
        for cid, r in rel.items():
            if cid in sel:
                continue
            ms = max(sim[(cid, s)] for s in sel)
            key = (-(0.5 * r - 0.5 * ms), cid)
            if best is None or key < best[0]:
                best = (key, cid)
        sel.append(best[1])
    return [(d, rel[d], i + 1) for i, d in enumerate(sel)]


@query("mmr_diversified_topk", oracle=_MMR_ORACLE)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal marginal relevance (Carbonell & Goldstein, SIGIR 1998):
    re-rank each query's exact top-{_MMR_CAND} cosine candidates into a
    DIVERSIFIED top-{_MMR_K} — greedily add the candidate maximizing
    0.5·relevance − 0.5·(max similarity to anything already selected).
    The de-duplication step retrieval pipelines run between ANN and the
    context window: near-identical passages waste prompt budget, and
    plain top-k returns them together.

    Determinism: relevance and pairwise similarities are the house
    6-digit-snapped exact-decimal cosines; lambda = 1/2 is dyadic so each
    greedy score is two EXACT halvings and one IEEE subtraction of
    identical operands — identical in both engines — with a
    (score DESC, id) total tiebreak. The DuckDB oracle replays the greedy
    loop as a recursive CTE (LATERAL argmax over the not-yet-selected,
    correlated MAX over the selected set).

    Scale: candidate generation rides the two-phase exact re-rank (pair
    shuffle carries ids + fast-cos only); the pairwise-sim table is
    q·{_MMR_CAND}² rows with vectors broadcast-attached; the greedy loop
    runs per query in an Arrow-batched cogroup over {_MMR_CAND}-row
    groups — q-parallel, never corpus-sized.
    """
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cand = similarity.cosine_topk(q, emb, _MMR_CAND).localCheckpoint(
        eager=True
    )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    den = F.sqrt(norm_sq_exact(F.col("va")).cast("double")) * F.sqrt(
        norm_sq_exact(F.col("vb")).cast("double")
    )
    ca = cand.alias("ca")
    cb = cand.alias("cb")
    sims = (
        ca.join(
            cb,
            (F.col("ca.query_id") == F.col("cb.query_id"))
            & (F.col("ca.neighbor_id") != F.col("cb.neighbor_id")),
        )
        .select(
            F.col("ca.query_id").alias("query_id"),
            F.col("ca.neighbor_id").alias("id_a"),
            F.col("cb.neighbor_id").alias("id_b"),
        )
        .join(F.broadcast(va), "id_a")
        .join(F.broadcast(vb), "id_b")
        .select(
            "query_id",
            "id_a",
            "id_b",
            F.round(
                dot_exact(F.col("va"), F.col("vb")).cast("double") / den, 6
            ).alias("sim"),
        )
    )

    def mmr_fn(cand_pdf: "pd.DataFrame", sims_pdf: "pd.DataFrame"):
        if cand_pdf.empty:
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "relevance", "mmr_rank"]
            )
        qid = int(cand_pdf["query_id"].iloc[0])
        rel = dict(
            zip(
                (int(x) for x in cand_pdf["neighbor_id"]),
                (float(x) for x in cand_pdf["cosine"]),
            )
        )
        seed = int(
            cand_pdf.loc[cand_pdf["rk"] == 1, "neighbor_id"].iloc[0]
        )
        sim = {
            (int(a), int(b)): float(s)
            for a, b, s in zip(
                sims_pdf["id_a"], sims_pdf["id_b"], sims_pdf["sim"]
            )
        }
        rows = _mmr_greedy_rows(rel, seed, sim, _MMR_K)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(rows),
                "neighbor_id": [r[0] for r in rows],
                "relevance": [r[1] for r in rows],
                "mmr_rank": [r[2] for r in rows],
            }
        )

    out = (
        cand.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(
            mmr_fn,
            "query_id long, neighbor_id long, relevance double, mmr_rank int",
        )
    )
    return out.orderBy("query_id", "mmr_rank")


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: distortion + variance audit
# ---------------------------------------------------------------------------

_JL_DIM = 64     # input embedding dimensionality
_JL_K = 16       # projected dimensionality
_JL_PANEL = 30   # fixed audit panel: vec_id < 30 → C(30,2) = 435 pairs


def _jl_sign(p: int, j: int) -> int:
    """Deterministic ±1 projection entry from md5 — portable: the oracle
    derives the IDENTICAL matrix from the same md5 string in SQL."""
    import hashlib

    h = hashlib.md5(f"{p}_{j}".encode()).hexdigest()
    return 1 if h[0] in "02468ace" else -1


_JL_SIGNS = [
    (p, j, _jl_sign(p, j))
    for p in range(1, _JL_DIM + 1)
    for j in range(_JL_K)
]

_JL_ORACLE = f"""
WITH signs AS (
    SELECT p, j,
           CASE WHEN substr(md5(CAST(p AS VARCHAR) || '_'
                                || CAST(j AS VARCHAR)), 1, 1)
                     IN ('0','2','4','6','8','a','c','e')
                THEN 1 ELSE -1 END AS s
    FROM range(1, {_JL_DIM + 1}) d(p), range(0, {_JL_K}) o(j)
),
proj AS (
    SELECT e.vec_id, s.j,
           CAST(SUM(CAST(s.s * CAST(e.embedding[s.p] AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS pv
    FROM embeddings e, signs s
    GROUP BY 1, 2
),
pvar AS (
    SELECT j, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(pv * 10000) AS BIGINT)) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(CAST(FLOOR(pv * 10000) AS BIGINT)
                    * CAST(FLOOR(pv * 10000) AS BIGINT))
                AS DECIMAL(38,0)) AS s2
    FROM proj GROUP BY 1
),
el AS (
    SELECT vec_id, p, CAST(embedding[p] AS DOUBLE) AS v
    FROM embeddings, range(1, {_JL_DIM + 1}) t(p)
),
ovar AS (
    SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(v * 10000) AS BIGINT)) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(CAST(FLOOR(v * 10000) AS BIGINT)
                    * CAST(FLOOR(v * 10000) AS BIGINT))
                AS DECIMAL(38,0)) AS s2
    FROM el GROUP BY 1
),
vr AS (
    SELECT CAST((SELECT SUM(n * s2 - s1 * s1) FROM pvar) AS DOUBLE)
           / {_JL_K}
           / CAST((SELECT SUM(n * s2 - s1 * s1) FROM ovar) AS DOUBLE)
               AS corpus_var_ratio
),
dorig AS (
    SELECT a.vec_id AS qa, b.vec_id AS qb,
           CAST(SUM(CAST((CAST(a.embedding[p] AS DOUBLE)
                          - CAST(b.embedding[p] AS DOUBLE))
                         * (CAST(a.embedding[p] AS DOUBLE)
                            - CAST(b.embedding[p] AS DOUBLE))
                         AS DECIMAL(38,12))) AS DOUBLE) AS d2
    FROM embeddings a, embeddings b, range(1, {_JL_DIM + 1}) t(p)
    WHERE a.vec_id < {_JL_PANEL} AND b.vec_id < {_JL_PANEL}
      AND a.vec_id < b.vec_id
    GROUP BY 1, 2
),
dproj AS (
    SELECT pa.vec_id AS qa, pb.vec_id AS qb,
           CAST(SUM(CAST((pa.pv - pb.pv) * (pa.pv - pb.pv)
                         AS DECIMAL(38,12))) AS DOUBLE) AS d2
    FROM proj pa JOIN proj pb
      ON pa.j = pb.j AND pa.vec_id < pb.vec_id
    WHERE pa.vec_id < {_JL_PANEL} AND pb.vec_id < {_JL_PANEL}
    GROUP BY 1, 2
),
r AS (
    SELECT CAST(FLOOR(p.d2 / {_JL_K} / o.d2 * 1e9) AS BIGINT) AS ru
    FROM dorig o JOIN dproj p ON p.qa = o.qa AND p.qb = o.qb
    WHERE o.d2 > 0
)
SELECT CAST(LEAST(ABS(ru - 1000000000) // 100000000, 4) AS INT)
           AS distortion_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ru) AS DOUBLE) / COUNT(*) / 1e9 AS mean_ratio,
       (SELECT corpus_var_ratio FROM vr) AS corpus_var_ratio
FROM r GROUP BY 1 ORDER BY 1
"""


@query("jl_projection_distortion", oracle=_JL_ORACLE)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketching audit: project every {_JL_DIM}-dim
    embedding to {_JL_K} dims with a deterministic ±1 sign matrix (md5-
    derived, portable across engines) and report (a) how well pairwise
    L2 distances survive on a fixed {_JL_PANEL}-vector panel — pairs
    bucketed by |d²_proj/(k·d²_orig) − 1| distortion bands — and (b) the
    corpus-wide variance retained by the sketch. This is the pre-flight
    that justifies replacing full vectors with a k-dim sketch in the ANN
    candidate stage (cf. ann_pq_adc_topk's codebook compression): JL
    says E[d²_proj/k] = d²_orig for ±1 matrices (Achlioptas 2003).

    Determinism: the sign matrix is md5 parity (identical string both
    engines); the projection is a per-element decimal-exact sum; variance
    numerators are all-integer (values floor-quantized to 1e-4 units,
    n·Σx² − (Σx)² in DECIMAL(38,0)); distortion ratios are one fixed IEEE
    division chain floor-quantized to integer units before aggregation.

    Scale: the projection is one explode + broadcast-sign join + hash
    aggregate — shuffle-linear in n·{_JL_DIM} with map-side combine; the
    variance rollups are {_JL_K}+{_JL_DIM} bounded rows; the panel
    pairwise work is constant (435 pairs). At 100 TB the projection is
    the only data-sized pass and it rides one shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("p0", "v0")
    ).select(
        "vec_id",
        (F.col("p0") + 1).alias("p"),
        F.col("v0").cast("double").alias("v"),
    )
    signs = spark.createDataFrame(_JL_SIGNS, "p int, j int, s int")
    # Materialized once: the projection feeds BOTH the variance rollup and
    # the panel distance pass (32k rows at sf0.1 — tiny next to re-running
    # the explode+join+aggregate per consumer).
    proj = (
        el.join(F.broadcast(signs), "p")
        .groupBy("vec_id", "j")
        .agg(
            F.sum((F.col("s") * F.col("v")).cast("decimal(38,12)"))
            .cast("double")
            .alias("pv")
        )
        .localCheckpoint(eager=True)
    )
    pu = F.floor(F.col("pv") * 10000).cast("bigint")
    pvar = proj.groupBy("j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(pu).cast("decimal(38,0)").alias("s1"),
        F.sum(pu * pu).cast("decimal(38,0)").alias("s2"),
    )
    vu = F.floor(F.col("v") * 10000).cast("bigint")
    ovar = el.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vu).cast("decimal(38,0)").alias("s1"),
        F.sum(vu * vu).cast("decimal(38,0)").alias("s2"),
    )
    vnum = pvar.agg(
        F.sum(F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).alias("x")
    )
    vden = ovar.agg(
        F.sum(F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).alias("y")
    )
    vr = vnum.crossJoin(F.broadcast(vden)).select(
        (
            F.col("x").cast("double") / _JL_K / F.col("y").cast("double")
        ).alias("corpus_var_ratio")
    )
    pan = el.where(F.col("vec_id") < _JL_PANEL)
    pa = pan.select(
        F.col("vec_id").alias("qa"), "p", F.col("v").alias("va")
    )
    pb = pan.select(
        F.col("vec_id").alias("qb"), "p", F.col("v").alias("vb")
    )
    dorig = (
        pa.join(pb, ["p"])
        .where(F.col("qa") < F.col("qb"))
        .groupBy("qa", "qb")
        .agg(
            F.sum(
                (
                    (F.col("va") - F.col("vb")) * (F.col("va") - F.col("vb"))
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("d2o")
        )
        .where(F.col("d2o") > 0)
    )
    qa_p = proj.where(F.col("vec_id") < _JL_PANEL).select(
        F.col("vec_id").alias("qa"), "j", F.col("pv").alias("pva")
    )
    qb_p = proj.where(F.col("vec_id") < _JL_PANEL).select(
        F.col("vec_id").alias("qb"), "j", F.col("pv").alias("pvb")
    )
    dproj = (
        qa_p.join(qb_p, ["j"])
        .where(F.col("qa") < F.col("qb"))
        .groupBy("qa", "qb")
        .agg(
            F.sum(
                (
                    (F.col("pva") - F.col("pvb"))
                    * (F.col("pva") - F.col("pvb"))
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("d2p")
        )
    )
    ru = F.floor(
        F.col("d2p") / _JL_K / F.col("d2o") * F.lit(1e9)
    ).cast("bigint")
    r = dorig.join(dproj, ["qa", "qb"]).select(ru.alias("ru"))
    band = F.least(
        F.floor(F.abs(F.col("ru") - 1000000000) / 100000000),
        F.lit(4),
    ).cast("int")
    return (
        r.groupBy(band.alias("distortion_band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.sum("ru").cast("double") / F.count(F.lit(1)) / F.lit(1e9)).alias(
                "mean_ratio"
            ),
        )
        .crossJoin(F.broadcast(vr))
        .select("distortion_band", "n_pairs", "mean_ratio", "corpus_var_ratio")
        .orderBy("distortion_band")
    )
