"""Training-data pipeline operator queries: dedup / similarity / text /
multimodal (BASELINE.json north-star operators; SURVEY.md §7.2 step 8).

Every query here is the thin binding of a reusable operator from
``autonomus_datapipeline_spark.operators`` to the driver's test tables, plus
a DuckDB oracle that re-states the operator's spec in portable SQL. The
oracle mirrors are generated programmatically from the same constants
(shingle sizes, hash counts, stopword lists) so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import dedup, multimodal, similarity, text
from autonomus_datapipeline_spark.workloads.registry import load_table, query

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect, mirrored from operator specs)
# ---------------------------------------------------------------------------

_TOKS = r"regexp_split_to_array(lower(text), '\s+')"
_HIGH_HEX = "('8','9','a','b','c','d','e','f')"


def _sql_shingles(n: int) -> str:
    """CTE text producing DISTINCT (doc_id, shingle) for n-word shingles."""
    return f"""
    toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(tk[i:i+{n - 1}], ' ') AS shingle
        FROM (
            SELECT doc_id, tk,
                   unnest(range(1, greatest(len(tk) - {n - 1}, 1) + 1)) AS i
            FROM toks
        ) u
    )
    """


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(CASE WHEN text IS NULL THEN 'n' ELSE 'v' || md5(text) END)
               AS content_hash,
           MIN(doc_id) AS kept_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: null-safe md5 content hash → keep lowest doc_id.

    Scale: one hash-shuffle; the md5 is computed map-side and the groupBy
    partially aggregates before the exchange. The oracle mirrors the
    prefix-free null-safe key encoding ('n' | 'v'||md5(col)).
    """
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"], "doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidates
# ---------------------------------------------------------------------------

_MH_K = 12          # minhash functions
_MH_BANDS = 4       # LSH bands (rows_per_band = 3)
_MH_ROWS = _MH_K // _MH_BANDS
_MH_SHINGLE = 2     # word bigrams


def _minhash_oracle() -> str:
    mins = ",\n               ".join(
        f"MIN(md5('{s}:' || shingle)) AS mh{s}" for s in range(_MH_K)
    )
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM mh".format(
            b=b,
            concat=" || ".join(f"mh{b * _MH_ROWS + r}" for r in range(_MH_ROWS)),
        )
        for b in range(_MH_BANDS)
    )
    return f"""
    WITH {_sql_shingles(_MH_SHINGLE)},
    mh AS (
        SELECT doc_id,
               {mins}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        {band_selects}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx
                AND a.band_hash = b.band_hash
                AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


@query("minhash_lsh_pairs", oracle=_minhash_oracle())
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (k=12 salted-md5 permutations over word bigrams) + LSH
    banding (4 bands × 3 rows) → candidate near-dup pairs.

    Scale: shingle explode → ONE aggregation for all 12 minhashes → band
    equi-join. Non-colliding pairs are never materialized; cost is bounded
    by bucket occupancy, not n².
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_table(docs, "doc_id", "text", _MH_SHINGLE)
    sigs = dedup.minhash_signatures(sh, _MH_K)
    return dedup.lsh_candidate_pairs(sigs, _MH_BANDS, _MH_ROWS)


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (exact, inverted-index join)
# ---------------------------------------------------------------------------

_JAC_SHINGLE = 3
_JAC_TOPK = 20


@query(
    "ngram_jaccard_top_pairs",
    oracle=f"""
    WITH {_sql_shingles(_JAC_SHINGLE)},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT {_JAC_TOPK}
    """,
)
def ngram_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard for pairs sharing ≥1 shingle; top-20 most
    similar with deterministic tiebreak.

    Scale: inverted-index self-join (cost Σ df(shingle)², not n²); at 100 TB
    hot shingles get document-frequency-capped upstream.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_table(docs, "doc_id", "text", _JAC_SHINGLE)
    pairs = dedup.ngram_jaccard_pairs(sh)
    return pairs.orderBy(
        F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(_JAC_TOPK)


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32


def _simhash_oracle() -> str:
    sums = ",\n               ".join(
        f"SUM(CASE WHEN substr(md5('{j}:' || tok), 1, 1) IN {_HIGH_HEX} "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(_SIMHASH_BITS)
    )
    bits = " || ".join(
        f"(CASE WHEN b{j} > 0 THEN '1' ELSE '0' END)" for j in range(_SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    sums AS (
        SELECT doc_id,
               {sums}
        FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {bits} AS simhash FROM sums
    """


@query("simhash_fingerprints", oracle=_simhash_oracle())
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (frequency-weighted salted-md5 bits).

    Scale: token explode → ONE aggregation computing all 32 bit-sums —
    single shuffle keyed on doc_id, no per-bit row blowup. Near-dup grouping
    then buckets on the fingerprint (or bit-rotations of it for Hamming ≤ k).
    """
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text", _SIMHASH_BITS)


# ---------------------------------------------------------------------------
# Embedding similarity: brute-force cosine top-k (baseline) + blocked pairs
# ---------------------------------------------------------------------------

_ANN_K = 5
_NEARDUP_TAU = 0.3
_DIM = 64
_DOT = (
    "SUM(CAST(CAST(a.embedding[p] AS DOUBLE) * CAST(b.embedding[p] AS DOUBLE)"
    " AS DECIMAL(38,12)))"
)
_NORM_CTE = f"""
    norms AS (
        SELECT vec_id,
               CAST(SUM(CAST(CAST(embedding[p] AS DOUBLE) * CAST(embedding[p] AS DOUBLE)
                             AS DECIMAL(38,12))) AS DOUBLE) AS nsq
        FROM embeddings, range(1, {_DIM + 1}) t(p)
        GROUP BY vec_id
    )
"""


@query(
    "embedding_cosine_topk",
    oracle=f"""
    WITH {_NORM_CTE},
    dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST({_DOT} AS DOUBLE) AS dot
        FROM embeddings a, embeddings b, range(1, {_DIM + 1}) t(p)
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, rk FROM (
        SELECT query_id, neighbor_id,
               ROUND(dot / (sqrt(nq.nsq) * sqrt(nc.nsq)), 6) AS cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY ROUND(dot / (sqrt(nq.nsq) * sqrt(nc.nsq)), 6) DESC,
                            neighbor_id) AS INT) AS rk
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id
    ) s WHERE rk <= {_ANN_K}
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 10 — the exact
    ANN baseline. Dot products use the exact decimal accumulator so ranks
    are engine-identical.

    Scale: query side broadcast; corpus scanned once; only shuffle is the
    per-query top-k window (tiny).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, _ANN_K
    )


@query(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH {_NORM_CTE},
    dots AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
               CAST({_DOT} AS DOUBLE) AS dot
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
             range(1, {_DIM + 1}) t(p)
        GROUP BY 1, 2, 3
    )
    SELECT id_a, id_b, block, cosine FROM (
        SELECT id_a, id_b, block,
               ROUND(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS cosine
        FROM dots
        JOIN norms na ON na.vec_id = id_a
        JOIN norms nb ON nb.vec_id = id_b
    ) s WHERE cosine >= {_NEARDUP_TAU}
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label: only
    same-block pairs are compared (Σ block² cost, not n²)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.blocked_neardup_pairs(emb, "label", _NEARDUP_TAU)


@query("ann_ivf_topk", oracle=None)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans cells (MLlib, fixed seed) + 3-probe exact re-rank —
    the clustered scale path next to the LSH one. Rows-only: cluster
    assignments are model-derived, not SQL-expressible.

    Measured recall@5 vs the exact baseline at sf0.01: 0.64 while scanning
    5/16 of the corpus (the test embeddings are near-random — real clustered
    embeddings fare far better at the same probe count)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, _ANN_K, n_clusters=16, n_probe=5
    )


@query("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets (numpy pandas-UDF
    signatures, equi-join on bucket with Hamming-1 multi-probe, exact
    re-rank inside the candidates).

    Rows-only check: recall vs the exact baseline is inherently approximate.
    Measured recall@5 at sf0.01: 0.20 scanning ≈(n_bits+1)/2^n_bits ≈ 11% of
    the corpus — near-random test vectors are angular LSH's worst case; the
    IVF path probes proportionally more and reaches 0.62 (see ann_ivf_topk).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        emb.filter(F.col("vec_id") < 10), emb, _ANN_K, _DIM, n_bits=6
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _stop_list_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(tk, x -> list_contains([{words}], x))) AS INT)"
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
    SELECT doc_id,
           CAST(len(tk) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars,
           ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                 / len(tk), 4) AS avg_token_len,
           CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT)
               AS n_punct,
           ROUND(CAST({_stop_list_sql('en')} AS DOUBLE) / len(tk), 4) AS stop_ratio,
           ROUND(least(1.0, len(tk) / 150.0) * 0.5
                 + ROUND(CAST({_stop_list_sql('en')} AS DOUBLE) / len(tk), 4) * 0.25
                 + least(1.0, ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                                    / len(tk), 4) / 8.0) * 0.25,
                 4) AS quality_score
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, char count, average token
    length, punctuation count, stopword ratio, composite score ∈ [0,1].

    Scale: pure codegen'd projection — runs at scan speed, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = text.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["n_chars"].alias("n_chars"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["n_punct"].alias("n_punct"),
        feats["stop_ratio"].alias("stop_ratio"),
        feats["quality_score"].alias("quality_score"),
    )


def _lang_id_oracle() -> str:
    score_cols = ",\n           ".join(
        f"{_stop_list_sql(lang)} AS s_{lang}" for lang in text.LANG_PRIORITY
    )
    greatest = ", ".join(f"s_{lang}" for lang in text.LANG_PRIORITY)
    case = " ".join(
        f"WHEN s_{lang} = g THEN '{lang}'" for lang in text.LANG_PRIORITY[:-1]
    )
    return f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS tk FROM documents),
    s AS (
        SELECT doc_id, lang,
           {score_cols}
        FROM t
    ),
    g AS (SELECT *, GREATEST({greatest}) AS g FROM s)
    SELECT doc_id, lang,
           CASE {case} ELSE '{text.LANG_PRIORITY[-1]}' END AS predicted_lang,
           (CASE {case} ELSE '{text.LANG_PRIORITY[-1]}' END) = lang AS is_correct
    FROM g
    """


@query("lang_id_stopword_voting", oracle=_lang_id_oracle())
def lang_id_stopword_voting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: per-language stopword-hit voting with a fixed
    tie order, compared against the labeled ``lang`` column.

    Scale: codegen'd projection (array filter per language), no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    pred = text.predicted_lang(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    )


@query(
    "token_count_regex",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{text.BPE_ISH_TOKEN_RE}')) AS INT)
               AS n_bpe_tokens,
           CAST(len({_TOKS}) AS INT) AS n_ws_tokens
    FROM documents
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenization
    (words | numbers | single symbols)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.size(text.tokens(F.col("text"))).alias("n_ws_tokens"),
    )


@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_fingerprint,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS token_fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace-normalized md5 + sorted-distinct-
    token md5 (catches reorderings). Both are the join keys for cross-corpus
    exact/near dedup at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.normalized_fingerprint(F.col("text")).alias("norm_fingerprint"),
        text.sorted_token_fingerprint(F.col("text")).alias("token_fingerprint"),
    )


_WK, _WW = 5, 8


@query(
    "winnowing_fingerprints",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id,
               length(text) - {_WK - 1} AS n_grams,
               i - 1 AS pos,
               md5(substr(text, CAST(i AS INT), {_WK})) AS h
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {_WK - 1} + 1)) AS i
            FROM documents WHERE length(text) >= {_WK}
        ) g
    ),
    mins AS (
        SELECT doc_id, n_grams, pos,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {_WW - 1} FOLLOWING)
                   AS fingerprint
        FROM grams
    )
    SELECT DISTINCT doc_id, fingerprint
    FROM mins WHERE pos <= n_grams - {_WW}
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (k=5 char-grams, window w=8):
    every window of 8 consecutive k-gram hashes contributes its minimum;
    the distinct set per doc is robust to local edits — the
    plagiarism-detection / fuzzy-dedup fingerprint.

    Scale: explode + one windowed min + distinct — one shuffle on doc_id
    plus the dedup shuffle; selection keeps ~2/w of grams.
    """
    docs = load_table(spark, sf_dir, "documents")
    return text.winnowing_fingerprints(docs, "doc_id", "text", _WK, _WW)


# ---------------------------------------------------------------------------
# Multimodal binary-column plumbing
# ---------------------------------------------------------------------------


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(md5(text) || '/' || CAST(i AS VARCHAR)) AS frame_md5
    FROM (
        SELECT doc_id, text,
               unnest(range(0, 1 + strlen(text) % 4)) AS i
        FROM documents
    ) t
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary 'video' payloads: 1 payload → N frame rows
    expanded inside the Arrow batch (mapInPandas), codec stubbed behind a
    deterministic fake (frame count = 1 + bytes mod 4, frame id =
    md5(payload_md5 || '/idx'))."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", multimodal.to_payload(F.col("text")).alias("payload")
    )
    return multimodal.sample_frames(docs)


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           md5(text) AS payload_md5,
           CAST(1 + ascii(substr(md5(text), 1, 1)) AS INT) AS width,
           CAST(1 + ascii(substr(md5(text), 2, 1)) AS INT) AS height,
           CASE ascii(substr(md5(text), 3, 1)) % 3
                WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: text → opaque binary payload → Arrow-
    batched mapInPandas 'decode' producing typed metadata (real codec call
    stubbed; deterministic md5-derived fake keeps the path oracle-checkable).

    Scale: the pandas stage is a streaming per-batch map with no shuffle;
    the payload column is dropped immediately after decode.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", multimodal.to_payload(F.col("text")).alias("payload")
    )
    return multimodal.decode_features(docs)
