"""Training-corpus preparation workloads: tokenizer-training prep (BPE merge
candidates), per-domain balancing, and one-pass Gram/covariance for PCA
whitening of embeddings.

All three are LLM-data-pipeline operators with no counterpart in the
reference engine (its transform surface stops at generic projections and
aggregations — SURVEY.md §2.B); each is expressed as built-in columnar
DataFrame ops so Catalyst fuses them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.operators.prefix_sum import (
    ranked_head,
    with_global_running,
)
from autonomus_datapipeline_spark.workloads.registry import (
    MD5_HEX7_PROXY_BOUNDS,
    UNIT_EMBED_COMPONENT_BOUNDS,
    descale6,
    load_table,
    query,
)

_TOKS = "regexp_split_to_array(lower(text), '\\s+')"

# ---------------------------------------------------------------------------
# BPE/WordPiece merge-candidate counting
# ---------------------------------------------------------------------------

_BPE_TOP = 30


@query(
    "bpe_merge_candidates",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ),
    pairs AS (
        SELECT tk[i] || ' ' || tk[i + 1] AS pair
        FROM (
            SELECT tk, unnest(range(1, len(tk))) AS i FROM toks
        ) u
    )
    SELECT pair, COUNT(*) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair counting — the distributed inner loop of BPE/WordPiece
    vocabulary training (each merge round picks the most frequent adjacent
    symbol pair; at 100 TB the count IS the training cost, so it must be a
    map-side-combinable word-count shape, never a per-document Python loop).

    zip_with over two shifted slices forms the pairs inside codegen (no
    self-join, no posexplode twice); explode + groupBy + count is the
    classic shuffle-light aggregation — partial counts collapse per
    partition before the shuffle, and the global top-k is
    TakeOrderedAndProject, not a full sort. Total (count, pair) tiebreak
    keeps the k-boundary deterministic on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.lower("text"), r"\s+")
    pairs = F.zip_with(
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
        F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Per-domain cap (domain balancing)
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 8


@query(
    "domain_cap_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN doc_id ELSE 0 END) AS BIGINT)
               AS kept_id_sum
    FROM ranked GROUP BY source
    """,
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the web-corpus balancing step that stops a
    handful of boilerplate-heavy domains from dominating the training mix
    (complement of the fraction-based ``stratified_sample``: a hard ceiling,
    not a rate). Selection is a deterministic md5 order, so the "random" cap
    is reproducible with no RNG state; the rank is a per-domain distributed
    prefix-sum (md5-bucketed within each domain), so a handful of huge
    domains cannot serialize into single tasks at 100 TB. kept_id_sum
    (exact BIGINT sum of retained ids) lets the oracle value-check the exact
    membership, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("_h")
    )
    kept = F.col("rk") <= _DOMAIN_CAP
    # Per-domain distributed rank: the domain-partitioned window would run
    # one task per domain over that domain's WHOLE document set; the
    # partitioned prefix-sum buckets each domain's md5 order (uniform, so
    # load-balanced) and keeps the rank shuffle-parallel.
    return (
        with_global_running(
            keyed,
            [("_h", True), ("doc_id", True)],
            row_number="rk",
            partition_by=["source"],
            # r15: _h is an md5 hex digest, so its bucket proxy has a
            # STRUCTURAL envelope (alphabet [0-9a-f]) — skips the
            # per-domain min/max scan + broadcast join-back.
            bounds=MD5_HEX7_PROXY_BOUNDS,
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("kept_id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# One-pass Gram matrix (PCA / whitening prep)
# ---------------------------------------------------------------------------

_GRAM_DIMS = 16  # leading block registered for the oracle; operator takes full d


@query(
    "embedding_gram_block",
    oracle=f"""
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(SUM(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                         * CAST(embedding[CAST(j AS INT)] AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS dot
    FROM embeddings,
         range(1, {_GRAM_DIMS + 1}) AS ri(i),
         range(1, {_GRAM_DIMS + 1}) AS rj(j)
    WHERE j >= i
    GROUP BY 1, 2
    """,
)
def embedding_gram_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix (Σ x xᵀ) over the leading {16} embedding dims — the
    single-scan sufficient statistic for PCA / ZCA whitening of a corpus
    embedding table: the d×d Gram is shuffle-tiny (d² rows), the
    eigen-decomposition happens driver-side on d×d, and the projection is a
    second scan. The registered query uses the exact-decimal per-element
    path (posexplode × 2 bounded to a d-block, dsum per cell) so DuckDB can
    value-check it bit-exactly; operators/similarity.gram_matrix is the
    full-d production variant (one numpy outer-product partial per Arrow
    batch — d² doubles leave Python per batch, not per row)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.slice("embedding", 1, _GRAM_DIMS).alias("v")
    )
    a = F.posexplode(F.col("v"))
    left = emb.select(a.alias("i0", "vi"), "v")
    pair = left.select(
        (F.col("i0") + 1).alias("i"),
        "vi",
        F.posexplode(F.col("v")).alias("j0", "vj"),
    ).where(F.col("j0") >= F.col("i0"))
    return (
        pair.select(
            F.col("i").cast("int").alias("i"),
            (F.col("j0") + 1).cast("int").alias("j"),
            # Promote float32 elements to double BEFORE the multiply (the
            # dot_exact rule — a float32 product loses 29 mantissa bits and
            # diverges from DuckDB's promoted arithmetic), then snap to the
            # scale-12 decimal quantum proven to agree between engines
            # (cf. norm_sq_exact / pipeline_ops nsq oracles).
            (F.col("vi").cast("double") * F.col("vj").cast("double"))
            .cast("decimal(30,12)")
            .alias("prod"),
        )
        .groupBy("i", "j")
        .agg(F.sum("prod").cast("double").alias("dot"))
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding winsorize/clip report
# ---------------------------------------------------------------------------

_CLIP_LO_NUM, _CLIP_HI_NUM, _CLIP_DEN = 5, 95, 100  # p05 / p95


@query(
    "embedding_dim_clip_report",
    oracle=f"""
    WITH v AS (
        SELECT CAST(i AS INT) AS dim,
               CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
        FROM embeddings, range(1, {_GRAM_DIMS + 1}) AS r(i)
    ),
    ranked AS (
        SELECT dim, x,
               ROW_NUMBER() OVER (PARTITION BY dim ORDER BY x, x) AS rk,
               COUNT(*) OVER (PARTITION BY dim) AS n
        FROM v
    ),
    thr AS (
        SELECT dim,
               MIN(CASE WHEN rk * {_CLIP_DEN} >= n * {_CLIP_LO_NUM}
                        THEN x END) AS lo,
               MIN(CASE WHEN rk * {_CLIP_DEN} >= n * {_CLIP_HI_NUM}
                        THEN x END) AS hi
        FROM ranked GROUP BY dim
    )
    SELECT v.dim, t.lo, t.hi,
           CAST(SUM(CASE WHEN v.x < t.lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_low,
           CAST(SUM(CASE WHEN v.x > t.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_high
    FROM v JOIN thr t ON t.dim = v.dim
    GROUP BY 1, 2, 3
    """,
)
def embedding_dim_clip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit for embedding sanitation: per dimension, the
    exact discrete p05/p95 element (rank ceil(p·n) — an ACTUAL stored
    value, so no interpolation float drift can split the engines) and how
    many values each clip bound would touch — run before quantization or
    outlier-sensitive indexing to spot corrupt dims.

    Scale: dims explode to (dim, value) rows ranked by a PER-DIMENSION
    distributed prefix-sum (bucket-parallel within every dim — a plain
    dim-partitioned window would cap at 64 single-task sorts of |vectors|
    rows each); the threshold table is dim-count-sized and re-attaches
    with a broadcast-sized join."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.slice("embedding", 1, _GRAM_DIMS).alias("v")
    )
    v = emb.select(F.posexplode("v").alias("i0", "xf")).select(
        (F.col("i0") + 1).cast("int").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    # Per-dim distributed rank: a dim-partitioned window caps parallelism
    # at 64 tasks each sorting |vectors| rows; the partitioned prefix-sum
    # buckets within each dim. Rank ties among equal x values are
    # order-arbitrary in BOTH shapes and cannot change the selected
    # threshold (min-when picks by value).
    ranked = with_global_running(
        v, [("x", True)], row_number="rk", total_count="n",
        partition_by=["dim"],
        # r15: x is a unit-vector component, |x| <= 1 by construction —
        # skips the per-dim min/max scan + broadcast join-back.
        bounds=UNIT_EMBED_COMPONENT_BOUNDS,
    )
    thr = ranked.groupBy("dim").agg(
        F.min(
            F.when(
                F.col("rk") * _CLIP_DEN >= F.col("n") * _CLIP_LO_NUM, F.col("x")
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rk") * _CLIP_DEN >= F.col("n") * _CLIP_HI_NUM, F.col("x")
            )
        ).alias("hi"),
    )
    return (
        v.join(thr, "dim")
        .groupBy("dim", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("x") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_low"),
            F.sum(F.when(F.col("x") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_high"),
        )
    )


# ---------------------------------------------------------------------------
# Collocation mining (bigram lift / PMI ranking)
# ---------------------------------------------------------------------------

_COLL_MIN_COUNT = 20
_COLL_TOP = 30


@query(
    "bigram_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT {_TOKS} AS tk FROM documents
    ),
    tot AS (
        SELECT CAST(SUM(len(tk)) AS BIGINT) AS n_tok FROM toks
    ),
    uni AS (
        SELECT t AS w, COUNT(*) AS n_w
        FROM (SELECT unnest(tk) AS t FROM toks) u
        GROUP BY 1
    ),
    big AS (
        SELECT tk[i] AS w1, tk[i + 1] AS w2, COUNT(*) AS n_ab
        FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks) u
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_COLL_MIN_COUNT}
    )
    SELECT b.w1, b.w2, b.n_ab,
           a.n_w AS n_a, c.n_w AS n_b,
           CAST(b.n_ab AS DOUBLE) * CAST(t.n_tok AS DOUBLE)
               / (CAST(a.n_w AS DOUBLE) * CAST(c.n_w AS DOUBLE)) AS lift
    FROM big b
    JOIN uni a ON a.w = b.w1
    JOIN uni c ON c.w = b.w2
    CROSS JOIN tot t
    ORDER BY lift DESC, b.w1, b.w2
    LIMIT {_COLL_TOP}
    """,
)
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: bigrams ranked by lift (the exponentiated PMI,
    p(ab)/(p(a)p(b))) — the phrase-detection pass that feeds tokenizer
    vocabularies and word2vec-style phrase merging. Three word-count
    aggregates (unigrams, bigrams, one scalar total) over one logical
    corpus scan; bigram counts below {20} occurrences are cut BEFORE the
    unigram joins, so the join input is the (tiny) frequent-bigram set,
    not the full bigram vocabulary. Unigram re-attachment shuffles on the
    word — vocabulary-sized, never corpus-sized; the 1-row total is a
    broadcast cross join.

    Lift is computed as one double expression over three exact BIGINTs
    (count·total / (n_a·n_b)) — both engines evaluate the identical IEEE
    operation tree on identical integers, so the ranking and the k-boundary
    are bit-stable with a (w1, w2) tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.lower("text"), r"\s+")
    toks = docs.select(tk.alias("tk"))
    tot = toks.agg(F.sum(F.size("tk")).alias("n_tok"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    pairs = F.zip_with(
        F.slice(F.col("tk"), 1, F.greatest(F.size("tk") - 1, F.lit(0))),
        F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        toks.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _COLL_MIN_COUNT)
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("n_w").alias("n_a"))
    ub = uni.select(F.col("w").alias("wb"), F.col("n_w").alias("n_b"))
    lift = (
        F.col("n_ab").cast("double") * F.col("n_tok").cast("double")
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return (
        big.join(ua, big.w1 == ua.wa)
        .join(ub, big.w2 == ub.wb)
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_ab", "n_a", "n_b", lift.alias("lift"))
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(_COLL_TOP)
    )


# ---------------------------------------------------------------------------
# BPE encode (apply a fixed merge table to the corpus, GPT-2 loop semantics)
# ---------------------------------------------------------------------------

_BPE_ENC_MERGES = 20  # merge-table size (single counting pass, rank-ordered)
_BPE_ENC_TOP = 50     # report: top tokens after encoding


def _bpe_apply(w: str, merges: list[tuple[str, str]]) -> list[str]:
    """The GPT-2 encoder loop: repeatedly merge the LOWEST-RANK pair
    present in the symbol sequence, leftmost occurrence first, until no
    table pair remains. Rank-general — symbols may be multi-character, so
    a cascaded merge table applies unchanged. The DuckDB oracle replays
    exactly this loop (min-rank LATERAL pick + first-occurrence rewrite),
    and tests pin the rank-priority/overlap edge cases directly."""
    syms = list(w)
    while True:
        best = None
        for a, b in merges:
            for j in range(len(syms) - 1):
                if syms[j] == a and syms[j + 1] == b:
                    best = j
                    break
            if best is not None:
                break
        if best is None:
            return syms
        syms[best:best + 2] = [syms[best] + syms[best + 1]]


def _bpe_enc_oracle() -> str:
    pat = "' '||m.a||' '||m.b||' '"
    return f"""
    WITH RECURSIVE vocab(word, wc) AS (
        SELECT word, CAST(COUNT(*) AS BIGINT)
        FROM (SELECT unnest({_TOKS}) AS word FROM documents) u
        WHERE length(word) >= 1
        GROUP BY word
    ),
    pc AS (
        SELECT substr(word, CAST(i AS INT), 1) AS a,
               substr(word, CAST(i AS INT) + 1, 1) AS b,
               SUM(wc) AS c
        FROM (
            SELECT word, wc, unnest(range(1, length(word))) AS i
            FROM vocab WHERE length(word) >= 2
        ) u
        GROUP BY 1, 2
    ),
    merges AS (
        SELECT a, b, rk FROM (
            SELECT a, b,
                   ROW_NUMBER() OVER (ORDER BY c DESC, a, b) - 1 AS rk
            FROM pc
        ) r WHERE rk < {_BPE_ENC_MERGES}
    ),
    enc(word, wc, s, done) AS (
        SELECT word, wc,
               ' ' || array_to_string(regexp_extract_all(word, '.'), ' ')
                   || ' ',
               false
        FROM vocab
        UNION ALL
        SELECT e.word, e.wc,
               CASE WHEN m.rk IS NULL THEN e.s
                    ELSE substr(e.s, 1, strpos(e.s, {pat}) - 1)
                         || ' '||m.a||m.b||' '
                         || substr(e.s, strpos(e.s, {pat})
                                   + length({pat}))
               END,
               m.rk IS NULL
        FROM enc e
        LEFT JOIN LATERAL (
            SELECT rk, a, b FROM merges
            WHERE strpos(e.s, ' '||a||' '||b||' ') > 0
            ORDER BY rk LIMIT 1
        ) m ON true
        WHERE NOT e.done
    ),
    cnt AS (
        SELECT token, CAST(SUM(wc) AS BIGINT) AS n_occurrences
        FROM (
            SELECT unnest(string_split(trim(s), ' ')) AS token, wc
            FROM enc WHERE done
        ) t
        GROUP BY token
    )
    SELECT token, n_occurrences, rk FROM (
        SELECT token, n_occurrences,
               CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token)
                    AS INT) AS rk
        FROM cnt
    ) r WHERE rk <= {_BPE_ENC_TOP}
    ORDER BY rk
    """


@query("bpe_encode_tokens", oracle=_bpe_enc_oracle())
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE at corpus scale: learn a {_BPE_ENC_MERGES}-entry merge
    table (adjacent character pairs inside words, weighted by word
    frequency, count-desc + pair-lexicographic rank — one counting pass,
    i.e. a deployment-fixed merge table) and APPLY it with the standard
    GPT-2 encoder loop: repeatedly merge the lowest-rank pair present,
    leftmost occurrence first, until no table pair remains. Reports the
    top {_BPE_ENC_TOP} resulting tokens by corpus occurrence count —
    the complement of bpe_merge_candidates (which counts, but never
    applies). The apply loop is rank-general (it handles multi-character
    symbols), so the same operator serves a cascaded multi-level merge
    table; with a single-pass table the merges happen to be
    character-pairs only.

    Determinism: integer pair counts with a total (count, a, b) tiebreak
    pin the merge table; the encoder loop is deterministic by
    construction; token counts are integers with a (count, token)
    tiebreak on the top-k boundary. The DuckDB oracle replays the exact
    loop with a recursive CTE (min-rank LATERAL pick + first-occurrence
    string surgery over space-delimited symbol states).

    Scale: the Python encoder runs over the DISTINCT-WORD table
    (vocabulary-sized, Arrow-batched pandas UDF), never the corpus —
    corpus token counts re-attach by weighting each word's tokens with
    its frequency. The merge table is {_BPE_ENC_MERGES} broadcast rows;
    pair counting is a map-side-combinable aggregate over the vocab.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    # vocab feeds BOTH the merge learning and the encode — materialize once
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
        .localCheckpoint(eager=True)
    )
    pc = (
        words.where(F.length("word") >= 2)
        .select(
            "word",
            "wc",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        )
        .select(
            F.expr("substring(word, i, 1)").alias("a"),
            F.expr("substring(word, i + 1, 1)").alias("b"),
            "wc",
        )
        .groupBy("a", "b")
        .agg(F.sum("wc").alias("c"))
    )
    # the fitted merge table: _BPE_ENC_MERGES rows — a bounded collect of
    # fitted state (the broadcast-small tokenizer artifact), rank order
    # pinned by the total tiebreak
    merges = [
        (r["a"], r["b"])
        for r in pc.orderBy(F.desc("c"), "a", "b")
        .limit(_BPE_ENC_MERGES)
        .collect()
    ]

    def encode_batches(batches):
        for pdf in batches:
            toks, wcs = [], []
            for w, wc in zip(pdf["word"], pdf["wc"]):
                for t in _bpe_apply(w, merges):
                    toks.append(t)
                    wcs.append(wc)
            yield pd.DataFrame({"token": toks, "wc": wcs})

    counts = (
        words.mapInPandas(encode_batches, schema="token string, wc long")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("n_occurrences"))
    )
    return (
        ranked_head(
            counts,
            [("n_occurrences", False), ("token", True)],
            _BPE_ENC_TOP,
            "rk",
        )
        .select("token", "n_occurrences", "rk")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi segmentation (SentencePiece-style ENCODE, integer-scored)
# ---------------------------------------------------------------------------

_UVT_MULTI = 40    # multi-character pieces kept in the vocabulary
_UVT_MAXP = 4      # maximum piece length
_UVT_COST_K = 64   # per-piece cost base: cost = K - floor(log2(count))
_UVT_TOP = 50      # report: top tokens after segmentation
_UVT_WORD_RE = "^[a-z]{1,16}$"  # ASCII-only words: pins string collation


def _uvt_oracle() -> str:
    return f"""
    WITH RECURSIVE vocab AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest({_TOKS}) AS word FROM documents) u
        WHERE regexp_matches(word, '{_UVT_WORD_RE}')
        GROUP BY word
    ),
    subs AS (
        SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
               CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (
            SELECT word, wc, unnest(range(1, length(word) + 1)) AS i
            FROM vocab
        ) p, unnest(range(2, {_UVT_MAXP + 1})) AS t(l)
        WHERE i + l - 1 <= length(word)
        GROUP BY 1
    ),
    multi AS (
        SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk
            FROM subs
        ) r WHERE rk <= {_UVT_MULTI}
    ),
    chars AS (
        SELECT substr(word, CAST(i AS INT), 1) AS piece,
               CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (
            SELECT word, wc, unnest(range(1, length(word) + 1)) AS i
            FROM vocab
        ) u
        GROUP BY 1
    ),
    pieces AS (
        SELECT piece,
               CAST({_UVT_COST_K} - (length(bin(cnt)) - 1) AS BIGINT) AS cost
        FROM chars
        UNION ALL
        SELECT piece,
               CAST({_UVT_COST_K} - (length(bin(cnt)) - 1) AS BIGINT) AS cost
        FROM multi
    ),
    rec(word, wc, i, c0, s0, c1, s1, c2, s2, c3, s3) AS (
        SELECT word, wc, 0,
               CAST(0 AS BIGINT), '',
               CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
               CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
               CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
        FROM vocab
        UNION ALL
        SELECT word, wc, i + 1,
               best.c, best.s,
               c0, s0, c1, s1, c2, s2
        FROM (
            SELECT word, wc, i, c0, s0, c1, s1, c2, s2,
                list_sort(list_filter([
                    {{'c': c0 + (SELECT cost FROM pieces
                                 WHERE piece = substr(word, i + 1, 1)),
                      's': s0 || ' ' || substr(word, i + 1, 1)}},
                    {{'c': c1 + (SELECT cost FROM pieces
                                 WHERE piece = substr(word, i, 2)),
                      's': s1 || ' ' || substr(word, i, 2)}},
                    {{'c': c2 + (SELECT cost FROM pieces
                                 WHERE piece = substr(word, i - 1, 3)),
                      's': s2 || ' ' || substr(word, i - 1, 3)}},
                    {{'c': c3 + (SELECT cost FROM pieces
                                 WHERE piece = substr(word, i - 2, 4)),
                      's': s3 || ' ' || substr(word, i - 2, 4)}}
                ], x -> x.c IS NOT NULL))[1] AS best
            FROM rec WHERE i < length(word)
        ) stepped
    ),
    final AS (
        SELECT word, wc, trim(s0) AS seg FROM rec WHERE i = length(word)
    ),
    cnts AS (
        SELECT token, CAST(SUM(wc) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(string_split(seg, ' ')) AS token, wc
              FROM final) t
        GROUP BY token
    )
    SELECT token, n_occurrences, rk FROM (
        SELECT token, n_occurrences,
               CAST(ROW_NUMBER()
                    OVER (ORDER BY n_occurrences DESC, token) AS INT) AS rk
        FROM cnts
    ) r WHERE rk <= {_UVT_TOP}
    ORDER BY rk
    """


def _uvt_segment(word: str, cost: dict[str, int]) -> list[str]:
    """Viterbi DP: minimize total piece cost; ties broken by the
    lexicographically smallest space-joined segmentation (leading-space
    convention — identical to the oracle's struct comparison, where the
    accumulated `s` strings all start with ' ').

    Invariant (asserted, not assumed): every single character of ``word``
    must be priced in ``cost`` — the vocab-derived cost dict always
    contains all corpus characters, which guarantees position j can
    always extend via the 1-char piece and ``cands`` is never empty. A
    caller feeding words from a DIFFERENT corpus than the cost table
    would otherwise fail deep inside an executor with a bare
    ``min([]) ValueError``."""
    missing = {ch for ch in word if ch not in cost}
    if missing:
        raise ValueError(
            f"_uvt_segment: characters {sorted(missing)!r} of word "
            f"{word!r} are not priced in the cost table — the piece "
            "vocabulary must cover every single character of the input"
        )
    best: list[tuple[int, str] | None] = [(0, "")] + [None] * len(word)
    for j in range(1, len(word) + 1):
        cands = []
        for length in range(1, min(_UVT_MAXP, j) + 1):
            prev = best[j - length]
            if prev is None:
                continue
            piece = word[j - length:j]
            c = cost.get(piece)
            if c is not None:
                cands.append((prev[0] + c, prev[1] + " " + piece))
        best[j] = min(cands)
    return best[len(word)][1].split()


@query("unigram_viterbi_tokens", oracle=_uvt_oracle())
def unigram_viterbi_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM subword segmentation (Kudo, ACL 2018 — the SentencePiece
    encoder) with a deployment-frozen integer score table: the piece
    vocabulary is every corpus character plus the top {_UVT_MULTI}
    substrings of length 2..{_UVT_MAXP} by corpus-weighted occurrence
    count, each piece scored cost = {_UVT_COST_K} - floor(log2(count)),
    and every word is segmented by the Viterbi DP that minimizes total
    cost — the integer-quantized analog of maximizing unigram
    log-likelihood (the per-piece constant plays the normalizer's role;
    same quantization discipline as dsir_importance_select's int64
    log-ratio weights). Complements the BPE pair in this module:
    bpe_encode_tokens applies greedy merge RANKS, this applies a global
    OPTIMUM under piece scores. Reports the top {_UVT_TOP} resulting
    tokens by corpus occurrence.

    Determinism: floor(log2(count)) is computed as binary-digit count
    (length(bin(cnt)) - 1 / int.bit_length - 1 — no float log anywhere);
    DP ties are broken by the lexicographically smallest space-joined
    segmentation over ASCII-pinned words ({_UVT_WORD_RE!r}), a total
    order both engines compare byte-identically. The DuckDB oracle replays
    the exact DP as a recursive CTE carrying the last {_UVT_MAXP}
    (cost, segmentation) states per word and picking each step's argmin
    via struct sort.

    Scale: the DP runs on the DISTINCT-WORD table (vocabulary-sized,
    Arrow-batched mapInPandas), never the corpus; corpus counts re-attach
    by word frequency. The score table is ≤ alphabet + {_UVT_MULTI}
    broadcast rows; substring counting is a map-side-combinable aggregate
    over vocab positions (bounded fan-out: ≤ 16·{_UVT_MAXP} positions per
    word).
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .where(F.col("word").rlike(_UVT_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
        .localCheckpoint(eager=True)
    )
    pos = words.select(
        "word",
        "wc",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    )
    subs = (
        pos.select(
            "word",
            "wc",
            "i",
            F.explode(
                F.sequence(F.lit(2), F.lit(_UVT_MAXP))
            ).alias("l"),
        )
        .where(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .select(F.expr("substring(word, i, l)").alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
    )
    chars = (
        pos.select(F.expr("substring(word, i, 1)").alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
    )
    # the fitted score table: a bounded collect of broadcast-small state
    # (≤ alphabet + _UVT_MULTI rows), rank order pinned by (cnt, piece)
    multi = [
        (r["piece"], r["cnt"])
        for r in subs.orderBy(F.desc("cnt"), "piece")
        .limit(_UVT_MULTI)
        .collect()
    ]
    cost = {
        r["piece"]: _UVT_COST_K - (int(r["cnt"]).bit_length() - 1)
        for r in chars.collect()
    }
    cost.update(
        (p, _UVT_COST_K - (int(c).bit_length() - 1)) for p, c in multi
    )

    def segment_batches(batches):
        for pdf in batches:
            toks, wcs = [], []
            for w, wc in zip(pdf["word"], pdf["wc"]):
                for t in _uvt_segment(w, cost):
                    toks.append(t)
                    wcs.append(wc)
            yield pd.DataFrame({"token": toks, "wc": wcs})

    counts = (
        words.mapInPandas(segment_batches, schema="token string, wc long")
        .groupBy("token")
        .agg(F.sum("wc").cast("bigint").alias("n_occurrences"))
    )
    return (
        ranked_head(
            counts,
            [("n_occurrences", False), ("token", True)],
            _UVT_TOP,
            "rk",
        )
        .select("token", "n_occurrences", "rk")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Leakage-free K-fold target encoding (out-of-fold category means)
# ---------------------------------------------------------------------------

_TE_FOLDS = 5     # deterministic folds: o_orderkey mod _TE_FOLDS
_TE_SMOOTH = 10   # prior strength m in the smoothed encoding

_TE_ORACLE = f"""
WITH base AS (
    SELECT o_orderpriority AS cat, o_orderkey % {_TE_FOLDS} AS fold,
           o_totalprice AS y
    FROM orders
),
cf AS (
    SELECT cat, fold,
           SUM(CAST(y AS DECIMAL(38,6))) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY 1, 2
),
c AS (SELECT cat, SUM(s) AS s, SUM(n) AS n FROM cf GROUP BY 1),
g AS (
    SELECT (CAST(CAST(SUM(CAST(y AS DECIMAL(38,6))) * CAST(1000000 AS DECIMAL(7,0)) AS DECIMAL(38,0)) AS DOUBLE) / 1e6) / COUNT(*) AS prior
    FROM base
)
SELECT cf.cat AS o_orderpriority, cf.fold,
       cf.n AS n_in_fold,
       CAST(c.n - cf.n AS BIGINT) AS n_out_fold,
       CAST(c.s - cf.s AS DOUBLE) / NULLIF(CAST(c.n - cf.n AS DOUBLE), 0.0)
           AS enc_oof,
       (CAST(c.s - cf.s AS DOUBLE) + CAST({_TE_SMOOTH} AS DOUBLE) * g.prior)
           / CAST(c.n - cf.n + {_TE_SMOOTH} AS DOUBLE) AS enc_smooth
FROM cf JOIN c ON c.cat = cf.cat
CROSS JOIN g
ORDER BY 1, 2
"""


@query("target_encode_oof", oracle=_TE_ORACLE)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free target encoding (Micci-Barreca, SIGKDD Expl. 2001, as
    deployed in K-fold CV pipelines): encode a categorical feature by the
    TARGET mean computed OUT-OF-FOLD — each (category, fold) cell gets
    the category's mean over every OTHER fold, so no row's own target
    leaks into its feature. Also emits the smoothed variant
    (S_oof + m·prior) / (N_oof + m) with m={_TE_SMOOTH} and the global
    prior, the standard guard for rare categories. Folds are
    deterministic (o_orderkey mod {_TE_FOLDS}), matching the repo's
    hash/key-split discipline (content_hash_split,
    stratified_kfold_assignment).

    Determinism: per-cell sums are exact DECIMAL(38,6) accumulators; the
    out-of-fold numerator is an exact decimal SUBTRACTION (total minus
    own fold — no second pass over the data); each output is a single
    correctly-rounded double division, and the smoothed blend is a
    pinned-order (A + m·prior)/(N+m) with m·prior one rounded multiply.

    Scale: ONE data-sized aggregate (category × fold cells, map-side
    combinable); category totals derive from the cell table, never from
    a rescan, so K-fold encoding costs the same shuffle as plain target
    encoding. The encoding table (|cats|·K rows) broadcasts back onto
    the training scan in production use.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderkey") % _TE_FOLDS).alias("fold"),
        F.col("o_totalprice").alias("y"),
    )
    cf = base.groupBy("cat", "fold").agg(
        F.sum(F.col("y").cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    c = cf.groupBy("cat").agg(
        F.sum("s").alias("s_tot"), F.sum("n").alias("n_tot")
    )
    g = base.agg(
        (
            descale6(F.sum(F.col("y").cast("decimal(38,6)")))
            / F.count(F.lit(1))
        ).alias("prior")
    )
    oof_s = (F.col("s_tot") - F.col("s")).cast("double")
    oof_n = (F.col("n_tot") - F.col("n")).cast("bigint")
    return (
        cf.join(F.broadcast(c), "cat")
        .crossJoin(F.broadcast(g))
        .select(
            F.col("cat").alias("o_orderpriority"),
            "fold",
            F.col("n").alias("n_in_fold"),
            oof_n.alias("n_out_fold"),
            # NULLIF pins the n_out_fold = 0 edge (a category confined to
            # one fold) to NULL on BOTH engines — Spark's Divide returns
            # NULL on a zero denominator while DuckDB's IEEE semantics
            # would yield ±Inf/NaN, a latent cross-engine parity break.
            (oof_s / F.nullif(oof_n.cast("double"), F.lit(0.0))).alias("enc_oof"),
            (
                (oof_s + F.lit(float(_TE_SMOOTH)) * F.col("prior"))
                / (F.col("n_tot") - F.col("n") + _TE_SMOOTH).cast("double")
            ).alias("enc_smooth"),
        )
        .orderBy("o_orderpriority", "fold")
    )
