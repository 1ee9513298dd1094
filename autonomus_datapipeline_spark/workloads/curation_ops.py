"""Training-data curation operators: PII redaction, deterministic stratified
sampling, Gopher-style quality filtering, benchmark-contamination checks,
incremental (cross-snapshot) dedup, sequence-length profiling and packing.

These are the corpus-curation steps a 100 TB LLM-data pipeline runs between
raw ingestion and tokenization. Every query is a pure DataFrame plan (no
Python row callbacks) with a DuckDB oracle mirrored from the same constants,
so determinism holds across engines and partitionings.

Reference parity note: the reference engine (sairam030/autonomus_datapipeline)
has no curation surface at all — these extend the §2.D capability envelope the
same way the dedup/ANN family does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from autonomus_datapipeline_spark.operators.prefix_sum import (
    with_global_ntile,
    with_global_running,
)
from autonomus_datapipeline_spark.operators.text import _e4_half_up
from autonomus_datapipeline_spark.workloads.pipeline_ops import (
    _TOKS,
    _e4_sql,
    _quality_score_sql,
    _sql_shingles,
)
from autonomus_datapipeline_spark.workloads.registry import (
    load_table,
    materialize_input,
    query,
)

# ---------------------------------------------------------------------------
# PII redaction (regexp scrub — the compliance pass every corpus needs)
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def _count_re(col: str, pat: str) -> str:
    """DuckDB fragment: number of matches of pat in col."""
    return f"CAST(len(regexp_extract_all({col}, '{pat}')) AS INT)"


@query(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IPV4}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS redacted,
           {_count_re('text', _PII_EMAIL)} AS n_emails,
           {_count_re('text', _PII_IPV4)} AS n_ips,
           CASE WHEN regexp_matches(text, '{_PII_EMAIL}')
                  OR regexp_matches(text, '{_PII_IPV4}')
                  OR regexp_matches(text, '{_PII_PHONE}')
                THEN TRUE ELSE FALSE END AS has_pii
    FROM documents
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: mask emails, IPv4 addresses and phone-shaped digit runs,
    and count what was masked. Pure regexp projection — codegen'd, fuses
    into the scan; at 100 TB this runs at parquet-read speed with zero
    shuffle. Order of masking matters (email before IP before phone) and is
    identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    n_emails = F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all("text", F.lit(_PII_IPV4), F.lit(0)))
    has_pii = (
        F.col("text").rlike(_PII_EMAIL)
        | F.col("text").rlike(_PII_IPV4)
        | F.col("text").rlike(_PII_PHONE)
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        has_pii.alias("has_pii"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (hash-threshold, no RNG state)
# ---------------------------------------------------------------------------

# Keep a document iff the first hex digit of md5(doc_id) falls in the accept
# set: 4/16 digits -> a deterministic ~25% sample, uniform within every
# stratum because md5 is independent of lang/source. Engine-portable (md5 is
# bit-identical in Spark and DuckDB), reproducible across runs/partitions,
# and requires NO shuffle for the sample itself — only the verification agg.
_SAMPLE_HEX = ("0", "1", "2", "3")


@query(
    "stratified_sample",
    oracle=f"""
    WITH s AS (
        SELECT lang, doc_id FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('{"','".join(_SAMPLE_HEX)}')
    )
    SELECT d.lang,
           COUNT(DISTINCT d.doc_id) AS n_total,
           COUNT(DISTINCT s.doc_id) AS n_sampled,
           CAST(min(s.doc_id) AS BIGINT) AS min_sampled_id
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    GROUP BY d.lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~25% per-language sample via an md5-hash threshold (no
    RNG, no seed state, no sampleBy). The accept decision is a map-side
    projection — at 100 TB the sample is a filter fused into the scan; this
    query additionally aggregates per-stratum acceptance counts so the gate
    can value-check the exact membership."""
    docs = load_table(spark, sf_dir, "documents")
    accept = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        *_SAMPLE_HEX
    )
    flagged = docs.select(
        "lang", "doc_id", F.when(accept, F.col("doc_id")).alias("sampled_id")
    )
    return flagged.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_total"),
        F.countDistinct("sampled_id").alias("n_sampled"),
        F.min("sampled_id").alias("min_sampled_id"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality filter chain
# ---------------------------------------------------------------------------

_QF_MIN_WORDS = 20
_QF_MAX_WORDS = 100_000
_QF_MIN_MWL = 2.0  # mean word length bounds
_QF_MAX_MWL = 12.0
_QF_STOPWORDS = ("the", "a", "of", "and", "to")
_QF_MIN_STOP_HITS = 1


@query(
    "quality_filter_chain",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_TOKS} AS tk FROM documents
    ), m AS (
        SELECT doc_id, lang,
               len(tk) AS n_words,
               CAST(len(array_to_string(tk, '')) AS DOUBLE) / len(tk)
                   AS mean_word_len,
               len(list_intersect(tk,
                   ['{"','".join(_QF_STOPWORDS)}'])) AS stop_hits
        FROM t
    )
    SELECT doc_id, lang, CAST(n_words AS INT) AS n_words,
           mean_word_len,
           n_words BETWEEN {_QF_MIN_WORDS} AND {_QF_MAX_WORDS} AS ok_length,
           mean_word_len BETWEEN {_QF_MIN_MWL} AND {_QF_MAX_MWL} AS ok_word_len,
           stop_hits >= {_QF_MIN_STOP_HITS} AS ok_stopwords,
           (n_words BETWEEN {_QF_MIN_WORDS} AND {_QF_MAX_WORDS})
               AND (mean_word_len BETWEEN {_QF_MIN_MWL} AND {_QF_MAX_MWL})
               AND stop_hits >= {_QF_MIN_STOP_HITS} AS keep
    FROM m
    """,
)
def quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate: word-count bounds, mean word
    length bounds, stopword presence — emitted as per-rule booleans plus the
    combined keep flag (so the rejection *reason* survives for audit).
    Everything is array built-ins over one tokenization — no shuffle, no
    Python; at 100 TB this is a scan-fused filter. The keep flag uses
    distinct stopword HITS (list_intersect semantics) so a doc repeating one
    stopword can't fake diversity."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.lower("text"), r"\s+")
    t = docs.select("doc_id", "lang", tk.alias("tk"))
    n_words = F.size("tk")
    mean_wl = F.length(F.array_join("tk", "")).cast("double") / F.size("tk")
    stop_hits = F.size(
        F.array_intersect("tk", F.array(*[F.lit(s) for s in _QF_STOPWORDS]))
    )
    m = t.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
    )
    ok_length = F.col("n_words").between(_QF_MIN_WORDS, _QF_MAX_WORDS)
    ok_wl = F.col("mean_word_len").between(_QF_MIN_MWL, _QF_MAX_MWL)
    ok_stop = F.col("stop_hits") >= _QF_MIN_STOP_HITS
    return m.select(
        "doc_id",
        "lang",
        "n_words",
        "mean_word_len",
        ok_length.alias("ok_length"),
        ok_wl.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        (ok_length & ok_wl & ok_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Benchmark contamination check (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

_CONTAM_N = 5  # word n-gram size
# Eval set: docs whose md5(doc_id) starts with '0' (~1/16 of the corpus) —
# stands in for a benchmark/eval corpus; deterministic and SF-stable.
_EVAL_HEX = "0"


@query(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH {_sql_shingles(_CONTAM_N)},
    eval_docs AS (
        SELECT doc_id FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{_EVAL_HEX}'
    ),
    eval_sh AS (
        SELECT DISTINCT sh.shingle FROM sh
        JOIN eval_docs e ON sh.doc_id = e.doc_id
    ),
    train_sh AS (
        SELECT sh.doc_id, sh.shingle FROM sh
        WHERE sh.doc_id NOT IN (SELECT doc_id FROM eval_docs)
    ),
    per_doc AS (
        SELECT t.doc_id,
               COUNT(*) AS n_grams,
               COUNT(e.shingle) AS n_contaminated
        FROM train_sh t LEFT JOIN eval_sh e ON t.shingle = e.shingle
        GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_contaminated AS BIGINT) AS n_contaminated,
           CAST(n_contaminated AS DOUBLE) / n_grams AS contamination_ratio,
           n_contaminated > 0 AS contaminated
    FROM per_doc
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: distinct word 5-grams of every training
    document are probed against the eval set's 5-gram vocabulary (held-out
    slice selected by md5(doc_id)); emits per-doc overlap counts, ratio, and
    the contaminated flag.

    Scale shape: the eval-side vocabulary is small relative to the corpus
    (benchmarks are MBs, corpora are TBs) → Spark broadcasts it, making the
    probe a map-side hash lookup with ONE shuffle for the per-doc agg. No
    all-pairs comparison anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.lower("text"), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size("tk") - (_CONTAM_N - 1), F.lit(1)))
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.get("tk", i + j - 1) for j in range(_CONTAM_N)]
            ),
        )
    )
    sh = docs.select("doc_id", tk.alias("tk")).select(
        "doc_id", F.explode(grams).alias("shingle")
    )
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == _EVAL_HEX
    eval_ids = docs.select("doc_id").where(is_eval)
    eval_sh = (
        sh.join(F.broadcast(eval_ids), "doc_id").select("shingle").distinct()
    )
    train_sh = sh.join(F.broadcast(eval_ids), "doc_id", "left_anti")
    per_doc = (
        train_sh.join(
            F.broadcast(eval_sh.withColumn("hit", F.lit(1))), "shingle", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        (F.col("n_contaminated").cast("double") / F.col("n_grams")).alias(
            "contamination_ratio"
        ),
        (F.col("n_contaminated") > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------


@query(
    "incremental_dedup_new_batch",
    oracle="""
    WITH hashed AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
               doc_id % 2 = 0 AS in_corpus
        FROM documents
    ),
    corpus_hashes AS (SELECT DISTINCT h FROM hashed WHERE in_corpus),
    batch AS (SELECT doc_id, h FROM hashed WHERE NOT in_corpus),
    survivors AS (
        SELECT b.doc_id, b.h,
               ROW_NUMBER() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn
        FROM batch b
        ANTI JOIN corpus_hashes c ON b.h = c.h
    )
    SELECT doc_id, h AS content_hash FROM survivors WHERE rn = 1
    """,
)
def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dedup: a new batch (odd doc_ids, standing in for
    today's crawl) is deduplicated against the existing corpus (even
    doc_ids) by whitespace-normalized content hash, then within itself
    (keep lowest doc_id). This is the daily-incremental shape of exact
    dedup: instead of re-hashing the whole corpus, the corpus side is just
    its hash column (stored once, scanned narrow).

    Scale: anti-join on the hash — corpus hashes are 16 bytes/doc so even a
    10-billion-doc corpus is ~160 GB, a standard shuffled anti-join (NOT
    broadcast); the within-batch dedup is one window over the same shuffle
    key, so both steps share a single hash partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    hashed = docs.select(
        "doc_id", h.alias("h"), (F.col("doc_id") % 2 == 0).alias("in_corpus")
    )
    corpus_hashes = hashed.where("in_corpus").select("h").distinct()
    batch = hashed.where(~F.col("in_corpus")).select("doc_id", "h")
    fresh = batch.join(corpus_hashes, "h", "left_anti")
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("doc_id", F.col("h").alias("content_hash"))
    )


# ---------------------------------------------------------------------------
# Sequence-length profile (token histogram in power-of-two buckets)
# ---------------------------------------------------------------------------


@query(
    "token_length_histogram",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
    )
    SELECT CAST(length(bin(n_tokens)) - 1 AS INT) AS log2_bucket,
           CAST(1::BIGINT << (length(bin(n_tokens)) - 1) AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t WHERE n_tokens > 0
    GROUP BY 1, 2
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length profile: documents bucketed by floor(log2(token
    count)) — the histogram that sizes context-window packing and flags
    truncation loss before tokenization. Map-side combine collapses to
    ~30 groups before the shuffle regardless of corpus size.

    Float-free by construction: the bucket is the integer bit-length of the
    token count (``length(bin(n)) - 1``) and the bucket floor is a left
    shift — no ``log2``/``pow`` on either engine, so no libm rounding can
    drift the hash at exact powers of two (the r3 driver-env failure mode)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower("text"), r"\s+")).cast("bigint")
    t = docs.select(n_tokens.alias("n_tokens")).where("n_tokens > 0")
    bucket = (F.length(F.bin("n_tokens")) - 1).cast("int")
    return (
        t.groupBy(bucket.alias("log2_bucket"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .select(
            "log2_bucket",
            F.expr("CAST(shiftleft(1L, log2_bucket) AS BIGINT)").alias("bucket_lo"),
            "n_docs",
            "total_tokens",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic sequence packing (context-window bin assignment)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per context window (toy-sized for the test corpus)
_PACK_WORKERS = 8  # parallel packer streams


@query(
    "sequence_packing_bins",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(doc_id % {_PACK_WORKERS} AS INT) AS packer,
               CAST(len({_TOKS}) AS INT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, packer, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY packer ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, packer, n_tokens,
           CAST(floor((cum - n_tokens) / {_PACK_BUDGET}.0) AS INT) AS bin_id
    FROM c
    """,
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic context-window packing: documents are sharded into
    {_PACK_WORKERS} independent packer streams (hash of doc_id), each stream
    assigns bins by running token count over doc_id order — bin_id =
    floor(start_offset / budget). Greedy first-fit is order-dependent and
    unscalable (global sequential state); offset packing is embarrassingly
    parallel: each packer's cumsum is an independent window, so adding
    packers scales out with zero cross-talk, and the assignment is
    reproducible run-to-run (the property training-data sharding actually
    needs)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower("text"), r"\s+"))
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % _PACK_WORKERS).cast("int").alias("packer"),
        n_tokens.cast("int").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("packer")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return c.select(
        "doc_id",
        "packer",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / float(_PACK_BUDGET))
        .cast("int")
        .alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster size distribution (dedup yield report)
# ---------------------------------------------------------------------------


@query(
    "dedup_cluster_size_stats",
    oracle="""
    WITH clusters AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
               COUNT(*) AS cluster_size
        FROM documents GROUP BY 1
    )
    SELECT cluster_size, n_clusters,
           CAST(cluster_size AS BIGINT) * n_clusters AS n_docs,
           (cluster_size - 1) * n_clusters AS n_removable
    FROM (
        SELECT CAST(cluster_size AS INT) AS cluster_size, COUNT(*) AS n_clusters
        FROM clusters GROUP BY 1
    ) g
    """,
)
def dedup_cluster_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield report: distribution of exact-duplicate cluster sizes and
    how many documents dedup would remove at each size — the number a data
    team checks before paying for a full dedup pass. Two cheap aggregations
    over the same hash key (the second input is |distinct hashes| rows)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    clusters = docs.groupBy(h.alias("h")).agg(F.count("*").alias("cluster_size"))
    return (
        clusters.groupBy(F.col("cluster_size").cast("int").alias("cluster_size"))
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size").cast("bigint") * F.col("n_clusters")).alias(
                "n_docs"
            ),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias("n_removable"),
        )
    )


# ---------------------------------------------------------------------------
# Context-window chunking (long-doc → overlapping training chunks)
# ---------------------------------------------------------------------------

_CHUNK_LEN = 64   # tokens per chunk
_CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = 16)


@query(
    "doc_chunking_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS tk, CAST(len({_TOKS}) AS BIGINT) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, tk, n,
               unnest(range(0, greatest(1,
                   (n - {_CHUNK_LEN - _CHUNK_STRIDE} + {_CHUNK_STRIDE - 1})
                       // {_CHUNK_STRIDE}))) AS c
        FROM t
    )
    SELECT doc_id,
           CAST(c AS INT) AS chunk_idx,
           CAST(least({_CHUNK_LEN}, n - c * {_CHUNK_STRIDE}) AS INT)
               AS n_chunk_tokens,
           array_to_string(tk[c * {_CHUNK_STRIDE} + 1
                             : c * {_CHUNK_STRIDE} + {_CHUNK_LEN}], ' ')
               AS chunk_text
    FROM c
    """,
)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into {64}-token chunks
    at stride {48} (16-token overlap so no span is ever cut without context)
    — the pretokenization step that turns variable-length documents into
    model-window-sized training rows. Chunk count per doc is
    max(1, ceil((n - overlap) / stride)), all integer math.

    Scale: pure array arithmetic in one projection + a bounded explode
    (output rows ≈ corpus tokens / stride); no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    overlap = _CHUNK_LEN - _CHUNK_STRIDE
    t = docs.select(
        "doc_id",
        F.split(F.lower("text"), r"\s+").alias("tk"),
        F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias("n"),
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.expr(f"CAST((n - {overlap} + {_CHUNK_STRIDE - 1}) div {_CHUNK_STRIDE} AS BIGINT)"),
    )
    c = t.select(
        "doc_id", "tk", "n",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_", "c"),
    )
    return c.select(
        "doc_id",
        F.col("c").cast("int").alias("chunk_idx"),
        F.least(F.lit(_CHUNK_LEN), F.col("n") - F.col("c") * _CHUNK_STRIDE)
        .cast("int")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("tk"), F.col("c") * _CHUNK_STRIDE + 1, _CHUNK_LEN), " "
        ).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Weighted corpus mixing (per-source deterministic sampling rates)
# ---------------------------------------------------------------------------

# Per-source keep rates (percent) — the data-mixing recipe. Generated from
# the source index so oracle and engine share the exact literal table.
_MIX_RATES = [(f"src{i}", 20 + (7 * i) % 75) for i in range(20)]
_MIX_DEFAULT = 50


@query(
    "corpus_mix_sampling",
    oracle=f"""
    WITH rates(source, rate_pct) AS (
        VALUES {", ".join(f"('{s}', {r})" for s, r in _MIX_RATES)}
    ),
    b AS (
        SELECT d.source,
               COALESCE(r.rate_pct, {_MIX_DEFAULT}) AS rate_pct,
               (ascii(substr(md5(d.text), 1, 1)) * 256
                + ascii(substr(md5(d.text), 2, 1))) % 100 AS bucket
        FROM documents d LEFT JOIN rates r ON r.source = d.source
    )
    SELECT source, CAST(rate_pct AS INT) AS rate_pct,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM b GROUP BY 1, 2
    """,
)
def corpus_mix_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: each source gets a target keep-rate (the
    data-mixing recipe — upweight curated sources, downsample crawl) and
    documents are kept by a deterministic content-hash bucket below the
    rate, so the mix is reproducible row-for-row across runs, engines, and
    partitionings (same ascii-of-md5 bucketing as content_hash_split).
    Reports per-source totals and kept counts.

    Scale: the rates table is a broadcast literal; bucketing is a codegen'd
    projection; one aggregation — the same plan at 20 sources or 20,000."""
    docs = load_table(spark, sf_dir, "documents")
    rates = docs.sparkSession.createDataFrame(
        _MIX_RATES, "source string, rate_pct int"
    )
    bucket = (
        F.ascii(F.substring(F.md5("text"), 1, 1)) * 256
        + F.ascii(F.substring(F.md5("text"), 2, 1))
    ) % 100
    b = (
        docs.join(F.broadcast(rates), "source", "left")
        .select(
            "source",
            F.coalesce(F.col("rate_pct"), F.lit(_MIX_DEFAULT)).alias("rate_pct"),
            bucket.alias("bucket"),
        )
    )
    return b.groupBy("source", "rate_pct").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("bucket") < F.col("rate_pct"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Per-group exact quantiles (grouped value-histogram method)
# ---------------------------------------------------------------------------


@query(
    "grouped_token_quantiles",
    oracle=f"""
    WITH t AS (
        SELECT lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
    ),
    hist AS (SELECT lang, n_tokens AS v, COUNT(*) AS c FROM t GROUP BY 1, 2),
    cum AS (
        SELECT lang, v, c,
               SUM(c) OVER (PARTITION BY lang ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS n
        FROM hist
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN 2 * cum >= n THEN v END) AS BIGINT)
               AS median_tokens,
           CAST(MIN(CASE WHEN 10 * cum >= 9 * n THEN v END) AS BIGINT)
               AS p90_tokens
    FROM cum GROUP BY lang
    """,
)
def grouped_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token-count median and p90 WITHOUT approx sketches
    or per-group sorts: the value histogram per group (token counts are
    small integers — bounded domain), a grouped cumulative window, and
    integer cross-multiplied rank cuts (2*cum ≥ n; 10*cum ≥ 9n). The
    grouped twin of quality_threshold_filter's global-quantile trick — per
    group the histogram is domain-bounded, so the window input is
    metadata-scale at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    hist = t.groupBy("lang", F.col("n_tokens").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("lang").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "v",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    return cum.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("v")))
        .cast("bigint")
        .alias("median_tokens"),
        F.min(F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("v")))
        .cast("bigint")
        .alias("p90_tokens"),
    )


# ---------------------------------------------------------------------------
# LM-score quality buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


@query(
    "lm_score_quality_buckets",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    bg AS (
        SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM (
            SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2
        ) u
    ),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT w1) AS BIGINT) AS v FROM bg),
    scored AS (
        SELECT b.doc_id,
               CAST(FLOOR(CAST(c2.c12 + 1 AS DOUBLE) / (c1.c1 + vo.v) * 1e12)
                    AS BIGINT) AS pq
        FROM bg b
        JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
        JOIN c1 ON c1.w1 = b.w1
        CROSS JOIN vocab vo
    ),
    perdoc AS (
        SELECT doc_id, CAST(SUM(pq) // COUNT(*) AS BIGINT) AS mean_pq
        FROM scored GROUP BY 1
    ),
    banded AS (
        SELECT doc_id, mean_pq,
               CAST(NTILE(3) OVER (ORDER BY mean_pq DESC, doc_id) AS INT)
                   AS tercile
        FROM perdoc
    )
    SELECT CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(mean_pq) AS BIGINT) AS min_score_q,
           CAST(MAX(mean_pq) AS BIGINT) AS max_score_q
    FROM banded GROUP BY 1 ORDER BY 1
    """,
)
def lm_score_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: documents split into head / middle /
    tail terciles by their in-corpus bigram-LM score (the
    bigram_lm_source_scores scorer, per document) — the partition CCNet
    uses to keep 'head' data, sample 'middle', and drop 'tail'. Scores
    are floor-picounit integers end-to-end (no decimal-snap tie class),
    and the tercile NTILE carries the doc_id total tiebreak, so the
    bucket boundary rows are engine-identical.

    Scale: the LM tables are vocabulary-sized; per-doc scoring is
    shuffle-linear on the bigram keys; the tercile is one range-
    partitioned sort over |docs| score rows; the report is 3 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", F.split(F.lower("text"), r"\s+").alias("tk"))
        .where(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(tk[i - 1] AS w1, tk[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vocab = bg.agg(F.count_distinct("w1").cast("bigint").alias("v"))
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                (F.col("c12") + 1).cast("double")
                / (F.col("c1") + F.col("v"))
                * F.lit(1e12)
            )
            .cast("bigint")
            .alias("pq"),
        )
    )
    perdoc = scored.groupBy("doc_id").agg(
        F.expr("sum(pq) div count(*)").cast("bigint").alias("mean_pq")
    )
    # materialize="cache": perdoc sits on the bigram explode + two LM-table
    # joins; the prefix-sum machinery reads its input from several subplans,
    # so without the cache that subtree re-executes per branch (measured
    # 3.1 → ~1.4 s at sf0.1). |docs| rows of (bigint, bigint) — cache-cheap.
    banded = with_global_ntile(
        perdoc,
        [("mean_pq", False), ("doc_id", True)],
        3,
        "tercile",
        materialize="cache",
        # mean_pq is a floor-quantized probability in picounits — its
        # range is fixed by construction, so the min/max scan is skipped
        bounds=(0.0, 1e12),
    ).select("mean_pq", "tercile")
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        banded.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("mean_pq").cast("bigint").alias("min_score_q"),
            F.max("mean_pq").cast("bigint").alias("max_score_q"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled corpus mixing weights (α = 0.5 via exact sqrt)
# ---------------------------------------------------------------------------


@query(
    "temperature_mix_weights",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ),
    weighted AS (
        SELECT source, n_docs, n_tokens,
               CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,6)) AS w
        FROM per_source
    ),
    tot AS (SELECT SUM(w) AS tw FROM weighted)
    SELECT source, n_docs, n_tokens,
           CAST(w AS DOUBLE) AS weight,
           CAST(w AS DOUBLE) / CAST(t.tw AS DOUBLE) AS mix_share
    FROM weighted CROSS JOIN tot t
    ORDER BY source
    """,
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (α = 0.5): each source's sampling
    share ∝ n_tokens^α — the multilingual/multi-source rebalancing rule
    (up-weights small sources, tempers dominant ones) behind mT5/XLM-R
    style data mixing; corpus_mix_sampling applies such shares, this
    query derives them. α = 0.5 keeps the whole computation portable
    because sqrt IS correctly rounded under IEEE-754 on both engines
    (unlike pow/exp/log — the repo's log-free discipline); the sqrt
    weights are snapped to decimal and summed order-free before the one
    double division per row.

    Scale: one map-side-combinable per-source rollup (sources ≪ rows), a
    scalar total broadcast, and a |sources|-row projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.lower("text"), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    weighted = per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(38,6)").alias("w"),
    )
    tot = weighted.agg(F.sum("w").alias("tw"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.col("w").cast("double").alias("weight"),
            (F.col("w").cast("double") / F.col("tw").cast("double")).alias(
                "mix_share"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# OOV-rate report (tokenizer vocabulary coverage on held-out docs)
# ---------------------------------------------------------------------------

_OOV_HIGH_HEX = "('8','9','a','b','c','d','e','f')"


@query(
    "oov_rate_report",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN {_OOV_HIGH_HEX} AS is_train,
               unnest({_TOKS}) AS tok
        FROM documents
    ),
    vocab AS (SELECT DISTINCT tok FROM tok WHERE is_train),
    eval_tok AS (
        SELECT t.source, t.tok, v.tok IS NOT NULL AS in_vocab
        FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
        WHERE NOT t.is_train
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS BIGINT)
               AS n_oov,
           CAST({_e4_sql("COUNT(CASE WHEN NOT in_vocab THEN 1 END)",
                         "COUNT(*)")} AS BIGINT) AS oov_e4
    FROM eval_tok GROUP BY 1 ORDER BY 1
    """,
)
def oov_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: a vocabulary is built from the md5-half
    train split (content_hash_split's convention) and each held-out
    source reports its token-level OOV rate — the tokenizer-coverage
    check run before freezing a vocab (vocab_zipf_stats sizes the vocab;
    this measures what the sizing misses on held-out data). The rate is
    the integer half-up ten-thousandth.

    Scale: the vocab is a distinct on the token key (vocabulary-sized);
    the coverage join is shuffle-linear on the token; per-source rollup
    is map-side combinable.
    """
    docs = load_table(spark, sf_dir, "documents")
    is_train = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "8", "9", "a", "b", "c", "d", "e", "f"
    )
    tok = docs.select(
        "source",
        is_train.alias("is_train"),
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    )
    vocab = tok.where("is_train").select("tok").distinct()
    eval_tok = (
        tok.where(~F.col("is_train"))
        .join(vocab.select("tok", F.lit(1).alias("in_vocab")), "tok", "left")
        .select("source", F.col("in_vocab").isNotNull().alias("in_vocab"))
    )
    n_oov = F.count(F.when(~F.col("in_vocab"), 1))
    return (
        eval_tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            n_oov.cast("bigint").alias("n_oov"),
            _e4_half_up(n_oov, F.count(F.lit(1))).cast("bigint").alias("oov_e4"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Quantile-normalization decile map (cross-source distribution alignment)
# ---------------------------------------------------------------------------


@query(
    "quantile_normalize_deciles",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    src_d AS (
        SELECT source, n_tokens,
               CAST(NTILE(10) OVER (PARTITION BY source
                                    ORDER BY n_tokens, doc_id) AS INT)
                   AS decile
        FROM lens
    ),
    pool_d AS (
        SELECT n_tokens,
               CAST(NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS INT)
                   AS decile
        FROM lens
    ),
    src_m AS (
        SELECT source, decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM src_d GROUP BY 1, 2
    ),
    pool_m AS (
        SELECT decile,
               CAST(SUM(n_tokens) AS BIGINT) AS p_sum,
               CAST(COUNT(*) AS BIGINT) AS p_n
        FROM pool_d GROUP BY 1
    )
    SELECT s.source, s.decile, s.n_docs,
           CAST(s.sum_tokens AS DOUBLE) / s.n_docs AS source_mean,
           CAST(p.p_sum AS DOUBLE) / p.p_n AS pooled_mean
    FROM src_m s JOIN pool_m p ON p.decile = s.decile
    ORDER BY s.source, s.decile
    """,
)
def quantile_normalize_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalization lookup: per (source, token-count decile),
    the source's decile mean next to the POOLED decile mean — the mapping
    table that aligns each source's length distribution onto the corpus
    distribution (the genomics/ML quantile-normalization recipe applied
    to doc lengths; substituting pooled_mean for source values equalizes
    marginals across sources before mixing). NTILE carries the doc_id
    total tiebreak on both engines; means are exact integer sums divided
    once.

    Scale: the per-source NTILE is a source-partitioned window; the
    POOLED NTILE is a distributed prefix-sum NTILE over the |docs|
    length rows (an unpartitioned pooled window would serialize the
    corpus), then bounded 10-row-per-source rollups — no fact-table
    join, no window over raw text.
    """
    # fan_out=False: this query's only text work is ONE size(split()) per
    # doc feeding window shuffles that re-partition anyway — fanning out
    # the raw text column first costs more than the compute win (measured
    # 2.2 s vs 3.7 s at sf0.1, AB_r11.json).
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    lens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    # Per-source distributed NTILE: a source-partitioned window caps
    # parallelism at |sources| with |docs|/|sources| rows per task; the
    # partitioned prefix-sum keeps each source's sort bucket-parallel.
    src_d = with_global_ntile(
        lens,
        [("n_tokens", True), ("doc_id", True)],
        10,
        "decile",
        partition_by=["source"],
    ).select("source", "n_tokens", "decile")
    pool_d = with_global_ntile(
        lens, [("n_tokens", True), ("doc_id", True)], 10, "decile"
    ).select("n_tokens", "decile")
    src_m = src_d.groupBy("source", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )
    pool_m = pool_d.groupBy("decile").agg(
        F.sum("n_tokens").cast("bigint").alias("p_sum"),
        F.count(F.lit(1)).cast("bigint").alias("p_n"),
    )
    return (
        src_m.join(F.broadcast(pool_m), "decile")
        .select(
            "source",
            "decile",
            "n_docs",
            (F.col("sum_tokens").cast("double") / F.col("n_docs")).alias(
                "source_mean"
            ),
            (F.col("p_sum").cast("double") / F.col("p_n")).alias("pooled_mean"),
        )
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking statistics (Rabin-style CDC boundaries)
# ---------------------------------------------------------------------------

_CDC_K = 8     # rolling-hash gram width
_CDC_MOD = 32  # boundary when hash % 32 == 0 → expected chunk ≈ 32 chars


@query(
    "content_defined_chunks",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, length(text) AS n_chars, i,
               (ascii(substr(md5(substr(text, CAST(i AS INT), {_CDC_K})), 1, 1))
                * 256
                + ascii(substr(md5(substr(text, CAST(i AS INT), {_CDC_K})), 2, 1)))
               % {_CDC_MOD} = 0 AS is_boundary
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {_CDC_K - 1} + 1)) AS i
            FROM documents WHERE length(text) >= {_CDC_K}
        ) g
    )
    SELECT doc_id,
           CAST(MAX(n_chars) AS BIGINT) AS n_chars,
           CAST(COUNT(CASE WHEN is_boundary THEN 1 END) + 1 AS BIGINT)
               AS n_chunks,
           CAST(MAX(n_chars) AS DOUBLE)
             / (COUNT(CASE WHEN is_boundary THEN 1 END) + 1) AS mean_chunk_len
    FROM pos GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking statistics: boundaries fall where the
    rolling {_CDC_K}-gram hash ≡ 0 (mod {_CDC_MOD}) — the Rabin/CDC
    scheme storage dedup and delta-sync use, because an insertion shifts
    FIXED windows everywhere (doc_chunking_overlap's failure mode for
    dedup) but only perturbs content-defined boundaries locally. Reports
    per-doc chunk count and mean chunk length (expected ≈ {_CDC_MOD}
    chars). md5-derived hashes keep the boundary set engine-identical.

    Scale: explode + per-row hash + one map-side-combinable rollup —
    shuffle-linear; at 100 TB the per-position md5 becomes the fused
    scan stage exactly like winnowing_fingerprints.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.where(F.length("text") >= _CDC_K).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (_CDC_K - 1))
        ).alias("i"),
        "text",
    )
    h = F.md5(F.expr(f"substr(text, CAST(i AS INT), {_CDC_K})"))
    is_boundary = (
        (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1)))
        % _CDC_MOD
        == 0
    )
    pos = g.select("doc_id", "n_chars", is_boundary.alias("is_boundary"))
    return (
        pos.groupBy("doc_id")
        .agg(
            F.max("n_chars").cast("bigint").alias("n_chars"),
            (F.count(F.when(F.col("is_boundary"), 1)) + 1)
            .cast("bigint")
            .alias("n_chunks"),
            (
                F.max("n_chars").cast("double")
                / (F.count(F.when(F.col("is_boundary"), 1)) + 1)
            ).alias("mean_chunk_len"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Stratified k-fold assignment (deterministic CV splits with balance audit)
# ---------------------------------------------------------------------------

_KFOLD_K = 5


@query(
    "stratified_kfold_assignment",
    oracle=f"""
    WITH assigned AS (
        SELECT source,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256
                + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)))
               % {_KFOLD_K} AS fold,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT source, CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {_KFOLD_K}-fold cross-validation assignment with a
    per-stratum balance audit: fold = md5(doc_id) mod k (content-stable —
    re-running on a grown corpus never reshuffles an existing doc's fold,
    unlike randomSplit; the same convention as content_hash_split), and
    the report shows docs/tokens per (source, fold) so skewed strata are
    visible before training. Eval harnesses (knn_label_classifier,
    markov_transition_accuracy, oov_rate_report) use the 2-fold special
    case of this assignment.

    Scale: a per-row hash + one map-side-combinable rollup to
    |sources|×k rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    fold = (
        F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    ) % _KFOLD_K
    return (
        docs.select(
            "source",
            fold.cast("int").alias("fold"),
            F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias(
                "n_tokens"
            ),
        )
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "fold")
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------

_DSIR_B = 64  # feature-hash buckets (production: 10k+; B-sized state either way)
_DSIR_TARGET = "src0"  # in-corpus proxy for the target distribution
_DSIR_TOP = 50
# ln(ratio) is quantized to 1e-6 before the integer weight sum: libm ln is
# not IEEE-correctly-rounded, so Spark (JVM Math.log) and DuckDB (C log)
# may differ in the last ulp (~1e-16 rel). A floor at 1e-6 granularity
# flips only if ln·1e6 sits within ~1e-10 of an integer — ~1e-10 odds per
# bucket, 64 buckets. All arithmetic before ln is exact-int products cast
# to double (< 2^53, exactly representable), so the ln INPUT is identical.
_DSIR_LQ = "1e6"


def _dsir_bucket_sql(ng: str) -> str:
    h = f"md5({ng})"
    return (
        f"(ascii(substr({h}, 1, 1)) * 256 + ascii(substr({h}, 2, 1)))"
        f" % {_DSIR_B}"
    )


@query(
    "dsir_importance_select",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
    uni AS (SELECT doc_id, source, unnest(tk) AS ng FROM toks),
    bi AS (
        SELECT doc_id, source, tk[i] || ' ' || tk[i + 1] AS ng
        FROM (
            SELECT doc_id, source, tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2
        ) u
    ),
    ng AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    db AS (
        SELECT doc_id, source, {_dsir_bucket_sql("ng")} AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM ng GROUP BY 1, 2, 3
    ),
    pool AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cs FROM db GROUP BY 1),
    tgt AS (
        SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM db
        WHERE source = '{_DSIR_TARGET}' GROUP BY 1
    ),
    tot AS (
        SELECT (SELECT SUM(cs) FROM pool) AS s_tot,
               (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS t_tot
    ),
    lq AS (
        SELECT p.b,
               CAST(FLOOR(ln(
                   CAST((COALESCE(t.ct, 0) + 1) * (o.s_tot + {_DSIR_B}) AS DOUBLE)
                   / CAST((p.cs + 1) * (o.t_tot + {_DSIR_B}) AS DOUBLE)
               ) * {_DSIR_LQ}) AS BIGINT) AS lq
        FROM pool p LEFT JOIN tgt t ON t.b = p.b CROSS JOIN tot o
    ),
    w AS (
        SELECT d.doc_id, d.source,
               CAST(SUM(d.c * l.lq) AS BIGINT) AS dsir_weight_q
        FROM db d JOIN lq l ON l.b = d.b
        GROUP BY 1, 2
    )
    SELECT doc_id, source, dsir_weight_q, rk FROM (
        SELECT doc_id, source, dsir_weight_q,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY dsir_weight_q DESC, doc_id) AS INT) AS rk
        FROM w
    ) r WHERE rk <= {_DSIR_TOP}
    ORDER BY rk
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score every
    pool document by its importance weight under a hashed-n-gram bag model
    — Σ_b c_doc(b)·[ln p_target(b) − ln p_pool(b)] with add-1 smoothing
    over {_DSIR_B} feature-hash buckets (unigrams + bigrams) — and keep
    the top {_DSIR_TOP}. The target distribution is fit on the
    '{_DSIR_TARGET}' slice; the pool is the whole corpus. This is the
    standard cheap pre-training data selector: raw pool in, target-like
    subset out, no model in the loop.

    Scale: feature hashing keeps ALL fitted state {_DSIR_B}-sized
    (broadcast) no matter the corpus; the corpus is tokenized once into a
    checkpointed (doc, bucket, count) table consumed by both the fit
    aggregates (map-side combinable, {_DSIR_B}-row outputs) and the
    per-doc weight join; the only corpus-sized shuffles are the two
    keyed aggregations. Weights are exact int64 sums of 1e-6-quantized
    log-ratios (see _DSIR_LQ note), so ranking is engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "source", F.split(F.lower("text"), r"\s+").alias("tk")
    )
    uni = tk.select("doc_id", "source", F.explode("tk").alias("ng"))
    bi = tk.where(F.size("tk") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> concat(tk[i - 1], ' ', tk[i]))"
            )
        ).alias("ng"),
    )
    ng = uni.unionByName(bi)
    bucket = (
        F.ascii(F.substring(F.md5("ng"), 1, 1)) * 256
        + F.ascii(F.substring(F.md5("ng"), 2, 1))
    ) % _DSIR_B
    # one tokenize+hash pass; three consumers below (pool fit, target fit,
    # weight join) read the checkpointed blocks, not the explode
    db = (
        ng.withColumn("b", bucket)
        .groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    pool = db.groupBy("b").agg(F.sum("c").cast("bigint").alias("cs"))
    tgt = (
        db.where(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("c").cast("bigint").alias("ct"))
    )
    tot = pool.agg(F.sum("cs").alias("s_tot")).crossJoin(
        F.broadcast(
            tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("t_tot"))
        )
    )
    lq = (
        pool.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        * (F.col("s_tot") + _DSIR_B)
                    ).cast("double")
                    / ((F.col("cs") + 1) * (F.col("t_tot") + _DSIR_B)).cast(
                        "double"
                    )
                )
                * float(_DSIR_LQ)
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    w = (
        db.join(F.broadcast(lq), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("c") * F.col("lq")).cast("bigint").alias("dsir_weight_q"))
    )
    from autonomus_datapipeline_spark.operators.prefix_sum import ranked_head

    return (
        ranked_head(
            w, [("dsir_weight_q", False), ("doc_id", True)], _DSIR_TOP, "rk"
        )
        .select("doc_id", "source", "dsir_weight_q", "rk")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# PPS systematic sampling (probability-proportional-to-size, grid inversion)
# ---------------------------------------------------------------------------

_PPS_K = 40  # sample size (grid points)


@query(
    "pps_systematic_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS w FROM documents
    ),
    c AS (
        SELECT doc_id, w,
               SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(w) OVER () AS tot
        FROM t
    ),
    g AS (SELECT CAST(unnest(range(0, {_PPS_K})) AS BIGINT) AS j)
    SELECT CAST(g.j AS INT) AS grid_idx,
           CAST(((2 * g.j + 1) * c.tot) // {2 * _PPS_K} AS BIGINT)
               AS grid_point,
           c.doc_id,
           c.w AS n_tokens
    FROM c JOIN g
      ON ((2 * g.j + 1) * c.tot) // {2 * _PPS_K} >= c.cum - c.w
     AND ((2 * g.j + 1) * c.tot) // {2 * _PPS_K} < c.cum
    """,
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay
    {_PPS_K} evenly spaced grid points over the corpus's cumulative token
    mass (midpoint rule, p_j = (2j+1)·W div 2k) and select the document
    whose cumulative-weight interval contains each point — the classic
    PPS design for building a length-weighted corpus sample / mixing
    probe without any randomness. Everything is INTEGER arithmetic
    (token counts, cumulative sums, floor division), so the selected set
    is bit-identical across engines — no float inversion, no RNG seed
    drift. A document longer than one stride is selected by several
    consecutive grid points (standard PPS-systematic multiplicity).

    Scale: the cumulative mass comes from the distributed prefix-sum
    operator (bucketed local windows + offset rollup — no unpartitioned
    window), the grid is k broadcast rows probed by a per-row interval
    test (k ≤ 10³; for larger k, bucket the grid by cum-range and
    equi-join), and the output is exactly k rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias("w"),
    )
    # doc_id has no generator-spec envelope, so the min/max scan cannot be
    # skipped — materialize the slim corpus projection once instead of
    # re-running the scan + split per prefix-sum branch (3× without this).
    t = materialize_input(t)
    c = with_global_running(
        t, [("doc_id", True)], sums={"cum": "w"}, totals={"tot": "w"}
    )
    g = spark.range(_PPS_K).select(F.col("id").cast("bigint").alias("j"))
    p = F.expr(f"((2 * j + 1) * tot) div {2 * _PPS_K}")
    return (
        c.join(
            F.broadcast(g),
            (p >= F.col("cum") - F.col("w")) & (p < F.col("cum")),
        )
        .select(
            F.col("j").cast("int").alias("grid_idx"),
            p.cast("bigint").alias("grid_point"),
            "doc_id",
            F.col("w").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget selection (greedy by quality under a corpus token budget)
# ---------------------------------------------------------------------------

_TB_BUDGET_FRAC = 4  # keep the best docs up to tot/4 tokens


@query(
    "token_budget_select",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    scored AS (
        SELECT doc_id, {_quality_score_sql()} AS q,
               CAST(len(tk) AS BIGINT) AS w
        FROM t
    ),
    c AS (
        SELECT doc_id, q, w,
               SUM(w) OVER (ORDER BY q DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(w) OVER () AS tot
        FROM scored
    )
    SELECT doc_id, q AS quality_score, w AS n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum * {_TB_BUDGET_FRAC} <= tot
    """,
)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data selection: keep the highest-quality documents
    (composite quality score, doc_id tiebreak) whose cumulative token
    count fits a budget of total/{_TB_BUDGET_FRAC} — the greedy
    knapsack every pretraining pipeline runs when the compute budget
    fixes the token count, not the document count. The budget test is
    exact integer cross-multiplication (cum·{_TB_BUDGET_FRAC} ≤ tot), so
    the cut-off document is engine-identical; the quality score itself is
    the integer-ten-thousandths composite shared with
    text_quality_scores / dedup_keep_best_quality.

    Scale: one scoring projection (codegen'd), one distributed prefix sum
    over the quality order (bucketed — no unpartitioned window), one
    filter. The grand total rides the prefix-sum rollup; the corpus is
    scanned once.
    """
    from autonomus_datapipeline_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        text_ops.quality_features(F.col("text"))["quality_score"].alias("q"),
        F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias("w"),
    )
    c = with_global_running(
        scored,
        [("q", False), ("doc_id", True)],
        sums={"cum": "w"},
        totals={"tot": "w"},
        # NOT materialize="cache"-d: measured in three interleaved A/Bs
        # (r14, AB_r14_bounds_inputs*.json) — the cache build + AQE pin
        # costs slightly more than the one branch re-scan it dedups
        # (consistent ~+0.05 s med over 3 runs; the r6/r7b lesson again).
        # quality_score ∈ [0, 1] by operator spec — skips the min/max
        # scan, which would re-run the corpus scan + feature extraction
        bounds=(0.0, 1.0),
    )
    return c.where(F.col("cum") * _TB_BUDGET_FRAC <= F.col("tot")).select(
        "doc_id",
        F.col("q").alias("quality_score"),
        F.col("w").alias("n_tokens"),
        F.col("cum").cast("bigint").alias("cum_tokens"),
    )


# ---------------------------------------------------------------------------
# Raking / iterative proportional fitting (post-filter margin reweighting)
# ---------------------------------------------------------------------------

_IPF_MIN_CHARS = 250          # the quality filter whose bias raking undoes
_IPF_PICO = "1000000000000.0"  # weight grain: integer picounits
_IPF_ROUNDS = ("lang", "source", "lang", "source")  # 2 full IPF rounds


def _ipf_adjust_sql(prev: str, out: str, key: str, tgt: str) -> str:
    """One unrolled IPF adjustment: per-margin weighted totals (exact
    DECIMAL(38,0) picounit sums of decimal n·w products — a bigint
    product wraps past ~9.2e6 docs per cell), then
    w' = FLOOR(w · target·10¹² / current) —
    the pagerank picounit-floor pattern: FLOOR has no tie case and every
    float op is a single correctly-rounded IEEE op in pinned order."""
    return f"""
    {out}_m AS (
        SELECT {key},
               CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS c
        FROM {prev} GROUP BY 1
    ),
    {out} AS (
        SELECT p.lang, p.source, p.n,
               CAST(FLOOR((CAST(p.w AS DOUBLE)
                           * (CAST(t.t AS DOUBLE) * {_IPF_PICO}))
                          / CAST(m.c AS DOUBLE)) AS BIGINT) AS w
        FROM {prev} p
        JOIN {out}_m m ON m.{key} = p.{key}
        JOIN {tgt} t ON t.{key} = p.{key}
    )"""


def _ipf_oracle() -> str:
    steps = []
    prev = "w0"
    for i, key in enumerate(_IPF_ROUNDS):
        out = f"w{i + 1}"
        tgt = "tl" if key == "lang" else "ts"
        steps.append(_ipf_adjust_sql(prev, out, key, tgt))
        prev = out
    chain = ",".join(steps)
    return f"""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents WHERE n_chars >= {_IPF_MIN_CHARS}
        GROUP BY 1, 2
    ),
    tl AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS t
        FROM documents GROUP BY 1
    ),
    ts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS t
        FROM documents GROUP BY 1
    ),
    w0 AS (
        SELECT lang, source, n, CAST({_IPF_PICO} AS BIGINT) AS w
        FROM cells
    ),{chain}
    SELECT lang, source, n AS n_kept, w AS w_pico,
           CAST(w AS DOUBLE) / {_IPF_PICO} AS weight,
           CAST(CAST(n AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))
                AS DOUBLE) / {_IPF_PICO} AS weighted_rows
    FROM {prev}
    ORDER BY lang, source
    """


@query("ipf_raking_weights", oracle=_ipf_oracle())
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan, AMS
    1940): after a quality filter (n_chars >= {_IPF_MIN_CHARS}) biases
    the corpus's (lang, source) composition, compute per-cell weights
    that restore the FULL corpus's lang and source margins — two unrolled
    IPF rounds, each alternately scaling rows to the lang margin and the
    source margin. This is the rebalance-after-filtering step of a
    training-data mix (and classic survey post-stratification): filters
    never remove uniformly, and raking undoes the composition drift
    without un-filtering anything.

    Determinism: weights live as integer PICOUNITS; each adjustment is
    w' = FLOOR(w · target·10¹² / current) where the weighted margin
    totals are exact DECIMAL(38,0) sums of decimal products (wrap-proof
    at any corpus size) and the float expression is three
    correctly-rounded IEEE ops in pinned order — the pagerank
    picounit-floor pattern (FLOOR has no tie case, unlike decimal
    rounding).

    Scale: ONE data-sized pass builds the (lang, source) cell counts and
    the two margin tables (all map-side combinable); every IPF round is
    a margin-sized aggregate plus a broadcast join onto the cell table —
    dimension-sized work, independent of corpus size. More rounds or
    more margin dimensions extend the same envelope.
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.where(F.col("n_chars") >= _IPF_MIN_CHARS)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    tl = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("t_lang")
    )
    ts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("t_source")
    )
    pico = float(_IPF_PICO)
    cur = cells.withColumn("w", F.lit(int(pico)).cast("bigint"))
    cur = cur.join(F.broadcast(tl), "lang").join(F.broadcast(ts), "source")
    for key in _IPF_ROUNDS:
        # DECIMAL product + sum: n·w is docs·picounits — the per-row
        # product wraps bigint past ~9.2e6 docs in one cell and the
        # margin total past the same corpus-wide (the r11 neyman class).
        m = cur.groupBy(key).agg(
            F.sum(
                F.col("n").cast("decimal(19,0)")
                * F.col("w").cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("c")
        )
        tcol = "t_lang" if key == "lang" else "t_source"
        cur = (
            cur.join(F.broadcast(m), key)
            .withColumn(
                "w",
                F.floor(
                    (
                        F.col("w").cast("double")
                        * (F.col(tcol).cast("double") * F.lit(pico))
                    )
                    / F.col("c").cast("double")
                ).cast("bigint"),
            )
            .drop("c")
        )
    return cur.select(
        "lang",
        "source",
        F.col("n").alias("n_kept"),
        F.col("w").alias("w_pico"),
        (F.col("w").cast("double") / F.lit(pico)).alias("weight"),
        (
            (
                F.col("n").cast("decimal(19,0)")
                * F.col("w").cast("decimal(19,0)")
            ).cast("double")
            / F.lit(pico)
        ).alias("weighted_rows"),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis–Spirakis A-Res, deterministic)
# ---------------------------------------------------------------------------

_WRS_K = 50
# 8 md5 hex nibbles → u uniform over (0, 1) in 1/(16^8+1) atoms (strictly
# interior: +1 shift keeps ln defined even for the all-zero nibble draw).
_WRS_DEN = 16**8 + 1
_WRS_LQ = "1e12"  # ln(u)/w floor grain; |key| < 22/min_w → units < 2^53


def _wrs_nibble_sql(h: str, i: int) -> str:
    a = f"ascii(substr({h}, {i}, 1))"
    return (
        f"(CAST({a} AS BIGINT) - 48"
        f" - CASE WHEN {a} >= 97 THEN 39 ELSE 0 END)"
    )


_WRS_K4_SQL = " + ".join(
    f"{_wrs_nibble_sql('h', i + 1)} * {16 ** (7 - i)}" for i in range(8)
)

_WRS_ORACLE = f"""
WITH keyed AS (
    SELECT o_orderkey, o_totalprice,
           CAST(FLOOR(ln((CAST(({_WRS_K4_SQL.replace("h", "md5(CAST(o_orderkey AS VARCHAR))")}) AS DOUBLE) + 1)
                         / {_WRS_DEN})
                      / o_totalprice * {_WRS_LQ}) AS BIGINT) AS key_units
    FROM orders
),
ranked AS (
    SELECT o_orderkey, o_totalprice, key_units,
           ROW_NUMBER() OVER (
               ORDER BY key_units DESC, o_orderkey ASC
           ) AS rk
    FROM keyed
)
SELECT CAST(rk AS INT) AS rk, o_orderkey, o_totalprice, key_units
FROM ranked WHERE rk <= {_WRS_K}
ORDER BY rk
"""


@query("weighted_reservoir_sample", oracle=_WRS_ORACLE)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    A-Res reservoir (Inf. Proc. Letters 2006): each row draws
    key = u^(1/w) and the top-{_WRS_K} keys ARE a without-replacement
    PPS sample — the one-pass, merge-friendly design every distributed
    sampler builds on, complementing pps_systematic_sample (fixed-grid,
    with multiplicity) with the draw-without-replacement semantics a
    training-mix needs when a document must not repeat.

    Determinism: u derives from md5(o_orderkey) nibbles (strictly
    interior via the +1 atom shift, so ln is always defined); the
    monotone-equivalent key ln(u)/w is one fixed IEEE expression over
    identical inputs, floor-quantized to integer units before ranking,
    and the top-k carries an orderkey tiebreak. No RNG, no seed drift —
    re-running the sample is byte-identical (the reservoir property
    tests rely on this).

    Scale: one narrow scan projecting the key (codegen'd md5 + integer
    nibble math + one ln), then TakeOrderedAndProject via ranked_head —
    per-partition heaps, no global sort, no unpartitioned window. The
    reservoir merges associatively at 100 TB: top-k of per-partition
    top-ks, exactly what the plan already does.
    """
    from autonomus_datapipeline_spark.operators.prefix_sum import ranked_head

    o = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))

    def nib(i: int):
        a = F.ascii(F.substring(h, i, 1))
        return (a - 48 - F.when(a >= 97, 39).otherwise(0)).cast("bigint")

    k4 = None
    for i in range(8):
        term = nib(i + 1) * F.lit(16 ** (7 - i)).cast("bigint")
        k4 = term if k4 is None else k4 + term
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        F.floor(
            F.log((k4.cast("double") + 1) / F.lit(_WRS_DEN))
            / F.col("o_totalprice")
            * float(_WRS_LQ)
        )
        .cast("bigint")
        .alias("key_units"),
    )
    return ranked_head(
        keyed, [("key_units", False), ("o_orderkey", True)], _WRS_K, "rk"
    ).select("rk", "o_orderkey", "o_totalprice", "key_units")
