"""Corpus-curation flagship pipeline: the LLM-training-data twin of the
medallion flagship.

The reference's core identity is a chained, validated transform pipeline
over a staged table (reference: backend/app/services/silver_service.py:96-127
folds ordered transform steps; gold_service.py aggregates the result). The
medallion flagship (`engine/pipeline.py`, exercised by ``bench.py``) proves
that lifecycle on relational data; THIS module proves it on the
training-data workload the engine is built for, by chaining the curation
stages every large-scale corpus pipeline runs:

    ingest → PII clean → quality filter → exact dedup → near dedup
           → decontaminate → mix weights → pack

Design: stages ANNOTATE instead of dropping — each stage adds flag/metric
columns and the "surviving" population is a conjunction of flags. This is
deliberate and production-shaped:

- the written Silver table is a full AUDIT artifact (why every document was
  dropped survives, per stage — the reference's data_quality_results table
  declared exactly this need);
- every stage is expressible as one window/join over the previous plan, so
  the whole chain folds into ONE Spark job with no intermediate
  materialization;
- the per-stage funnel metrics (the Gold layer) are derivable from the
  final table by counting flag conjunctions — no ``count()`` bracketing per
  stage (SURVEY.md §4 item 2), and the SAME funnel is an oracle-checkable
  registry query (``curation_pipeline_funnel``).

Every stage reuses the exact logic of its standalone registry operator
(pii_redaction, quality_filter_chain, dedup_exact, minhash banding,
contamination_ngram_overlap, temperature_mix_weights, sequence_packing_bins)
so the flagship is the COMPOSITION proof, not a re-implementation.

Scale: no stage is worse than explode → hash → window/join on banding-
bounded relations; the eval-gram set broadcasts (benchmarks are MBs);
packing is per-stream windows (embarrassingly parallel); nothing touches
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import dedup
from autonomus_datapipeline_spark.workloads.curation_ops import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
    _QF_MAX_MWL,
    _QF_MAX_WORDS,
    _QF_MIN_MWL,
    _QF_MIN_STOP_HITS,
    _QF_MIN_WORDS,
    _QF_STOPWORDS,
)
from autonomus_datapipeline_spark.workloads.pipeline_ops import (
    _MH_BANDS,
    _MH_K,
    _MH_ROWS,
    _MH_SHINGLE,
)
from autonomus_datapipeline_spark.workloads.registry import load_table, query

# Decontamination: word n-gram size and the held-out eval slice (docs whose
# md5(doc_id) starts with this hex digit stand in for an external benchmark
# corpus — same convention as contamination_ngram_overlap).
CONTAM_N = 5
EVAL_HEX = "0"

# Packing: whitespace-token budget per packed context window; packer streams
# are languages (each language's window is an independent cumsum).
PACK_BUDGET = 512

# Mixing: temperature τ = 0.5 → per-(lang, source) weight ∝ share^(τ-1)
# = sqrt(N / n_group), floor-quantized to integer ppm (engine-identical:
# one IEEE sqrt of an exact ratio, one floor — no tie case).
MIX_PPM = 1_000_000


def stage_clean(df: DataFrame) -> DataFrame:
    """PII-redact (email → IP → phone, the pii_redaction order) then
    whitespace-normalize; adds clean_text and the n_tokens every later
    stage budgets with. Pure regexp projection — scan-fused."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    clean = F.trim(F.regexp_replace(redacted, r"\s+", " "))
    # The raw text column is dropped here: every later stage works on
    # clean_text, and carrying both doubles the bytes through the two
    # stage barriers below.
    out = df.select(
        "doc_id", "lang", "source", clean.alias("clean_text")
    )
    return out.withColumn(
        "n_tokens", F.size(F.split(F.lower("clean_text"), r"\s+")).cast("bigint")
    )


def stage_quality(df: DataFrame) -> DataFrame:
    """Gopher-style quality gate on the CLEAN text (word-count bounds, mean
    word length bounds, stopword presence — quality_filter_chain's exact
    rules); adds ok_quality."""
    tk = F.split(F.lower("clean_text"), r"\s+")
    n_words = F.size(tk)
    mean_wl = F.length(F.array_join(tk, "")).cast("double") / F.size(tk)
    stop_hits = F.size(
        F.array_intersect(tk, F.array(*[F.lit(s) for s in _QF_STOPWORDS]))
    )
    ok = (
        n_words.between(_QF_MIN_WORDS, _QF_MAX_WORDS)
        & mean_wl.between(_QF_MIN_MWL, _QF_MAX_MWL)
        & (stop_hits >= _QF_MIN_STOP_HITS)
    )
    return df.withColumn("ok_quality", ok)


def stage_exact_dedup(df: DataFrame) -> DataFrame:
    """Exact dedup among quality survivors: lowest doc_id per clean-text
    md5 is the representative (dedup_exact's rule); adds is_exact_dup.
    One window over the content hash — dropped-upstream docs can't occupy
    a representative slot (the min is over survivors only)."""
    h = F.md5("clean_text")
    w = Window.partitionBy(h)
    rep = F.min(F.when(F.col("ok_quality"), F.col("doc_id"))).over(w)
    return df.withColumn(
        "is_exact_dup", F.col("ok_quality") & (F.col("doc_id") != rep)
    )


def stage_near_dedup(df: DataFrame) -> DataFrame:
    """MinHash-LSH near-dedup among remaining survivors, using the
    streaming-gate admission rule (neardup/minhash gates): a document is a
    near-dup iff it shares ANY band bucket with a SMALLER-id surviving
    document. Banding is the shared 12-permutation / 4-band configuration;
    signatures are computed array-side (map-only) over the clean text.
    Adds is_near_dup.

    Scale: explode to docs × bands rows, one window over the bucket key,
    one per-doc aggregate, one id join back — never all-pairs."""
    alive = F.col("ok_quality") & ~F.col("is_exact_dup")
    sigs = dedup.minhash_signatures_from_text(
        df, "doc_id", "clean_text", _MH_SHINGLE, _MH_K
    )
    bands = dedup.band_table(sigs, _MH_BANDS, _MH_ROWS).join(
        df.select("doc_id", alive.alias("_alive")), "doc_id"
    )
    wb = Window.partitionBy("band_idx", "band_hash")
    rep = F.min(F.when(F.col("_alive"), F.col("doc_id"))).over(wb)
    near = (
        bands.withColumn("_smaller", F.col("_alive") & (rep < F.col("doc_id")))
        .groupBy("doc_id")
        .agg(F.max("_smaller").alias("is_near_dup"))
    )
    return df.join(near, "doc_id", "left").withColumn(
        "is_near_dup", F.coalesce("is_near_dup", F.lit(False))
    )


def stage_decontaminate(df: DataFrame) -> DataFrame:
    """Benchmark decontamination: the eval slice (md5(doc_id) hex-{EVAL_HEX}
    docs — an external benchmark stand-in) is removed outright, and any
    surviving training document sharing a clean-text word {CONTAM_N}-gram
    with the eval slice is flagged contaminated
    (contamination_ngram_overlap's rule). Adds is_eval, is_contaminated and
    the pipeline's final `keep`.

    Scale: the eval gram vocabulary is benchmark-sized → broadcast probe +
    one per-doc aggregate."""
    is_eval = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == EVAL_HEX
    )
    tk = F.split(F.lower("clean_text"), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - (CONTAM_N - 1), F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.get(tk, i + j - 1) for j in range(CONTAM_N)]
            ),
        )
    )
    sh = df.select("doc_id", F.explode(grams).alias("gram"))
    eval_ids = df.select("doc_id").where(is_eval)
    eval_sh = sh.join(F.broadcast(eval_ids), "doc_id").select("gram").distinct()
    hits = (
        sh.join(F.broadcast(eval_sh.withColumn("_hit", F.lit(1))), "gram")
        .select("doc_id")
        .distinct()
        .withColumn("_contaminated", F.lit(True))
    )
    out = (
        df.withColumn("is_eval", is_eval)
        .join(hits, "doc_id", "left")
        .withColumn(
            "is_contaminated",
            F.coalesce("_contaminated", F.lit(False)) & ~F.col("is_eval"),
        )
        .drop("_contaminated")
    )
    return out.withColumn(
        "keep",
        F.col("ok_quality")
        & ~F.col("is_exact_dup")
        & ~F.col("is_near_dup")
        & ~F.col("is_eval")
        & ~F.col("is_contaminated"),
    )


def stage_mix_weights(df: DataFrame) -> DataFrame:
    """Temperature mixing (τ = 0.5) over the kept corpus: each (lang,
    source) group's sampling weight ∝ sqrt(N / n_group), floor-quantized
    to integer ppm so both engines agree to the last unit. Adds
    mix_weight_ppm (NULL for dropped docs). Window-only — no extra pass."""
    # Corpus total via aggregate + broadcast, NOT a global window (a
    # window over lit(1) funnels the whole corpus through one task).
    tot = df.agg(
        F.count(F.when(F.col("keep"), 1)).cast("bigint").alias("_n_total")
    )
    wg = Window.partitionBy("lang", "source")
    n_group = F.count(F.when(F.col("keep"), 1)).over(wg)
    ppm = F.floor(
        F.sqrt(F.col("_n_total").cast("double") / n_group.cast("double"))
        * F.lit(MIX_PPM)
    ).cast("bigint")
    return (
        df.crossJoin(F.broadcast(tot))
        .withColumn("mix_weight_ppm", F.when(F.col("keep"), ppm))
        .drop("_n_total")
    )


def stage_pack(df: DataFrame) -> DataFrame:
    """Offset packing of kept documents into {PACK_BUDGET}-token context
    windows, one independent stream per language (sequence_packing_bins'
    scheme: bin = floor(start_offset / budget) over doc_id order — greedy
    first-fit is sequential; offset packing is parallel and reproducible).
    Adds bin_id (NULL for dropped docs)."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0)).over(w)
    bin_id = F.floor((cum - F.col("n_tokens")) / float(PACK_BUDGET)).cast("int")
    return df.withColumn("bin_id", F.when(F.col("keep"), bin_id))


CURATION_STAGES = (
    stage_clean,
    stage_quality,
    stage_exact_dedup,
    stage_near_dedup,
    stage_decontaminate,
    stage_mix_weights,
    stage_pack,
)


def curate(docs: DataFrame) -> DataFrame:
    """The full annotated curation table: every stage folded over the
    documents scan (the registry query and the spec-driven silver chain
    both run exactly this)."""
    out = docs
    for stage in CURATION_STAGES:
        out = stage(out)
    return out


def funnel(annotated: DataFrame) -> DataFrame:
    """Per-stage funnel over the annotated table: documents, clean tokens
    and distinct (lang, source) groups surviving each stage, plus the
    packed-bin count for the pack stage — ONE conditional aggregation pass,
    stacked into rows. This is the Gold layer of the spec-driven run AND
    the oracle-checked registry query."""
    stages = [
        ("clean_pii", F.lit(True)),
        ("quality_filter", F.col("ok_quality")),
        ("exact_dedup", F.col("ok_quality") & ~F.col("is_exact_dup")),
        (
            "near_dedup",
            F.col("ok_quality") & ~F.col("is_exact_dup") & ~F.col("is_near_dup"),
        ),
        ("decontaminate", F.col("keep")),
        ("pack", F.col("keep")),
    ]
    aggs = []
    for i, (name, cond) in enumerate(stages):
        aggs += [
            F.count(F.when(cond, 1)).cast("bigint").alias(f"d{i}"),
            F.coalesce(F.sum(F.when(cond, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias(f"t{i}"),
            (
                F.count_distinct(
                    F.when(cond, F.struct("lang", F.col("bin_id")))
                )
                if name == "pack"
                else F.count_distinct(
                    F.when(cond, F.struct("lang", "source"))
                )
            )
            .cast("bigint")
            .alias(f"g{i}"),
        ]
    one = annotated.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name}', d{i}, t{i}, g{i}" for i, (name, _) in enumerate(stages)
    )
    return one.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) AS "
            "(stage_idx, stage, n_docs, n_tokens, n_groups)"
        )
    ).orderBy("stage_idx")


# ---------------------------------------------------------------------------
# Oracle: the full stage chain + funnel replayed in DuckDB SQL.
# ---------------------------------------------------------------------------


def _funnel_oracle() -> str:
    mins = ",\n               ".join(
        f"MIN(substr(md5('{s // 4}:' || shingle), {(s % 4) * 8 + 1}, 8)) AS mh{s}"
        for s in range(_MH_K)
    )
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM cmh".format(
            b=b,
            concat=" || ".join(f"mh{b * _MH_ROWS + r}" for r in range(_MH_ROWS)),
        )
        for b in range(_MH_BANDS)
    )
    stop_list = "','".join(_QF_STOPWORDS)
    return f"""
    WITH cleaned AS (
        SELECT doc_id, lang, source,
               trim(regexp_replace(
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '{_PII_EMAIL}', '<EMAIL>', 'g'),
                       '{_PII_IPV4}', '<IP>', 'g'),
                       '{_PII_PHONE}', '<PHONE>', 'g'),
                   '\\s+', ' ', 'g')) AS clean_text
        FROM documents
    ),
    tok AS (
        SELECT *, regexp_split_to_array(lower(clean_text), '\\s+') AS tk
        FROM cleaned
    ),
    q AS (
        SELECT doc_id, lang, source, tk,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               (len(tk) BETWEEN {_QF_MIN_WORDS} AND {_QF_MAX_WORDS})
                 AND (CAST(len(array_to_string(tk, '')) AS DOUBLE) / len(tk)
                      BETWEEN {_QF_MIN_MWL} AND {_QF_MAX_MWL})
                 AND (len(list_intersect(tk, ['{stop_list}']))
                      >= {_QF_MIN_STOP_HITS}) AS ok_quality,
               clean_text
        FROM tok
    ),
    ex AS (
        SELECT *,
               ok_quality AND doc_id <> MIN(CASE WHEN ok_quality THEN doc_id END)
                   OVER (PARTITION BY md5(clean_text)) AS is_exact_dup
        FROM q
    ),
    csh AS (
        SELECT DISTINCT doc_id,
               array_to_string(tk[i:i+{_MH_SHINGLE - 1}], ' ') AS shingle
        FROM (
            SELECT doc_id, tk,
                   unnest(range(1, greatest(len(tk) - {_MH_SHINGLE - 1}, 1) + 1))
                       AS i
            FROM ex
        ) u
    ),
    cmh AS (
        SELECT doc_id,
               {mins}
        FROM csh GROUP BY doc_id
    ),
    cbands AS (
        {band_selects}
    ),
    bflag AS (
        SELECT b.doc_id,
               e.ok_quality AND NOT e.is_exact_dup AS alive,
               MIN(CASE WHEN e.ok_quality AND NOT e.is_exact_dup
                        THEN b.doc_id END)
                   OVER (PARTITION BY b.band_idx, b.band_hash) AS rep
        FROM cbands b JOIN ex e ON e.doc_id = b.doc_id
    ),
    near AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN alive AND rep < doc_id
                                 THEN TRUE ELSE FALSE END), FALSE)
                   AS is_near_dup
        FROM bflag GROUP BY doc_id
    ),
    g5 AS (
        SELECT DISTINCT doc_id,
               array_to_string(tk[i:i+{CONTAM_N - 1}], ' ') AS gram
        FROM (
            SELECT doc_id, tk,
                   unnest(range(1, greatest(len(tk) - {CONTAM_N - 1}, 1) + 1))
                       AS i
            FROM ex
        ) u
    ),
    ev AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{EVAL_HEX}'
                   AS is_eval
        FROM ex
    ),
    evsh AS (
        SELECT DISTINCT gram FROM g5
        JOIN ev ON ev.doc_id = g5.doc_id WHERE ev.is_eval
    ),
    contam AS (SELECT DISTINCT g5.doc_id FROM g5 JOIN evsh USING (gram)),
    fin AS (
        SELECT e.doc_id, e.lang, e.source, e.n_tokens, e.ok_quality,
               e.is_exact_dup,
               COALESCE(n.is_near_dup, FALSE) AS is_near_dup,
               v.is_eval,
               (c.doc_id IS NOT NULL) AND NOT v.is_eval AS is_contaminated,
               e.ok_quality AND NOT e.is_exact_dup
                 AND NOT COALESCE(n.is_near_dup, FALSE)
                 AND NOT v.is_eval
                 AND NOT ((c.doc_id IS NOT NULL) AND NOT v.is_eval) AS keep
        FROM ex e
        JOIN ev v ON v.doc_id = e.doc_id
        LEFT JOIN near n ON n.doc_id = e.doc_id
        LEFT JOIN contam c ON c.doc_id = e.doc_id
    ),
    packed AS (
        SELECT *,
               CASE WHEN keep THEN CAST(floor(
                   (SUM(CASE WHEN keep THEN n_tokens ELSE 0 END)
                        OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING)
                    - n_tokens) / {PACK_BUDGET}.0) AS INT) END AS bin_id
        FROM fin
    ),
    agg AS (
        SELECT
          CAST(COUNT(*) AS BIGINT) AS d0,
          CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t0,
          CAST(COUNT(DISTINCT (lang, source)) AS BIGINT) AS g0,
          CAST(COUNT(CASE WHEN ok_quality THEN 1 END) AS BIGINT) AS d1,
          CAST(COALESCE(SUM(CASE WHEN ok_quality THEN n_tokens END), 0)
               AS BIGINT) AS t1,
          CAST(COUNT(DISTINCT CASE WHEN ok_quality THEN (lang, source) END)
               AS BIGINT) AS g1,
          CAST(COUNT(CASE WHEN ok_quality AND NOT is_exact_dup THEN 1 END)
               AS BIGINT) AS d2,
          CAST(COALESCE(SUM(CASE WHEN ok_quality AND NOT is_exact_dup
                            THEN n_tokens END), 0) AS BIGINT) AS t2,
          CAST(COUNT(DISTINCT CASE WHEN ok_quality AND NOT is_exact_dup
                              THEN (lang, source) END) AS BIGINT) AS g2,
          CAST(COUNT(CASE WHEN ok_quality AND NOT is_exact_dup
                          AND NOT is_near_dup THEN 1 END) AS BIGINT) AS d3,
          CAST(COALESCE(SUM(CASE WHEN ok_quality AND NOT is_exact_dup
                            AND NOT is_near_dup THEN n_tokens END), 0)
               AS BIGINT) AS t3,
          CAST(COUNT(DISTINCT CASE WHEN ok_quality AND NOT is_exact_dup
                              AND NOT is_near_dup THEN (lang, source) END)
               AS BIGINT) AS g3,
          CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS d4,
          CAST(COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0)
               AS BIGINT) AS t4,
          CAST(COUNT(DISTINCT CASE WHEN keep THEN (lang, source) END)
               AS BIGINT) AS g4,
          CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS d5,
          CAST(COALESCE(SUM(CASE WHEN keep THEN n_tokens END), 0)
               AS BIGINT) AS t5,
          CAST(COUNT(DISTINCT CASE WHEN keep THEN (lang, bin_id) END)
               AS BIGINT) AS g5
        FROM packed
    )
    SELECT 0 AS stage_idx, 'clean_pii' AS stage, d0 AS n_docs,
           t0 AS n_tokens, g0 AS n_groups FROM agg
    UNION ALL SELECT 1, 'quality_filter', d1, t1, g1 FROM agg
    UNION ALL SELECT 2, 'exact_dedup', d2, t2, g2 FROM agg
    UNION ALL SELECT 3, 'near_dedup', d3, t3, g3 FROM agg
    UNION ALL SELECT 4, 'decontaminate', d4, t4, g4 FROM agg
    UNION ALL SELECT 5, 'pack', d5, t5, g5 FROM agg
    ORDER BY 1
    """


@query("curation_pipeline_funnel", oracle=_funnel_oracle())
def curation_pipeline_funnel(spark, sf_dir: str) -> DataFrame:
    """The corpus-curation flagship's per-stage funnel: documents, clean
    tokens and distinct (lang, source) groups surviving each stage of the
    chained curation pipeline (PII clean → quality filter → exact dedup →
    MinHash near-dedup → benchmark decontamination → packing), with the
    packed-bin count as the final stage's group figure. Exactly the Gold
    output of the spec-driven run (``curation_spec`` + plans/spec.run_spec
    — a test pins their equality), so the driver's oracle check
    value-proves the END-TO-END composition, not just each stage alone.

    Scale: the whole chain folds into one job — scan-fused regexp/array
    projections, two hash windows (content hash, band buckets), one
    broadcast gram probe, per-language packing windows, and ONE
    conditional-aggregation pass for the funnel itself. The mix-weight
    stage is skipped here (the funnel reads flags and bin_id only; its
    corpus-total aggregate would re-evaluate the whole upstream for a
    column the funnel never touches) — the spec-driven run keeps it, and
    the funnel values are identical either way (a test pins that)."""
    docs = load_table(spark, sf_dir, "documents")
    ann = stage_pack(
        stage_decontaminate(
            stage_near_dedup(stage_exact_dedup(stage_quality(stage_clean(docs))))
        )
    )
    return funnel(ann)


# ---------------------------------------------------------------------------
# Spec-driven run (plans/spec.py): the stages as sandboxed silver steps,
# the funnel as the gold step — the exact lifecycle the medallion flagship
# proves for relational data, applied to corpus curation.
# ---------------------------------------------------------------------------

_STAGE_STEP_TMPL = """from autonomus_datapipeline_spark.workloads.curation_pipeline import {fn}
def transform(df, spark):
    return {fn}(df)
"""

_FUNNEL_STEP = """from autonomus_datapipeline_spark.workloads.curation_pipeline import funnel
def transform(df, spark):
    return funnel(df)
"""


def curation_spec(source_path: str, name: str = "corpus_curation") -> dict:
    """The declarative spec (plans/spec.py shape) for the curation
    flagship: one silver step per stage, the funnel as gold."""
    return {
        "name": name,
        "source": {"kind": "files", "path": source_path, "format": "parquet"},
        "silver": [
            {"name": fn.__name__, "code": _STAGE_STEP_TMPL.format(fn=fn.__name__)}
            for fn in CURATION_STAGES
        ],
        "gold": [{"name": "funnel", "code": _FUNNEL_STEP}],
    }
