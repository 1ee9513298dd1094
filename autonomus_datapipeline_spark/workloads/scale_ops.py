"""Scale-mechanics workload queries: zone-map data skipping and
duplicated-span (ExactSubstr-style) dedup.

Both are §2.D capability extensions: the reference engine rescans parquet
wholesale (no file-statistics surface) and has no dedup operator at all.
Each query is deterministic set logic, so the DuckDB oracle checks it
value-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators.dedup import strip_duplicated_spans
from autonomus_datapipeline_spark.operators.maintenance import (
    file_zone_map,
    prune_manifest,
)
from autonomus_datapipeline_spark.workloads.registry import (
    dsum,
    load_table,
    query,
    sql_dsum,
)

# ---------------------------------------------------------------------------
# Zone-map pruned scan (manifest-level data skipping)
# ---------------------------------------------------------------------------

_ZM_LO_SQL = "1996-01-01 00:00:00"
_ZM_HI_SQL = "1997-01-01 00:00:00"


@query(
    "zonemap_pruned_scan",
    oracle=f"""
    SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def zonemap_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1996 monthly revenue computed through manifest-level data skipping:
    a per-file min/max zone map over the table's OWN files is built
    (operators/maintenance.file_zone_map) and the scan reads ONLY files
    whose zone intersects the predicate — the Delta/Iceberg skipping
    mechanism on plain parquet. The prune happens over the manifest (one
    row per file — bounded metadata, the same listing the driver already
    holds), never over data rows; correctness does not depend on the
    layout because the zone map is computed from the actual files, and the
    final aggregation re-applies the predicate, so skipping is a pure I/O
    optimization, invisible in the result.

    How many files the prune removes depends on the table's physical
    layout; producing a skip-friendly layout (repartitionByRange on the
    filter column) is a MAINTENANCE operation, not part of the query —
    tests/test_maintenance.py builds such a layout and asserts files are
    actually skipped. Earlier revisions wrote that layout lazily inside
    this query, which billed a full lineitem rewrite to the first
    invocation per environment (the r3 bench regression)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    # Distributed prune: the manifest stays a DataFrame (per-file stats
    # never hit the driver); only the SURVIVING path strings are collected
    # — the bounded scan-planning step Delta/Iceberg also perform
    # driver-side. String-literal timestamp bounds parse in the pinned
    # session zone (see in_range below).
    zones = file_zone_map(li, "l_shipdate")
    kept = prune_manifest(
        zones,
        F.lit(_ZM_LO_SQL).cast("timestamp"),
        F.lit(_ZM_HI_SQL).cast("timestamp"),
    )
    keep = [r.path for r in kept.collect()]
    pruned = (
        spark.read.parquet(*keep).select(
            "l_shipdate", "l_extendedprice", "l_discount"
        )
        if keep
        else li.limit(0)
    )
    # String-literal casts parse in the SESSION time zone (pinned UTC) —
    # F.lit(datetime) would convert through the driver's LOCAL zone and
    # shift both boundaries on a non-UTC driver while the oracle stays
    # naive (repo pattern, cf. relational.py).
    in_range = (F.col("l_shipdate") >= F.lit(_ZM_LO_SQL).cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(_ZM_HI_SQL).cast("timestamp")
    )
    return (
        pruned.filter(in_range)
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicated-span removal (ExactSubstr-style dedup)
# ---------------------------------------------------------------------------

_SPAN_N = 8


@query(
    "dup_span_strip",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS tk
        FROM documents
    ),
    g AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(tk[i:i+{_SPAN_N - 1}], ' ')) AS gh
        FROM (
            SELECT doc_id, tk,
                   unnest(range(1, CASE WHEN len(tk) >= {_SPAN_N}
                                        THEN len(tk) - {_SPAN_N - 1}
                                        ELSE 0 END + 1)) AS i
            FROM toks
        ) u
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) > 1),
    occ AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN dup USING (gh)),
    cover AS (
        SELECT DISTINCT doc_id, pos + unnest(range(0, {_SPAN_N})) AS cpos
        FROM occ
    ),
    words AS (
        SELECT doc_id, i AS pos, tk[i] AS word
        FROM (
            SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM toks
        ) u
    ),
    kept AS (
        SELECT w.doc_id, w.pos, w.word FROM words w
        ANTI JOIN cover c ON w.doc_id = c.doc_id AND w.pos = c.cpos
    ),
    agg AS (
        SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
               string_agg(word, ' ' ORDER BY pos) AS kept_text
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS INT) AS n_words,
           COALESCE(a.n_kept, 0) AS n_kept,
           CAST(len(t.tk) AS INT) - COALESCE(a.n_kept, 0) AS n_removed,
           COALESCE(a.kept_text, '') AS kept_text
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def dup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (Lee et al. 2022 ExactSubstr, relational
    form): every word inside an 8-word span that occurs more than once in
    the corpus is removed from ALL its occurrences. See
    operators/dedup.strip_duplicated_spans for the 100 TB plan shape (gram
    hash shuffle + anti-join — no suffix arrays, no pairwise scans)."""
    docs = load_table(spark, sf_dir, "documents")
    return strip_duplicated_spans(docs, "doc_id", "text", n=_SPAN_N)
