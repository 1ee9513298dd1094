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


# ---------------------------------------------------------------------------
# V-optimal histogram (optimizer-statistics construction, exact-integer DP)
# ---------------------------------------------------------------------------

_VOPT_BAND = 20000.0  # base-bucket width over o_totalprice
_VOPT_K = 4           # histogram buckets to fit


def _vopt_layer_sql(prev: str, out: str) -> str:
    """One DP layer: dp_k(i) = min over segment starts j of
    dp_(k-1)(prevb(j)) + sse(j..i), argmin pinned by (total, path)."""
    return f"""
    {out} AS (
        SELECT i, total, path FROM (
            SELECT c.i, d.total + c.sse AS total,
                   d.path || ',' || CAST(c.j AS VARCHAR) AS path,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.i
                       ORDER BY d.total + c.sse,
                                d.path || ',' || CAST(c.j AS VARCHAR)
                   ) AS rn
            FROM cost c
            JOIN prevb p ON p.j = c.j
            JOIN {prev} d ON d.i = p.p
        ) r WHERE rn = 1
    )"""


def _vopt_oracle() -> str:
    layers = ",".join(
        _vopt_layer_sql(f"dp{k - 1}", f"dp{k}")
        for k in range(2, _VOPT_K + 1)
    )
    finals = "\n    UNION ALL ".join(
        f"SELECT {k} AS k, d.path AS boundaries, d.total AS total_sse"
        f" FROM dp{k} d JOIN mx ON d.i = mx.xb"
        for k in range(1, _VOPT_K + 1)
    )
    return f"""
    WITH b AS (
        SELECT CAST(FLOOR(o_totalprice / {_VOPT_BAND}) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                        * CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS ss
        FROM orders GROUP BY 1
    ),
    mn AS (SELECT MIN(bucket) AS mb FROM b),
    mx AS (SELECT MAX(bucket) AS xb FROM b),
    prevb AS (
        SELECT a.bucket AS j, MAX(c.bucket) AS p
        FROM b a JOIN b c ON c.bucket < a.bucket
        GROUP BY 1
    ),
    spans AS (
        SELECT j.bucket AS j, i.bucket AS i,
               CAST(SUM(m.n) AS BIGINT) AS n,
               CAST(SUM(m.s) AS BIGINT) AS s,
               CAST(SUM(m.ss) AS BIGINT) AS ss
        FROM b j
        JOIN b i ON i.bucket >= j.bucket
        JOIN b m ON m.bucket BETWEEN j.bucket AND i.bucket
        GROUP BY 1, 2
    ),
    cost AS (
        SELECT j, i,
               CAST(ss AS DOUBLE)
               - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE)
                   AS sse
        FROM spans
    ),
    dp1 AS (
        SELECT c.i, c.sse AS total, CAST(c.j AS VARCHAR) AS path
        FROM cost c JOIN mn ON c.j = mn.mb
    ),{layers}
    {finals}
    ORDER BY k
    """


@query("voptimal_histogram", oracle=_vopt_oracle())
def voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal histogram construction (Jagadish et al., VLDB 1998) — the
    optimizer-statistics histogram that minimizes total within-bucket
    variance (SSE) for k = 1..{_VOPT_K} buckets over the order-price
    distribution, reporting each k's optimal segment-start boundaries and
    total SSE (the elbow view a query planner or data profiler uses to
    pick k). The reference engine keeps no column statistics at all; this
    is the §2.D-style capability a 100 TB engine needs for selectivity
    estimation and file skipping (zonemap_pruned_scan's natural
    companion).

    Determinism: per-bucket moments are EXACT integers over FLOOR-dollar
    units (u and u² sums both < 2^63 through sf100; FLOOR has no tie
    case, unlike cent-rounding at half-grain); each segment SSE is the
    pinned-order expression ss − s²/n on exact-integer-valued doubles;
    each DP layer's argmin carries a (total, path) total order so equal-
    cost partitions resolve identically in both engines; FLOOR(·/band)
    bucketing has no tie case.

    Scale: ONE data-sized aggregate builds the B base buckets (map-side
    combinable moments); everything after — spans, costs, {_VOPT_K} DP
    layers — is O(B²)/O(B³) arithmetic on the DOMAIN-bounded bucket table
    (B ≈ 25), broadcast-joined, independent of row count. Production
    k·B growth keeps the same envelope (B=256, k=32 is ~2M span rows —
    still one executor's work).
    """
    o = load_table(spark, sf_dir, "orders")
    units = F.floor(F.col("o_totalprice")).cast("bigint")
    b = (
        o.select(
            F.floor(F.col("o_totalprice") / F.lit(_VOPT_BAND))
            .cast("bigint")
            .alias("bucket"),
            units.alias("c"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        )
        .localCheckpoint(eager=True)
    )
    mn = b.agg(F.min("bucket").alias("mb"))
    mx = b.agg(F.max("bucket").alias("xb"))
    ja = b.select(F.col("bucket").alias("j"))
    jc = b.select(F.col("bucket").alias("cb"))
    prevb = (
        ja.join(F.broadcast(jc), F.col("cb") < F.col("j"))
        .groupBy("j")
        .agg(F.max("cb").alias("p"))
    )
    spans = (
        b.select(F.col("bucket").alias("j"))
        .join(F.broadcast(b.select(F.col("bucket").alias("i"))),
              F.col("i") >= F.col("j"))
        .join(
            F.broadcast(
                b.select(F.col("bucket").alias("mb_"), "n", "s", "ss")
            ),
            (F.col("mb_") >= F.col("j")) & (F.col("mb_") <= F.col("i")),
        )
        .groupBy("j", "i")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").cast("bigint").alias("s"),
            F.sum("ss").cast("bigint").alias("ss"),
        )
    )
    cost = spans.select(
        "j",
        "i",
        (
            F.col("ss").cast("double")
            - (F.col("s").cast("double") * F.col("s").cast("double"))
            / F.col("n").cast("double")
        ).alias("sse"),
    ).localCheckpoint(eager=True)

    from pyspark.sql.window import Window

    dp = (
        cost.join(F.broadcast(mn), cost.j == F.col("mb"))
        .select("i", F.col("sse").alias("total"),
                F.col("j").cast("string").alias("path"))
    )
    finals = [
        dp.join(F.broadcast(mx), dp.i == F.col("xb"))
        .select(F.lit(1).alias("k"), F.col("path").alias("boundaries"),
                F.col("total").alias("total_sse"))
    ]
    w = Window.partitionBy("i").orderBy("total", "path")
    for k in range(2, _VOPT_K + 1):
        cand = (
            cost.join(F.broadcast(prevb), "j")
            .join(
                F.broadcast(dp.select(F.col("i").alias("p"),
                                      F.col("total").alias("pt"),
                                      F.col("path").alias("pp"))),
                "p",
            )
            .select(
                "i",
                (F.col("pt") + F.col("sse")).alias("total"),
                F.concat_ws(",", F.col("pp"),
                            F.col("j").cast("string")).alias("path"),
            )
        )
        dp = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("i", "total", "path")
        )
        finals.append(
            dp.join(F.broadcast(mx), dp.i == F.col("xb"))
            .select(F.lit(k).alias("k"), F.col("path").alias("boundaries"),
                    F.col("total").alias("total_sse"))
        )
    out = finals[0]
    for f_ in finals[1:]:
        out = out.unionByName(f_)
    return out.orderBy("k")
