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
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT))
                    AS DECIMAL(38,0)) AS s,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                        * CAST(FLOOR(o_totalprice) AS BIGINT))
                    AS DECIMAL(38,0)) AS ss
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
               CAST(SUM(m.s) AS DECIMAL(38,0)) AS s,
               CAST(SUM(m.ss) AS DECIMAL(38,0)) AS ss
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
    units, accumulated in DECIMAL(38,0) on BOTH engines — exact at any
    reachable scale (the span-level Σu² re-aggregation passes 2^63 near
    sf100, where a bigint sum would wrap silently; FLOOR has no tie
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
            # DECIMAL(38,0) accumulators: the span-level re-aggregation
            # below sums these over EVERY base bucket, and the total Σu²
            # passes 2^63 near sf100 — a bigint sum would wrap silently
            # (the r11 neyman class). Per-row u² ≤ 3.6e11 stays bigint.
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
            .alias("ss"),
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
            F.sum("s").cast("decimal(38,0)").alias("s"),
            F.sum("ss").cast("decimal(38,0)").alias("ss"),
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


# ---------------------------------------------------------------------------
# Z-order layout audit: multi-column clustering vs natural insert order
# ---------------------------------------------------------------------------

_ZO_FILES = 64
_ZO_BITS = 8  # 8 bits per dimension → 16-bit Morton key

_ZO_MORTON_SQL = " + ".join(
    f"((p8 // {1 << j}) % 2) * {1 << (2 * j)}"
    f" + ((s8 // {1 << j}) % 2) * {1 << (2 * j + 1)}"
    for j in range(_ZO_BITS)
)

_ZO_ORACLE = f"""
WITH bounds AS (
    SELECT MIN(l_partkey) AS minp, MAX(l_partkey) AS maxp,
           MIN(l_suppkey) AS mins, MAX(l_suppkey) AS maxs,
           MIN(l_orderkey) AS mino, MAX(l_orderkey) AS maxo
    FROM lineitem
),
keyed AS (
    SELECT ((l.l_partkey - b.minp) * 256) // (b.maxp - b.minp + 1) AS p8,
           ((l.l_suppkey - b.mins) * 256) // (b.maxs - b.mins + 1) AS s8,
           ((l.l_orderkey - b.mino) * {_ZO_FILES})
               // (b.maxo - b.mino + 1) AS fid_nat,
           l.l_partkey, l.l_suppkey
    FROM lineitem l CROSS JOIN bounds b
),
tagged AS (
    SELECT 'natural' AS layout, fid_nat AS fid, l_partkey, l_suppkey
    FROM keyed
    UNION ALL
    SELECT 'zorder' AS layout,
           (({_ZO_MORTON_SQL}) * {_ZO_FILES}) // 65536 AS fid,
           l_partkey, l_suppkey
    FROM keyed
),
files AS (
    SELECT layout, fid, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(l_partkey) AS fminp, MAX(l_partkey) AS fmaxp,
           MIN(l_suppkey) AS fmins, MAX(l_suppkey) AS fmaxs
    FROM tagged GROUP BY 1, 2
),
band AS (
    SELECT minp + ((maxp - minp + 1) * 40) // 100 AS plo,
           minp + ((maxp - minp + 1) * 45) // 100 AS phi,
           mins + ((maxs - mins + 1) * 40) // 100 AS slo,
           mins + ((maxs - mins + 1) * 45) // 100 AS shi
    FROM bounds
)
SELECT f.layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN f.fminp <= b.phi AND f.fmaxp >= b.plo
                      AND f.fmins <= b.shi AND f.fmaxs >= b.slo
                THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       CAST(SUM(CASE WHEN f.fminp <= b.phi AND f.fmaxp >= b.plo
                      AND f.fmins <= b.shi AND f.fmaxs >= b.slo
                THEN f.n ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(f.fmaxp - f.fminp) AS DOUBLE) / COUNT(*) AS avg_part_span,
       CAST(SUM(f.fmaxs - f.fmins) AS DOUBLE) / COUNT(*) AS avg_supp_span
FROM files f CROSS JOIN band b
GROUP BY 1
ORDER BY 1
"""


@query("zorder_layout_audit", oracle=_ZO_ORACLE)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout audit: how many of {_ZO_FILES} equal-width "files"
    must a two-column point-band query scan under the NATURAL insert
    order vs a Morton (Z-order) interleave of (l_partkey, l_suppkey)?
    This is the decision metric behind `OPTIMIZE ZORDER BY` in
    Delta/Iceberg table maintenance: Z-ordering shrinks per-file min/max
    envelopes on BOTH keys simultaneously so zone-map pruning (cf.
    zonemap_pruned_scan) skips most files for multi-column predicates.

    Determinism: everything is integer arithmetic — bit interleave via
    div/mod, equal-width file binning, exact envelope counts; the two
    reported spans are single divisions of exact integer sums.

    Scale: one fact scan computing the Morton key per row (pure
    narrow projection — codegen'd integer ops), one groupBy per layout
    (map-side combinable, 2×{_ZO_FILES} output rows), and constant-size
    envelope scoring against a broadcast bounds row. At 100 TB this IS
    the cheap pre-flight that decides whether a re-layout pays for
    itself; the value-range binning avoids any global sort while
    measuring the same clustering effect.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").alias("minp"),
        F.max("l_partkey").alias("maxp"),
        F.min("l_suppkey").alias("mins"),
        F.max("l_suppkey").alias("maxs"),
        F.min("l_orderkey").alias("mino"),
        F.max("l_orderkey").alias("maxo"),
    )
    keyed = (
        li.select("l_partkey", "l_suppkey", "l_orderkey")
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                "((l_partkey - minp) * 256) div (maxp - minp + 1)"
            ).alias("p8"),
            F.expr(
                "((l_suppkey - mins) * 256) div (maxs - mins + 1)"
            ).alias("s8"),
            F.expr(
                f"((l_orderkey - mino) * {_ZO_FILES}) div (maxo - mino + 1)"
            ).alias("fid_nat"),
            "l_partkey",
            "l_suppkey",
        )
    )
    morton_expr = " + ".join(
        f"((p8 div {1 << j}) % 2) * {1 << (2 * j)}"
        f" + ((s8 div {1 << j}) % 2) * {1 << (2 * j + 1)}"
        for j in range(_ZO_BITS)
    )
    tagged = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("natural").alias("layout"),
                    F.col("fid_nat").alias("fid"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(
                        f"(({morton_expr}) * {_ZO_FILES}) div 65536"
                    ).alias("fid"),
                ),
            )
        ).alias("t"),
        "l_partkey",
        "l_suppkey",
    ).select("t.layout", "t.fid", "l_partkey", "l_suppkey")
    files = tagged.groupBy("layout", "fid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("l_partkey").alias("fminp"),
        F.max("l_partkey").alias("fmaxp"),
        F.min("l_suppkey").alias("fmins"),
        F.max("l_suppkey").alias("fmaxs"),
    )
    band = bounds.select(
        F.expr("minp + ((maxp - minp + 1) * 40) div 100").alias("plo"),
        F.expr("minp + ((maxp - minp + 1) * 45) div 100").alias("phi"),
        F.expr("mins + ((maxs - mins + 1) * 40) div 100").alias("slo"),
        F.expr("mins + ((maxs - mins + 1) * 45) div 100").alias("shi"),
    )
    hit = (
        (F.col("fminp") <= F.col("phi"))
        & (F.col("fmaxp") >= F.col("plo"))
        & (F.col("fmins") <= F.col("shi"))
        & (F.col("fmaxs") >= F.col("slo"))
    )
    return (
        files.crossJoin(F.broadcast(band))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("files_hit"),
            F.sum(F.when(hit, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
            (
                F.sum(F.col("fmaxp") - F.col("fminp")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_part_span"),
            (
                F.sum(F.col("fmaxs") - F.col("fmins")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_supp_span"),
        )
        .orderBy("layout")
    )
