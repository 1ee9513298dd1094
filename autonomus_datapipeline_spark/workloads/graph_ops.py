"""Dedup-clustering workload queries: connected components over near-dup
candidate pairs (iterative, oracle-checked via recursive CTE) and SimHash
Hamming-neighbor candidates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import dedup, graph, multimodal
from autonomus_datapipeline_spark.workloads import pipeline_ops
from autonomus_datapipeline_spark.workloads.registry import load_table, query

# ---------------------------------------------------------------------------
# Connected components over MinHash-LSH candidate pairs
# ---------------------------------------------------------------------------


def _minhash_stars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed bucket-star edge list over the documents table — the
    shared first stage of the three CC-based dedup queries. Signatures are
    computed array-side (map-only, no shuffle:
    dedup.minhash_signatures_from_text), so the star window is the
    pipeline's FIRST shuffle, scoped to the band-table size (docs × bands,
    known from a cheap columnless count)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    sigs = dedup.minhash_signatures_from_text(
        docs, "doc_id", "text", pipeline_ops._MH_SHINGLE, pipeline_ops._MH_K
    )
    return dedup.lsh_bucket_stars(
        sigs,
        pipeline_ops._MH_BANDS,
        pipeline_ops._MH_ROWS,
        n_rows_hint=n_docs * pipeline_ops._MH_BANDS,
        symmetric=True,
    )


def _cc_oracle() -> str:
    # Reuse the minhash pair-generation SQL as CTEs, then transitive closure
    # via a recursive CTE; component = min reachable node (incl. self).
    mh_sql = pipeline_ops._minhash_oracle()
    # strip the leading WITH and the final SELECT: rebuild with pairs as CTE
    body = mh_sql.strip()
    assert body.startswith("WITH")
    with_part, select_part = body.split("SELECT a.doc_id AS doc_a", 1)
    return f"""
    {with_part.rstrip().replace("WITH", "WITH RECURSIVE", 1)},
    pairs AS (
        SELECT a.doc_id AS doc_a{select_part}
    ),
    sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(node, r) AS (
        SELECT a, b FROM sym
        UNION
        SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a
    )
    SELECT node AS doc_id,
           LEAST(node, MIN(r)) AS component_id
    FROM reach GROUP BY node
    """


@query("dedup_connected_components", oracle=_cc_oracle())
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: connected components over the MinHash-LSH candidate
    graph — every doc in a component is a near-dup of the others;
    component_id (min doc id) is the canonical representative to keep.

    Iterative join-based min-label propagation (O(diameter) rounds, each a
    distributed join+agg); oracled by a DuckDB recursive-CTE transitive
    closure over the pairwise candidate SQL. The Spark side feeds the loop
    BUCKET STARS (operators/dedup.lsh_bucket_stars) instead of all
    colliding pairs: every band bucket is a clique, so a member→bucket-min
    star has the identical transitive closure at band-table-linear edge
    count (never Σ occupancy²) — and the near-star input converges in
    fewer contraction rounds.
    """
    stars = _minhash_stars(spark, sf_dir)
    return graph.connected_components(stars, "doc_a", "doc_b", assume_symmetric=True).select(
        F.col("node").alias("doc_id"), "component_id"
    )


_ED_PREFIX = 40


def _edit_distance_oracle() -> str:
    mh = pipeline_ops._minhash_oracle().strip()
    with_part, select_part = mh.split("SELECT a.doc_id AS doc_a", 1)
    return f"""
    {with_part.rstrip()},
    pairs AS (
        SELECT a.doc_id AS doc_a{select_part}
    )
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(substr(da.text, 1, {_ED_PREFIX}),
                            substr(db.text, 1, {_ED_PREFIX})) AS INT) AS edit_distance
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    """


@query("edit_distance_pairs", oracle=_edit_distance_oracle())
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein verification of LSH candidate pairs (on a 40-char prefix
    — edit distance is O(len²) per pair, so at scale it only ever runs on
    LSH-bounded candidates over bounded prefixes, never pairwise on full
    texts)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, _ED_PREFIX).alias("prefix")
    )
    sh = dedup.shingle_table(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        pipeline_ops._MH_SHINGLE,
    )
    sigs = dedup.minhash_signatures(sh, pipeline_ops._MH_K)
    pairs = dedup.lsh_candidate_pairs(
        sigs, pipeline_ops._MH_BANDS, pipeline_ops._MH_ROWS
    ).select("doc_a", "doc_b")
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb"))
    # da/db carry a 40-char prefix for EVERY corpus document — shuffled
    # join, never broadcast (corpus-sized side; see _sh_banded_hamming_pairs).
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("int").alias("edit_distance"),
        )
    )


def _dedup_apply_oracle() -> str:
    cc = _cc_oracle().strip()
    with_part, final = cc.rsplit("SELECT node AS doc_id,", 1)
    return f"""
    {with_part.rstrip()}
    , comp AS (
        SELECT node AS doc_id, {final}
    )
    SELECT lang,
           COUNT(CASE WHEN c.component_id IS NULL OR c.component_id = d.doc_id
                      THEN 1 END) AS n_kept,
           COUNT(CASE WHEN c.component_id IS NOT NULL AND c.component_id <> d.doc_id
                      THEN 1 END) AS n_dropped
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    GROUP BY lang
    """


@query("dedup_apply_minhash", oracle=_dedup_apply_oracle())
def dedup_apply_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline applied: MinHash-LSH candidates → connected
    components → drop every non-representative member; per-language
    kept/dropped accounting. This is the operator a user actually runs over
    a corpus — candidates and clusters are its internals."""
    docs = load_table(spark, sf_dir, "documents")
    # Bucket stars, not pairwise candidates: identical components at
    # band-table-linear edge count (see dedup_connected_components).
    stars = _minhash_stars(spark, sf_dir)
    comp = graph.connected_components(stars, "doc_a", "doc_b", assume_symmetric=True)
    # Single-pass accounting: one left join flags each doc as kept/dropped,
    # one aggregation counts both — instead of materializing the kept set
    # and anti-joining the corpus against it twice. No broadcast hint:
    # non_reps scales with the number of DUPLICATED documents (most of a
    # crawl corpus in the worst case), so the planner must stay free to
    # pick a shuffled join when the dup set is large.
    non_reps = (
        comp.filter(F.col("node") != F.col("component_id"))
        .select(F.col("node").alias("doc_id"), F.lit(True).alias("dropped"))
    )
    flagged = docs.join(non_reps, "doc_id", "left")
    return flagged.groupBy("lang").agg(
        F.count(F.when(F.col("dropped").isNull(), 1)).alias("n_kept"),
        F.count("dropped").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# SimHash Hamming-neighbor candidates (block-LSH on the fingerprint)
# ---------------------------------------------------------------------------

# 64-bit fingerprint, 16-bit blocks: the banding bucket space (2^16) must
# exceed corpus size or every bucket goes quadratic — the 32-bit/8-bit
# configuration saturates at 256 bucket values (at sf0.1 it produced 425K
# candidate pairs from 5000 docs; at 100 TB it would be the bottleneck).
_SH_BITS = 64
_SH_BLOCKS = 4
_SH_BLOCK_LEN = _SH_BITS // _SH_BLOCKS
# ≤ _SH_BLOCKS - 1 so the banded join is EXACT by pigeonhole: a pair within
# this Hamming distance cannot differ in all 4 blocks, so it always shares
# one and is always found. (Google's production simhash dedup likewise uses
# ≤3 on 64 bits.)
_SH_MAX_HAMMING = 3


def _banded_pairs_sql() -> str:
    """Band → candidate → Hamming-verify SQL over an `fp(doc_id, simhash)`
    CTE — shared by every banded-fingerprint near-dup oracle."""
    hamming = " + ".join(
        f"(CASE WHEN substr(a.simhash, {i + 1}, 1) <> substr(b.simhash, {i + 1}, 1) "
        f"THEN 1 ELSE 0 END)"
        for i in range(_SH_BITS)
    )
    blocks = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS block_idx, "
        f"substr(simhash, {b * _SH_BLOCK_LEN + 1}, {_SH_BLOCK_LEN}) AS block FROM fp"
        for b in range(_SH_BLOCKS)
    )
    return f"""
    blocks AS (
        {blocks}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM blocks x JOIN blocks y
          ON x.block_idx = y.block_idx AND x.block = y.block
         AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM (
        SELECT c.doc_a, c.doc_b,
               CAST({hamming} AS INT) AS hamming
        FROM cand c
        JOIN fp a ON a.doc_id = c.doc_a
        JOIN fp b ON b.doc_id = c.doc_b
    ) t WHERE hamming <= {_SH_MAX_HAMMING}
    """


def _simhash_pairs_oracle(source: str = "documents") -> str:
    return f"""
    WITH {pipeline_ops._simhash_cte(_SH_BITS, source).strip()},
    {_banded_pairs_sql()}
    """


def _sh_blocked(fp: DataFrame) -> DataFrame:
    """(doc_id, block_idx, block) — the banding explode of a fingerprint."""
    return fp.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.substring(
                            "simhash", b * _SH_BLOCK_LEN + 1, _SH_BLOCK_LEN
                        ).alias("block"),
                    )
                    for b in range(_SH_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "blk.block_idx", "blk.block")


def _sh_halves(sh) -> list:
    """The fingerprint bitstring as 32-bit longs: ``conv(bits, 2, 10)`` of a
    full 64-bit string can exceed signed-long range (→ NULL), so each 32-bit
    half converts separately. Evaluated ONCE per document — the per-candidate
    Hamming verify then XORs plain longs instead of re-parsing bitstrings
    (the candidate set is ~100× the doc count on near-dup-heavy corpora)."""
    return [
        F.conv(F.substring(sh, off + 1, min(32, _SH_BITS - off)), 2, 10).cast("long")
        for off in range(0, _SH_BITS, 32)
    ]


def _sh_hamming_longs(a_halves: list, b_halves: list):
    total = F.lit(0)
    for ha, hb in zip(a_halves, b_halves):
        total = total + F.bit_count(ha.bitwiseXOR(hb))
    return total.cast("int")


def _sh_banded_hamming_pairs(
    fp: DataFrame, max_block_occupancy: int | None = None
) -> DataFrame:
    """Banded candidate join + exact verify shared by both simhash queries.
    ``fp`` must already be materialized (cache/localCheckpoint) — the
    banding feeds a self-join that would otherwise recompute the whole
    fingerprint subtree per side.

    ``max_block_occupancy`` engages dedup.cap_bucket_occupancy on the
    (block_idx, block) buckets — the skew guard for boilerplate-heavy
    corpora where one hot bucket would contribute k² candidates to a single
    shuffle key. Off by default: the registered queries are oracle-exact,
    and the production mitigation for hot buckets is the dedup-first
    ordering (exact dedup removes identical docs before fingerprinting)."""
    blocks = _sh_blocked(fp)
    if max_block_occupancy is not None:
        blocks = dedup.cap_bucket_occupancy(
            blocks, ["block_idx", "block"], max_block_occupancy
        )
    x, y = blocks.alias("x"), blocks.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.block_idx") == F.col("y.block_idx"))
            & (F.col("x.block") == F.col("y.block"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    n_halves = len(_sh_halves(F.col("simhash")))
    fa = fp.select(
        F.col("doc_id").alias("doc_a"),
        *[h.alias(f"a{i}") for i, h in enumerate(_sh_halves(F.col("simhash")))],
    )
    fb = fp.select(
        F.col("doc_id").alias("doc_b"),
        *[h.alias(f"b{i}") for i, h in enumerate(_sh_halves(F.col("simhash")))],
    )
    # fa/fb are corpus-sized: at 10B docs a broadcast here is a 100 GB+
    # driver/executor OOM, so the verify re-attach must be a shuffled join
    # on the id (AQE picks SMJ/shuffled-hash; both sides hash-partition on
    # the join key, candidates shuffle once per side — linear, not a
    # replicated copy of the corpus on every executor).
    hamming = _sh_hamming_longs(
        [F.col(f"a{i}") for i in range(n_halves)],
        [F.col(f"b{i}") for i in range(n_halves)],
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= _SH_MAX_HAMMING)
    )


@query("simhash_hamming_pairs", oracle=_simhash_pairs_oracle())
def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: block the 64-bit fingerprint into 4 16-bit
    substrings (any pair with Hamming ≤ 3 must share a block — pigeonhole,
    so the banded join is exact, not best-effort), equi-join on
    (block_idx, block), verify exact Hamming distance (XOR+popcount per
    32-bit half), keep ≤ 3.

    Scale: candidate count is bounded by block-bucket occupancy — 2^16
    bucket values per band keeps buckets sparse far beyond this corpus;
    the verify step is O(1) per candidate (no text touched).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Eager localCheckpoint, not cache(): a lazily-cached fingerprint is
    # computed concurrently by both sides of the banding self-join before
    # the cache fills (measured ~2× slower at sf0.1).
    fp = dedup.simhash(docs, "doc_id", "text", _SH_BITS).localCheckpoint(eager=True)
    return _sh_banded_hamming_pairs(fp)


# ---------------------------------------------------------------------------
# SimHash near-dup with exact-dedup-first collapse (the 100 TB-shaped plan)
# ---------------------------------------------------------------------------


def _simhash_dedup_first_oracle() -> str:
    pairs_sql = _simhash_pairs_oracle(source="reps").strip()
    assert pairs_sql.startswith("WITH ")
    return f"""
    WITH reps AS (
        SELECT MIN(doc_id) AS doc_id,
               min_by(text, doc_id) AS text,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ),
    {pairs_sql[len("WITH "):]}
    """


@query("simhash_hamming_dedup_first", oracle=_simhash_dedup_first_oracle())
def simhash_hamming_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates with the exact-dedup collapse FIRST:
    identical (whitespace-normalized) documents are reduced to one
    representative before fingerprinting, then the banded Hamming join runs
    over distinct content only.

    This is the production ordering at 100 TB: a heavily duplicated corpus
    makes every block bucket quadratic in the copy count (the uncollapsed
    twin measured a 100× candidate blow-up on a 10×-duplicated corpus in
    SCALE_PROBE.md), while after collapse the candidate count depends only
    on DISTINCT content — duplication changes nothing by construction.
    Exact copies are already handled by the collapse itself; the Hamming
    pairs that remain are the genuinely-near (not identical) ones.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm_hash = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    reps = (
        docs.groupBy(norm_hash.alias("_h"))
        # min_by: the representative keeps ITS OWN text — an independent
        # MIN(text) could pair the kept doc_id with another member's
        # (only normalization-equal) text and fingerprint the wrong string
        .agg(F.min("doc_id").alias("doc_id"), F.min_by("text", "doc_id").alias("text"))
        .drop("_h")
    )
    fp = dedup.simhash(reps, "doc_id", "text", _SH_BITS).localCheckpoint(eager=True)
    return _sh_banded_hamming_pairs(fp)


# ---------------------------------------------------------------------------
# Multimodal payload near-dup (positional fingerprint over binary payloads)
# ---------------------------------------------------------------------------


_PFP_GRAM = 8  # bytes per gram
_PFP_PROBES = 10  # probe payloads: doc_id < 10


_PFP_CORRUPT = "~X~"  # bytes appended to build probe payloads


def _payload_fp_cte(name: str, source: str) -> str:
    """``name``(doc_id, simhash) CTE set: winnowed byte-aligned payload gram
    minima over ``source`` (a relation providing doc_id + text) — the SQL
    replay of operators/multimodal.payload_fingerprint (text bytes stand in
    for the binary payload, as in the other multimodal queries)."""
    p = name
    return f"""{p}_hxt AS (
        SELECT doc_id, hex(text) AS h,
               greatest(length(hex(text)) // 2 - {_PFP_GRAM - 1}, 1) AS n_kpos
        FROM {source}
    ),
    {p}_g2 AS (
        SELECT doc_id, gh,
               CAST(((strpos('0123456789abcdef', substr(gh, 1, 1)) - 1) % 4) * 16
                    + (strpos('0123456789abcdef', substr(gh, 2, 1)) - 1) AS INT)
                   AS w
        FROM (
            SELECT doc_id,
                   md5(substr(h, CAST(2 * k + 1 AS INT), {2 * _PFP_GRAM})) AS gh
            FROM (SELECT doc_id, h, n_kpos,
                         unnest(range(0, n_kpos)) AS k
                  FROM {p}_hxt) u
            WHERE k = 0
               OR substr(h, CAST(2 * k + 2 AS INT), 1) IN ('0', '4', '8', 'C')
        ) g
    ),
    {p}_wmin AS (
        SELECT doc_id, w, min(gh) AS m FROM {p}_g2 GROUP BY 1, 2
    ),
    {p}_fbits AS (
        SELECT d.doc_id, t.j,
               CASE WHEN wm.m IS NOT NULL
                     AND substr(wm.m, 32, 1) IN ('8','9','a','b','c','d','e','f')
                    THEN '1' ELSE '0' END AS bit
        FROM (SELECT doc_id FROM {p}_hxt) d
        CROSS JOIN range(0, {_SH_BITS}) t(j)
        LEFT JOIN {p}_wmin wm ON wm.doc_id = d.doc_id AND wm.w = t.j
    ),
    {p} AS (
        SELECT doc_id, string_agg(bit, '' ORDER BY j) AS simhash
        FROM {p}_fbits GROUP BY doc_id
    )"""


def _payload_probe_pairs_sql() -> str:
    """Probe-side banded lookup (pfp against fp) + Hamming verify."""
    hamming = " + ".join(
        f"(CASE WHEN substr(a.simhash, {i + 1}, 1) <> substr(b.simhash, {i + 1}, 1) "
        f"THEN 1 ELSE 0 END)"
        for i in range(_SH_BITS)
    )

    def blocks(rel: str) -> str:
        return "\n        UNION ALL ".join(
            f"SELECT doc_id, {b} AS block_idx, "
            f"substr(simhash, {b * _SH_BLOCK_LEN + 1}, {_SH_BLOCK_LEN}) AS block "
            f"FROM {rel}"
            for b in range(_SH_BLOCKS)
        )

    return f"""
    cblocks AS (
        {blocks("fp")}
    ),
    pblocks AS (
        {blocks("pfp")}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS probe_id, y.doc_id AS doc_id
        FROM pblocks x JOIN cblocks y
          ON x.block_idx = y.block_idx AND x.block = y.block
    )
    SELECT probe_id, doc_id, hamming FROM (
        SELECT c.probe_id, c.doc_id,
               CAST({hamming} AS INT) AS hamming
        FROM cand c
        JOIN pfp a ON a.doc_id = c.probe_id
        JOIN fp b ON b.doc_id = c.doc_id
    ) t WHERE hamming <= {_SH_MAX_HAMMING}
    """


@query(
    "multimodal_payload_neardup",
    oracle=f"""
    WITH {_payload_fp_cte("fp", "documents")},
    {_payload_fp_cte("pfp", f"(SELECT doc_id, text || '{_PFP_CORRUPT}' AS text "
                            f"FROM documents WHERE doc_id < {_PFP_PROBES})")},
    {_payload_probe_pairs_sql()}
    """,
)
def multimodal_payload_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-copy lookup over opaque BINARY payloads (trace known image/audio
    assets through a corpus without decoding them): every corpus payload
    gets a shift-robust winnowed byte-gram fingerprint
    (multimodal.payload_fingerprint); the probe set — here, CORRUPTED copies
    of 10 corpus payloads (bytes appended, so every probe has a byte-shifted
    true source the lookup must find) — is fingerprinted the same way and
    matched through the banded-Hamming machinery: 16-bit blocks,
    pigeonhole-exact candidate join, long-XOR popcount verify, Hamming ≤ 3.

    Probe-set shape, not all-pairs: tracing a bounded probe set keeps
    candidates at |probes| × bucket-occupancy — the production shape for
    "find every near-copy of THESE assets" at 100 TB. Corpus-wide near-dup
    CLUSTERING belongs to the text-level operators (simhash/minhash).

    Scale: fingerprinting is one md5 per ~4 payload bytes (content-defined
    gram sampling) + a 64-way conditional-min agg (map-side combined); the
    probe join touches only buckets a probe occupies.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id", multimodal.to_payload(F.col("text")).alias("payload")
    )
    probes_src = docs.filter(F.col("doc_id") < _PFP_PROBES).select(
        "doc_id",
        multimodal.to_payload(F.concat(F.col("text"), F.lit(_PFP_CORRUPT))).alias(
            "payload"
        ),
    )
    fp = multimodal.payload_fingerprint(corpus, gram=_PFP_GRAM).localCheckpoint(
        eager=True
    )
    pfp = multimodal.payload_fingerprint(probes_src, gram=_PFP_GRAM).localCheckpoint(
        eager=True
    )
    cand = (
        _sh_blocked(pfp)
        .alias("x")
        .join(
            _sh_blocked(fp).alias("y"),
            (F.col("x.block_idx") == F.col("y.block_idx"))
            & (F.col("x.block") == F.col("y.block")),
        )
        .select(
            F.col("x.doc_id").alias("probe_id"), F.col("y.doc_id").alias("doc_id")
        )
        .distinct()
    )
    n_halves = len(_sh_halves(F.col("simhash")))
    fa = pfp.select(
        F.col("doc_id").alias("probe_id"),
        *[h.alias(f"a{i}") for i, h in enumerate(_sh_halves(F.col("simhash")))],
    )
    fb = fp.select(
        "doc_id",
        *[h.alias(f"b{i}") for i, h in enumerate(_sh_halves(F.col("simhash")))],
    )
    hamming = _sh_hamming_longs(
        [F.col(f"a{i}") for i in range(n_halves)],
        [F.col(f"b{i}") for i in range(n_halves)],
    )
    # fa is the bounded probe set → broadcast is correct; fb is the full
    # corpus fingerprint table → must stay a shuffled join (corpus-sized
    # broadcasts OOM at 100 TB).
    return (
        cand.join(F.broadcast(fa), "probe_id")
        .join(fb, "doc_id")
        .select("probe_id", "doc_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= _SH_MAX_HAMMING)
    )


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup candidate graph
# ---------------------------------------------------------------------------


def _triangle_oracle() -> str:
    mh_sql = pipeline_ops._minhash_oracle()
    body = mh_sql.strip()
    assert body.startswith("WITH")
    with_part, select_part = body.split("SELECT a.doc_id AS doc_a", 1)
    return f"""
    {with_part.rstrip()},
    pairs AS (
        SELECT a.doc_id AS doc_a{select_part}
    ),
    e AS (SELECT DISTINCT doc_a AS a, doc_b AS b FROM pairs),
    deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
        ) u GROUP BY n
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((
               SELECT COUNT(*)
               FROM e e1 JOIN e e2 ON e2.a = e1.b
                         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
           ) AS BIGINT) AS n_triangles
    """


@query("neardup_triangle_count", oracle=_triangle_oracle())
def neardup_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the MinHash-LSH candidate graph — the cluster-
    cohesion diagnostic for dedup quality (triangle-dense neighborhoods are
    true duplicate clusters; triangle-free stars are often LSH false
    positives worth a higher verify threshold).

    Classic distributed triangle counting on the id-oriented edge list
    (a < b): wedges join closing edges, so the cost is Σ deg(v)² on the
    CANDIDATE graph (already banding-bounded), never corpus-sized. The
    id orientation makes each triangle count exactly once (a < b < c); at
    extreme skew the standard upgrade is degree-based orientation (point
    each edge at the higher-degree endpoint, bounding wedge fan-out by the
    graph degeneracy) — same joins, different orientation key.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_table(docs, "doc_id", "text", pipeline_ops._MH_SHINGLE)
    sigs = dedup.minhash_signatures(sh, pipeline_ops._MH_K)
    pairs = (
        dedup.lsh_candidate_pairs(sigs, pipeline_ops._MH_BANDS, pipeline_ops._MH_ROWS)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # three self-join consumers below
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    wedges = e1.join(e2, F.col("e2.a") == F.col("e1.b"))
    closed = wedges.join(
        e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b"))
    )
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = (
        pairs.select(F.col("a").alias("n"))
        .union(pairs.select(F.col("b").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    # three single-row aggregates — broadcast-tiny cross joins
    return n_edges.crossJoin(n_nodes).crossJoin(n_tri)


# ---------------------------------------------------------------------------
# Quality-aware representative selection (dedup policy variant)
# ---------------------------------------------------------------------------


def _keep_best_oracle() -> str:
    cc = _cc_oracle().strip()
    with_part, final = cc.rsplit("SELECT node AS doc_id,", 1)
    qsql = pipeline_ops._quality_score_sql()
    return f"""
    {with_part.rstrip()}
    , comp AS (
        SELECT node AS doc_id, {final}
    ),
    t AS (SELECT doc_id, text, {pipeline_ops._TOKS} AS tk FROM documents),
    scored AS (SELECT doc_id, {qsql} AS quality_score FROM t),
    m AS (
        SELECT c.component_id, s.doc_id, s.quality_score,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY s.quality_score DESC, s.doc_id DESC)
                   AS rk,
               COUNT(*) OVER (PARTITION BY c.component_id) AS nm
        FROM comp c JOIN scored s ON s.doc_id = c.doc_id
    )
    SELECT component_id, doc_id AS rep_doc_id, quality_score AS rep_quality,
           CAST(nm AS BIGINT) AS n_members
    FROM m WHERE rk = 1
    """


@query("dedup_keep_best_quality", oracle=_keep_best_oracle())
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representative selection: within each near-dup
    cluster keep the HIGHEST-quality member (composite quality score,
    doc_id tiebreak) instead of the arbitrary minimum id — the policy a
    training-data pipeline actually wants when duplicates differ in
    cleanliness (truncated vs full, boilerplate-wrapped vs bare).

    One row_number window partitioned by component — the per-cluster argmax
    never sees more rows than the cluster, and clusters are banding-bounded.
    Scoring is a codegen'd projection joined onto the membership table on
    doc_id (shuffled join; both sides cluster-membership-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    # Bucket stars, not pairwise candidates: identical components at
    # band-table-linear edge count (see dedup_connected_components).
    stars = _minhash_stars(spark, sf_dir)
    comp = graph.connected_components(stars, "doc_a", "doc_b", assume_symmetric=True)
    from autonomus_datapipeline_spark.operators import text as text_ops

    scored = docs.select(
        "doc_id",
        text_ops.quality_features(F.col("text"))["quality_score"].alias(
            "quality_score"
        ),
    )
    from pyspark.sql.window import Window

    m = comp.join(scored, comp.node == scored.doc_id).select(
        "component_id", "doc_id", "quality_score"
    )
    w = Window.partitionBy("component_id").orderBy(
        F.desc("quality_score"), F.desc("doc_id")
    )
    wc = Window.partitionBy("component_id")
    return (
        m.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .where(F.col("rk") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("quality_score").alias("rep_quality"),
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )


# ---------------------------------------------------------------------------
# Global clustering coefficient of the near-dup candidate graph
# ---------------------------------------------------------------------------


def _clustering_oracle() -> str:
    mh_sql = pipeline_ops._minhash_oracle()
    body = mh_sql.strip()
    assert body.startswith("WITH")
    with_part, select_part = body.split("SELECT a.doc_id AS doc_a", 1)
    return f"""
    {with_part.rstrip()},
    pairs AS (
        SELECT a.doc_id AS doc_a{select_part}
    ),
    e AS (SELECT DISTINCT doc_a AS a, doc_b AS b FROM pairs),
    deg AS (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
        ) u GROUP BY n
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    wed AS (SELECT CAST(SUM(CAST(d * (d - 1) // 2 AS DECIMAL(38,0)))
                        AS BIGINT) AS w FROM deg)
    SELECT tri.t AS n_triangles, wed.w AS n_wedges,
           CASE WHEN wed.w > 0
                THEN 3.0 * tri.t / wed.w ELSE 0.0 END AS clustering_coeff
    FROM tri CROSS JOIN wed
    """


@query("neardup_clustering_coefficient", oracle=_clustering_oracle())
def neardup_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient 3·triangles / wedges of the
    MinHash-LSH candidate graph — one number summarizing whether the
    near-dup graph is clique-like (true duplicate clusters; coefficient
    → 1) or star/chain-like (banding false positives; → 0). Complements
    neardup_triangle_count's raw census with the degree-normalized
    cohesion metric dedup-threshold tuning actually reads.

    Scale: same banding-bounded edge list and Σ deg² triangle join as the
    census; wedges are one aggregate over the degree table. The
    coefficient is a single division of exact integers.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_table(docs, "doc_id", "text", pipeline_ops._MH_SHINGLE)
    sigs = dedup.minhash_signatures(sh, pipeline_ops._MH_K)
    pairs = (
        dedup.lsh_candidate_pairs(
            sigs, pipeline_ops._MH_BANDS, pipeline_ops._MH_ROWS
        )
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by triangles AND degrees
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    deg = (
        pairs.select(F.col("a").alias("n"))
        .union(pairs.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    # DECIMAL(38,0) accumulator: the corpus-wide wedge total Σ d(d-1)/2
    # can pass 2^63 long before any single degree does — a bigint sum
    # wraps silently there (the r11 neyman class); the final bigint cast
    # saturates visibly (null) at the output type's own ceiling instead.
    wed = deg.agg(
        F.sum(F.expr("(d * (d - 1)) div 2").cast("decimal(38,0)"))
        .cast("bigint")
        .alias("w")
    )
    coeff = F.when(
        F.col("w") > 0, F.lit(3.0) * F.col("t") / F.col("w")
    ).otherwise(F.lit(0.0))
    return (
        tri.crossJoin(F.broadcast(wed))
        .select(
            F.col("t").alias("n_triangles"),
            F.col("w").alias("n_wedges"),
            coeff.alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Ingestion-gate admission report (batch mirror of the streaming near-dup
# gate in streaming/neardup.py — value-checks the shared candidate/verify
# code path under the DuckDB oracle)
# ---------------------------------------------------------------------------


def _gate_hamming_sql(left: str, right: str) -> str:
    return " + ".join(
        f"(CASE WHEN substr({left}.simhash, {i + 1}, 1) <> "
        f"substr({right}.simhash, {i + 1}, 1) THEN 1 ELSE 0 END)"
        for i in range(_SH_BITS)
    )


def _gate_admission_oracle() -> str:
    return f"""
    WITH {pipeline_ops._simhash_cte(_SH_BITS, "documents").strip()},
    idx AS (SELECT doc_id, simhash FROM fp WHERE doc_id % 2 = 0),
    newb AS (SELECT doc_id, simhash FROM fp WHERE doc_id % 2 = 1),
    vs_index AS (
        SELECT n.doc_id AS new_id, COUNT(*) AS c
        FROM newb n JOIN idx x
          ON ({_gate_hamming_sql("n", "x")}) <= {_SH_MAX_HAMMING}
        GROUP BY n.doc_id
    ),
    intra AS (
        SELECT b.doc_id AS new_id, COUNT(*) AS c
        FROM newb b JOIN newb a
          ON a.doc_id < b.doc_id
         AND ({_gate_hamming_sql("b", "a")}) <= {_SH_MAX_HAMMING}
        GROUP BY b.doc_id
    )
    SELECT n.doc_id AS new_id,
           CAST(COALESCE(v.c, 0) AS BIGINT) AS n_index_matches,
           CAST(COALESCE(i.c, 0) AS BIGINT) AS n_batch_matches,
           (COALESCE(v.c, 0) = 0 AND COALESCE(i.c, 0) = 0) AS admitted
    FROM newb n
    LEFT JOIN vs_index v ON v.new_id = n.doc_id
    LEFT JOIN intra i ON i.new_id = n.doc_id
    """


def _minhash_gate_admission_oracle() -> str:
    return f"""
    WITH {pipeline_ops._minhash_bands_cte()},
    idxb AS (SELECT * FROM bands WHERE doc_id % 2 = 0),
    newbnd AS (SELECT * FROM bands WHERE doc_id % 2 = 1),
    vs_index AS (
        SELECT n.doc_id AS new_id, COUNT(DISTINCT x.doc_id) AS c
        FROM newbnd n JOIN idxb x
          ON x.band_idx = n.band_idx AND x.band_hash = n.band_hash
        GROUP BY 1
    ),
    intra AS (
        SELECT b.doc_id AS new_id, COUNT(DISTINCT a.doc_id) AS c
        FROM newbnd b JOIN newbnd a
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
        GROUP BY 1
    )
    SELECT d.doc_id AS new_id,
           CAST(COALESCE(v.c, 0) AS BIGINT) AS n_index_matches,
           CAST(COALESCE(i.c, 0) AS BIGINT) AS n_batch_matches,
           (COALESCE(v.c, 0) = 0 AND COALESCE(i.c, 0) = 0) AS admitted
    FROM documents d
    LEFT JOIN vs_index v ON v.new_id = d.doc_id
    LEFT JOIN intra i ON i.new_id = d.doc_id
    WHERE d.doc_id % 2 = 1
    """


@query("minhash_gate_admission", oracle=_minhash_gate_admission_oracle())
def minhash_gate_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the MinHash-banded streaming ingestion gate
    (streaming/neardup.py minhash_gate_*): even doc_ids play the persisted
    band index, odd doc_ids play one incoming micro-batch; a batch
    document is admitted iff it shares NO LSH band with any index document
    NOR with a lower-id batch document. Runs the SAME ``minhash_band_table``
    / ``minhash_matches`` code path the streaming gate executes per
    micro-batch, so the oracle value-checks the gate's admission rule —
    the shingle-Jaccard complement of neardup_gate_admission's SimHash
    Hamming rule.

    Scale: banding is an equi-join on (band_idx, band_hash) — never
    all-pairs; the admission flags come from two aggregated left joins
    keyed on doc_id. Documents too short to shingle produce no bands and
    are admitted by construction (mirrored by the oracle's left joins).
    """
    from autonomus_datapipeline_spark.streaming.neardup import (
        minhash_band_table,
        minhash_matches,
    )

    docs = load_table(spark, sf_dir, "documents")
    # Eager materialization: the band subtree otherwise recomputes once
    # per side in each of the two minhash_matches calls.
    bands = minhash_band_table(
        docs,
        "doc_id",
        "text",
        pipeline_ops._MH_SHINGLE,
        pipeline_ops._MH_K,
        pipeline_ops._MH_BANDS,
    ).localCheckpoint(eager=True)
    idxb = bands.filter(F.col("doc_id") % 2 == 0)
    newbnd = bands.filter(F.col("doc_id") % 2 == 1)
    vs_index = (
        minhash_matches(newbnd, idxb)
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_idx"))
    )
    intra = (
        minhash_matches(newbnd, newbnd)
        .filter(F.col("index_id") < F.col("new_id"))
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_batch"))
    )
    zero = F.lit(0).cast("bigint")
    return (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select(F.col("doc_id").alias("new_id"))
        .join(vs_index, "new_id", "left")
        .join(intra, "new_id", "left")
        .select(
            "new_id",
            F.coalesce("c_idx", zero).alias("n_index_matches"),
            F.coalesce("c_batch", zero).alias("n_batch_matches"),
            (
                F.coalesce("c_idx", zero).eqNullSafe(0)
                & F.coalesce("c_batch", zero).eqNullSafe(0)
            ).alias("admitted"),
        )
    )


@query("neardup_gate_admission", oracle=_gate_admission_oracle())
def neardup_gate_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the streaming ingestion gate
    (streaming/neardup.py): even doc_ids play the persisted corpus
    fingerprint index, odd doc_ids play one incoming micro-batch; a batch
    document is admitted iff it is not within Hamming ``_SH_MAX_HAMMING``
    of any index document NOR of a lower-id batch document. Runs the SAME
    ``neardup_matches`` banding/verify the streaming gate executes per
    micro-batch, so the oracle value-checks the gate's admission rule —
    not just a lookalike.

    Scale: both match passes are pigeonhole-banded equi-joins (never
    all-pairs), the verify is O(1) long-XOR popcount per candidate, and
    the final admission flags come from two aggregated left joins keyed on
    doc_id — one shuffle each, no window, no driver state.
    """
    from autonomus_datapipeline_spark.streaming.neardup import neardup_matches

    docs = load_table(spark, sf_dir, "documents")
    # Eager materialization: the fp subtree otherwise recomputes once per
    # banding side in each of the two neardup_matches calls.
    fp = dedup.simhash(docs, "doc_id", "text", _SH_BITS).localCheckpoint(
        eager=True
    )
    idx = fp.filter(F.col("doc_id") % 2 == 0)
    newb = fp.filter(F.col("doc_id") % 2 == 1)
    vs_index = (
        neardup_matches(newb, idx, _SH_MAX_HAMMING)
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_idx"))
    )
    intra = (
        neardup_matches(newb, newb, _SH_MAX_HAMMING)
        .filter(F.col("index_id") < F.col("new_id"))
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_batch"))
    )
    zero = F.lit(0).cast("bigint")
    return (
        newb.select(F.col("doc_id").alias("new_id"))
        .join(vs_index, "new_id", "left")
        .join(intra, "new_id", "left")
        .select(
            "new_id",
            F.coalesce("c_idx", zero).alias("n_index_matches"),
            F.coalesce("c_batch", zero).alias("n_batch_matches"),
            (
                F.coalesce("c_idx", zero).eqNullSafe(0)
                & F.coalesce("c_batch", zero).eqNullSafe(0)
            ).alias("admitted"),
        )
    )
