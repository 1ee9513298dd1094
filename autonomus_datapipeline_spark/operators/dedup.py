"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference system has no dedup operator (its only incremental-correctness
claim is Kafka offset exactly-once, reference: benchmarks/results/
auto_pipeline_benchmark_paper.tex:165-166); these are the capability
extensions a training-data pipeline needs at 100 TB (BASELINE.json north
star).

Design rules for scale:

- Everything is expressed as explode → hash → aggregate → equi-join, i.e.
  pure shuffle-parallel relational algebra. No pairwise O(n²) comparison ever
  happens outside an LSH/blocking bucket.
- All hashes are md5 hex (portable: identical in Spark, DuckDB, Python), and
  "minimum hash" means lexicographic minimum of the hex string — this makes
  every operator bit-deterministic and oracle-checkable, with no
  engine-specific hash seeds.
- Shingling is done with built-in array functions (split / sequence / slice /
  transform), JVM-side in whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _null_safe_key(key_cols: list[str]) -> Column:
    """Prefix-free null-safe content key over ``key_cols``.

    A plain ``concat_ws`` skips NULLs — ('a', NULL) and (NULL, 'a') would
    hash identically — and an embedded separator byte could collide across
    column boundaries. Encode each column as ``'n'`` (NULL) or
    ``'v' || md5(value)`` (fixed 33 chars), which is prefix-free and
    unambiguous to decode, then md5 the concatenation.
    """
    parts = [
        F.when(F.col(c).isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.md5(F.col(c).cast("string")))
        )
        for c in key_cols
    ]
    return F.md5(F.concat(*parts))


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per duplicate group.

    Hash-groupBy on the content key — one shuffle, map-side partial agg.
    Returns (content md5, kept id, group size). The key is null-safe and
    separator-collision-free (see :func:`_null_safe_key`).
    """
    content = _null_safe_key(key_cols)
    return df.groupBy(content.alias("content_hash")).agg(
        F.min(id_col).alias("kept_id"),
        F.count("*").alias("n_copies"),
    )


def word_shingles(toks: Column, n: int) -> Column:
    """Distinct n-word shingles from a token-array column.

    Two performance rules learned from profiling:
    - ``F.get`` (O(1) element lookup) instead of ``F.slice`` — slice inside a
      transform is O(L) per position → O(L²) per document.
    - ``toks`` must be a materialized column reference, not an inline
      ``split(...)`` expression: every ``F.get`` reference re-evaluates its
      child, so an inlined split runs n+1 times per shingle position.
    ``F.get`` returns NULL (skipped by concat_ws) past the end, matching a
    clamped slice for texts shorter than n tokens.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.get(toks, i + j - 1) for j in range(n)]
            ),
        )
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) rows, one per distinct shingle per document.

    The tokenizing split lands in its own projection so Catalyst keeps it
    evaluated once per row (CollapseProject refuses to inline expressions
    referenced many times).
    """
    tk = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("tk"),
    )
    return tk.select(
        "doc_id",
        F.explode(word_shingles(F.col("tk"), n)).alias("shingle"),
    )


def _salted_md5(g: int):
    """Single-arg transform lambda factory. NOTE: pyspark's ``F.transform``
    treats a second lambda parameter as the array INDEX, so closure state
    must be captured via a factory, never a default argument."""
    return lambda s: F.md5(F.concat(F.lit(f"{g}:"), s))


def _hash_slice(offset: int):
    return lambda h: F.substring(h, offset, 8)


def minhash_signatures_from_text(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int, n_hashes: int
) -> DataFrame:
    """MinHash signatures computed ARRAY-SIDE: per document, hash the
    distinct-shingle array with ``F.transform`` and take ``F.array_min``
    per permutation — zero shuffle, zero row explosion, all inside
    whole-stage codegen.

    Value-identical to ``minhash_signatures(shingle_table(...))`` (same
    salted md5 per shingle, same lexicographic minimum over the same
    distinct shingle set — asserted by tests), but the explode + 64-way
    groupBy-min shuffle becomes a per-row projection: measured 2.5×
    faster at sf0.1, and at 100 TB it removes a corpus-sized shuffle
    entirely (the signature stage becomes map-only, so the FIRST shuffle
    of any dedup pipeline is the band join, on docs × bands rows).
    Consumers that need the (doc_id, shingle) relation itself (inverted
    index joins, df caps) still use :func:`shingle_table`.

    Each salted md5 yields four independent 32-bit slices, so the hash
    arrays are materialized once per group in their own projection
    (CollapseProject keeps multiply-referenced expressions from
    re-inlining) and the k = ``n_hashes`` minima reference them 4× each.
    """
    groups = (n_hashes + 3) // 4
    tk = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("tk"),
    )
    shg = tk.select(
        "doc_id", word_shingles(F.col("tk"), shingle_n).alias("sh")
    )
    hashed = shg.select(
        "doc_id",
        *[
            F.transform(F.col("sh"), _salted_md5(g)).alias(f"h{g}")
            for g in range(groups)
        ],
    )
    return hashed.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col(f"h{s // 4}"), _hash_slice((s % 4) * 8 + 1))
            ).alias(f"mh{s}")
            for s in range(n_hashes)
        ],
    )


def minhash_signatures(
    shingles: DataFrame, n_hashes: int
) -> DataFrame:
    """MinHash signature per doc: k independent permutations approximated by
    hash slicing — each salted md5 yields FOUR independent 32-bit hash values
    (disjoint 8-hex-char slices of its 128 output bits), so k permutations
    cost ceil(k/4) md5 evaluations per shingle instead of k. mh_s =
    MIN(substr(md5('<s//4>:'||shingle), (s%4)*8+1, 8)). All mins in ONE
    aggregation (single shuffle); 32-bit values keep collision odds
    ~2^-32 per shingle pair — negligible against LSH band widths."""
    groups = (n_hashes + 3) // 4
    salted = [
        F.md5(F.concat(F.lit(f"{g}:"), F.col("shingle"))).alias(f"h{g}")
        for g in range(groups)
    ]
    hashed = shingles.select("doc_id", *salted)
    aggs = [
        F.min(F.substring(f"h{s // 4}", (s % 4) * 8 + 1, 8)).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def band_table(
    signatures: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band_idx, band_hash) — one row per LSH band per document.

    The shared banding of the batch pair-join (:func:`lsh_candidate_pairs`)
    and the streaming MinHash ingestion gate
    (streaming/neardup.minhash_gate_and_append_batch): both consume this
    table, so batch and streaming agree on what counts as a band collision
    by construction.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat(
                        *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(
        "doc_id", F.explode(bands).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """Band the signature, bucket-join on (band index, band hash).

    The self-join is an equi-join on the banded hash — at 100 TB this
    shuffles each side once on the bucket key and never materializes
    non-colliding pairs. Returns (doc_a < doc_b, n_bands matched).
    """
    banded = band_table(signatures, n_bands, rows_per_band)
    # The self-join would otherwise recompute the entire shingle→minhash
    # subtree for each side. The banded table is docs × n_bands rows of
    # hashes — tiny relative to the corpus — so materialize it once (the
    # 100 TB analog: persist the signature table before pairing).
    banded = banded.localCheckpoint(eager=True)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )


def lsh_bucket_stars(
    signatures: DataFrame,
    n_bands: int,
    rows_per_band: int,
    n_rows_hint: int | None = None,
    symmetric: bool = False,
) -> DataFrame:
    """Connectivity-preserving LSH edge list: one star per band bucket
    (every member links to the bucket's MINIMUM doc_id) instead of all
    colliding pairs.

    Every band bucket is a clique in the candidate-pair graph (its members
    pairwise share that band), and a star connects exactly the same
    members — so the transitive closure over bucket stars is IDENTICAL to
    the closure over :func:`lsh_candidate_pairs` output, while the edge
    count is band-table-linear (≤ docs × n_bands) instead of Σ occupancy².
    This is the 100 TB-correct input for connected-components dedup: a
    boilerplate-heavy bucket of k near-identical docs costs k star edges,
    not k² candidate rows. Pair-scoring consumers (Hamming/Jaccard
    verification, n_bands counts) still need the pair join; component
    consumers should take this.

    Returns (doc_a, doc_b) with doc_a = bucket min < doc_b, distinct, and
    eagerly materialized: the consumer is an iterative loop whose first
    step symmetrizes the edge list (two reads), and without the checkpoint
    the whole shingle→signature→banding chain would execute once per read
    (the same reason lsh_candidate_pairs materializes its banded table).

    ``n_rows_hint`` (the band-table row count ≈ docs × n_bands, which the
    caller usually knows from a metadata-only parquet count) scopes the
    window/distinct shuffle width to the relation size — the band table is
    hash tuples, tiny next to the corpus, and at the session's corpus-scale
    width these two shuffles are pure task overhead. Omitted → session
    default (correct for callers that cannot bound the size).

    ``symmetric=True`` emits BOTH edge directions, distinct and
    materialized — the exact input contract of
    ``graph.connected_components(..., assume_symmetric=True)``, fused here
    so star build + symmetrize cost ONE checkpoint job instead of two
    (doc_a < doc_b always holds for a star edge, so the reversed set is
    disjoint and a narrow union AFTER the distinct stays distinct).
    """
    banded = band_table(signatures, n_bands, rows_per_band)
    w = Window.partitionBy("band_idx", "band_hash")

    def _build() -> DataFrame:
        stars = (
            banded.withColumn("rep", F.min("doc_id").over(w))
            .where(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
            .distinct()
        )
        if symmetric:
            # explode-to-both-directions, not union-of-two-branches: a
            # union would re-run the distinct aggregate once per branch,
            # the explode emits both directions in ONE pass per row.
            stars = stars.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
                        ),
                        F.struct(
                            F.col("doc_b").alias("a"), F.col("doc_a").alias("b")
                        ),
                    )
                ).alias("e")
            ).select(F.col("e.a").alias("doc_a"), F.col("e.b").alias("doc_b"))
        return stars.localCheckpoint(eager=True)

    if n_rows_hint is None:
        return _build()
    from autonomus_datapipeline_spark import tuning

    with tuning.scoped_shuffle(
        signatures.sparkSession, tuning.width_for_rows(signatures.sparkSession, n_rows_hint)
    ):
        return _build()


def cap_bucket_occupancy(
    rows: DataFrame, keys: list[str], max_occupancy: int
) -> DataFrame:
    """Drop bucket keys whose occupancy exceeds ``max_occupancy`` — the
    banded-join analog of :func:`cap_document_frequency`: a candidate bucket
    with k members contributes k² join rows, and boilerplate-heavy corpora
    concentrate near-identical fingerprints into single (block_idx, block)
    buckets, turning one shuffle key into the straggler that dominates the
    stage at 100 TB.

    Hot buckets carry mostly exact/near-exact duplicates, which the
    production ordering removes BEFORE fingerprinting
    (simhash_hamming_dedup_first); the cap is the guard for pipelines where
    that pre-pass was skipped, and — like the ngram df cap — it trades
    bounded recall (pairs whose only shared bucket was hot) for a hard
    worst-case bound. One count-aggregation + a semi join, both map-side
    combinable."""
    cool = (
        rows.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") <= max_occupancy)
        .select(*keys)
    )
    return rows.join(cool, list(keys), "left_semi")


def cap_document_frequency(shingles: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles appearing in more than ``max_df`` documents — the
    stopword-gram suppression that bounds the inverted-index join at scale
    (a shingle with df=d contributes d² join rows; hot grams carry no
    similarity signal). One count-aggregation + a semi join."""
    rare = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    return shingles.join(rare, "shingle", "left_semi")


def ngram_jaccard_pairs(
    shingles: DataFrame, min_jaccard: float = 0.0, max_df: int | None = None
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.

    Shuffle-parallel: self-equi-join on the shingle (inverted index), count
    intersections, join per-doc sizes. Pairs sharing nothing never appear —
    the cost is Σ_shingle df(shingle)², the classic inverted-index bound, not
    n². ``max_df`` engages :func:`cap_document_frequency` (Jaccard is then
    computed over the retained shingle sets — both sides of any oracle must
    apply the same cap).
    """
    if max_df is not None:
        shingles = cap_document_frequency(shingles, max_df)
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def simhash(df: DataFrame, id_col: str, text_col: str, n_bits: int = 32) -> DataFrame:
    """SimHash fingerprint as an ``n_bits``-char bitstring per document.

    Bit j is the high bit of hex char j%32 of md5 number j//32 per token
    (md5's 128 output bits are independent, so each md5 yields 32
    independent hash bits; bits 32-63 come from a second, salted md5 —
    ``md5('1:'||tok)``). Weighted by token frequency (tokens explode with
    multiplicity). All n_bits sums happen in ONE aggregation — no per-bit
    shuffle, no row blowup, ceil(n_bits/32) md5 evaluations per token.

    Fingerprint width is a scale knob: near-dup banding on b-bit blocks has
    2^b bucket values, so the 64-bit/16-bit-block configuration keeps
    bucket occupancy ~corpus/65536 where the 32-bit/8-bit one saturates at
    256 buckets (quadratic bucket joins long before 100 TB).
    """
    groups = (n_bits + 31) // 32
    hashes = [
        (
            F.md5("tok")
            if g == 0
            else F.md5(F.concat(F.lit(f"{g}:"), F.col("tok")))
        ).alias(f"h{g}")
        for g in range(groups)
    ]
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).select("doc_id", *hashes)
    # Bit j is the HIGH BIT of hex nibble j%32 of md5 j//32 — extracted via
    # 8-char windows parsed to longs (8 conv calls/row) instead of 64
    # substring+set-membership string ops/row: same bits, ~1/8th the string
    # work in the hot per-token projection. Window w covers chars 8w+1..8w+8;
    # char p inside it owns long bits [31-4p .. 28-4p], so its nibble high
    # bit is bit (31-4p).
    words = {
        (g, w): F.conv(F.substring(f"h{g}", 8 * w + 1, 8), 16, 10).cast("long")
        for g in range(groups)
        for w in range(4)
    }

    def _bit(j: int):
        c = j % 32
        return F.shiftright(words[(j // 32, c // 8)], 31 - 4 * (c % 8)).bitwiseAND(
            F.lit(1)
        )

    # sum(±1) over tokens == 2*sum(bit) - count: track the bit sums and one
    # shared count instead of 64 conditional ±1 aggregations.
    bit_sums = [F.sum(_bit(j)).alias(f"b{j}") for j in range(n_bits)]
    sums = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"), *bit_sums)
    bitchars = [
        F.when(2 * F.col(f"b{j}") - F.col("_n") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(n_bits)
    ]
    return sums.select("doc_id", F.concat(*bitchars).alias("simhash"))


def strip_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Exact duplicated-span removal (ExactSubstr-style dedup, relationally).

    Removes every word that lies inside an ``n``-word span occurring more
    than once in the corpus (across documents or repeated within one) — the
    span-level dedup of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", re-expressed as shuffle-parallel relational
    algebra instead of a suffix array:

    1. positional n-gram hashes per document (array-side, one md5 per
       position, whole-stage codegen);
    2. one global count-aggregation finds grams with count > 1;
    3. occurrences of duplicated grams expand to covered word positions
       (``sequence(pos, pos+n-1)`` — bounded ×n blowup on dup rows only);
    4. an anti-join drops covered words; per-doc ordered re-assembly via
       ``array_sort(collect_list(struct(pos, word)))``.

    No pairwise comparison, no suffix structure, no driver-side state: the
    cost is O(tokens) shuffle for the gram count plus O(dup_occurrences × n)
    for coverage — at 100 TB every step is a hash shuffle Catalyst plans as
    partial-agg + exchange. Deterministic set logic end-to-end (md5 grams,
    unique positions), so the result is engine-exact and oracle-checkable.

    Returns (doc_id, n_words, n_kept, n_removed, kept_text); docs shorter
    than ``n`` words contribute no grams and pass through unchanged.
    """
    tk = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), r"\s+").alias("tk"),
    )
    gh_arr = F.when(
        F.size("tk") >= n,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("tk") - n + 1, F.lit(1))),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.get("tk", i + j - 1) for j in range(n)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = tk.select("doc_id", F.posexplode(gh_arr).alias("p0", "gh")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "gh"
    )
    # The gram table feeds both the duplicate count and the occurrence join;
    # materialize EAGERLY once (a lazy cache consumed by two branches of the
    # same job is computed concurrently by both before it fills — measured
    # ~2× slower on the simhash twin). 100 TB analog: persist the gram
    # table, it is hashes not text.
    grams = grams.localCheckpoint(eager=True)
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("gh")
    )
    occ = grams.join(dup, "gh", "left_semi")
    cover = (
        occ.select(
            "doc_id",
            F.explode(F.sequence("pos", F.col("pos") + n - 1)).alias("cpos"),
        )
        .distinct()
        .withColumnRenamed("doc_id", "c_doc_id")
    )
    words = tk.select(
        "doc_id", F.posexplode("tk").alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "word")
    kept = words.join(
        cover,
        (words["doc_id"] == cover["c_doc_id"]) & (words["pos"] == cover["cpos"]),
        "left_anti",
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        tk.select("doc_id", F.size("tk").alias("n_words"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )
