"""Dedup operator units: df capping, representative keeping."""

from __future__ import annotations

from pyspark.sql import functions as F

from autonomus_datapipeline_spark.operators import dedup, graph


def test_exact_dedup_null_safe_keys(spark):
    # ('a', NULL) vs (NULL, 'a') must hash to DIFFERENT groups, and an
    # embedded separator-ish byte must not collide across column boundaries.
    df = spark.createDataFrame(
        [
            (1, "a", None),
            (2, None, "a"),
            (3, "a\x1fb", "c"),
            (4, "a", "b\x1fc"),
            (5, "a", None),  # true duplicate of row 1
        ],
        ["id", "c1", "c2"],
    )
    out = dedup.exact_dedup(df, ["c1", "c2"], "id").collect()
    assert len(out) == 4  # rows 1&5 merge; 2, 3, 4 all distinct
    merged = [r for r in out if r["n_copies"] == 2]
    assert len(merged) == 1 and merged[0]["kept_id"] == 1


def test_cap_document_frequency(spark):
    docs = spark.createDataFrame(
        [(i, "common common " + f"unique{i} token{i}") for i in range(6)],
        ["doc_id", "text"],
    )
    sh = dedup.shingle_table(docs, "doc_id", "text", 1)
    capped = dedup.cap_document_frequency(sh, max_df=3)
    shingles_left = {r["shingle"] for r in capped.select("shingle").distinct().collect()}
    assert "common" not in shingles_left      # df=6 > 3 → suppressed
    assert "unique0" in shingles_left          # df=1 → kept


def test_jaccard_with_cap_changes_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "hot a b"), (2, "hot c d"), (3, "hot e f")], ["doc_id", "text"]
    )
    sh = dedup.shingle_table(docs, "doc_id", "text", 1)
    uncapped = dedup.ngram_jaccard_pairs(sh).count()
    capped = dedup.ngram_jaccard_pairs(sh, max_df=2).count()
    assert uncapped == 3   # all pairs share 'hot'
    assert capped == 0     # 'hot' suppressed → nothing shared


def test_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(5)], ["doc_id", "text"]
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4)], ["node", "component_id"]
    )
    kept = graph.keep_representatives(docs, comp, "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 3, 4}  # 2 dropped
