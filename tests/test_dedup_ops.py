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


def test_strip_duplicated_spans_semantics(spark):
    shared = "a b c d e f g h"  # the duplicated 8-word span
    docs = spark.createDataFrame(
        [
            (1, f"{shared} x y z"),          # span at pos 1-8 -> keep x y z
            (2, f"q r {shared} w"),          # span at pos 3-10 -> keep q r w
            (3, "short doc only"),           # < 8 words: no grams, untouched
            (4, f"{shared} {shared}"),       # internal repeat: all covered
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in dedup.strip_duplicated_spans(docs, "doc_id", "text", n=8).collect()
    }
    assert (out[1].kept_text, out[1].n_removed) == ("x y z", 8)
    assert (out[2].kept_text, out[2].n_removed) == ("q r w", 8)
    assert (out[3].kept_text, out[3].n_removed) == ("short doc only", 0)
    assert (out[4].kept_text, out[4].n_kept) == ("", 0)


def test_simhash_64_bits_and_hamming_exactness(spark):
    # Identical texts -> identical 64-char fingerprints; the banded query
    # machinery is exercised by the oracle tests, this guards the width and
    # the multi-hash bit derivation.
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "wholly other words")],
        ["doc_id", "text"],
    )
    fp = {r.doc_id: r.simhash for r in dedup.simhash(df, "doc_id", "text", 64).collect()}
    assert len(fp[1]) == 64 and set(fp[1]) <= {"0", "1"}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_strip_duplicated_spans_matches_reference_model(spark):
    # Seeded random corpus from a tiny vocabulary (forces span collisions),
    # checked exactly against an independent pure-Python model — a third
    # formulation alongside the Spark plan and the DuckDB oracle.
    import re
    from collections import Counter
    from random import Random

    rnd = Random(7)
    vocab = ["red", "blue", "green", "ox", "owl", "yak"]
    n = 5
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 30))))
        for i in range(40)
    ]

    def model(rows):
        toks = {i: re.split(r"\s+", t.lower()) for i, t in rows}
        grams = Counter()
        occs = []
        for i, ws in toks.items():
            for p in range(len(ws) - n + 1):
                g = tuple(ws[p : p + n])
                grams[g] += 1
                occs.append((i, p, g))
        covered = set()
        for i, p, g in occs:
            if grams[g] > 1:
                covered.update((i, q) for q in range(p, p + n))
        out = {}
        for i, ws in toks.items():
            kept = [w for q, w in enumerate(ws) if (i, q) not in covered]
            out[i] = (len(ws), len(kept), len(ws) - len(kept), " ".join(kept))
        return out

    expected = model(docs)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_words, r.n_kept, r.n_removed, r.kept_text)
        for r in dedup.strip_duplicated_spans(df, "doc_id", "text", n=n).collect()
    }
    assert got == expected


def test_payload_fingerprint_shift_robust(spark):
    """A length-CHANGING local edit must flip only a few fingerprint bits
    (the winnowed-min selection survives byte shifts); an unrelated payload
    must differ in many."""
    from autonomus_datapipeline_spark.operators import multimodal

    base = ("the quick brown fox jumps over the lazy dog " * 30).encode()
    edited = base.replace(b"jumps", b"leaps", 1)          # shorter by 1 byte
    other = ("completely different content with other words " * 30).encode()
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(edited)), (2, bytearray(other))],
        "doc_id bigint, payload binary",
    )
    fp = {r["doc_id"]: r["simhash"]
          for r in multimodal.payload_fingerprint(df).collect()}
    assert len(fp[0]) == 64 and set(fp[0]) <= {"0", "1"}

    def hamming(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert hamming(fp[0], fp[1]) <= 3       # near-dup despite the byte shift
    assert hamming(fp[0], fp[2]) > 10       # unrelated content far away


def test_cap_bucket_occupancy_drops_hot_buckets(spark):
    rows = spark.createDataFrame(
        [(i, 0, "hot") for i in range(10)] + [(100, 0, "cool"), (101, 0, "cool")],
        "doc_id long, block_idx int, block string",
    )
    kept = dedup.cap_bucket_occupancy(rows, ["block_idx", "block"], 5).collect()
    assert sorted(r.doc_id for r in kept) == [100, 101]


def test_simhash_occupancy_cap_bounds_hot_bucket_candidates(spark):
    """Skew guard (verdict-r4 item 6): a boilerplate hot bucket (10 identical
    fingerprints → 45 candidate pairs on ONE shuffle key) is dropped by the
    cap while genuinely-banded near pairs survive."""
    from autonomus_datapipeline_spark.workloads.graph_ops import (
        _sh_banded_hamming_pairs,
    )

    hot = [(i, "0" * 64) for i in range(10)]
    near = [(100, "1" * 63 + "0"), (101, "1" * 64)]  # hamming 1
    fp = spark.createDataFrame(hot + near, "doc_id long, simhash string").cache()
    uncapped = _sh_banded_hamming_pairs(fp).collect()
    assert len(uncapped) == 45 + 1
    capped = _sh_banded_hamming_pairs(fp, max_block_occupancy=5).collect()
    assert [(r.doc_a, r.doc_b) for r in capped] == [(100, 101)]


def test_decode_features_real_codec_when_available(spark):
    """`use_fake=False` drives the SAME mapInPandas plumbing through the
    real Pillow decoder when it's importable; in codec-less sandboxes the
    stub raises NotImplementedError (documented fallback)."""
    import pytest as _pytest

    from autonomus_datapipeline_spark.operators import multimodal

    try:
        import io

        from PIL import Image
    except ImportError:
        with _pytest.raises(Exception) as exc_info:
            multimodal.decode_features(
                spark.createDataFrame(
                    [(1, bytearray(b"xx"))], "doc_id long, payload binary"
                ),
                use_fake=False,
            ).collect()
        assert "NotImplementedError" in str(
            exc_info.value
        ) or isinstance(exc_info.value, NotImplementedError)
        return

    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    row = multimodal.decode_features(df, use_fake=False).collect()[0]
    assert (row.width, row.height, row.format) == (7, 5, "png")


def test_bucket_stars_components_equal_pairwise_components(spark):
    """lsh_bucket_stars is connectivity-equivalent to lsh_candidate_pairs:
    every band bucket is a clique, so member→bucket-min stars yield the
    IDENTICAL connected components at band-table-linear edge count. Pin
    (node → component) equality on a corpus with duplicate clusters,
    chained near-dups, and singletons."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("kappa", "kappa2")),  # near-dup of 1
        (4, base.replace("kappa", "kappa2").replace("tau", "tau2")),  # chains via 3
        (10, "completely different words about parquet shuffle joins and "
             "broadcast exchanges in distributed query processing engines"),
        (11, "completely different words about parquet shuffle joins and "
             "broadcast exchanges in distributed query processing engines"),
        (20, "a lone singleton document with its own unique vocabulary "
             "entirely disjoint from every other text in this corpus"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingle_table(docs, "doc_id", "text", 2)
    sigs = dedup.minhash_signatures(sh, 12).localCheckpoint(eager=True)
    pairs = dedup.lsh_candidate_pairs(sigs, 4, 3)
    stars = dedup.lsh_bucket_stars(sigs, 4, 3)
    comp_pairs = {
        (r["node"], r["component_id"])
        for r in graph.connected_components(pairs, "doc_a", "doc_b").collect()
    }
    comp_stars = {
        (r["node"], r["component_id"])
        for r in graph.connected_components(stars, "doc_a", "doc_b").collect()
    }
    assert comp_stars == comp_pairs
    # sanity: the clusters actually formed (1,2,3 together; 10,11 together)
    comp = dict(comp_pairs)
    assert comp[1] == comp[2] == comp[3]
    assert comp[10] == comp[11]
    # star edge list never exceeds the band table (linear), pairs may not
    assert stars.count() <= 4 * sigs.count()
    # every star edge points member -> bucket minimum
    assert stars.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
