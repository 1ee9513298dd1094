"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as `binary` columns with metadata
structs; the decode/feature-extract step runs in Arrow-batched pandas over
``mapInPandas`` so each Python worker sees columnar batches, not rows.

The image/audio libs are not in this container, so the actual codec call is
STUBBED (`decode_image` raises NotImplementedError unless a fake decoder is
requested); the Spark-side plumbing — schema, batch iteration, UDF signature,
partition behavior — is real and tested. The deterministic fake decoder
derives "features" from the payload's md5 so the whole path stays
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, payload_md5 string, "
    "width int, height int, format string"
)

_FORMATS = ["png", "jpeg", "webp"]


def to_payload(text: Column) -> Column:
    """Model an opaque binary column (here: utf-8 bytes of the text)."""
    return F.encode(text, "UTF-8")


def decode_image(payload: bytes) -> dict:
    """Real image decode when Pillow is importable (same contract as
    :func:`fake_decode`); raises NotImplementedError where no codec library
    exists so callers fall back to the deterministic fake. The Spark-side
    plumbing (schema, Arrow batching, mapInPandas signature) is identical
    for both decoders — swapping in the real one is a pure function swap."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # codec libs absent in this sandbox
        raise NotImplementedError(
            "image codecs (Pillow) are not available in this environment; "
            "use fake_decode for deterministic tests"
        ) from exc
    with Image.open(io.BytesIO(payload)) as im:
        return {
            "payload_md5": hashlib.md5(payload).hexdigest(),
            "width": im.width,
            "height": im.height,
            "format": (im.format or "").lower(),
        }


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: metadata derived from the payload md5.

    width  = 1 + (ascii of md5 hex char 1) as pixels
    height = 1 + (ascii of md5 hex char 2)
    format = _FORMATS[ascii of md5 hex char 3 mod 3]
    (Spec is mirrored in the oracle SQL via ascii(substr(md5(text), i, 1)).)
    """
    h = hashlib.md5(payload).hexdigest()
    return {
        "payload_md5": h,
        "width": 1 + ord(h[0]),
        "height": 1 + ord(h[1]),
        "format": _FORMATS[ord(h[2]) % 3],
    }


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_fake: bool = True,
) -> DataFrame:
    """Frame sampling: one binary 'video' payload in → N frame rows out.

    Demonstrates the 1→N mapInPandas shape (row expansion inside an Arrow
    batch — no explode of materialized frames through the JVM). The real
    frame extractor (ffmpeg) is stubbed; the deterministic fake emits
    1 + (payload_bytes mod 4) frames whose ids are md5(payload_md5 || '/i'),
    so the whole path stays oracle-checkable.
    """
    if not use_fake:
        raise NotImplementedError("ffmpeg is not available in this environment")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                h = hashlib.md5(b).hexdigest()
                n_frames = 1 + (len(b) % 4)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(f"{h}/{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_fake: bool = True,
) -> DataFrame:
    """Arrow-batched decode: one pandas batch in, one metadata batch out.

    At scale this is the pattern for any codec stage: binary in, small typed
    struct out, no shuffle — pipeline it right after the scan so the heavy
    payload column is dropped as early as possible.
    """
    decoder = fake_decode if use_fake else decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "payload_md5": [m["payload_md5"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def payload_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bits: int = 64,
    gram: int = 8,
) -> DataFrame:
    """Shift-robust fingerprint of an opaque binary payload (the byte-level
    near-dup hash for image/audio blobs): one-permutation minhash over
    byte ``gram``s, binned into ``n_bits`` content-addressed buckets.

    Every overlapping ``gram``-byte window is hashed; the hash's own first
    6 bits pick its bucket and bit j is (the high bit of the last hex char
    of) the MINIMUM gram hash in bucket j. Because bucket assignment is
    content-addressed — NOT positional — the fingerprint is invariant to
    where grams sit: inserting, deleting, or appending bytes touches only
    the buckets of the grams the edit creates or removes, so near-identical
    payloads land within small Hamming distance even when the edit changes
    length (a positional window hash dies on any length shift for short
    payloads). This is one-permutation minwise hashing (Li et al., NIPS
    2012) specialized to 1 bit per bin. A real perceptual hash would decode
    the media first (codec stubbed in this environment); the fingerprint →
    banded join → Hamming verify pipeline downstream is identical.

    Scale: one md5 per payload byte (the winnowing cost, shuffle-linear),
    one groupBy(doc) with n_bits conditional-min aggregates — map-side
    combined, no row blowup beyond the gram explode.
    """
    assert n_bits == 64, "bucket arithmetic below is specialized to 64 bins"
    hx = F.hex(F.col(payload_col))
    # byte-aligned grams at stride 2: position k covers bytes [k, k+gram) →
    # hex chars [2k+1, 2k+2*gram]. Stride 2 halves the md5 count while every
    # byte stays covered by ≥ 1 gram (gram ≫ stride); md5 runs per exploded
    # row so it stays on the codegen'd path (an array-side transform lambda
    # is interpreted per element — measured 2.5× slower end-to-end).
    n_kpos = F.greatest((F.length(hx) / 2).cast("long") - (gram - 1), F.lit(1))
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.sequence(F.lit(0), n_kpos - 1, F.lit(2))).alias("_", "k"),
        hx.alias("h"),
    ).select(
        "doc_id",
        F.md5(F.substring("h", 2 * F.col("k") + 1, F.lit(2 * gram))).alias("gh"),
    ).select(
        "doc_id",
        "gh",
        # content-addressed bucket: 6 bits from the gram hash's first two
        # hex chars — ((v1 % 4) * 16 + v2) == (v1*16 + v2) mod 64
        F.expr(
            "CAST(((instr('0123456789abcdef', substring(gh, 1, 1)) - 1) % 4) * 16"
            " + (instr('0123456789abcdef', substring(gh, 2, 1)) - 1) AS INT)"
        ).alias("w"),
    )
    # Two-stage: min per (doc, bucket) first — ONE min expression over the
    # gram-sized input, map-side combined — then the 64-way pivot runs over
    # exactly n_bits rows per doc instead of evaluating 64 conditionals on
    # every gram.
    wmin = grams.groupBy("doc_id", "w").agg(F.min("gh").alias("m"))
    mins = wmin.groupBy("doc_id").agg(
        *[F.min(F.when(F.col("w") == j, F.col("m"))).alias(f"m{j}") for j in range(n_bits)]
    )
    high = list("89abcdef")
    # Bit = high bit of the min's LAST hex char: the minimum is decided by
    # its leading chars (which therefore skew toward 0 — a leading-char bit
    # would be degenerate); trailing chars of the argmin hash stay uniform.
    bits = [
        F.when(F.substring(F.col(f"m{j}"), 32, 1).isin(high), F.lit("1"))
        .otherwise(F.lit("0"))  # includes NULL (short payload, empty bucket)
        for j in range(n_bits)
    ]
    return mins.select("doc_id", F.concat(*bits).alias("simhash"))
