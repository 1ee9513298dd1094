"""Text-analysis operators: quality scoring, language ID, token counting,
document fingerprinting.

All pure built-in column expressions (split / regexp / higher-order array
functions) — whole-stage-codegen'd, zero Python in the hot path, so they run
at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-voting language ID
# heuristic. Deliberately small + deterministic: this is a heuristic operator,
# not a model.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que"],
    "es": ["el", "la", "de", "que", "los", "es", "una", "por"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic argmax tie order

# Regex tokenizer approximating BPE pre-tokenization: words | numbers | symbol.
BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,!?;:]"


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the stopword list (JVM lambda filter)."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def _e4_half_up(num: Column, den: Column) -> Column:
    """Round-half-up of 10⁴·num/den as an exact integer: floor((2·10⁴·num
    + den) / (2·den)) for non-negative integer columns. ROUND(double, 4)
    is NOT engine-portable for arbitrary rationals — the engine first
    multiplies the double by 10⁴ (its own rounding step), so a ratio whose
    exact expansion sits just under a .00005 boundary can round up on one
    engine and down on the other (bit the sf0.1 gate, round 5). Integer
    cross-multiplication has no intermediate double, so the quantized
    value is identical everywhere."""
    return F.floor((num * 20000 + den) / (den * 2)).cast("long")


# quality_score = 0.5·min(n/150,1) + 0.25·(s_e4/10⁴) + 0.25·min(a_e4/(8·10⁴),1)
#               = (3200·min(n,150) + 24·s_e4 + 3·min(a_e4,80000)) / 960000
# — one rational with integer numerator, quantized by the same half-up rule.
_Q_DEN = 960_000


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0,1]. Formula is part of the operator spec (mirrored in the
    oracle SQL). Every ratio is reported in exact integer ten-thousandths
    divided once by 10⁴ — see _e4_half_up for why ROUND(double, 4) is
    banned here."""
    toks = tokens(text)
    n_tokens = F.size(toks)
    n = n_tokens.cast("long")
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"\s+", "")).cast("long")
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    stop = stopword_hits(text, LANG_STOPWORDS["en"]).cast("long")
    a_e4 = _e4_half_up(alpha_chars, n)
    s_e4 = _e4_half_up(stop, n)
    p = (
        F.least(n, F.lit(150)) * 3200
        + s_e4 * 24
        + F.least(a_e4, F.lit(80_000)) * 3
    )
    q_e4 = F.floor((p * 20000 + _Q_DEN) / F.lit(2 * _Q_DEN)).cast("long")
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "avg_token_len": a_e4.cast("double") / 10000.0,
        "n_punct": n_punct,
        "stop_ratio": s_e4.cast("double") / 10000.0,
        "quality_score": q_e4.cast("double") / 10000.0,
    }


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_hits(text, sw) for lang, sw in LANG_STOPWORDS.items()}


def predicted_lang(text: Column) -> Column:
    """Stopword-voting argmax: first language in LANG_PRIORITY whose score
    equals the max (deterministic tie order, mirrored in the oracle SQL)."""
    scores = lang_scores(text)
    mx = F.greatest(*scores.values())
    expr = F.when(scores[LANG_PRIORITY[0]] == mx, F.lit(LANG_PRIORITY[0]))
    for lang in LANG_PRIORITY[1:-1]:
        expr = expr.when(scores[lang] == mx, F.lit(lang))
    return expr.otherwise(F.lit(LANG_PRIORITY[-1]))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_RE), 0))


def normalized_fingerprint(text: Column) -> Column:
    """md5 of whitespace-collapsed lowercased text — exact-dup fingerprint."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def winnowing_fingerprints(
    df, id_col: str, text_col: str, k: int = 5, w: int = 8
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken style,
    rolling-hash selection): hash every character k-gram, slide a window of
    w consecutive hashes, keep each window's minimum, dedup per document.

    Near-identical documents share most fingerprints even under local edits
    — the plagiarism/dedup workhorse. Expressed relationally (explode +
    window-min + distinct) so it shuffles once on doc_id and is
    oracle-checkable; the hash is md5 of the k-gram (portable), the window
    min is the lexicographic min.
    """
    # All array-side, no explode of grams and no per-doc window sort: the
    # gram-hash array is built once per document (its own projection, and
    # referenced twice below, so CollapseProject cannot inline it into every
    # window evaluation), then each window minimum is array_min over an
    # O(w) slice — O(n·w) work per doc with w constant, vs the previous
    # posexplode + orderBy(pos) window sort (the one superlinear op in the
    # round-1 scale probe). array_distinct dedups in-array, so the whole
    # operator is a shuffle-free narrow pipeline.
    hashes = df.filter(F.length(F.col(text_col)) >= k + w - 1).select(  # ≥ 1 full window
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"transform(sequence(1, length({text_col}) - {k - 1}),"
            f" i -> md5(substring({text_col}, i, {k})))"
        ).alias("hs"),
    )
    return hashes.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(hs) - {w - 1}),"
                    f" p -> array_min(slice(hs, p, {w})))"
                )
            )
        ).alias("fingerprint"),
    )


def sorted_token_fingerprint(text: Column) -> Column:
    """md5 of the sorted distinct token multiset (OpenRefine-style key
    collision fingerprint): catches token-order shuffles."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    )
