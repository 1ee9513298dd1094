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


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0,1]. Formula is part of the operator spec (mirrored in the
    oracle SQL)."""
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    avg_token_len = F.round(alpha_chars / n_tokens, 4)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    stop_ratio = F.round(stopword_hits(text, LANG_STOPWORDS["en"]) / n_tokens, 4)
    score = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(150.0)) * 0.5
        + stop_ratio * 0.25
        + F.least(F.lit(1.0), avg_token_len / F.lit(8.0)) * 0.25,
        4,
    )
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "avg_token_len": avg_token_len,
        "n_punct": n_punct,
        "stop_ratio": stop_ratio,
        "quality_score": score,
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
