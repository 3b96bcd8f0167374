"""Text analysis operators over document tables (training-data pipeline ops).

The reference ships payload values through untouched (no scalar expression
library of its own — SURVEY.md §2.8), so these operators are the
training-data-pipeline extensions the graft calls for: language ID, quality
scoring, token counting, document fingerprinting. Everything here is built
from JVM-side ``pyspark.sql.functions`` (whole-stage codegen, no Python in the
hot path) and has an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword-hit heuristic.
# Deterministic and SQL-expressible; real language ID would plug a model into
# the same column contract.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "que", "de"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
}

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def _count_word(col: Column, word: str) -> Column:
    """Whole-word occurrence count, JVM-side regexp."""
    return F.regexp_count(col, F.lit(rf"\b{word}\b"))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization + a BPE-ish subword estimate.

    ``n_tokens``: whitespace split count. ``n_subwords``: count of
    letter-runs/digit-runs/punctuation (a cheap regex proxy for BPE piece
    count). Both as pure SQL expressions.
    """
    return df.withColumns(
        {
            "n_tokens": F.size(F.split(F.col(text_col), " ")),
            "n_chars": F.length(F.col(text_col)),
            "n_subwords": F.regexp_count(
                F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, mean word length, stopword
    ratio, alpha ratio, and a composite score in [0, 1]."""
    text = F.col(text_col)
    n_tokens = F.size(F.split(text, " "))
    n_chars = F.length(text)
    stop_hits = None
    for w in _STOPWORDS:
        c = _count_word(text, w)
        stop_hits = c if stop_hits is None else (stop_hits + c)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    mean_word_len = (n_chars - (n_tokens - F.lit(1))) / n_tokens
    stop_ratio = stop_hits / n_tokens
    alpha_ratio = alpha_chars / n_chars
    score = F.round(
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + alpha_ratio * 0.3,
        6,
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "mean_word_len": F.round(mean_word_len, 6),
            "stop_ratio": F.round(stop_ratio, 6),
            "alpha_ratio": F.round(alpha_ratio, 6),
            "quality": score,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language ID with deterministic ties (highest count,
    then lexicographic language code)."""
    text = F.col(text_col)
    scores = {
        lang: sum(
            (_count_word(text, w) for w in words[1:]), _count_word(text, words[0])
        )
        for lang, words in LANG_MARKERS.items()
    }
    df2 = df.withColumns({f"_s_{lang}": c for lang, c in scores.items()})
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # reversed lexicographic fold → first lexicographic language wins ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = df2.withColumn("pred_lang", pred)
    return out.drop(*[f"_s_{lang}" for lang in LANG_MARKERS])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.
    (A content-defined rolling hash reduces to this for whole-doc identity.)"""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fp", F.md5(norm))
