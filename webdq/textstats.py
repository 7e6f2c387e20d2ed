"""Heuristic per-document features as pure Spark expressions.

Analog of the reference's per-entity count/ratio feature extraction
(/root/reference/osmdq/utils.py:422-463, the 40-feature user vector of
article6). The reference builds features with ~20 pandas groupby+merge
round-trips; a web document is a single row, so every feature here is
a whole-stage-codegen scalar expression — zero Python in the hot path
(SURVEY.md §2.7, §4 "Vectorization" row).

Gopher/C4-style rules: stopword ratio, symbol density, digit density,
word-repetition and 5-gram-repetition ratios, mean word length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword set (public, ubiquitous). Used for the
# Gopher-style "has enough stopwords" signal.
EN_STOPWORDS = (
    "the of and to in a is that it for on with as are was at be this have from or by an "
    "not we you they he she his her its their our your i but if then than so what which who"
).split()

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PATTERNS = {"email": _EMAIL, "phone": _PHONE, "ipv4": _IPV4}


def words_col(text: Column) -> Column:
    """Whitespace tokens; empty array for empty/null text."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def _char_class_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters matching a regex char class."""
    n = F.length(F.coalesce(text, F.lit("")))
    kept = F.length(F.regexp_replace(F.coalesce(text, F.lit("")), pattern, ""))
    return _safe_div(n - kept, n)


def word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams as strings (space-joined); empty array if too short."""
    cnt = F.size(words)
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), cnt - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def heuristic_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the heuristic feature columns (schema.FEATURE_COLS minus
    the model-backed ones) to ``df``. One projection, no shuffle."""
    text = F.col(text_col)
    words = words_col(text)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    grams5 = word_ngrams(words, 5)

    n_chars = F.length(F.coalesce(text, F.lit(""))).cast("double")
    n_words = F.size(words).cast("double")
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))).cast("double")
    # mean word length: non-whitespace chars / word count
    nonws = F.length(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s", "")).cast("double")

    pii = sum(
        F.regexp_count(F.coalesce(text, F.lit("")), F.lit(p)).cast("double") for p in PII_PATTERNS.values()
    )

    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_word_len": _safe_div(nonws, n_words),
            "stopword_ratio": _safe_div(n_stop, n_words),
            "symbol_ratio": _char_class_ratio(text, r"[^\p{L}\p{N}\s]"),
            "digit_ratio": _char_class_ratio(text, r"\p{N}"),
            "upper_ratio": _char_class_ratio(text, r"\p{Lu}"),
            "dup_word_ratio": F.lit(1.0) - _safe_div(F.size(F.array_distinct(words)), n_words),
            "dup_5gram_ratio": F.when(F.size(grams5) > 0, F.lit(1.0) - _safe_div(F.size(F.array_distinct(grams5)), F.size(grams5))).otherwise(F.lit(0.0)),
            "pii_hits": pii,
        }
    )
