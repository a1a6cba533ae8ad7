"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions — no Python in the hot
path), so they whole-stage-codegen and scale linearly with the scan:
- token_count: whitespace tokens + a BPE-ish subword regex count
- quality_score: length / punctuation / stopword / uppercase ratios
- language_id: stopword-hit heuristic over a few languages
- fingerprint: deterministic 64-bit content fingerprint

Each is a column-expression factory over a text column; the matching
DuckDB-SQL oracles live in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny public stopword sets per language (heuristic language-id only)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "una"],
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    # split on runs of whitespace; trim first so edges don't add empties
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def upper_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    upper = n - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return F.when(n > 0, upper.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Count of stopword occurrences (word-bounded, case-insensitive)."""
    c = F.col(text) if isinstance(text, str) else text
    pat = r"(?i)\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(c, F.lit(pat), 0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks = whitespace_token_count(c)
    return F.when(
        toks > 0, stopword_hits(c, lang).cast("double") / toks.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality: long enough, low punct noise, has stopwords.

    The exact blend is this engine's own heuristic (the reference has no
    notion of quality); weights chosen so typical clean English prose
    scores > 0.5 and symbol soup scores near 0.
    """
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4.0)
    stop_score = F.least(stopword_ratio(c) * 3.0, F.lit(1.0))
    return (len_score * 0.4 + punct_pen * 0.3 + stop_score * 0.3).cast("double")


def language_id(text: Column | str) -> Column:
    """Pick the language whose stopword hit-count is highest; 'und' if 0."""
    c = F.col(text) if isinstance(text, str) else text
    langs = list(STOPWORDS)
    pairs = [F.struct(stopword_hits(c, lg).alias("hits"), F.lit(lg).alias("lang")) for lg in langs]
    # greatest of structs compares hits first, then lang (stable tiebreak)
    best = F.greatest(*pairs)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint64(text: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of the text).

    The 'rolling hash' role from the brief: a stable content identity for
    exact-dup detection and lineage joins, computed JVM-side.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(c)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection with all text-analysis columns."""
    c = F.col(text_col)
    return df.select(
        "*",
        whitespace_token_count(c).alias("n_ws_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        language_id(c).alias("lang_id"),
        fingerprint64(c).alias("fp64"),
    )
