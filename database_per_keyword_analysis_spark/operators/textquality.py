"""Text-analysis extensions for a training-data pipeline (north star;
SURVEY.md §2.11): quality scoring, language-ID heuristic, token counting,
document fingerprinting.

All pure column expressions — at 100 TB these run as a single projection
pass over the corpus with no shuffle at all (the quality metrics) or one
tiny aggregation (the per-language rollups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic.  Real corpora would use larger lists or character n-gram
# profiles; the mechanism (score per language via marker hits, argmax) is
# identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "les", "est"],
    "es": ["el", "los", "es", "y"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is"]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
# (shared regex subset: works identically in Java, RE2/DuckDB, Python).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def ws_token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(c: Column) -> Column:
    """Tokenizer-style count via the BPE-ish regex."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: lengths, token counts, mean word
    length, stopword ratio, punctuation ratio."""
    c = F.col(text_col)
    n_ws = ws_token_count(c)
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(F.trim(c)), r"\s+"),
            lambda t: t.isin(*STOPWORDS_EN),
        )
    )
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return docs.where(c.isNotNull()).select(
        "doc_id",
        F.length(c).alias("n_chars_actual"),
        n_ws.alias("n_tokens_ws"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        (
            (F.length(F.regexp_replace(c, r"\s+", "")).cast("double"))
            / n_ws.cast("double")
        ).alias("mean_word_len"),
        (stop_hits.cast("double") / n_ws.cast("double")).alias("stopword_ratio"),
        (n_punct.cast("double") / F.length(c).cast("double")).alias("punct_ratio"),
    )


def lang_scores(c: Column) -> list[Column]:
    cols = []
    for lang, markers in LANG_MARKERS.items():
        toks = F.split(F.lower(F.trim(c)), r"\s+")
        cols.append(
            F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"score_{lang}")
        )
    return cols


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: marker-hit score per language, argmax with
    deterministic tie-break on language code; 'und' when no marker hits."""
    scored = docs.where(F.col(text_col).isNotNull()).select(
        "doc_id", "lang", *lang_scores(F.col(text_col))
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first (alphabetical) language achieving the max wins
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowered text (north-star 'document fingerprinting').  md5 is identical
    across Spark/DuckDB/Python — the portable choice for oracle checks."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.where(F.col(text_col).isNotNull()).select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )
