"""Tier-B NLP: hazm-faithful normalize → tokenize → POS-filter →
lemmatize behind Arrow-vectorized pandas UDFs (SURVEY.md §2.9 Tier B).

The reference runs hazm row-by-row in a Python for-loop
(/root/reference/main.py:456-513).  Tier B keeps hazm's exact behavior
but executes it as `pandas_udf` batches: Arrow transfer + per-batch
Python, ~10-100× less interpreter overhead than per-row UDFs, and the
models are loaded ONCE PER EXECUTOR (module-level lazy singleton), not
per row or per batch.

hazm is NOT installed in this container, so every stage degrades exactly
the way the reference itself degrades when its models are missing
(main.py:478-481 keeps all tokens when the POS tagger is absent):

  * normalizer absent  → Tier-A regex chain (functions/text.py)
  * tokenizer absent   → Tier-A whitespace/punct split
  * POS tagger absent  → keep all tokens (reference-sanctioned fallback)
  * lemmatizer absent  → identity, plus the reference's `past#present`
    verb-lemma split rule (main.py:484-486) applied to any token that
    carries a '#'

`tier_b_available()` reports which stages are real; Tier B is never
oracle-checked either way (SURVEY.md §7.4: even the reference's own
output is environment-dependent).

Placement rule for 100 TB: these UDFs are opaque to Catalyst, so call
them AFTER all built-in filters/projections (pushdown and pruning happen
upstream of the Arrow exchange).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@lru_cache(maxsize=1)
def _hazm():
    """Per-process lazy singleton of hazm tools (None if unavailable)."""
    try:
        import hazm
    except ImportError:
        return None
    return {
        "normalizer": hazm.Normalizer(persian_numbers=False),
        "lemmatizer": hazm.Lemmatizer(),
        "tokenize": hazm.word_tokenize,
    }


@lru_cache(maxsize=1)
def _pos_tagger():
    """POS tagger needs a downloaded model (main.py:210-218) — treated
    as a separately-missing dependency, like the reference does."""
    try:
        import hazm

        return hazm.POSTagger(model="pos_tagger.model")
    except Exception:
        return None


def tier_b_available() -> dict[str, bool]:
    h = _hazm() is not None
    return {
        "normalizer": h,
        "tokenizer": h,
        "lemmatizer": h,
        "pos_tagger": _pos_tagger() is not None,
    }


def _fallback_normalize(s: pd.Series) -> pd.Series:
    """Pandas twin of the Tier-A normalizer chain (kept in sync with
    functions/text.py:normalize_text)."""
    out = s.fillna("")
    for src, dst in zip("يكؤةۀإأ", "یکوههاا"):
        out = out.str.replace(src, dst, regex=False)
    out = out.str.replace(r"[ًٌٍَُِّْٰ]", "", regex=True)
    # lower BEFORE the repeat-squeeze, matching text.py:normalize_text —
    # case folding can create new 3-runs ('AAa' → 'aaa' must squeeze)
    out = out.str.lower()
    out = out.str.replace(r"(.)\1{2,}", r"\1\1", regex=True)
    return out.str.replace(r"\s+", " ", regex=True).str.strip()


@pandas_udf(T.StringType())
def normalize_b(s: pd.Series) -> pd.Series:
    h = _hazm()
    if h is None:
        return _fallback_normalize(s)
    return s.fillna("").map(h["normalizer"].normalize)


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_b(s: pd.Series) -> pd.Series:
    h = _hazm()
    if h is None:
        return s.fillna("").str.replace(
            r"[^\w؀-ۿ‌@.:/]+", " ", regex=True
        ).str.strip().str.split(r"\s+")
    return s.fillna("").map(h["tokenize"])


@pandas_udf(T.ArrayType(T.StringType()))
def pos_keep_nouns_adjectives(tokens: pd.Series) -> pd.Series:
    """U4: keep tokens tagged N*/AJ*; absent tagger → keep all
    (the reference's own fallback, main.py:478-481)."""
    tagger = _pos_tagger()
    if tagger is None:
        return tokens
    return tokens.map(
        lambda ts: [w for w, tag in tagger.tag(list(ts)) if tag[:1] == "N" or tag[:2] == "AJ"]
    )


def _split_hash_lemma(lemma: str) -> str:
    """Reference rule main.py:484-486: verb lemma 'past#present' → past."""
    return lemma.split("#", 1)[0] if "#" in lemma else lemma


@pandas_udf(T.ArrayType(T.StringType()))
def lemmatize_b(tokens: pd.Series) -> pd.Series:
    h = _hazm()
    if h is None:
        return tokens.map(lambda ts: [_split_hash_lemma(t) for t in ts])
    lem = h["lemmatizer"].lemmatize
    return tokens.map(lambda ts: [_split_hash_lemma(lem(t)) for t in ts])


def tier_b_tokens(text_col: Column | str) -> Column:
    """Full U1→U5 Tier-B pipeline as one column expression:
    normalize → tokenize → POS filter → lemmatize."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return lemmatize_b(pos_keep_nouns_adjectives(tokenize_b(normalize_b(c))))
