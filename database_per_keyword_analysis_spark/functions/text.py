"""Tier-A text pipeline: normalize → tokenize → token filters, entirely
in built-in column expressions (SURVEY.md §2.9).

The reference's NLP stage is a row-at-a-time Python loop over hazm
(normalize, tokenize, POS-filter, lemmatize, stopword-filter —
/root/reference/main.py:440-567).  Tier A re-expresses the deterministic
parts as Catalyst expressions (regexp_replace / split / explode / rlike):
oracle-checkable and 10-100× faster than a Python loop since everything
stays in whole-stage codegen.  Tier B (hazm-faithful normalizer/POS/
lemmatizer behind a pandas_udf) is deliberately NOT oracle-checked —
the reference's own POS output is environment-dependent (its fallback
keeps all tokens when the HF model is absent, main.py:478-481).

Persian-specific rules mirror hazm's Normalizer config (main.py:132-135):
char unification (ي→ی, ك→ک), diacritics strip, repeated-char squeeze,
whitespace normalization.  They are no-ops on ASCII fixtures and are
covered by unit tests rather than the DuckDB oracle (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Arabic-presentation → Persian canonical forms + diacritics, per hazm's
# unicode replacement / remove_diacritics steps.
_CHAR_MAP = {"ي": "ی", "ك": "ک", "ؤ": "و", "ة": "ه", "ۀ": "ه", "إ": "ا", "أ": "ا"}
_DIACRITICS = "ًٌٍَُِّْٰ"
ZWNJ = "‌"


def normalize_text(col: Column | str) -> Column:
    """Deterministic normalizer chain (U1 Tier A): char unification,
    diacritics strip, 3+ repeated-char squeeze to 2, lowercase,
    whitespace collapse."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, "".join(_CHAR_MAP), "".join(_CHAR_MAP.values()))
    c = F.translate(c, _DIACRITICS, "")
    # lowercase BEFORE the repeat-squeeze: case folding can create new
    # 3-runs ('ÞÞþ' → 'þþþ'), which would break normalize∘normalize ≡
    # normalize (the idempotence property tests rely on)
    c = F.lower(c)
    c = F.regexp_replace(c, r"(.)\1{2,}", "$1$1")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokenize(col: Column | str) -> Column:
    """Tokenize to ArrayType(String) (U3 Tier A): punctuation → space
    (ZWNJ preserved inside words, as hazm does), then split on whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[^\w؀-ۿ‌@.:/]+", " ")
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


@dataclass(frozen=True)
class TokenFilterSpec:
    """The U6 strict token filters (main.py:488-510), as data.

    `ascii_rule` is the reference's "all-ASCII and (len>7 or in junk
    list)" drop — faithful for a Persian corpus, but it deletes ordinary
    long English words, so English-corpus queries disable it.
    """

    min_len: int = 3
    drop_digits: bool = True
    drop_weblike: bool = True  # http/www/.com/.ir/@.../id:/bot
    charset: str | None = r"^[\w؀-ۿ‌]+$"
    ascii_rule: bool = False
    ascii_junk: tuple[str, ...] = ("landing", "saamim", "click", "join", "admin")
    ascii_max_len: int = 7


REFERENCE_SPEC = TokenFilterSpec(ascii_rule=True)
ENGLISH_SPEC = TokenFilterSpec(ascii_rule=False)


def token_keep_predicate(tok: Column, spec: TokenFilterSpec) -> Column:
    """Keep-predicate for one token column under `spec` — pure built-ins,
    applied after explode so Catalyst can pipeline it with the count."""
    keep = F.length(tok) >= spec.min_len
    if spec.drop_digits:
        keep = keep & ~tok.rlike(r"\d")
    if spec.drop_weblike:
        keep = keep & ~tok.rlike(r"http|www|\.com|\.ir|@|id:|bot")
    if spec.charset:
        keep = keep & tok.rlike(spec.charset)
    if spec.ascii_rule:
        is_ascii = tok.rlike(r"^[a-zA-Z]+$")
        junk = tok.isin(*spec.ascii_junk)
        keep = keep & ~(is_ascii & ((F.length(tok) > spec.ascii_max_len) | junk))
    return keep


def snippet(col: Column | str, n: int = 100) -> Column:
    """Display snippet (C5; main.py:918): first n chars, newlines →
    spaces, ellipsis appended."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.regexp_replace(F.substring(c, 1, n), r"\n", " "), F.lit("...")
    )


# A small fixed Persian corpus for oracle-checking the Persian-specific
# normalizer behavior (char unification, diacritics strip, ZWNJ-aware
# tokenization) that the English parquet fixtures never exercise — each
# string targets one rule.  Newline- and apostrophe-free BY CONTRACT:
# the DuckDB replay of the repeat-squeeze is character-level (RE2 has
# no backreferences), which matches Java's `(.)\1{2,}` everywhere
# except newline runs (Java's dot excludes them), and the strings embed
# into a SQL VALUES list.
PERSIAN_FIXTURE: tuple[str, ...] = (
    # Arabic-presentation yeh/kaf unify to Persian ی/ک: both spellings
    # of 'یک کتاب' must count as the SAME tokens
    "علي يك كتاب خوب دارد",
    "علی یک کتاب خوب دارد",
    # diacritics strip: کتابِ/خوبً collapse onto the bare forms
    "کتابِ خوبً عالی است",
    # ZWNJ survives inside tokens (می‌خواهم stays ONE token)
    "می‌خواهم کتاب‌ها را بخوانم",
    # 3+ repeated chars squeeze to exactly 2
    "سلاااام عالییییی کتاب",
    # weblike tokens drop; ASCII junk words drop; short ASCII survives
    "تماس با http://example.ir یا @kanal یا id:123",
    "landing admin click wonderful salam کتاب",
    # ASCII digits drop the token; Persian digits pass the charset
    "سال 1402 و ۱۴۰۲ بود",
    # whitespace variety collapses; short tokens (<3) drop
    "متن\tخوب   متن با او",
)
