"""Streaming curation gate: the stateless document-quality tiers
(token/punctuation quality, PII scrubbing) applied to a DOCUMENT
STREAM — filter and scrub training data as it arrives, before it ever
lands in the corpus.

These tiers are pure column projections (SCALE.md §Text analysis), so
they lift to Structured Streaming unchanged — ONE select per
micro-batch, no joins (a stream-stream self-join would demand
watermark state for what is algebraically a projection), no state
store, append mode.  Stateful tiers (dedup, LM scoring — anything
needing corpus-wide aggregates) stay batch; the standard pipeline is
stream-scrub on ingest, batch-dedup per snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pii as PII
from ..operators import textquality as TQ


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`documents` as a parquet-directory stream (schema from a
    footer-only batch read, as the events stream reader does)."""
    static_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    return (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_quality_gate(
    docs: DataFrame,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.30,
    text_col: str = "text",
) -> DataFrame:
    """Quality-gate a document stream: drop too-short / punctuation-heavy
    docs and scrub PII from the survivors.  Returns (doc_id, lang,
    source, n_tokens_ws, punct_ratio, redacted, n_redactions) in append
    mode.  Works identically on a batch DataFrame (same expressions),
    which is what the parity test asserts.
    """
    c = F.col(text_col)
    n_ws = TQ.ws_token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    punct_ratio = n_punct.cast("double") / F.length(c).cast("double")
    n_red = (
        PII._count(c, PII.EMAIL_PATTERN)
        + PII._count(c, PII.PHONE_PATTERN)
        + PII._count(c, PII.IPV4_PATTERN)
    )
    return (
        docs.where(c.isNotNull())
        .select(
            "doc_id",
            "lang",
            "source",
            n_ws.alias("n_tokens_ws"),
            punct_ratio.alias("punct_ratio"),
            PII.redact_text(c).alias("redacted"),
            n_red.alias("n_redactions"),
        )
        .where(
            (F.col("n_tokens_ws") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
        )
    )
