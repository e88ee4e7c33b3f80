"""Corpus curation: the end-to-end per-document keep/drop decision a
training-data pipeline consumes.

The reference stops at per-slice reports (/root/reference/main.py:385-437);
a 100 TB pretraining pipeline instead needs ONE verdict per document with
an auditable reason.  `curate` composes three already-independent stages —
quality metrics (operators/textquality.py), exact dedup (operators/
dedup.py:exact_duplicates) and near-dup group decisions (operators/
dedup.py:minhash_dup_groups) — into (doc_id, metrics..., exact_dup,
near_dup, drop_reason, keep), with a fixed reason precedence:

    exact_duplicate > near_duplicate > too_short > high_punctuation

Scale design: every input is a per-doc_id table — the quality metrics are
scan-stage column expressions (zero shuffle), exact dedup shuffles
(fingerprint, id) and never text, the near-dup tier is the banded
MinHash+LSH path (candidate-bounded, see SCALE.md) — and the final
assembly is two left equi-joins on doc_id, which co-partition after one
hash shuffle.  No stage is all-pairs; no stage collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import textquality as TQ


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic subsample of a corpus to ≈ `budget_tokens` total
    tokens: keep each doc with probability budget/total via a uniform
    hash of its id (md5-derived, the repo's portable-hash idiom), so the
    same corpus and budget always select the same docs.

    Scale design: the exact way to hit a budget — global sort by hash +
    running token sum — serializes an unbounded window on one partition,
    so this uses hash-threshold Bernoulli instead: one map-side token
    count, one scalar total (broadcast via cross join, not collected),
    one filter.  Expected kept tokens = budget exactly; the realized
    total concentrates within O(sqrt) sampling noise, the right trade at
    100 TB where the "budget" is itself a target, not an invariant.
    Returns (doc_id, n_tokens_ws, u) for the kept docs, u being the
    doc's uniform draw (audit column: kept ⇔ u < budget/total).
    """
    n = TQ.ws_token_count(F.col(text_col))
    counted = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), n.alias("n_tokens_ws")
    )
    total = counted.agg(
        F.sum(F.col("n_tokens_ws").cast("long")).alias("total_tokens")
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(2**48))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .withColumn("u", u)
        .where(
            F.col("u")
            < F.least(
                F.lit(1.0),
                F.lit(float(budget_tokens))
                / F.greatest(F.col("total_tokens"), F.lit(1)).cast("double"),
            )
        )
        .select("doc_id", "n_tokens_ws", "u")
        .orderBy("doc_id")
    )


def apply_curation(docs: DataFrame, verdict: DataFrame) -> DataFrame:
    """Filter a corpus to its kept documents: semi-join `docs` against the
    keep side of a `curate` verdict on doc_id.  Keeps every original
    column; the join is an equi-join on the id (broadcast or shuffle as
    the optimizer prefers), so applying a verdict to a 100 TB corpus is
    one co-partitioned pass."""
    return docs.join(
        verdict.where(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )


def curate(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.30,
    near_threshold: float = 0.8,
) -> DataFrame:
    """Per-document curation decision over a corpus.

    Returns (doc_id, n_tokens_ws, punct_ratio, exact_dup, near_dup,
    drop_reason, keep): `keep` is true iff no drop reason fires;
    `drop_reason` is the highest-precedence failure (NULL when kept).
    Duplicate KEEPERS (rank 1 in their group) are kept — only the
    non-keeper members of a duplicate group are dropped, so applying the
    decision never loses content, it only removes redundancy.
    """
    quality = TQ.quality_metrics(docs, text_col).select(
        "doc_id", "n_tokens_ws", "punct_ratio"
    )
    exact = D.exact_duplicates(docs, text_col).select(
        "doc_id", F.col("is_duplicate").alias("exact_dup")
    )
    near = D.minhash_dup_groups(docs, text_col, threshold=near_threshold).select(
        "doc_id", F.col("is_duplicate").alias("near_dup")
    )
    return (
        quality.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens_ws",
            "punct_ratio",
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
            F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
        )
        .withColumn(
            "drop_reason",
            F.when(F.col("exact_dup"), F.lit("exact_duplicate"))
            .when(F.col("near_dup"), F.lit("near_duplicate"))
            .when(F.col("n_tokens_ws") < min_tokens, F.lit("too_short"))
            .when(F.col("punct_ratio") > max_punct_ratio, F.lit("high_punctuation")),
        )
        .withColumn("keep", F.col("drop_reason").isNull())
        .orderBy("doc_id")
    )
