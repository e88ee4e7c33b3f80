"""Opt-in 20× scale smoke (SPARK_GRAFT_SCALE_SMOKE=1 to run).

Replicates the sf0.1 documents table 20× (each original becomes a
20-clique of salted near-duplicates → 100k docs) and drives the heavy
dedup/text operators end-to-end, asserting OUTPUT STRUCTURE — planted
cliques found, all replicas lose their shared chunks — not wall time.
Measured wall times are recorded in SCALE.md §"Measured 20× scale
smoke"; this test exists so the experiment is reproducible, and is
skipped by default because it takes ~45 s on local[32].
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import dedup as D
from database_per_keyword_analysis_spark.operators import textquality as TQ
from database_per_keyword_analysis_spark.sources import load

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="20x scale smoke is opt-in: set SPARK_GRAFT_SCALE_SMOKE=1",
)


@pytest.fixture(scope="module")
def big(spark):
    docs = load(spark, "/root/testdata/sf0.1", "documents")
    reps = docs.crossJoin(
        F.broadcast(spark.range(20).withColumnRenamed("id", "rep"))
    )
    return (
        reps.select(
            (F.col("doc_id") * 20 + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" salt"), F.col("rep").cast("string"))
            )
            .alias("text"),
            "lang",
            "source",
        )
        .repartition(32)
        .localCheckpoint()
    )


def test_minhash_fast_finds_planted_cliques(big):
    pairs = D.minhash_near_dups(
        big, threshold=0.8, n_seeds=24, n_bands=8, hasher="xxhash64"
    )
    n = pairs.count()
    # 5,000 planted 20-cliques contribute C(20,2)·5k = 950k pairs; LSH
    # recall at J≈0.95+ is ~1, so we must see at least 90% of them
    assert n >= 0.9 * 950_000, n


def test_line_dedup_removes_replicated_chunks(big):
    lined = big.select("doc_id", D.token_line_chunks("text", 3).alias("lines"))
    out = D.line_dedup(lined)
    # every doc's chunks exist in >=20 docs -> every doc loses lines
    assert out.where("n_removed > 0").count() == big.count()


def test_unigram_lm_scores_all_docs(big):
    assert TQ.unigram_lm_scores(big).count() == big.count()
