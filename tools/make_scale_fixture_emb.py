"""Derive a 10x embeddings fixture from sf0.1 for the embedding/ANN
scaling-curve measurement (round-5 judge item 7):
.cache/scale_emb1/embeddings.parquet.

Replica 0 is the sf0.1 table verbatim; replicas 1-9 offset vec_id by
1M*i and apply a per-replica CYCLIC COORDINATE SHIFT to the embedding
(rotate the 64 dims by 6*i).  A coordinate permutation is orthogonal,
so every within-replica dot product, norm, and cosine is preserved
EXACTLY — each replica keeps the original's cluster geometry, near-dup
pairs, and kNN structure bit-for-bit — while cross-replica cosines
between a vector and its shifted copy are generically near zero (the
shifted axes decorrelate), so replicas stay geometry-disjoint: cluster
COUNT grows 10x, cluster shapes and sizes stay fixed.  That is the
scaling shape that matters for IVF/SemDeDup: n_lists-per-data ratio is
preserved by scaling n_lists 10x at measurement time (the knob the
module doc ties to sqrt(N)), and in-cluster pair work should then grow
~linearly with N, not quadratically.

A naive 10x copy was rejected for the same reason as the documents
fixture: identical replicas weld each vector into a 10-clique of
perfect duplicates, turning the dedup measurement into an unrealistic
all-ones similarity problem.

Usage: python tools/make_scale_fixture_emb.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402

N_REPLICAS = 10
ID_STRIDE = 1_000_000
DIM = 64


def build(src_sf_dir: str, out_dir: str) -> str:
    spark = get_spark("make-scale-fixture-emb")
    emb = spark.read.parquet(os.path.join(src_sf_dir, "embeddings.parquet"))
    rep = emb.crossJoin(
        spark.range(N_REPLICAS).select(F.col("id").cast("int").alias("rep"))
    )
    # cyclic shift by 6*rep positions: element i of the output reads
    # element ((i + 6*rep) mod DIM) of the input — pure JVM-side
    # higher-order arithmetic, no UDF
    shifted = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: F.element_at(
            "embedding",
            ((i + F.col("rep") * 6) % DIM + 1).cast("int"),
        ),
    )
    tagged = rep.select(
        (F.col("vec_id") + F.col("rep").cast("long") * ID_STRIDE).alias("vec_id"),
        F.when(F.col("rep") == 0, F.col("embedding"))
        .otherwise(shifted)
        .alias("embedding"),
        "label",
    )
    out = os.path.join(out_dir, "embeddings.parquet")
    tagged.repartition(32).write.mode("overwrite").parquet(out)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "scale_emb1",
    )
    print(build(src, dst))
