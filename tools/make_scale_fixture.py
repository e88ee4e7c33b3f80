"""Derive a 10x documents fixture from sf0.1 for the scaling-curve
measurement (round-4 advice item 5): .cache/scale_sf1/documents.parquet.

Replica 0 is the sf0.1 corpus verbatim; replicas 1-9 offset doc_id by
10M*i and apply a per-replica Caesar rotation of the a-z alphabet to
the text — so replicas are CONTENT-DISJOINT (no shared shingles /
char-gram fingerprints / lines across replicas) while each replica
keeps the original's INTERNAL dup/near-dup structure EXACTLY (a
character bijection preserves token lengths, repetition patterns, and
every within-replica similarity relation).  That is the scaling shape
that matters: duplicate GROUP COUNT grows 10x with N, group SIZES and
similarity geometry stay fixed — so connected-components round counts
should track cluster diameter (unchanged), not N, and the hash-shuffle
families should grow ~linearly.

Two rejected designs, for the record: a naive 10x copy welds every doc
into a 10-clique (measures an unrealistic problem), and per-token
"r{i}_" PREFIXING injects the same 3-char substring every ~6 chars —
which floods the char-k-gram winnowing space with mid-frequency
fingerprints and blew winnowing_pairs up 40x instead of 10x (measured;
the prefix, not the operator, was the super-linearity).

Usage: python tools/make_scale_fixture.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402

N_REPLICAS = 10
ID_STRIDE = 10_000_000


def _alphabet_bijections(n: int) -> list[str]:
    """`n` distinct substitution alphabets as affine ciphers
    j → (a·j + b) mod 26 with gcd(a, 26)=1 — 12 units × 26 offsets =
    312 distinct bijections, enough for a 100x (round-8) fixture.  The
    enumeration order makes the first 13 non-identity maps exactly the
    legacy even-shift Caesars (a=1, b=2i), so replicas 0-9 of every
    fixture built since round 4 are reproduced bit-identically and the
    historical 10x SCALE.md rows stay comparable.  Like the Caesar
    rotation, every affine map is a character bijection: token
    lengths, repetition patterns and all within-replica similarity
    structure are preserved exactly; replica vocabularies are images
    of one source vocab under distinct bijections (disjoint up to rare
    cross-map word collisions), so bigram TYPE count grows ~n with N —
    the KN type-table worst case."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    units = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
    pairs = [(1, b) for b in range(2, 26, 2)]  # legacy Caesars first
    pairs += [(1, b) for b in range(1, 26, 2)]
    pairs += [(a, b) for a in units[1:] for b in range(26)]
    maps = []
    for a, b in pairs[: n - 1]:
        maps.append("".join(alpha[(a * j + b) % 26] for j in range(26)))
    return maps


def _cjk_blocks(n: int) -> list[str]:
    """`n` DISJOINT 36-codepoint caseless alphabets from the CJK block
    (0x4E00+): replica i maps a-z0-9 (and A-Z onto the same 26 targets,
    since the gram hashers lower() first) to its own codepoints, so
    char k-grams are exactly disjoint across replicas — the guarantee
    the affine ciphers cannot give (100 substitution maps over one
    26-letter alphabet share grams by pigeonhole; measured: +0.68%
    winnowing-group rows at 100x).  CJK is caseless (lower() is the
    identity) and combining-free, so no case fold can weld two
    replicas' blocks.  Residual cross-replica grams would need 16
    consecutive non-alphanumeric chars post-normalization — the
    output-contract assert in measure_scale_r12.py is the watchdog."""
    return [
        "".join(chr(0x4E00 + 36 * i + j) for j in range(36))
        for i in range(n - 1)
    ]


def build(
    src_sf_dir: str,
    out_dir: str,
    replicas: int = N_REPLICAS,
    disjoint_grams: bool = False,
) -> str:
    spark = get_spark("make-scale-fixture")
    docs = spark.read.parquet(os.path.join(src_sf_dir, "documents.parquet"))
    alpha = "abcdefghijklmnopqrstuvwxyz"
    text = F.col("text")
    if disjoint_grams:
        digits = "0123456789"
        src_syms = alpha + alpha.upper() + digits
        for i, block in enumerate(_cjk_blocks(replicas), start=1):
            mapped = block[:26] + block[:26] + block[26:]
            text = F.when(
                F.col("rep") == i, F.translate(F.col("text"), src_syms, mapped)
            ).otherwise(text)
    else:
        for i, mapped in enumerate(_alphabet_bijections(replicas), start=1):
            text = F.when(
                F.col("rep") == i, F.translate(F.col("text"), alpha, mapped)
            ).otherwise(text)
    rep = docs.crossJoin(
        spark.range(replicas).select(F.col("id").cast("int").alias("rep"))
    )
    tagged = rep.select(
        (F.col("doc_id") + F.col("rep").cast("long") * ID_STRIDE).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    out = os.path.join(out_dir, "documents.parquet")
    tagged.repartition(32).write.mode("overwrite").parquet(out)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "scale_sf1",
    )
    print(build(src, dst))
