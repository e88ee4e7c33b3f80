"""Measure the Kneser-Ney tier's 10x scaling curve (round 7) against
the content-disjoint 10x documents fixture (.cache/scale_sf1, from
tools/make_scale_fixture.py — Caesar-rotated replicas keep each
replica's internal bigram statistics exact while making replicas
disjoint, so bigram-TYPE count grows ~10x with N, the worst case for
the KN type tables).

Protocol: interleaved warmth (one un-timed sweep over both scales,
then adjacent 1x/10x timings), 3-iter medians, noop sink.  bigram_lm
is measured alongside as the family baseline: the delta isolates what
the KN type-table joins add.

Usage: python tools/measure_scale_kn.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark.operators import textquality as TQ  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402
from database_per_keyword_analysis_spark.sources import load  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")


def median3(fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[1], 3)


def main() -> None:
    spark = get_spark("measure-scale-kn")
    base_dir = "/root/testdata/sf0.1"
    big_dir = os.path.join(CACHE, "scale_sf1")
    if not os.path.exists(os.path.join(big_dir, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(base_dir, big_dir)

    variants = {
        "kneser_ney_scores": TQ.kneser_ney_bigram_scores,
        "kneser_ney3_scores": TQ.kneser_ney_trigram_scores,
        "bigram_lm_scores": TQ.bigram_lm_scores,
    }
    scales = [("1x", base_dir), ("10x", big_dir)]
    if "--100x" in sys.argv:
        # r7 verdict item 4: one 100x point for the worst measured
        # curve (kneser_ney3's type-table growth) — same affine-cipher
        # recipe at 100 replicas (tools/make_scale_fixture.py), same
        # interleaved protocol; the trigram tier + its family baseline
        huge_dir = os.path.join(CACHE, "scale_sf10")
        if not os.path.exists(os.path.join(huge_dir, "documents.parquet")):
            from tools.make_scale_fixture import build

            build(base_dir, huge_dir, replicas=100)
        scales = [("1x", base_dir), ("100x", huge_dir)]
        variants = {
            "kneser_ney3_scores": TQ.kneser_ney_trigram_scores,
            "bigram_lm_scores": TQ.bigram_lm_scores,
        }
    docs = {s: load(spark, d, "documents", parallel=True) for s, d in scales}
    for fn in variants.values():  # un-timed warmup sweep
        for d in docs.values():
            fn(d).write.format("noop").mode("overwrite").save()
    (s1, _), (s2, _) = scales
    for name, fn in variants.items():
        w1 = median3(lambda: fn(docs[s1]))
        w2 = median3(lambda: fn(docs[s2]))
        print(json.dumps({"q": name, s1: w1, s2: w2,
                          "ratio": round(w2 / w1, 2)}))


if __name__ == "__main__":
    main()
