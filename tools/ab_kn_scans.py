"""A/B the kneser_ney3 unigram-layer build (r11 verdict item 3): the
current third corpus-wide bigram explode+distinct (arm A, 3 scans) vs
deriving the bigram-TYPE table from the checkpointed trigram types +
the 2-token-doc residual (arm B, derive_bigram_types=True — the
corpus-sized distinct shuffle becomes two vocab-bounded projections).

Both arms proven bit-equal (tests/test_textquality KN block).
Protocol: same session, interleaved A/B/A/B per scale, median-of-3,
noop sink — the ab_hits_fused.py convention for single-function arms.

Usage: python tools/ab_kn_scans.py
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


def timed(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("ab-kn-scans")
    base_dir = "/root/testdata/sf0.1"
    big_dir = os.path.join(CACHE, "scale_sf1")
    if not os.path.exists(os.path.join(big_dir, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(base_dir, big_dir)
    scales = [("1x", base_dir), ("10x", big_dir)]
    out = {}
    for label, d in scales:
        docs = load(spark, d, "documents", parallel=True)
        arms = {
            "explode": lambda: TQ.kneser_ney_trigram_scores(docs),
            "derive": lambda: TQ.kneser_ney_trigram_scores(
                docs, derive_bigram_types=True
            ),
        }
        for fn in arms.values():  # un-timed warmup
            fn().write.format("noop").mode("overwrite").save()
        samples: dict[str, list[float]] = {a: [] for a in arms}
        for _ in range(3):  # interleaved A/B/A/B
            for a, fn in arms.items():
                samples[a].append(timed(fn))
        med = {a: round(sorted(s)[1], 3) for a, s in samples.items()}
        med["derive_over_explode"] = round(med["derive"] / med["explode"], 3)
        out[label] = med
        print(json.dumps({label: med}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
