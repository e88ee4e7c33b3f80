"""Measure the relational/TPC-H family's 10x scaling curve (round 7) —
noop sink; catalog queries run unmodified (no knobs exist to retune —
the point of the family).

Protocol note vs the other SCALE.md curves: a first draft measured the
whole 1x block before the 10x block and got 10x medians BELOW 1x —
pricing_summary 6.2 s at 1x vs 2.6 s at 10x — because the 1x block was
absorbing global JVM/C2 warmup (per-query cold-then-warm does not
amortize it; Spark internals JIT across MANY plan executions).  So:
one full un-timed warmup sweep over every (query, scale) pair first,
then per query the 1x and 10x timings taken ADJACENTLY (3 iters each,
median) so the pair shares identical warmth.

Fixture: .cache/scale_tpch1 from tools/make_scale_fixture_tpch.py
(key-offset replicas: 10x key cardinality, identical per-key fanout,
shared 25-row nation / 5-row region dims so per-nation groups grow 10x
as at a real 10x SF).

Queries: one per distinct physical shape in the decorrelation batch —
scan-agg (Q1), left-outer double agg (Q13), per-group scalar join-back
(Q17), HAVING + join-back top-k (Q18), multi-join share-of-total (Q8),
EXISTS/NOT-EXISTS self-joins (Q21), plus the round-7 second-batch
join trees: profit multi-join (Q9) and residual-inequality
conditional-count join (Q12).

Usage: python tools/measure_scale_tpch.py   (one JSON line per
measurement; transcribe into SCALE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")

QUERIES = [
    "pricing_summary",
    "customer_order_distribution",
    "small_quantity_revenue",
    "large_volume_orders",
    "nation_market_share",
    "supplier_wait_blame",
    "nation_profit",
    "late_shipment_priority",
]


def run_once(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def median3(fn):
    ts = sorted(run_once(fn) for _ in range(3))
    return round(ts[1], 3)


def main() -> None:
    spark = get_spark("measure-scale-tpch")

    base_dir = "/root/testdata/sf0.1"
    big_dir = os.path.join(CACHE, "scale_tpch1")
    big_label = "10x"
    queries = QUERIES
    if "--100x" in sys.argv:
        # r7 verdict item 4: one 100x point for the worst measured
        # relational curve (Q13: both join sides grow) — key-offset
        # recipe at 100 replicas, same interleaved protocol
        big_dir = os.path.join(CACHE, "scale_tpch10")
        big_label = "100x"
        queries = ["customer_order_distribution"]
        if not os.path.exists(os.path.join(big_dir, "lineitem.parquet")):
            from tools.make_scale_fixture_tpch import build

            build(base_dir, big_dir, replicas=100)
    elif not os.path.exists(os.path.join(big_dir, "lineitem.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(base_dir, big_dir)

    qs = catalog.queries()
    for sf_dir in (base_dir, big_dir):  # un-timed global warmup sweep
        for name in queries:
            run_once(lambda: qs[name](spark, sf_dir))

    for name in queries:
        w1 = median3(lambda: qs[name](spark, base_dir))
        w10 = median3(lambda: qs[name](spark, big_dir))
        print(
            json.dumps(
                {
                    "q": name,
                    "1x": w1,
                    big_label: w10,
                    "ratio": round(w10 / w1, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
