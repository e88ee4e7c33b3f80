"""Probe: where does connected_components time go, and what does a
geometric round schedule buy?  Times dup_groups end-to-end on the real
winnowing / semantic pair lists at sf0.1 under different
steps_per_round values, interleaved A/B/A/B in one session.

Usage: python tools/probe_cc_rounds_r14.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.operators import dedup as D  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def run(spark, qname, arm_steps_per_round):
    import database_per_keyword_analysis_spark.operators.dedup as dd

    orig = dd.connected_components

    # keep the original parameter name (r14 advice item 3): a keyword
    # callsite passing steps_per_round= must bind, not TypeError —
    # the probe's arm value overrides whatever arrives
    def patched(pairs, src="doc_a", dst="doc_b", max_iter=50,
                shortcut_after=2, steps_per_round=2):
        del steps_per_round  # overridden by the probe's arm value
        return orig(pairs, src, dst, max_iter, shortcut_after,
                    arm_steps_per_round)

    dd.connected_components = patched
    try:
        t0 = time.perf_counter()
        df = catalog.queries()[qname](spark, SF)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # orig's body writes `connected_components.last_iterations`,
        # which resolves to the PATCHED global while we are patched
        iters = getattr(dd.connected_components, "last_iterations", None)
    finally:
        dd.connected_components = orig
    spark.catalog.clearCache()
    return dt, iters


def main():
    spark = get_spark("probe-cc")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries = ["winnowing_dup_groups", "semantic_dedup"]
    arms = [1, 2]
    res = {q: {a: [] for a in arms} for q in queries}
    for trip in range(3):
        order = arms if trip % 2 == 0 else arms[::-1]
        for a in order:
            for q in queries:
                dt, iters = run(spark, q, a)
                res[q][a].append((round(dt, 2), iters))
                print(f"trip {trip} steps/round={a} {q}: {dt:.2f}s "
                      f"iters={iters}", flush=True)
    print("RESULT", res)
    spark.stop()


if __name__ == "__main__":
    main()
