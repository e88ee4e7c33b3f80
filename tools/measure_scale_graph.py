"""Graph-family scale points at DEFAULT heap with the AUTO posture
(round 9, r8 verdict items 3-4).

Two questions, both answered by running the catalog's own graph
queries against the 100x TPC-H key-offset fixture (~58M distinct
edges, ~1.6M nodes) under the repo's 8 GiB default heap:

1. pagerank auto-posture (item 3): broadcast_ranks is now DERIVED
   from the measured node count (graph.GRAPH_BROADCAST_MAX_NODES);
   at 1.6M nodes the auto path must pick the shuffle posture and the
   run must PASS where the former manual broadcast default died with
   UNABLE_TO_ACQUIRE_MEMORY (SCALE.md round-8 addendum).
2. label propagation's 100x point (item 4): the r8 round's worst 10x
   curve (3.46x) only had one decade measured; this adds the second.

Protocol: interleaved warmth (un-timed 1x+100x sweep first), then
median-of-N adjacent timings, noop sink — measure_scale_tpch.py's
protocol.  The fixture is .cache/scale_tpch10 (built by
measure_scale_tpch.py --100x if absent).

Usage:
    python tools/measure_scale_graph.py [--iters N] [--queries a,b]
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
BASE = "/root/testdata/sf0.1"

QUERIES = ["purchase_graph_pagerank", "purchase_graph_communities"]


def run_once(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def median_n(fn, n):
    return round(sorted(run_once(fn) for _ in range(n))[n // 2], 3)


def _fixture_dir() -> str:
    big = os.path.join(CACHE, "scale_tpch10")
    if not os.path.exists(os.path.join(big, "lineitem.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(BASE, big, replicas=100)
    d = os.path.join(CACHE, "scale_graph100")
    os.makedirs(d, exist_ok=True)
    for t in ("orders", "lineitem"):
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(big, f"{t}.parquet"), dst)
    return d


def main() -> None:
    iters = 3
    queries = QUERIES
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    if "--queries" in sys.argv:
        queries = sys.argv[sys.argv.index("--queries") + 1].split(",")
    assert os.environ.get("DPKA_DRIVER_MEMORY") in (None, "8g"), (
        "this harness exists to prove the DEFAULT-heap posture; unset "
        "DPKA_DRIVER_MEMORY"
    )
    spark = get_spark("measure-scale-graph")
    big = _fixture_dir()
    qs = catalog.queries()
    for d in (BASE, big):  # un-timed warmup sweep
        for name in queries:
            run_once(lambda: qs[name](spark, d))
    for name in queries:
        w1 = median_n(lambda: qs[name](spark, BASE), iters)
        w100 = median_n(lambda: qs[name](spark, big), iters)
        print(
            json.dumps(
                {
                    "q": name,
                    "heap": "8g(default)",
                    "posture": "auto",
                    "1x": w1,
                    "100x": w100,
                    "ratio": round(w100 / w1, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
