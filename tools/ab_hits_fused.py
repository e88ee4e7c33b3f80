"""A/B the HITS probe shapes (round-11; r10 verdict item 3).

Both arms run the exact `purchase_graph_hits` dataflow — the shared
`_purchase_edges` build feeding `graph.hits_fixed` — differing ONLY in
the probe shape:

  two-probe : the r10 Jacobi form — per iteration, the |E|-row
              DISK_ONLY edge persist is joined twice (hub pass +
              authority pass), 2 joins + 2 aggregates;
  fused     : ONE union-keyed routing table (2|E| rows, built once)
              joined once per iteration against the (node, kind)
              score table, 1 join + 1 aggregate.

The per-(node, kind) DECIMAL message multiset is identical, so the
arms are bit-equal (tests/test_graph.py pins it) and the oracle is
untouched — this is purely a physical-plan race.

Protocol: measure_scale_tpch.py's — un-timed warmup sweep of both
arms at both scales, then interleaved (A,B,A,B,...) timed trips,
median-of-N per arm, noop sink.  Scales: 1x = /root/testdata/sf0.1,
10x = .cache/scale_tpch1 (key-offset replicas; built if absent).

Usage:
    python tools/ab_hits_fused.py [--iters N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.operators import graph as G  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")
BASE = "/root/testdata/sf0.1"


def _fixture_dir() -> str:
    d = os.path.join(CACHE, "scale_tpch1")
    if not os.path.exists(os.path.join(d, "lineitem.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(BASE, d, replicas=10)
    return d


def run_once(spark, sf_dir: str, fused: bool) -> float:
    t0 = time.perf_counter()
    edges = catalog._purchase_edges(spark, sf_dir)
    G.hits_fixed(edges, fused=fused).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def main() -> None:
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    spark = get_spark("ab-hits-fused")
    big = _fixture_dir()
    for d in (BASE, big):  # un-timed warmup, both arms
        for fused in (False, True):
            run_once(spark, d, fused)
    for label, d in (("1x", BASE), ("10x", big)):
        times: dict[bool, list[float]] = {False: [], True: []}
        for _ in range(iters):  # interleaved adjacent trips
            for fused in (False, True):
                times[fused].append(run_once(spark, d, fused))
        med = lambda xs: round(sorted(xs)[len(xs) // 2], 3)
        two, fus = med(times[False]), med(times[True])
        print(
            json.dumps(
                {
                    "scale": label,
                    "two_probe": two,
                    "fused": fus,
                    "fused_over_two_probe": round(fus / two, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
