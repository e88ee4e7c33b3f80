"""Round-11 100x points for the two continuation members the r10
table could not measure honestly (r10 verdict item 4):

* customer_linkage_scores — 100x CARDINALITY-CONTROLLED customers
  (make_scale_fixture_linkage: key-offset replicas with ED-isolated
  name tags, so candidates/pairs/output are exactly 100x the base —
  wall-vs-output honesty restored; the r10 10x row measured 14.45x
  wall for 191.8x OUTPUT on name-welded replicas).
* doc_containment_pairs — 100x content-disjoint documents (the
  affine-bijection replicas of make_scale_fixture): no shared
  shingles across replicas, so the asymmetric prefix join's
  candidates and the directed output stay per-replica.

The harness asserts the output-cardinality contract (100x rows ==
100 * 1x rows) before timing, so a fixture regression cannot
silently turn the row back into an artifact.

Protocol: interleaved warmth (un-timed 1x/100x sweep), median-of-3,
noop sink — measure_scale_tpch.py's protocol.

Usage: python tools/measure_scale_r11.py [--queries a,b]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402
from tools.measure_scale_r10 import (  # noqa: E402
    BASE,
    _fixture_dir,
    median3,
    run_once,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")


def _linkage100x() -> str:
    d = os.path.join(CACHE, "scale_linkage100")
    if not os.path.exists(os.path.join(d, "customer.parquet")):
        from tools.make_scale_fixture_linkage import build

        build(BASE, d, replicas=100)
    return d


def _docs100x() -> str:
    d = os.path.join(CACHE, "scale_sf10")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(BASE, d, replicas=100)
    return d


def _novel_fixtures() -> dict:
    """10x fixtures for the round-11 novel queries (the per-addition
    measured-curve standard): events user-replicas for the sketch and
    streaming members, the TPC-H key-offset graph for the weighted
    relaxation, content-disjoint docs for the NPMI pair join, orders
    replicas for the MAD report."""
    from tools.measure_scale_r10 import _docs10x, _events10x, _tpch10x

    tpch_graph = _fixture_dir(
        {
            "orders": _tpch10x("orders"),
            "lineitem": _tpch10x("lineitem"),
            "customer": _tpch10x("customer"),
            "nation": os.path.join(BASE, "nation.parquet"),
        },
        tag="_r11",
    )
    return {
        "events_kmv_distinct": (BASE, _events10x()),
        "events_hll_distinct": (BASE, _events10x()),
        "stream_event_heavy_hitters": (BASE, _events10x()),
        "purchase_cheapest_paths": (BASE, tpch_graph),
        "doc_cooccurrence_npmi": (BASE, _docs10x()),
        "order_price_mad_outliers": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}, tag="_r11"),
        ),
        "doc_boolean_search": (BASE, _docs10x()),
        "event_trend_break": (BASE, _events10x()),
        "event_type_trends_robust": (BASE, _events10x()),
    }


def main() -> None:
    only = None
    if "--queries" in sys.argv:
        only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
    spark = get_spark("measure-scale-r11")
    if "--100x" in sys.argv:
        # the round-11 candidates that could hide a knee: the weighted
        # relaxation (iterative graph) and the NPMI pair join (the
        # only quadratic stage) — 100x fixtures reuse the established
        # key-offset TPC-H graph and content-disjoint docs recipes
        from tools.measure_scale_r10 import _tpch100x

        fixtures = {
            "purchase_cheapest_paths": (
                BASE,
                _fixture_dir(
                    {
                        "orders": _tpch100x("orders"),
                        "lineitem": _tpch100x("lineitem"),
                        "customer": _tpch100x("customer"),
                        "nation": os.path.join(BASE, "nation.parquet"),
                    },
                    tag="_r11_100x",
                ),
            ),
            "doc_cooccurrence_npmi": (BASE, _docs100x()),
        }
        if only:
            fixtures = {k: v for k, v in fixtures.items() if k in only}
        qs = catalog.queries()
        for name, dirs in fixtures.items():
            for d in dirs:
                run_once(lambda: qs[name](spark, d))
        for name, (d1, dbig) in fixtures.items():
            w1 = median3(lambda: qs[name](spark, d1))
            wbig = median3(lambda: qs[name](spark, dbig))
            print(
                json.dumps(
                    {"q": name, "1x": w1, "100x": wbig,
                     "ratio": round(wbig / w1, 2)}
                ),
                flush=True,
            )
        return
    if "--novel" in sys.argv:
        fixtures = _novel_fixtures()
        if only:
            fixtures = {k: v for k, v in fixtures.items() if k in only}
        qs = catalog.queries()
        for name, dirs in fixtures.items():  # un-timed warmup sweep
            for d in dirs:
                run_once(lambda: qs[name](spark, d))
        for name, (d1, dbig) in fixtures.items():
            w1 = median3(lambda: qs[name](spark, d1))
            wbig = median3(lambda: qs[name](spark, dbig))
            print(
                json.dumps(
                    {"q": name, "1x": w1, "10x": wbig,
                     "ratio": round(wbig / w1, 2)}
                ),
                flush=True,
            )
        return
    fixtures = {
        "customer_linkage_scores": (BASE, _linkage100x()),
        "doc_containment_pairs": (BASE, _docs100x()),
    }
    if only:
        fixtures = {k: v for k, v in fixtures.items() if k in only}
    qs = catalog.queries()
    for name, (d1, dbig) in fixtures.items():
        # the cardinality contract IS the point of these recipes:
        # output must grow exactly 100x with the data
        n1 = qs[name](spark, d1).count()
        nbig = qs[name](spark, dbig).count()
        assert nbig == 100 * n1, (name, n1, nbig)
        print(
            json.dumps({"q": name, "rows_1x": n1, "rows_100x": nbig}),
            flush=True,
        )
    for name, dirs in fixtures.items():  # un-timed warmup sweep
        for d in dirs:
            run_once(lambda: qs[name](spark, d))
    for name, (d1, dbig) in fixtures.items():
        w1 = median3(lambda: qs[name](spark, d1))
        wbig = median3(lambda: qs[name](spark, dbig))
        print(
            json.dumps(
                {"q": name, "1x": w1, "100x": wbig,
                 "ratio": round(wbig / w1, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
