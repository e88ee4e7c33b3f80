"""Round-12 scale points (r11 verdict item 4 + the per-addition
standard):

* winnowing_dup_groups — 100x content-disjoint documents
  (make_scale_fixture's affine-bijection replicas: the token bijection
  preserves each replica's within-replica equality structure, so dup
  groups stay per-replica and OUTPUT rows must be exactly 100x — the
  contract asserted below before timing).
* bpe_encode — same 100x fixture; per-doc scan-stage replace chain,
  output rows = document count (contract asserted).
* order_price_quantile_summary — 10x key-offset TPC-H orders (the new
  r12 member's curve): output is k cells per group, so rows are FLAT
  (5 priorities x 9 cells at both scales — contract asserted); the
  window sort is the scaling cost.

Protocol: interleaved warmth (un-timed 1x/big sweep — which also
builds the winnow index caches outside the timed window), median-of-3,
noop sink — measure_scale_tpch.py's protocol.

Usage: python tools/measure_scale_r12.py [--queries a,b]
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
    _docs10x,
    _events10x,
    _fixture_dir,
    _tpch10x,
    median3,
    run_once,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")


def _docs100x() -> str:
    d = os.path.join(CACHE, "scale_sf10")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(BASE, d, replicas=100)
    return d


def _docs100x_disjoint_grams() -> str:
    # winnowing's fixture: the affine-cipher replicas share char
    # k-grams by pigeonhole (measured +0.68% group rows at 100x), so
    # the gram-exact contract needs per-replica disjoint codepoint
    # blocks (make_scale_fixture.build(disjoint_grams=True))
    d = os.path.join(CACHE, "scale_sf10w")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(BASE, d, replicas=100, disjoint_grams=True)
    return d


def main() -> None:
    spark = get_spark("measure-scale-r12")
    only = None
    if "--queries" in sys.argv:
        only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
    fixtures: dict[str, tuple[str, str, int]] = {
        # name -> (1x dir, big dir, expected big/1x OUTPUT-row ratio;
        #          0 = flat (equal row counts at both scales))
        "winnowing_dup_groups": (BASE, _docs100x_disjoint_grams(), 100),
        "bpe_encode": (BASE, _docs100x(), 100),
        "order_price_quantile_summary": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
            0,
        ),
        # flat output (event types x 7 lags at both scales); the
        # day-grain collapse makes the lag join flat in event volume
        "event_type_acf": (BASE, _events10x(), 0),
        # flat single-row output; key-offset lineitem replicas keep
        # baskets replica-local so the pairs CTE grows linearly
        "copurchase_assortativity": (
            BASE,
            _fixture_dir({"lineitem": _tpch10x("lineitem")}, tag="_asrt"),
            0,
        ),
        # flat output (one row per source at both scales); the window
        # sort is the scaling cost
        "doc_length_gini": (BASE, _docs10x(), 0),
        # flat output (one row per lang); the type table is
        # vocab-bounded — cipher replicas grow it ~10x, the worst case
        "vocab_zipf_slope": (BASE, _docs10x(), 0),
        # flat 10-row curve; the first-occurrence agg runs over the
        # (10x-grown) type table, the curve fold stays 10 rows
        "vocab_heaps_law": (BASE, _docs10x(), 0),
        # flat output (one row per event type); 10x user replicas give
        # 10x lag partitions of the same per-user history
        "event_gap_burstiness": (BASE, _events10x(), 0),
        # flat single-row output; the distinct-value CDF table is
        # value-cardinality work after the groupBy(value) collapse
        "doc_length_ks_drift": (BASE, _docs10x(), 0),
        # steady state (the stream_event_heavy_hitters caveat: the MV
        # fold runs once at fixture build in the warmup, cache-keyed);
        # timed cost = the even-half collapse + value-cardinality KS
        "stream_length_ks_drift": (BASE, _docs10x(), 0),
        # flat 9-row output; one scan-stage digit projection + a
        # 9-group map-side-combinable aggregate
        "order_price_benford": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
            0,
        ),
        # flat K-row output; the lead-window transition count is the
        # only fact-scale stage, the iterations are K-row work
        "event_type_stationary": (BASE, _events10x(), 0),
    }
    if only:
        fixtures = {k: v for k, v in fixtures.items() if k in only}
    # winnowing's contract is a BOUND, not equality: the window-MINIMUM
    # fingerprint selection is hash-value-dependent, so no character
    # bijection preserves the selected fp set — near-threshold pairs
    # flip in/out per replica (measured two-sided flutter 471-480 rows
    # per replica around the base 472 on the gram-disjoint fixture,
    # where true cross-replica sharing is exactly ONE 48-bit hash
    # collision).  1.5% bounds the flutter; a super-linear artifact
    # (the welded-clique failure mode) would blow straight through it.
    tolerance = {"winnowing_dup_groups": 0.015}
    qs = catalog.queries()
    for name, (d1, dbig, ratio) in fixtures.items():
        # output contract BEFORE timing: a fixture regression cannot
        # silently turn the scale row into an artifact
        n1 = qs[name](spark, d1).count()
        nbig = qs[name](spark, dbig).count()
        want = n1 if ratio == 0 else ratio * n1
        tol = tolerance.get(name, 0.0)
        assert abs(nbig - want) <= tol * want, (name, n1, nbig, want)
        print(json.dumps({"q": name, "rows_1x": n1, "rows_big": nbig,
                          "rows_expected": want, "contract": "ok"}),
              flush=True)
    for name, (d1, dbig, _r) in fixtures.items():  # un-timed warmup
        run_once(lambda: qs[name](spark, d1))
        run_once(lambda: qs[name](spark, dbig))
    for name, (d1, dbig, ratio) in fixtures.items():
        label = "10x" if ratio == 0 else "100x"
        w1 = median3(lambda: qs[name](spark, d1))
        wbig = median3(lambda: qs[name](spark, dbig))
        print(
            json.dumps(
                {"q": name, "1x": w1, label: wbig,
                 "ratio": round(wbig / w1, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
