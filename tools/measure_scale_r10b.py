"""Measure the round-10 CONTINUATION queries' 10x scaling curves —
every addition ships with a measured curve (the per-round standard
since round 7).

Fixtures reuse the established recipes (symlink-assembled per query):

* doc_pairs_complete_jaccard — documents 10x (content-disjoint
  replicas): shingle df counts, the rarest-first prefix self-join and
  the candidate-bounded verify all grow with the corpus; replicas
  share no shingles so candidates stay per-replica (the honest
  linear shape).
* lineitem_bloom_join — lineitem+part 10x (TPC-H key-offset): the
  bloom build side grows with the PROMO dim slice, the probe side
  scans 10x fact rows at identical selectivity.
* purchase_reachability — orders+lineitem+customer 10x: c_nationkey
  is preserved per replica, so the seed set AND the (disjoint)
  replica graphs both grow 10x — frontier work and edge probes scale
  together.
* copurchase_lift / copurchase_triangles — lineitem 10x: part keys
  are offset per replica, so baskets/pairs/triangles replicate with
  per-key fanout bit-identical to base (the geometry-preserving
  recipe).
* events_value_interp — events 10x (user replicas): 10x series keys
  over the same day spine; window parallelism is the key cardinality.

Protocol: interleaved warmth (un-timed 1x/10x sweep), median-of-3,
noop sink — measure_scale_tpch.py's protocol.

Usage: python tools/measure_scale_r10b.py [--queries a,b]
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


def _docs100x() -> str:
    out = os.path.join(os.path.dirname(_docs10x()), "scale_sf10")
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(BASE, out, replicas=100)
    return out


def _tpch100x(table: str) -> str:
    from tools.measure_scale_r10 import _tpch100x as t100

    return t100(table)


def main() -> None:
    spark = get_spark("measure-scale-r10b")
    only = None
    if "--queries" in sys.argv:
        only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
    if "--100x" in sys.argv:
        # the 100x tier for the continuation's two candidate
        # scale-killers: the complete-recall prefix join (does the
        # candidate set stay per-replica at 100x vocab?) and BFS
        # (seeds AND graphs both 100x)
        fixtures = {
            "doc_pairs_complete_jaccard": (BASE, _docs100x()),
            "purchase_reachability": (
                BASE,
                _fixture_dir(
                    {
                        "orders": _tpch100x("orders"),
                        "lineitem": _tpch100x("lineitem"),
                        "customer": _tpch100x("customer"),
                        "nation": os.path.join(BASE, "nation.parquet"),
                    },
                    tag="_r10b_100x",
                ),
            ),
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
    tpch_graph = _fixture_dir(
        {
            "orders": _tpch10x("orders"),
            "lineitem": _tpch10x("lineitem"),
            "customer": _tpch10x("customer"),
            "nation": os.path.join(BASE, "nation.parquet"),
        },
        tag="_r10b",
    )
    tpch_li = _fixture_dir({"lineitem": _tpch10x("lineitem")}, tag="_r10b")
    tpch_lipart = _fixture_dir(
        {"lineitem": _tpch10x("lineitem"), "part": _tpch10x("part")},
        tag="_r10b",
    )
    tpch_cust = _fixture_dir({"customer": _tpch10x("customer")}, tag="_r10b")
    fixtures = {
        "doc_pairs_complete_jaccard": (BASE, _docs10x()),
        "lineitem_bloom_join": (BASE, tpch_lipart),
        "purchase_reachability": (BASE, tpch_graph),
        "copurchase_lift": (BASE, tpch_li),
        "copurchase_triangles": (BASE, tpch_li),
        "events_value_interp": (BASE, _events10x()),
        # second continuation batch:
        # chisq — events 10x: one fact pass dominates, margins fixed
        "events_type_dow_chisq": (BASE, _events10x()),
        # drift — documents 10x: two token aggs + vocab merge grow
        # with the corpus
        "corpus_drift_terms": (BASE, _docs10x()),
        # containment — documents 10x: sub-prefix probe vs the full
        # shingle stream, candidates per-replica (content-disjoint)
        "doc_containment_pairs": (BASE, _docs10x()),
        # linkage — customer 10x (key-offset): the ED block's variant
        # join grows with names, feature joins id-keyed
        "customer_linkage_scores": (BASE, tpch_cust),
        # transition matrix / stickiness — events 10x (user replicas):
        # window parallelism and activity pairs grow 10x
        "event_transition_matrix": (BASE, _events10x()),
        "user_stickiness": (BASE, _events10x()),
        # k-core — lineitem 10x: pair build + 12 peel rounds over the
        # replicated (disjoint) co-purchase graph
        "copurchase_kcore": (BASE, tpch_li),
        # HITS — orders+lineitem 10x: 2k node-cardinality shuffles
        # over a 10x bipartite edge list
        "purchase_graph_hits": (BASE, tpch_graph),
        # spans / attribution / count-min — events 10x (user replicas)
        "user_active_spans": (BASE, _events10x()),
        "touch_attribution": (BASE, _events10x()),
        "user_count_min": (BASE, _events10x()),
        # trend — events 10x: moment agg per group, 10x fact rows
        "event_type_trends": (BASE, _events10x()),
        # phrase — documents 10x: postings prune + (doc, pos) joins
        "phrase_search": (BASE, _docs10x()),
        # join-size sketch — orders+customer 10x: two sketch builds
        # scan 10x rows into the SAME depth x width cells
        "orders_join_size_sketch": (
            BASE,
            _fixture_dir(
                {
                    "orders": _tpch10x("orders"),
                    "customer": _tpch10x("customer"),
                },
                tag="_r10b",
            ),
        ),
        # streaming drift — documents 10x: 4 micro-batch folds over a
        # 10x token stream (cache-keyed workdir rebuilds per fixture)
        "stream_corpus_drift": (BASE, _docs10x()),
        # lag funnel — events 10x: same chained-min joins + residual
        "purchase_funnel_24h": (BASE, _events10x()),
        # deciles — orders 10x: the documented global-sort member
        "order_price_deciles": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
        ),
    }
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


if __name__ == "__main__":
    main()
