"""Measure the round-9 novel queries' 10x scaling curves — every
addition ships with a measured curve (the per-round standard since
round 7).

Fixtures reuse the TPC-H key-offset recipe (.cache/scale_tpch1, built
by tools/make_scale_fixture_tpch.py: 10x key cardinality, identical
per-key fanout), symlink-assembled per query:

* orders_mv_incremental — orders 10x: both the MV build and the delta
  partials grow 10x rows, key cardinality (priorities) fixed at 5 —
  the realistic MV shape (huge base, tiny group count).
* orders_pruned_totals — orders 10x: the range-clustered fixture and
  its zone map rebuild at 10x (cache keyed by source file stat); the
  band predicate selects ~10x the rows from the same FRACTION of
  files.
* customer_pairs_complete_ed — customer 10x: names replicate with
  offset keys, so the variant join's bucket sizes grow ~10x and the
  result pair count grows super-linearly (each replica's digit
  neighborhood) — the stress direction for the candidate join.

Protocol: interleaved warmth (un-timed 1x/10x sweep), median-of-3
adjacent timings, noop sink — measure_scale_tpch.py's protocol.

Usage: python tools/measure_scale_r9.py
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


def run_once(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def median3(fn):
    return round(sorted(run_once(fn) for _ in range(3))[1], 3)


def _tpch10x(table: str) -> str:
    out = os.path.join(CACHE, "scale_tpch1")
    if not os.path.exists(os.path.join(out, f"{table}.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(BASE, out)
    return os.path.join(out, f"{table}.parquet")


def _docs10x() -> str:
    out = os.path.join(CACHE, "scale_sf1")
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        from tools.make_scale_fixture import build

        build(BASE, out)
    return out


def _events10x() -> str:
    out = os.path.join(CACHE, "scale_events1")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.measure_scale_upsert import build_events_10x

        build_events_10x(BASE, out)
    return out


def _fixture_dir(tables: dict[str, str], tag: str = "") -> str:
    key = "_".join(sorted(tables)) + tag
    d = os.path.join(CACHE, f"scale_r9_{key}")
    os.makedirs(d, exist_ok=True)
    for t, src in tables.items():
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def _tpch100x(table: str) -> str:
    out = os.path.join(CACHE, "scale_tpch10")
    if not os.path.exists(os.path.join(out, f"{table}.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(BASE, out, replicas=100)
    return os.path.join(out, f"{table}.parquet")


def main() -> None:
    spark = get_spark("measure-scale-r9")
    only = None
    if "--queries" in sys.argv:
        only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
    if "--100x" in sys.argv:
        # two-decade points for the orders-based r9 queries (the
        # zone-map/z-order fixtures re-cluster the 100x table; the MV
        # absorbs a 100x delta) — scale_tpch10 is the shared fixture
        big = _fixture_dir({"orders": _tpch100x("orders")}, tag="_100x")
        label = "100x"
        fixtures = {
            q: (BASE, big)
            for q in (
                "orders_mv_incremental",
                "orders_pruned_totals",
                "orders_zorder_pruned",
            )
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
                    {"q": name, "1x": w1, label: wbig,
                     "ratio": round(wbig / w1, 2)}
                ),
                flush=True,
            )
        return
    fixtures = {
        "orders_mv_incremental": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
        ),
        "orders_pruned_totals": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
        ),
        "customer_pairs_complete_ed": (
            BASE,
            _fixture_dir({"customer": _tpch10x("customer")}),
        ),
        # z-order twin of orders_pruned_totals: same 10x orders, the
        # fixture re-clusters and the two-band probe consults the
        # two-column zone map
        "orders_zorder_pruned": (
            BASE,
            _fixture_dir({"orders": _tpch10x("orders")}),
        ),
        # A-ES weighted sampler over the content-disjoint 10x corpus
        # (make_scale_fixture recipe): keys ride the scan, top-k is
        # per-partition heaps
        "weighted_doc_sample": (
            BASE,
            _docs10x(),
        ),
        # funnel + paths over the 10x events (key-offset user replicas:
        # 10x users, per-user history identical — reach tables and
        # window partitions grow 10x, per-user work fixed)
        "purchase_funnel": (
            BASE,
            _events10x(),
        ),
        "top_user_paths": (
            BASE,
            _events10x(),
        ),
        # content-keyed split over the content-disjoint 10x corpus
        # (pure scan-stage expressions)
        "content_safe_split": (
            BASE,
            _docs10x(),
        ),
    }
    if only:
        fixtures = {k: v for k, v in fixtures.items() if k in only}
    qs = catalog.queries()
    for name, dirs in fixtures.items():  # un-timed warmup sweep
        for d in dirs:
            run_once(lambda: qs[name](spark, d))
    for name, (d1, d10) in fixtures.items():
        w1 = median3(lambda: qs[name](spark, d1))
        w10 = median3(lambda: qs[name](spark, d10))
        print(
            json.dumps(
                {"q": name, "1x": w1, "10x": w10, "ratio": round(w10 / w1, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
