"""Measure the round-10 novel queries' 10x scaling curves — every
addition ships with a measured curve (the per-round standard since
round 7).

Fixtures reuse the established recipes, symlink-assembled per query:

* orders_mv_upsert — orders 10x (TPC-H key-offset): the CDC diff's
  full-outer join and the signed-delta agg grow 10x rows; group
  cardinality fixed (priorities) — the realistic IVM shape.
* orders_bucketed_join — orders+customer 10x: the co-bucketed layout
  rebuilds at 10x (cache keyed by source stat, built in the warmup
  sweep) and the exchange-free SortMergeJoin reads 10x bucket rows.
* event_heavy_hitters — events 10x (key-offset user replicas: 10x
  users, per-user history identical): pass-1 MG state stays O(1/phi)
  per task while the scanned stream grows 10x; candidate counts grow
  with the user replicas.
* content_safe_split_neardup — documents 10x (content-disjoint
  replicas): the minhash/LSH/CC group assignment is the dominant
  cost and is candidate-bounded; the split itself stays scan-stage +
  one group join.

Protocol: interleaved warmth (un-timed 1x/10x sweep — which also
builds the cache-keyed layouts outside the timed window),
median-of-3, noop sink — measure_scale_tpch.py's protocol.

Usage: python tools/measure_scale_r10.py [--queries a,b] [--100x]
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


def _tpch100x(table: str) -> str:
    out = os.path.join(CACHE, "scale_tpch10")
    if not os.path.exists(os.path.join(out, f"{table}.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(BASE, out, replicas=100)
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


def _events100x() -> str:
    out = os.path.join(CACHE, "scale_events100")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.measure_scale_upsert import build_events_10x

        build_events_10x(BASE, out, replicas=100)
    return out


def _fixture_dir(tables: dict[str, str], tag: str = "") -> str:
    key = "_".join(sorted(tables)) + tag
    d = os.path.join(CACHE, f"scale_r10_{key}")
    os.makedirs(d, exist_ok=True)
    for t, src in tables.items():
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def main() -> None:
    spark = get_spark("measure-scale-r10")
    only = None
    if "--queries" in sys.argv:
        only = set(sys.argv[sys.argv.index("--queries") + 1].split(","))
    if "--100x" in sys.argv:
        fixtures = {
            "orders_mv_upsert": (
                BASE,
                _fixture_dir({"orders": _tpch100x("orders")}, tag="_100x"),
            ),
            "event_heavy_hitters": (BASE, _events100x()),
            "orders_bucketed_join": (
                BASE,
                _fixture_dir(
                    {
                        "orders": _tpch100x("orders"),
                        "customer": _tpch100x("customer"),
                    },
                    tag="_100x",
                ),
            ),
        }
        label = "100x"
    else:
        fixtures = {
            "orders_mv_upsert": (
                BASE,
                _fixture_dir({"orders": _tpch10x("orders")}),
            ),
            "orders_bucketed_join": (
                BASE,
                _fixture_dir(
                    {
                        "orders": _tpch10x("orders"),
                        "customer": _tpch10x("customer"),
                    }
                ),
            ),
            "event_heavy_hitters": (BASE, _events10x()),
            "content_safe_split_neardup": (BASE, _docs10x()),
        }
        label = "10x"
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
                {"q": name, "1x": w1, label: wbig,
                 "ratio": round(wbig / w1, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
