"""Measure the round-8 novel queries' 10x scaling curves — every
addition ships with a measured curve (the round-7 standard).

Queries and their fixtures (reusing the existing 10x recipes):

* purchase_user_state_pit — events 10x (.cache/scale_events1, the
  key-offset replication from measure_scale_upsert): user count grows
  10x, per-user event history is bit-identical, so SCD2 run counts per
  user and the PIT join's per-fact match work are fixed while key
  cardinality scales.
* join_strategy_decisions — same 10x events plus the base customer
  dim (both sides of the decision's stats passes grow: the skew
  scan 10x, the dim count unchanged — the realistic shape).
* pq_knn_frozen — embeddings 10x (.cache/scale_emb1, round-7 emb
  sweep fixture): corpus encode + ADC scoring scale with N, the query
  set stays the bounded vec_id < 10 convention.

Protocol: interleaved warmth (one un-timed sweep over every
(query, scale) pair, then adjacent 1x/Nx timings), 3-iter medians,
noop sink — identical to measure_scale_tpch.py.

Usage: python tools/measure_scale_r8.py   (one JSON line per query;
transcribe into SCALE.md)
"""

from __future__ import annotations

import json
import os
import shutil
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


def _events10x() -> str:
    out = os.path.join(CACHE, "scale_events1")
    if not os.path.exists(os.path.join(out, "events.parquet")):
        from tools.measure_scale_upsert import build_events_10x

        build_events_10x(BASE, out)
    return out


def _emb10x() -> str:
    out = os.path.join(CACHE, "scale_emb1")
    if not os.path.exists(os.path.join(out, "embeddings.parquet")):
        import duckdb

        os.makedirs(out, exist_ok=True)
        con = duckdb.connect()
        src = f"{BASE}/embeddings.parquet"
        stride = con.execute(
            f"SELECT max(vec_id) + 1 FROM '{src}'"
        ).fetchone()[0]
        con.execute(
            f"COPY (SELECT t.* REPLACE (vec_id + r.r * {stride} AS vec_id) "
            f"FROM '{src}' t CROSS JOIN range(10) r(r)) "
            f"TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
        )
    return out


def _tpch10x(table: str) -> str:
    out = os.path.join(CACHE, "scale_tpch1")
    if not os.path.exists(os.path.join(out, f"{table}.parquet")):
        from tools.make_scale_fixture_tpch import build

        build(BASE, out)
    return os.path.join(out, f"{table}.parquet")


def _customer10x() -> str:
    return _tpch10x("customer")


def _fixture_dir(tables: dict[str, str]) -> str:
    """A measurement dir assembling existing parquet files by symlink
    (never copies, never touches the sources)."""
    key = "_".join(sorted(tables))
    d = os.path.join(CACHE, f"scale_r8_{key}")
    os.makedirs(d, exist_ok=True)
    for t, src in tables.items():
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def main() -> None:
    spark = get_spark("measure-scale-r8")
    ev10 = _events10x()
    emb10 = _emb10x()
    fixtures = {
        "purchase_user_state_pit": (
            BASE,
            _fixture_dir({"events": f"{ev10}/events.parquet"}),
        ),
        "join_strategy_decisions": (
            BASE,
            _fixture_dir(
                {
                    "events": f"{ev10}/events.parquet",
                    "customer": f"{BASE}/customer.parquet",
                }
            ),
        ),
        "pq_knn_frozen": (
            BASE,
            _fixture_dir({"embeddings": f"{emb10}/embeddings.parquet"}),
        ),
        # snapshot diff: customer 10x from the TPC-H key-offset fixture
        # (both diff sides grow 10x; the full-outer join's shuffle is
        # the measured term)
        "customer_snapshot_diff": (
            BASE,
            _fixture_dir({"customer": _customer10x()}),
        ),
        # PageRank: edge list from the 10x orders/lineitem (node count
        # and edge count both grow ~10x; per-iteration join + agg are
        # the measured terms)
        "purchase_graph_pagerank": (
            BASE,
            _fixture_dir(
                {
                    "orders": _tpch10x("orders"),
                    "lineitem": _tpch10x("lineitem"),
                }
            ),
        ),
        "purchase_graph_communities": (
            BASE,
            _fixture_dir(
                {
                    "orders": _tpch10x("orders"),
                    "lineitem": _tpch10x("lineitem"),
                }
            ),
        ),
    }
    qs = catalog.queries()
    for name, dirs in fixtures.items():  # un-timed warmup sweep
        for d in dirs:
            run_once(lambda: qs[name](spark, d))
    for name, (d1, d10) in fixtures.items():
        w1 = median3(lambda: qs[name](spark, d1))
        w10 = median3(lambda: qs[name](spark, d10))
        print(json.dumps({"q": name, "1x": w1, "10x": w10,
                          "ratio": round(w10 / w1, 2)}))


if __name__ == "__main__":
    main()
