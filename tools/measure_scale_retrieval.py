"""Measure the round-7 retrieval additions' 10x scaling curve
(hybrid_search_rrf, knn_eval_metrics) — interleaved protocol from
tools/measure_scale_tpch.py (full un-timed warmup sweep over every
(query, scale) pair, then per query the 1x/10x timings ADJACENTLY,
median of 3, noop sink; the 1x-block-first draft protocol measured
warmup, not scale — see that tool's docstring).

Fixture: .cache/scale_ret1 — a composite of the two existing 10x
fixtures (documents from scale_sf1, embeddings from scale_emb1, both
built by their respective make_scale_fixture* tools), symlinked into
one sf_dir so the catalog queries run unmodified.  Base ids (replica
0) are offset-free in both fixtures, so the query vector (vec_id 0)
and the eval query set (vec_id < 20) exist at both scales.

Usage: python tools/measure_scale_retrieval.py  (one JSON line per
query; transcribe into SCALE.md)
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

QUERIES = ["hybrid_search_rrf", "knn_eval_metrics"]


def ensure_fixture() -> str:
    ret = os.path.join(CACHE, "scale_ret1")
    os.makedirs(ret, exist_ok=True)
    for name, src in (
        ("documents.parquet", os.path.join(CACHE, "scale_sf1", "documents.parquet")),
        ("embeddings.parquet", os.path.join(CACHE, "scale_emb1", "embeddings.parquet")),
    ):
        if not os.path.exists(src):
            raise SystemExit(f"missing 10x fixture {src} — build it first")
        link = os.path.join(ret, name)
        if not os.path.exists(link):
            os.symlink(src, link)
    return ret


def run_once(fn):
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def median3(fn):
    ts = sorted(run_once(fn) for _ in range(3))
    return round(ts[1], 3)


def main() -> None:
    spark = get_spark("measure-scale-retrieval")
    base_dir = "/root/testdata/sf0.1"
    big_dir = ensure_fixture()
    qs = catalog.queries()
    for sf_dir in (base_dir, big_dir):  # un-timed global warmup sweep
        for name in QUERIES:
            run_once(lambda: qs[name](spark, sf_dir))
    for name in QUERIES:
        w1 = median3(lambda: qs[name](spark, base_dir))
        w10 = median3(lambda: qs[name](spark, big_dir))
        print(
            json.dumps(
                {"q": name, "1x": w1, "10x": w10, "ratio": round(w10 / w1, 2)}
            )
        )


if __name__ == "__main__":
    main()
