"""One-arm runner for the r8-vs-r9 stable-core mover A/B (r9 verdict
item 1).

Invoked as a SUBPROCESS with cwd = an arm checkout (a git worktree at
the round-8 or round-9 commit); sys.path[0] = cwd makes every
``database_per_keyword_analysis_spark`` import resolve to THAT arm's
code.  Runs the given queries with exactly bench.py's per-query
protocol (timed window includes query construction; noop sink forces
end-to-end execution; one cold run then ``reps`` measured runs) and
prints one JSON line {query: {"cold": s, "samples": [...], "median": s}}.

The interleaving (A,B,A,B,... within one wall-clock session) lives in
tools/ab_movers.py, which alternates subprocess arms so any machine
drift hits both arms equally.
"""

from __future__ import annotations

import json
import os
import sys
import time

ARM = os.getcwd()
sys.path.insert(0, ARM)

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dpka-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    qs = catalog.queries()
    out: dict[str, dict] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()  # bench.py's r14 between-sample hygiene
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            dfi = qs[name](spark, sf_dir)
            dfi.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "cold": cold,
            "samples": samples,
            "median": sorted(samples)[len(samples) // 2],
        }
    print("ABRESULT " + json.dumps({"arm": ARM, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
