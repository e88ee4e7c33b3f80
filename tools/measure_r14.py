"""Round-14 optimization measurement harness.

Times named catalog queries with exactly bench.py's per-query protocol
(timed window includes query construction; noop sink forces end-to-end
execution; one cold run then ``reps`` measured runs) and captures each
query's ``explain("formatted")`` physical plan to plans/r14/.

Usage:
    python tools/measure_r14.py <tag> <name>[,<name>...] [reps]

``tag`` labels the plan files (``<name>_<tag>.txt``) — use ``before``
for the baseline capture and ``after`` for post-change re-measures.
Prints one JSON line per query and a MEASURE summary line at the end.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("dpka-measure-r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    qs = catalog.queries()
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r14-measure: {name} (cold)")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()  # bench.py's r14 between-sample hygiene
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"r14-measure: {name} #{i}")
            t0 = time.perf_counter()
            dfi = qs[name](spark, sf_dir)
            dfi.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        # plan capture AFTER timing so explain cost never pollutes samples
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        out[name] = {
            "cold": cold,
            "samples": samples,
            "median": sorted(samples)[len(samples) // 2],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("MEASURE " + json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
