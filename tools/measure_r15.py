"""Per-stage accounting for one catalog query (r15 measurement tool).

Runs <query> once cold under a UI-enabled session, then prints every
job/stage with task counts and durations from the UI REST API — the
guide §1/§7 'where does the time actually go' step for queries whose
cost is spread over many small jobs (the iterative graph family).

Usage: python tools/measure_r15.py <query> [reps]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DPKA_SPARK_UI", "true")

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {"spark.ui.enabled": "true"}
    extra.update(json.loads(os.environ.get("DPKA_EXTRA_CONF", "{}")))
    spark = get_spark("dpka-measure-r15", extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = catalog.queries()

    # cold
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    print(f"cold: {time.perf_counter() - t0:.3f}s")
    spark.catalog.clearCache()
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        dfi = qs[name](spark, sf_dir)
        dfi.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        print(f"rep {i}: {times[-1]:.3f}s")
        if i < reps - 1:
            spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: s["stageId"])
    total_ms = 0
    rows = []
    for s in done:
        dur = s.get("executorRunTime", 0)
        sub = s.get("submissionTime", "")
        rows.append(
            (s["stageId"], s["numCompleteTasks"], dur,
             s.get("shuffleWriteBytes", 0), s.get("inputBytes", 0),
             s["name"].split("\n")[0][:70])
        )
        total_ms += dur
    # only print the last chunk (the final rep's stages dominate the tail)
    print(f"\n{len(done)} complete stages, total executorRunTime "
          f"{total_ms / 1000:.2f}s (all reps+cold)")
    print(f"{'stage':>6} {'tasks':>5} {'runMs':>8} {'shufW':>10} {'input':>10}  name")
    for sid, nt, dur, sw, inp, nm in rows[-80:]:
        print(f"{sid:>6} {nt:>5} {dur:>8} {sw:>10} {inp:>10}  {nm}")
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    print(f"\n{len(jobs)} jobs total")
    spark.stop()


if __name__ == "__main__":
    main()
