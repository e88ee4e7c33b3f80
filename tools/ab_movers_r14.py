"""Interleaved r12-vs-r13 A/B for the two code-untouched driver-bench
movers the round-13 verdict named (item 1: incremental_near_dup_ingest
7.24 s vs its r10-r12 band 3.69-4.39 — roughly +65% — and
copurchase_lift 6.14 s vs 3.3-4.3).  Neither query's module changed in
round 13 (dedup.py untouched per the r13 diffstat; stats.py changed by
pure addition), and the r13 record was contention_suspect, so the
question is environment vs regression.

The verdict's cache-keying hypothesis (the ingest query's persisted
.cache/lshindex band index rebuilt per warm iteration after the r13
state-dir sweep rework) was tested FIRST and refuted by direct
instrumentation: across 4 consecutive runs in one process the index
_SUCCESS mtime never changed and the build branch never fired (the
sweep only walks its own .cache/<family> root; lshindex is outside
it).  What remains is the standard paired-arm question.

Protocol (BASELINE.md "A/B protocol", tools/ab_movers.py lineage):
both arms are git worktrees pinned at round-end commits (.ab_r12 =
72ab978, .ab_r13 = e6d69a5); each round-trip runs arm A then arm B
(order swapped every trip) as fresh subprocesses in ONE wall-clock
session, so machine drift and page-cache state hit both arms equally.
Each subprocess applies bench.py's exact per-query protocol
(tools/ab_query_arm.py).  Output: per-query paired medians + the A/B
ratio, stdout and .scratch/ab_r12_r13.json.

Usage: python tools/ab_movers_r14.py [trips]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARM_A = os.path.join(REPO, ".ab_r12")  # round-12 end commit worktree
ARM_B = os.path.join(REPO, ".ab_r13")  # round-13 end commit worktree
QUERIES = "incremental_near_dup_ingest,copurchase_lift"


def run_arm(arm: str) -> dict[str, dict]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(arm, "tools", "ab_query_arm.py"),
         QUERIES, "3"],
        cwd=arm,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])["queries"]
    raise RuntimeError(f"arm {arm} produced no result:\n{proc.stderr[-2000:]}")


def main() -> None:
    trips = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, dict[str, list[float]]] = {}
    for trip in range(trips):
        order = [("r12", ARM_A), ("r13", ARM_B)]
        if trip % 2:
            order.reverse()
        for label, arm in order:
            out = run_arm(arm)
            for q, rec in out.items():
                results.setdefault(q, {}).setdefault(label, []).append(
                    rec["median"]
                )
            print(f"trip {trip} arm {label}: "
                  + json.dumps({q: rec["median"] for q, rec in out.items()}),
                  flush=True)
    summary = {}
    for q, arms in results.items():
        a = statistics.median(arms["r12"])
        b = statistics.median(arms["r13"])
        summary[q] = {
            "r12_medians": arms["r12"],
            "r13_medians": arms["r13"],
            "r12": round(a, 3),
            "r13": round(b, 3),
            "r13_over_r12": round(b / a, 3) if a else None,
        }
    os.makedirs(os.path.join(REPO, ".scratch"), exist_ok=True)
    with open(os.path.join(REPO, ".scratch", "ab_r12_r13.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
