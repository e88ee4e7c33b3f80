"""Interleaved r11-vs-r12 A/B for the three code-untouched driver-bench
movers the round-12 verdict named (item 2: supplier_wait_blame
1.15->1.74 s +51%, event_anomalies 0.30->0.82 s +175%, corpus_curation
4.04->4.86 s +20% — none of their code changed in round 12, verified
by `git diff 00ee85f..72ab978` on their modules).

Protocol (BASELINE.md "A/B protocol", tools/ab_movers.py unchanged):
both arms are git worktrees pinned at the round-end commits (.ab_r11 =
00ee85f, .ab_r12 = 72ab978); each round-trip runs arm A then arm B
(order swapped every trip) as fresh subprocesses in ONE wall-clock
session, so machine drift and page-cache state hit both arms equally.
Each subprocess applies bench.py's exact per-query protocol
(tools/ab_query_arm.py).  Output: per-query paired medians + the A/B
ratio, stdout and .scratch/ab_r11_r12.json.

Usage: python tools/ab_movers_r13.py [trips]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARM_A = os.path.join(REPO, ".ab_r11")  # round-11 end commit worktree
ARM_B = os.path.join(REPO, ".ab_r12")  # round-12 end commit worktree
QUERIES = "corpus_curation,supplier_wait_blame,event_anomalies"


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
        timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])["queries"]
    raise RuntimeError(f"arm {arm} produced no result:\n{proc.stderr[-2000:]}")


def main() -> None:
    trips = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, dict[str, list[float]]] = {}
    for trip in range(trips):
        order = [("r11", ARM_A), ("r12", ARM_B)]
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
        a = statistics.median(arms["r11"])
        b = statistics.median(arms["r12"])
        summary[q] = {
            "r11_medians": arms["r11"],
            "r12_medians": arms["r12"],
            "r11": round(a, 3),
            "r12": round(b, 3),
            "r12_over_r11": round(b / a, 3) if a else None,
        }
    os.makedirs(os.path.join(REPO, ".scratch"), exist_ok=True)
    with open(os.path.join(REPO, ".scratch", "ab_r11_r12.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
