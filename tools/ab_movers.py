"""Interleaved r8-vs-r9 A/B for the four stable-core up-movers
(r9 verdict item 1: semantic_dedup 2.95→4.24 s, corpus_curation +18%,
stateful_user_stats +32%, duplicated_spans +26% — all on code the
round did not touch).

Protocol (BASELINE.md "A/B protocol"): both arms are git worktrees of
this repo pinned at the round-end commits; each round-trip runs arm A
then arm B (order swapped every trip) as fresh subprocesses in ONE
wall-clock session, so slow machine drift and page-cache state hit
both arms equally.  Each subprocess applies bench.py's exact
per-query protocol (tools/ab_query_arm.py).  Output: per-query paired
medians + the A/B ratio, written to stdout and .scratch/ab_r8_r9.json.

Usage: python tools/ab_movers.py [trips]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARM_A = os.path.join(REPO, ".ab_r8")  # round-8 end commit worktree
ARM_B = REPO  # round-9 end commit (HEAD)
QUERIES = "semantic_dedup,corpus_curation,stateful_user_stats,duplicated_spans"
RUNNER = os.path.join(REPO, "tools", "ab_query_arm.py")


def run_arm(arm: str) -> dict[str, dict]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, RUNNER, QUERIES, "3"],
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
        order = [("r8", ARM_A), ("r9", ARM_B)]
        if trip % 2:
            order.reverse()
        for label, arm in order:
            out = run_arm(arm)
            for q, rec in out.items():
                results.setdefault(q, {}).setdefault(label, []).append(rec["median"])
            print(f"trip {trip} arm {label}: "
                  + json.dumps({q: rec["median"] for q, rec in out.items()}),
                  flush=True)
    summary = {}
    for q, arms in results.items():
        a = statistics.median(arms["r8"])
        b = statistics.median(arms["r9"])
        summary[q] = {
            "r8_medians": arms["r8"],
            "r9_medians": arms["r9"],
            "r8": round(a, 3),
            "r9": round(b, 3),
            "r9_over_r8": round(b / a, 3) if a else None,
        }
    os.makedirs(os.path.join(REPO, ".scratch"), exist_ok=True)
    with open(os.path.join(REPO, ".scratch", "ab_r8_r9.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
