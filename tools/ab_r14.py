"""Generic interleaved two-arm A/B for the round-14 optimization work.

Usage:
    python tools/ab_r14.py <armA_dir> <armB_dir> <q1[,q2...]> [trips] [reps]

Each arm is a checkout (a pinned git worktree, or the live repo root for
the working tree).  Per round-trip both arms run as fresh subprocesses
in ONE wall-clock session (order swapped every trip) so machine drift
hits both equally — the BASELINE.md A/B protocol, generalized from
tools/ab_movers_r14.py.  Each subprocess applies bench.py's exact
per-query protocol via that arm's tools/ab_query_arm.py.  Prints the
per-query paired medians + B/A ratio and writes .scratch/ab_r14_<tag>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(arm: str, queries: str, reps: int) -> dict[str, dict]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(arm, "tools", "ab_query_arm.py"),
         queries, str(reps)],
        cwd=arm,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])["queries"]
    raise RuntimeError(f"arm {arm} produced no result:\n{proc.stderr[-2000:]}")


def main() -> None:
    arm_a, arm_b, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    trips = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    results: dict[str, dict[str, list[float]]] = {}
    for trip in range(trips):
        order = [("A", arm_a), ("B", arm_b)]
        if trip % 2:
            order.reverse()
        for label, arm in order:
            out = run_arm(arm, queries, reps)
            for q, rec in out.items():
                results.setdefault(q, {}).setdefault(label, []).append(
                    rec["median"]
                )
            print(f"trip {trip} arm {label}: "
                  + json.dumps({q: rec["median"] for q, rec in out.items()}),
                  flush=True)
    summary = {}
    for q, arms in results.items():
        a = statistics.median(arms["A"])
        b = statistics.median(arms["B"])
        summary[q] = {
            "A_medians": arms["A"],
            "B_medians": arms["B"],
            "A": round(a, 3),
            "B": round(b, 3),
            "B_over_A": round(b / a, 3) if a else None,
        }
    os.makedirs(os.path.join(REPO, ".scratch"), exist_ok=True)
    tag = queries.split(",")[0]
    with open(os.path.join(REPO, ".scratch", f"ab_r14_{tag}.json"), "w") as f:
        json.dump({"arm_a": arm_a, "arm_b": arm_b, **summary}, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
