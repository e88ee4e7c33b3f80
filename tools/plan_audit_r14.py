"""Catalog-wide physical-plan audit (r14): for every query, count
parquet scans per source file and Exchange nodes in the formatted plan.
Queries that scan the same file many times have the branch-duplication
disease (per-branch column pruning defeats exchange reuse and every
reference re-plans its upstream — a full table pass each at 100 TB).

Usage: python tools/plan_audit_r14.py [sf_dir] [min_scans_flag]
Prints one line per query: n_exchanges n_scans worst_file:count name.
"""

from __future__ import annotations

import io
import os
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_per_keyword_analysis_spark import catalog  # noqa: E402
from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan-audit-r14")
    qs = catalog.queries()
    rows = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: {type(e).__name__}: {e}")
            continue
        n_ex = plan.count("Exchange ")
        scans = re.findall(r"Location:.*?\[([^\]]*)\]", plan)
        files = Counter()
        for loc in re.findall(r"file:[^\s,\]]*", plan):
            files[os.path.basename(loc.rstrip("/")) or loc] += 1
        n_scan = plan.count("Scan parquet")
        worst = files.most_common(1)[0] if files else ("-", 0)
        rows.append((n_scan, n_ex, worst, name))
        print(
            f"{n_ex:4d}ex {n_scan:4d}scan worst={worst[0]}:{worst[1]} {name}",
            flush=True,
        )
        spark.catalog.clearCache()
    rows.sort(reverse=True)
    print("\n== worst by scan count ==")
    for n_scan, n_ex, worst, name in rows[:30]:
        print(f"{n_scan:4d} scans {n_ex:4d} ex  {name}  (worst {worst[0]}:{worst[1]})")
    spark.stop()


if __name__ == "__main__":
    main()
