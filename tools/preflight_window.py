"""Driver-environment pre-flight: run the 50-query hash window through
a VANILLA SparkSession (exactly the session the driver builds —
local[$SPARK_GRAFT_CPUS] + shuffle.partitions only, NONE of
session.get_spark's extra confs) against the DuckDB oracle with the
driver's canonicalization.

This is the parity check the round-8..10 verdicts asked for, promoted
from an ad-hoc round-10 step to a standing tool: every conf the
engine needs must be set by the QUERY PATHS at runtime (the loader's
nanosAsLong, run_with_confs' scoped knobs, per-plan broadcast hints),
never inherited from our own session factory — otherwise the driver's
session diverges from local green.

Usage: python tools/preflight_window.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from tools.check_oracle import canon_rows, duck_connect  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("preflight-window")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from database_per_keyword_analysis_spark import catalog

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    window = list(qs)[:50]
    con = duck_connect(sf_dir)
    failures = []
    for name in window:
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            ok = (
                sorted(sdf.columns) == sorted(dcols)
                and len(srows) == len(drows)
                and canon_rows(sdf.columns, [tuple(r) for r in srows])
                == canon_rows(dcols, drows)
            )
        except Exception as e:  # a vanilla-session-only crash IS the finding
            print(f"✗ {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        print(("✓" if ok else "✗") + f" {name}")
        if not ok:
            failures.append(name)
    if failures:
        print("PREFLIGHT FAILED:", failures)
        sys.exit(1)
    print(f"preflight green: {len(window)}/50 under the vanilla session")


if __name__ == "__main__":
    main()
