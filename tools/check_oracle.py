"""Local stand-in for the driver's DuckDB-oracle differential check.

Runs every catalog query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, and an
order-insensitive canonical value multiset (floats rounded to 9 sig
figs).  Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v):
    # Type-TAGGED canonicalization: the driver's hash check is
    # type-sensitive (DuckDB HUGEINT surfaces as float64 and fails
    # against a Spark BIGINT even when values are equal), so int 1 and
    # float 1.0 must NOT canonicalize to the same string here — an
    # untagged "1" masked exactly that failure in round 1.
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, Decimal):
        v = float(v)  # catalog convention casts decimals to DOUBLE
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0:
            return "f:0"
        return f"f:{v:.9g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from database_per_keyword_analysis_spark import catalog
    from database_per_keyword_analysis_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    qs, oracles = catalog.queries(), catalog.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name:32s} rows-only: {len(srows)} rows")
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"✗ {name}: columns differ spark={scols} duck={dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"✗ {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            s = canon_rows(scols, [tuple(r) for r in srows])
            d = canon_rows(dcols, drows)
            if s != d:
                diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
                print(f"✗ {name}: values differ; first diffs {diffs}")
                ok = False
        if ok:
            print(f"✓ {name:32s} {len(srows)} rows")
        else:
            failures.append(name)
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
