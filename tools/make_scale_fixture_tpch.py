"""Build a 10x TPC-H-family fixture for the relational scaling curve
(round 7): .cache/scale_tpch1/{lineitem,orders,customer,supplier,part,
nation,region}.parquet.

Replication preserves the join GEOMETRY the way real TPC-H scale
factors do: every replica offsets each key space by a per-table stride
(max key + 1), so key CARDINALITY grows 10x while per-key fanout
(lineitems per order, orders per customer) is bit-identical to the
base — growing the fanout instead would measure a skew artifact, not
scale.  The nation/region dimensions are shared across replicas
(25/5 rows at every real SF), so per-nation group sizes grow 10x,
exactly as at a real 10x SF.  Non-key columns (dates, prices, names)
are copied unchanged, so date-range predicates select 10x the rows at
the same selectivity.

DuckDB does the replication (no Spark session needed): one
CROSS JOIN range(10) per table with `* REPLACE` key offsets.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# table -> columns that live in its own key space (offset by that
# table's stride) or reference another table's key space
KEYS = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
}


def build(base_dir: str, out_dir: str, replicas: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    strides = {}
    for space, (table, col) in {
        "customer": ("customer", "c_custkey"),
        "orders": ("orders", "o_orderkey"),
        "part": ("part", "p_partkey"),
        "supplier": ("supplier", "s_suppkey"),
    }.items():
        strides[space] = (
            con.execute(
                f"SELECT max({col}) + 1 FROM "
                f"'{base_dir}/{table}.parquet'"
            ).fetchone()[0]
        )
    for table, keycols in KEYS.items():
        repl = ", ".join(
            f"{col} + r.r * {strides[space]} AS {col}"
            for col, space in keycols.items()
        )
        con.execute(
            f"COPY (SELECT t.* REPLACE ({repl}) "
            f"FROM '{base_dir}/{table}.parquet' t "
            f"CROSS JOIN range({replicas}) r(r)) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
    for table in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{base_dir}/{table}.parquet') "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".cache", "scale_tpch1")
    )
    build(base, out)
    print("wrote", out)
