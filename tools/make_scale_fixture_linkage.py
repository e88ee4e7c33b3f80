"""Cardinality-CONTROLLED customer replicas for the linkage /
ED-block 100x rows (round-11; r10 verdict item 4).

The plain key-offset TPC-H fixture copies c_name UNCHANGED, so a 10x
replica set welds every name into a 10-clique and the ED-blocked
output grows ~quadratically (the r10 rows honestly reported 14.45x
wall for 191.8x OUTPUT — an output-cardinality artifact, not an
operator curve).  This builder makes replicas NAME-DISJOINT instead:

* c_custkey offsets by the usual per-replica stride;
* c_name gets a per-replica 4-char suffix built by DOUBLING a 2-char
  base-26 code ("aa" → ".aaaa", "ab" → ".aabb", ...): two distinct
  codes differ in >= 1 code position, so the doubled tags differ in
  >= 2 characters and every CROSS-replica name pair sits at edit
  distance >= 2 > max_ed=1 — no cross-replica candidate survives
  (deletion variants of names with tags differing in >= 2 positions
  can never collide), while appending the SAME suffix to every name
  within a replica shifts no WITHIN-replica edit distance at all.

Result: pair candidates, verified pairs, and linkage output are all
exactly `replicas` x the base corpus's — output grows LINEARLY with
data, so the wall-clock ratio reads as an operator curve, not an
output artifact.  Non-name feature columns (nation, segment,
balance) are copied unchanged, preserving each pair's agreement
pattern bit-identically.

Usage: python tools/make_scale_fixture_linkage.py [src] [out] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(base_dir: str, out_dir: str, replicas: int = 100) -> None:
    assert replicas <= 26 * 26, "2-char base-26 replica codes"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    stride = con.execute(
        f"SELECT max(c_custkey) + 1 FROM '{base_dir}/customer.parquet'"
    ).fetchone()[0]
    # ".aabb"-style doubled tag: chr(97 + r//26) twice, chr(97 + r%26) twice
    tag = (
        "'.' || repeat(chr(CAST(97 + r.r // 26 AS INTEGER)), 2) || "
        "repeat(chr(CAST(97 + r.r % 26 AS INTEGER)), 2)"
    )
    con.execute(
        f"COPY (SELECT t.* REPLACE (t.c_custkey + r.r * {stride} AS "
        f"c_custkey, t.c_name || {tag} AS c_name) "
        f"FROM '{base_dir}/customer.parquet' t "
        f"CROSS JOIN range({replicas}) r(r)) "
        f"TO '{out_dir}/customer.parquet' (FORMAT PARQUET)"
    )


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".cache", "scale_linkage100")
    )
    build(base, out, int(sys.argv[3]) if len(sys.argv) > 3 else 100)
    print("wrote", out)
