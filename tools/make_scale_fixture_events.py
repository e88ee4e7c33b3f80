"""Build a 10x events fixture for the r15 sf1 re-probes (r14 verdict
item 8): .cache/scale_events1/events.parquet.

Replication preserves per-user journey geometry exactly (funnel
semantics are per-user): each replica offsets user_id and event_id by
that table's stride (max key + 1), all other columns verbatim — user
cardinality grows 10x, per-user event sequences are bit-identical to
the base, so funnel reach-table sizes grow 10x while per-round join
fanout stays fixed.  DuckDB does the replication; timestamps write as
microsecond TIMESTAMP (the probe compares two SPARK arms on the same
fixture, so engine-level ns/us parity is irrelevant here).

Usage: python tools/make_scale_fixture_events.py [src_dir] [out_dir]
"""
from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(base: str, out: str, replicas: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    src = f"'{base}/events.parquet'"
    u_stride, e_stride = con.execute(
        f"SELECT max(user_id) + 1, max(event_id) + 1 FROM {src}"
    ).fetchone()
    con.execute(
        f"COPY (SELECT event_id + i * {e_stride} AS event_id, ts, "
        f"user_id + i * {u_stride} AS user_id, event_type, value, props "
        f"FROM {src} CROSS JOIN range({replicas}) t(i) "
        f"ORDER BY event_id) TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()
    print(f"wrote {out}/events.parquet: {n[0]} rows")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".cache", "scale_events1")
    )
    build(base, out)
