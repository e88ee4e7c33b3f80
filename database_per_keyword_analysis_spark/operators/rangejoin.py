"""Binned range (interval) join: point ∈ [start, end] without a cartesian.

Spark has no native range-join optimization: a raw
``points JOIN intervals ON p BETWEEN s AND e`` has no equi key, so the
planner emits BroadcastNestedLoopJoin (small side) or CartesianProduct —
O(|P|·|I|) comparisons either way, dead at 100 TB. This module maps both
sides onto fixed-width time bins so the join becomes a hash / sort-merge
EQUI-join on bin id:

  * each interval is exploded to every bin it overlaps
    (``(end-start)/width + 1`` rows — bounded fanout; pick a width near
    the median interval length so the expansion stays ~2×);
  * each point lands in exactly ONE bin, so every matched
    (point, interval) pair is emitted exactly once — no post-join dedup;
  * the exact containment predicate filters within the bin.

At scale both sides shuffle ONCE on ``_bin`` (plus any ``extra_keys``,
which further shard hot bins); AQE's skew-join handles a pathological
bin. Overlapping intervals are fully supported — a point inside k
intervals yields k rows, exactly as the non-equi semantics require.

Reference parity: the reference (a pandas monolith, /root/reference/
main.py) has no interval join; this is a §2.3 gap-row extension in the
same spirit as the as-of join (operators/events.py:77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BIN_COL = "_bin"


def _floor_bin(us_col, width: int):
    """Exact floor(us / width) as BIGINT, correct for NEGATIVE epochs.

    `(us / width).cast('long')` truncates toward zero — equal to floor
    only post-1970; a pre-epoch timestamp mis-binned and the first-
    shared-bin emission predicate could then silently drop overlapping
    pairs (round-5 advice).  `pmod` is the positive modulus, so
    `us - pmod(us, width)` is the largest multiple of width <= us; the
    division is then exactly divisible (integer quotient < 2^53 is
    exactly representable, so the double division is exact)."""
    return ((us_col - F.pmod(us_col, F.lit(width))) / width).cast("long")


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_minutes: int = 60,
    extra_keys: tuple[str, ...] = (),
    inclusive_end: bool = True,
) -> DataFrame:
    """Inner-join `points` to every interval containing them.

    `point_col` / `start_col` / `end_col` are timestamp columns; all
    other column names must be disjoint between the two inputs (except
    `extra_keys`, which must exist on both sides and join as additional
    equi keys — the interval copy is dropped from the output).

    Bin arithmetic runs in integer microseconds (exact — no float
    boundary drift against an oracle's BETWEEN).
    """
    width = bin_minutes * 60_000_000
    p_us = F.unix_micros(F.col(point_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    binned_i = intervals.withColumn(
        BIN_COL,
        F.explode(F.sequence(_floor_bin(s_us, width), _floor_bin(e_us, width))),
    )
    binned_p = points.withColumn(BIN_COL, _floor_bin(p_us, width))
    cond = binned_p[BIN_COL] == binned_i[BIN_COL]
    for k in extra_keys:
        cond = cond & (binned_p[k] == binned_i[k])
    upper = (p_us <= e_us) if inclusive_end else (p_us < e_us)
    joined = binned_p.join(binned_i, cond).where((p_us >= s_us) & upper)
    drop = [binned_i[BIN_COL]] + [binned_i[k] for k in extra_keys]
    return joined.drop(binned_p[BIN_COL]).drop(*drop)


def gap_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap_minutes: int = 10,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based interval build, generalized from sessionize
    (operators/events.py:45): a burst breaks when `key_col`'s stream is
    idle longer than `gap_minutes`.

    Returns (key_col, burst_id, burst_start, burst_end, n_burst_events).
    Partitioned by `key_col` — at scale that is the natural shard key of
    the interval source (device, sensor, type); the range join itself is
    what must never go all-pairs.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = (prev_us.isNull() | ((us - prev_us) > gap_minutes * 60_000_000)).cast("int")
    with_ids = df.select(
        key_col,
        ts_col,
        tiebreak,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("burst_id"),
    )
    return with_ids.groupBy(key_col, "burst_id").agg(
        F.min(ts_col).alias("burst_start"),
        F.max(ts_col).alias("burst_end"),
        F.count(F.lit(1)).alias("n_burst_events"),
    )


def binned_interval_overlap(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    *,
    bin_minutes: int = 60,
) -> DataFrame:
    """Interval×interval OVERLAP join without a cartesian: pairs where
    ``[l_start, l_end]`` and ``[r_start, r_end]`` intersect (inclusive;
    overlap ⇔ max(starts) ≤ min(ends)).

    Both sides explode to their covered bins and equi-join on bin id —
    but an overlapping pair shares EVERY bin the intersection spans, so
    naive binning would duplicate pairs and need an expensive DISTINCT
    over the full output.  The exactly-once trick: emit a pair only in
    the bin containing ``max(l_start, r_start)`` — the intersection's
    first bin, which both sides necessarily cover — so each overlapping
    pair survives in exactly one joined row and no dedup runs at all.
    All other column names must be disjoint between the inputs.

    Scale: one shuffle per side on bin id (fanout = interval length /
    bin width, same knob as `binned_range_join`); the emission
    predicate and the exact overlap check are per-row integer-µs
    arithmetic inside the join.  Adds `overlap_us` (BIGINT, exact) to
    the output."""
    width = bin_minutes * 60_000_000
    ls = F.unix_micros(F.col(l_start).cast("timestamp"))
    le = F.unix_micros(F.col(l_end).cast("timestamp"))
    rs = F.unix_micros(F.col(r_start).cast("timestamp"))
    re = F.unix_micros(F.col(r_end).cast("timestamp"))
    binned_l = left.withColumn(
        BIN_COL,
        F.explode(F.sequence(_floor_bin(ls, width), _floor_bin(le, width))),
    )
    binned_r = right.withColumn(
        BIN_COL,
        F.explode(F.sequence(_floor_bin(rs, width), _floor_bin(re, width))),
    )
    overlap = (ls <= re) & (rs <= le)
    first_shared_bin = _floor_bin(F.greatest(ls, rs), width)
    joined = (
        binned_l.join(binned_r, binned_l[BIN_COL] == binned_r[BIN_COL])
        .where(overlap & (binned_l[BIN_COL] == first_shared_bin))
        .withColumn("overlap_us", F.least(le, re) - F.greatest(ls, rs))
    )
    return joined.drop(binned_l[BIN_COL]).drop(binned_r[BIN_COL])
