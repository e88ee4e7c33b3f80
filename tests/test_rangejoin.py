"""Binned range join: semantics vs a naive non-equi join, exactly-once
pair emission, boundary behavior, and the no-cartesian plan property."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import rangejoin as RJ


def _ts(minute: float):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def _fixtures(spark):
    # overlapping intervals, an interval spanning many bins, a
    # zero-length interval, and points on every boundary
    intervals = spark.createDataFrame(
        [
            ("a", 1, _ts(0), _ts(30)),
            ("a", 2, _ts(20), _ts(200)),  # overlaps 1, spans 4 hour-bins
            ("b", 1, _ts(50), _ts(50)),  # zero-length
        ],
        "key string, iid int, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [
            ("a", 10, _ts(0)),  # on start boundary
            ("a", 11, _ts(30)),  # on 1's end AND inside 2
            ("a", 12, _ts(199.5)),
            ("a", 13, _ts(200)),  # on 2's end boundary
            ("a", 14, _ts(201)),  # outside all
            ("b", 15, _ts(50)),  # inside the zero-length interval
            ("c", 16, _ts(25)),  # key with no intervals (extra_keys case)
        ],
        "key string, pid int, p timestamp",
    )
    return points, intervals


def _naive(points, intervals, inclusive_end=True, keys=False):
    out = points.crossJoin(intervals.select("iid", "s", "e", intervals["key"].alias("ikey")))
    cond = (F.col("p") >= F.col("s")) & (
        (F.col("p") <= F.col("e")) if inclusive_end else (F.col("p") < F.col("e"))
    )
    if keys:
        cond = cond & (F.col("key") == F.col("ikey"))
    return sorted(out.where(cond).select("pid", "iid").collect())


def test_matches_naive_inclusive(spark):
    points, intervals = _fixtures(spark)
    got = RJ.binned_range_join(
        points.drop("key"), intervals.drop("key"), "p", "s", "e", bin_minutes=60
    )
    assert sorted(got.select("pid", "iid").collect()) == _naive(points, intervals)


def test_matches_naive_exclusive_end(spark):
    points, intervals = _fixtures(spark)
    got = RJ.binned_range_join(
        points.drop("key"),
        intervals.drop("key"),
        "p",
        "s",
        "e",
        bin_minutes=60,
        inclusive_end=False,
    )
    assert sorted(got.select("pid", "iid").collect()) == _naive(
        points, intervals, inclusive_end=False
    )


def test_exactly_once_even_when_interval_spans_many_bins(spark):
    points, intervals = _fixtures(spark)
    # tiny bins force interval 2 to explode into >30 bin rows; each
    # matched pair must still appear exactly once
    got = RJ.binned_range_join(
        points.drop("key"), intervals.drop("key"), "p", "s", "e", bin_minutes=5
    )
    rows = got.select("pid", "iid").collect()
    assert len(rows) == len(set(rows))
    assert sorted(rows) == _naive(points, intervals)


def test_extra_keys_shard_the_join(spark):
    points, intervals = _fixtures(spark)
    got = RJ.binned_range_join(
        points, intervals, "p", "s", "e", bin_minutes=60, extra_keys=("key",)
    )
    assert sorted(got.select("pid", "iid").collect()) == _naive(
        points, intervals, keys=True
    )
    # the interval-side key copy is dropped: one `key` column remains
    assert got.columns.count("key") == 1


def test_plan_is_equi_join_not_nested_loop(spark):
    points, intervals = _fixtures(spark)
    got = RJ.binned_range_join(
        points.drop("key"), intervals.drop("key"), "p", "s", "e", bin_minutes=60
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_gap_intervals_basic(spark):
    ev = spark.createDataFrame(
        [
            ("x", 1, _ts(0)),
            ("x", 2, _ts(5)),
            ("x", 3, _ts(30)),  # >10 min gap -> new burst
            ("y", 4, _ts(0)),
        ],
        "key string, event_id int, ts timestamp",
    )
    got = {
        (r.key, r.burst_id): (r.burst_start, r.burst_end, r.n_burst_events)
        for r in RJ.gap_intervals(ev, "key", gap_minutes=10).collect()
    }
    assert got == {
        ("x", 1): (_ts(0), _ts(5), 2),
        ("x", 2): (_ts(30), _ts(30), 1),
        ("y", 1): (_ts(0), _ts(0), 1),
    }


def test_interval_overlap_exactly_once_across_bins(spark):
    import datetime as dt

    from database_per_keyword_analysis_spark.operators import rangejoin as RJ

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    # left interval spans 5 hourly bins; right overlaps it across 3 bins
    # -> they share multiple bins, but the pair must emit exactly once
    left = spark.createDataFrame(
        [(1, t(0), t(5)), (2, t(10), t(11))],
        "lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(2), t(7)),    # overlaps lid=1 over bins 2..5
         (20, t(6), t(8)),    # touches nothing of lid=1 (starts after 5? no: 6>5) -> no overlap with 1
         (30, t(11), t(12)),  # touches lid=2 at the inclusive boundary
         (40, t(20), t(21))], # no overlap at all
        "rid long, rs timestamp, re timestamp",
    )
    out = RJ.binned_interval_overlap(
        left, right, "ls", "le", "rs", "re", bin_minutes=60
    ).collect()
    pairs = sorted((r.lid, r.rid) for r in out)
    assert pairs == [(1, 10), (2, 30)]  # each exactly once, no dups
    by = {(r.lid, r.rid): r.overlap_us for r in out}
    assert by[(1, 10)] == 3 * 3_600_000_000  # [2h,5h] = 3h
    assert by[(2, 30)] == 0  # inclusive boundary touch counts, zero length


def test_pre_epoch_intervals_bin_correctly(spark):
    # round-5 advice: (us / width).cast('long') truncates toward zero,
    # which mis-binned pre-1970 timestamps; _floor_bin must floor.  A
    # point inside a pre-epoch interval, an interval crossing the epoch,
    # and an overlapping pre-epoch pair must all survive.
    t = dt.datetime
    intervals = spark.createDataFrame(
        [
            (1, t(1969, 12, 31, 22, 0), t(1969, 12, 31, 23, 30)),
            (2, t(1969, 12, 31, 23, 30), t(1970, 1, 1, 0, 30)),  # crosses epoch
        ],
        "iid int, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, t(1969, 12, 31, 22, 30)),  # inside 1
            (11, t(1969, 12, 31, 23, 45)),  # inside 2 (pre-epoch part)
            (12, t(1970, 1, 1, 0, 15)),  # inside 2 (post-epoch part)
            (13, t(1969, 12, 31, 21, 0)),  # outside all
        ],
        "pid int, p timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in RJ.binned_range_join(
            points, intervals, "p", "s", "e", bin_minutes=60
        ).collect()
    )
    assert got == [(10, 1), (11, 2), (12, 2)]

    left = intervals.selectExpr("iid as l_id", "s as l_s", "e as l_e")
    right = intervals.selectExpr("iid as r_id", "s as r_s", "e as r_e")
    pairs = sorted(
        (r.l_id, r.r_id)
        for r in RJ.binned_interval_overlap(
            left, right, "l_s", "l_e", "r_s", "r_e", bin_minutes=60
        ).collect()
    )
    # exactly once per overlapping pair, including the pre-epoch overlap
    assert pairs == [(1, 1), (1, 2), (2, 1), (2, 2)]
