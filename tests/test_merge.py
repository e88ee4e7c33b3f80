"""MERGE/upsert (SCD1), partition-pruned parquet merge, SCD2 history."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import merge as M


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0, "2024-01"), (2, "b", 20.0, "2024-01"), (3, "c", 30.0, "2024-02")],
        "k int, v string, amt double, part string",
    )


def test_merge_update_insert_delete(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [
            (2, "B2", 22.0, "2024-01", False),  # update
            (4, "d", 40.0, "2024-02", False),  # insert
            (3, None, 0.0, "2024-02", True),  # delete
        ],
        "k int, v string, amt double, part string, is_delete boolean",
    )
    got = {
        r.k: (r.v, r.amt)
        for r in M.merge_upsert(base, changes, ["k"], delete_col="is_delete").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("B2", 22.0), 4: ("d", 40.0)}


def test_merge_without_delete_col(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, "A", 11.0, "2024-01")], "k int, v string, amt double, part string"
    )
    got = {r.k: r.v for r in M.merge_upsert(base, changes, ["k"]).collect()}
    assert got == {1: "A", 2: "b", 3: "c"}


def test_merge_preserves_base_column_order(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(9, "2024-01", "z", 1.0)], "k int, part string, v string, amt double"
    )
    merged = M.merge_upsert(base, changes, ["k"])
    assert merged.columns == base.columns


def test_merge_into_parquet_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _base(spark).write.partitionBy("part").parquet(path)

    def files_of(part):
        d = os.path.join(path, f"part={part}")
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    before_jan, before_feb = files_of("2024-01"), files_of("2024-02")
    changes = spark.createDataFrame(
        [(2, "B2", 22.0, "2024-01", False)],
        "k int, v string, amt double, part string, is_delete boolean",
    )
    M.merge_into_parquet(spark, path, changes, ["k"], "part", delete_col="is_delete")
    # untouched partition's files are byte-identical (never rewritten)
    assert files_of("2024-02") == before_feb
    assert files_of("2024-01") != before_jan
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_merge_partition_mover_tombstones_old_copy(spark, tmp_path):
    # round-5 advice: a change row whose partition value differs from
    # the key's existing partition must tombstone the old row too —
    # otherwise the key is duplicated (stale copy in the untouched
    # partition plus the new row)
    path = str(tmp_path / "tbl")
    _base(spark).write.partitionBy("part").parquet(path)
    changes = spark.createDataFrame(
        [(3, "c-moved", 33.0, "2024-03", False)],  # k=3 moves 02 -> 03
        "k int, v string, amt double, part string, is_delete boolean",
    )
    M.merge_into_parquet(spark, path, changes, ["k"], "part", delete_col="is_delete")
    rows = spark.read.parquet(path).collect()
    got = {(r.k, r.part): r.v for r in rows}
    assert got == {
        (1, "2024-01"): "a",
        (2, "2024-01"): "b",
        (3, "2024-03"): "c-moved",
    }
    assert len(rows) == 3  # no duplicated key


def test_merge_mover_emptying_a_partition_removes_it(spark, tmp_path):
    # the mover's OLD partition can end up with zero rows; dynamic
    # overwrite never touches empty-output partitions, so the merge
    # must delete the stale directory explicitly
    path = str(tmp_path / "tbl")
    _base(spark).write.partitionBy("part").parquet(path)
    changes = spark.createDataFrame(
        [(3, "c3", 30.0, "2024-01", False)],  # only row of 2024-02 moves out
        "k int, v string, amt double, part string, is_delete boolean",
    )
    M.merge_into_parquet(spark, path, changes, ["k"], "part", delete_col="is_delete")
    assert not os.path.isdir(os.path.join(path, "part=2024-02"))
    got = {r.k: (r.v, r.part) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", "2024-01"), 2: ("b", "2024-01"), 3: ("c3", "2024-01")}


def test_merge_plan_is_single_anti_join(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, "A", 11.0, "2024-01")], "k int, v string, amt double, part string"
    )
    plan = (
        M.merge_upsert(base, changes, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def _d(s):
    return dt.date.fromisoformat(s)


def test_scd2_collapses_runs_and_builds_intervals(spark):
    log = spark.createDataFrame(
        [
            (1, _d("2024-01-01"), 100, "P1"),
            (1, _d("2024-01-05"), 101, "P1"),  # same value -> same run
            (1, _d("2024-02-01"), 102, "P2"),  # flip
            (1, _d("2024-03-01"), 103, "P1"),  # flip back -> NEW run of P1
            (2, _d("2024-01-02"), 104, "P9"),
        ],
        "key int, ts date, seq int, val string",
    )
    hist = M.scd2_history(log, ["key"], "ts", ["val"], "seq")
    rows = sorted(
        (r.key, r.valid_from, r.val, r.valid_to, r.is_current, r.n_observations)
        for r in hist.collect()
    )
    assert rows == [
        (1, _d("2024-01-01"), "P1", _d("2024-02-01"), False, 2),
        (1, _d("2024-02-01"), "P2", _d("2024-03-01"), False, 1),
        (1, _d("2024-03-01"), "P1", None, True, 1),
        (2, _d("2024-01-02"), "P9", None, True, 1),
    ]


def test_scd2_same_day_double_flip_is_deterministic(spark):
    # two runs open on the same date; `_run` tie-break keeps lead() stable
    log = spark.createDataFrame(
        [
            (1, _d("2024-01-01"), 1, "A"),
            (1, _d("2024-01-01"), 2, "B"),
            (1, _d("2024-01-01"), 3, "A"),
        ],
        "key int, ts date, seq int, val string",
    )
    hist = M.scd2_history(log, ["key"], "ts", ["val"], "seq")
    rows = sorted((r.val, r.is_current) for r in hist.collect())
    assert rows == [("A", False), ("A", True), ("B", False)]
    assert hist.where(F.col("is_current")).count() == 1


def test_scd2_null_tracked_values(spark):
    log = spark.createDataFrame(
        [(1, _d("2024-01-01"), 1, None), (1, _d("2024-01-02"), 2, None), (1, _d("2024-01-03"), 3, "X")],
        "key int, ts date, seq int, val string",
    )
    hist = M.scd2_history(log, ["key"], "ts", ["val"], "seq")
    # NULL==NULL collapses (eqNullSafe), NULL->X opens a run
    assert hist.count() == 2


def test_merge_into_parquet_rejects_unrenderable_partition_values(spark, tmp_path):
    """Round-6 advice: partition values Spark percent-escapes in
    directory names (or NULL) must fail fast BEFORE any read/write, not
    silently mis-target the tombstone rmtree."""
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators.merge import (
        _check_partition_dir_value,
        merge_into_parquet,
    )

    # unit surface: the whitelist itself
    assert _check_partition_dir_value("p", "2024-01-01") == "2024-01-01"
    assert _check_partition_dir_value("p", 7) == "7"
    assert _check_partition_dir_value("p", "US east") == "US east"
    for bad in ("a=b", "a/b", "a:b", "a%b", None):
        with _pytest.raises(ValueError):
            _check_partition_dir_value("p", bad)

    # end-to-end: a changeset carrying an escapable partition value
    # aborts before touching the table
    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "ok", 10)], "k long, p string, v long")
    base.write.partitionBy("p").parquet(path)
    changes = spark.createDataFrame([(2, "a=b", 20)], "k long, p string, v long")
    with _pytest.raises(ValueError, match="characters Spark escapes"):
        merge_into_parquet(spark, path, changes, ["k"], "p")
    got = [(r.k, r.p, r.v) for r in spark.read.parquet(path).collect()]
    assert got == [(1, "ok", 10)]  # table untouched


def test_scd2_pit_join_picks_the_containing_interval(spark):
    """Round-8: temporal-join correctness — each fact takes the run
    whose half-open interval contains its ts; facts before the key's
    first run keep NULL; boundary fact at valid_from belongs to the
    NEW run (half-open)."""
    from database_per_keyword_analysis_spark.operators import merge as M

    def _t(s):
        return dt.datetime.fromisoformat(s)

    log = spark.createDataFrame(
        [
            (1, _t("2024-01-02"), 1, "bronze"),
            (1, _t("2024-01-05"), 2, "gold"),
            (2, _t("2024-01-03"), 3, "silver"),
        ],
        "k long, ts timestamp_ntz, seq long, tier string",
    )
    hist = M.scd2_history(log, ["k"], "ts", ["tier"], "seq").select(
        "k", "valid_from", "valid_to", "tier"
    )
    facts = spark.createDataFrame(
        [
            (1, 10, _t("2024-01-01")),  # before first run -> NULL
            (1, 11, _t("2024-01-03")),  # inside bronze
            (1, 12, _t("2024-01-05")),  # ON the boundary -> gold (half-open)
            (1, 13, _t("2024-01-09")),  # open current run -> gold
            (2, 20, _t("2024-01-04")),  # silver
            (3, 30, _t("2024-01-04")),  # unknown key -> NULL
        ],
        "k long, fid long, fts timestamp_ntz",
    )
    out = M.scd2_pit_join(facts, hist, ["k"], "fts")
    got = {r.fid: r.tier for r in out.collect()}
    assert got == {
        10: None, 11: "bronze", 12: "gold", 13: "gold", 20: "silver", 30: None,
    }
    # cardinality-preserving: one output row per fact
    assert out.count() == facts.count()
    # the dimension broadcasts; the fact side never shuffles for it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # equi on keys + interval residual
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_pit_join_rejects_nonkey_column_collisions(spark):
    """Round-9 (r8 advisor finding): a non-key history column sharing a
    name with a fact column would survive on BOTH sides and only fail
    on the next select-by-name — the helper must reject it up front
    with the column named."""
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators import merge as M

    facts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3), "f")], "k long, fts timestamp_ntz, ts string"
    )
    hist = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), None, "h")],
        "k long, valid_from timestamp_ntz, valid_to timestamp_ntz, ts string",
    )
    with _pytest.raises(ValueError, match=r"collide.*\['ts'\]"):
        M.scd2_pit_join(facts, hist, ["k"], "fts")


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=5, deadline=None)
@given(
    log=st.lists(  # (key, day, tier_idx)
        st.tuples(st.integers(0, 2), st.integers(1, 9), st.integers(0, 2)),
        min_size=1,
        max_size=12,
    ),
    facts=st.lists(  # (key, day)
        st.tuples(st.integers(0, 3), st.integers(1, 9)),
        min_size=1,
        max_size=8,
    ),
)
def test_scd2_pit_join_matches_python_reference(spark, log, facts):
    """Property: for ANY change log and fact set, scd2_history +
    scd2_pit_join agree with a direct 'latest log entry at or before
    the fact, by (ts, seq)' lookup — intervals are just an encoding of
    that rule, and collapsing equal-value runs must not change it."""
    from database_per_keyword_analysis_spark.operators import merge as M

    tiers = ["bronze", "silver", "gold"]
    log_rows = [
        (k, dt.datetime(2024, 1, d), i, tiers[t])
        for i, (k, d, t) in enumerate(log)
    ]
    fact_rows = [
        (k, fid, dt.datetime(2024, 1, d))
        for fid, (k, d) in enumerate(facts)
    ]
    ldf = spark.createDataFrame(
        log_rows,
        "k long, ts timestamp_ntz, seq long, tier string",
    )
    fdf = spark.createDataFrame(
        fact_rows, "k long, fid long, fts timestamp_ntz"
    )
    hist = M.scd2_history(ldf, ["k"], "ts", ["tier"], "seq").select(
        "k", "valid_from", "valid_to", "tier"
    )
    got = {
        r.fid: r.tier
        for r in M.scd2_pit_join(fdf, hist, ["k"], "fts").collect()
    }
    want = {}
    for k, fid, fts in fact_rows:
        at_or_before = [
            (ts, seq, tier)
            for kk, ts, seq, tier in log_rows
            if kk == k and ts <= fts
        ]
        want[fid] = max(at_or_before)[2] if at_or_before else None
    assert got == want


def test_table_diff_classifies_and_round_trips(spark):
    """Diff semantics: insert/update/delete classification with
    null-safe value compare (unchanged keys dropped), and the
    ROUND-TRIP invariant — merging the diff into old reproduces new."""
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, v string, amt double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),    # unchanged -> dropped
         (2, "b", None),    # NULL == NULL -> unchanged (null-safe)
         (3, "c", 33.0),    # update
         (5, "e", 50.0)],   # insert; k=4 deleted
        "k int, v string, amt double",
    )
    diff = M.table_diff(old, new, ["k"])
    got = {r.k: (r.op, r.v, r.amt) for r in diff.collect()}
    assert got == {
        3: ("update", "c", 33.0),
        4: ("delete", None, None),
        5: ("insert", "e", 50.0),
    }
    # round-trip: old + diff (as a keyed changeset w/ delete flag) == new
    changes = diff.withColumn("is_delete", F.col("op") == "delete").drop("op")
    merged = M.merge_upsert(old, changes, ["k"], delete_col="is_delete")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, new.collect())
    )
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


@settings(max_examples=5, deadline=None)
@given(
    old=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("abc"),
                  st.one_of(st.none(), st.floats(0, 9, allow_nan=False))),
        max_size=8, unique_by=lambda t: t[0],
    ),
    new=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("abc"),
                  st.one_of(st.none(), st.floats(0, 9, allow_nan=False))),
        max_size=8, unique_by=lambda t: t[0],
    ),
)
def test_table_diff_round_trip_property(spark, old, new):
    """Property: for ANY pair of key-unique snapshots,
    merge_upsert(old, table_diff(old, new)) == new — the diff is
    exactly the changeset that replays one version onto the other."""
    schema = "k long, v string, amt double"
    o = spark.createDataFrame(old, schema)
    n = spark.createDataFrame(new, schema)
    diff = M.table_diff(o, n, ["k"])
    changes = diff.withColumn(
        "is_delete", F.col("op") == "delete"
    ).drop("op")
    merged = M.merge_upsert(o, changes, ["k"], delete_col="is_delete")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, n.collect())
    )
