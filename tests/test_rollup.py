"""Incremental rollup (operators/rollup.py): re-aggregating the daily
pre-aggregate must be EXACT — bit-identical to computing the coarse
granularity directly from raw rows — under any partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_per_keyword_analysis_spark.operators import rollup as RU
from database_per_keyword_analysis_spark.sources import load


def _direct_monthly(orders):
    return (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("month")
    )


def test_rollup_reaggregate_exact(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    via_rollup = RU.reaggregate_monthly(RU.daily_order_rollup(orders)).collect()
    direct = _direct_monthly(orders).collect()
    assert [tuple(r) for r in via_rollup] == [tuple(r) for r in direct]
    assert len(direct) > 0


def test_rollup_exact_under_repartitioning(spark, sf_dir):
    """DECIMAL partials make the rollup grouping-shape-independent: a
    differently-partitioned raw table yields identical month totals."""
    orders = load(spark, sf_dir, "orders")
    a = RU.reaggregate_monthly(RU.daily_order_rollup(orders)).collect()
    b = RU.reaggregate_monthly(
        RU.daily_order_rollup(orders.repartition(17, "o_custkey"))
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_mv_delta_merge_equals_full_recompute(spark):
    """Round-9 IVM exactness: for every split of the rows into
    base/delta (including empty-delta and empty-base), merging the
    delta's partials into the base MV is bit-identical to
    re-aggregating everything from raw rows."""
    import datetime as dt

    from database_per_keyword_analysis_spark.operators import rollup as RU

    rows = [
        (i, f"g{i % 3}", float(i) * 1.25, dt.date(2024, 1 + i % 3, 1 + i))
        for i in range(12)
    ]
    schema = "id long, g string, amt double, d date"
    merges = {"n": "sum", "s": "sum", "lo": "min", "hi": "max"}

    def partials(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amt").cast("decimal(18,6)")).alias("s"),
            F.min("d").alias("lo"),
            F.max("d").alias("hi"),
        )

    full = spark.createDataFrame(rows, schema)
    want = sorted(tuple(r) for r in partials(full).collect())
    for cut in (0, 4, 7, 12):
        base = spark.createDataFrame(rows[:cut] or [], schema)
        delta = spark.createDataFrame(rows[cut:] or [], schema)
        got = RU.mv_delta_merge(
            partials(base), partials(delta), ["g"], merges
        )
        assert sorted(tuple(r) for r in got.collect()) == want


def test_mv_delta_merge_rejects_bad_schema_and_merge(spark):
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators import rollup as RU

    mv = spark.createDataFrame([("a", 1)], "g string, n long")
    with _pytest.raises(ValueError, match="unsupported merge"):
        RU.mv_delta_merge(mv, mv, ["g"], {"n": "avg"})
    other = spark.createDataFrame([("a", 1, 2)], "g string, n long, x long")
    with _pytest.raises(ValueError, match="exactly"):
        RU.mv_delta_merge(mv, other, ["g"], {"n": "sum"})


def test_mv_apply_changes_equals_full_recompute_over_random_batches(spark):
    """Round-10 delete/update-aware IVM (r9 verdict item 2): for
    seeded random upsert/delete batches — including group-MOVING
    updates and groups fully retracted — applying the signed-partial
    changeset to the old MV is bit-identical to recomputing the MV
    from the new table version."""
    import random

    from database_per_keyword_analysis_spark.operators import merge as M
    from database_per_keyword_analysis_spark.operators import rollup as RU

    schema = "id long, g string, amt double"

    def partials(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amt").cast("decimal(18,6)")).alias("s"),
        )

    rng = random.Random(1007)
    for trial in range(4):
        old_rows = [
            (i, f"g{rng.randrange(4)}", round(rng.uniform(1, 100), 2))
            for i in range(30)
        ]
        new_rows = []
        next_id = 1000
        for (i, g, amt) in old_rows:
            r = rng.random()
            if r < 0.25:
                continue  # delete
            if r < 0.45:
                # update: measure change, half of them also move group
                g2 = f"g{rng.randrange(4)}" if r < 0.35 else g
                new_rows.append((i, g2, round(amt + rng.uniform(-50, 50), 2)))
            else:
                new_rows.append((i, g, amt))  # unchanged
        for _ in range(rng.randrange(8)):
            new_rows.append(
                (next_id, f"g{rng.randrange(5)}", round(rng.uniform(1, 100), 2))
            )
            next_id += 1
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows or [(0, "g0", 1.0)], schema)
        changes = M.table_diff(old, new, ["id"], include_old=True)
        got = RU.mv_apply_changes(
            partials(old), changes, ["g"], "n", {"s": "amt"}
        )
        want = sorted(tuple(r) for r in partials(new).collect())
        assert sorted(tuple(r) for r in got.collect()) == want, f"trial {trial}"


def test_mv_apply_changes_drops_fully_retracted_groups(spark):
    from database_per_keyword_analysis_spark.operators import merge as M
    from database_per_keyword_analysis_spark.operators import rollup as RU

    schema = "id long, g string, amt double"
    old = spark.createDataFrame([(1, "a", 10.0), (2, "b", 5.0)], schema)
    new = spark.createDataFrame([(2, "b", 5.0)], schema)  # group a gone

    def partials(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amt").cast("decimal(18,6)")).alias("s"),
        )

    changes = M.table_diff(old, new, ["id"], include_old=True)
    got = RU.mv_apply_changes(partials(old), changes, ["g"], "n", {"s": "amt"})
    assert [(r.g, r.n, float(r.s)) for r in got.collect()] == [("b", 1, 5.0)]


def test_mv_apply_changes_requires_old_columns(spark):
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators import rollup as RU

    mv = spark.createDataFrame([("a", 1, 1.0)], "g string, n long, s double")
    no_old = spark.createDataFrame(
        [(1, "insert", "a", 2.0)], "id long, op string, g string, amt double"
    )
    with _pytest.raises(ValueError, match="include_old"):
        RU.mv_apply_changes(mv, no_old, ["g"], "n", {"s": "amt"})


def test_table_diff_include_old_carries_retraction_values(spark):
    from database_per_keyword_analysis_spark.operators import merge as M

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 5.0), (3, "c", 7.0)], "id long, g string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "z", 6.0), (4, "d", 1.0)], "id long, g string, v double"
    )
    got = {
        r.id: r
        for r in M.table_diff(old, new, ["id"], include_old=True).collect()
    }
    assert set(got) == {2, 3, 4}
    assert (got[2].op, got[2].g, got[2].old_g, got[2].v, got[2].old_v) == (
        "update", "z", "b", 6.0, 5.0,
    )
    assert (got[3].op, got[3].g, got[3].old_g, got[3].old_v) == (
        "delete", None, "c", 7.0,
    )
    assert (got[4].op, got[4].g, got[4].old_g) == ("insert", "d", None)


def test_mv_apply_changes_minmax_equals_full_recompute(spark):
    """Round-10 min/max retraction contract: for seeded random
    upsert/delete batches (group-movers included), the split
    maintenance — signed count/sum + distributive insert-merge +
    affected-group re-aggregation — matches the full recompute over
    the new version for ALL partials, including groups whose extremum
    was the retracted row and brand-new groups."""
    import datetime as dt
    import random

    from database_per_keyword_analysis_spark.operators import merge as M
    from database_per_keyword_analysis_spark.operators import rollup as RU

    schema = "id long, g string, amt double, d date"

    def partials(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("amt").cast("decimal(18,6)")).alias("s"),
            F.min("d").alias("lo"),
            F.max("d").alias("hi"),
        )

    rng = random.Random(515)
    for trial in range(3):
        old_rows = [
            (
                i,
                f"g{rng.randrange(4)}",
                round(rng.uniform(1, 100), 2),
                dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(300)),
            )
            for i in range(40)
        ]
        new_rows = []
        next_id = 1000
        for (i, g, amt, d) in old_rows:
            r = rng.random()
            if r < 0.3:
                continue  # delete (often retracting a group extremum)
            if r < 0.5:
                g2 = f"g{rng.randrange(4)}" if r < 0.4 else g
                new_rows.append(
                    (i, g2, round(amt + rng.uniform(-50, 50), 2),
                     d + dt.timedelta(days=rng.randrange(-40, 40)))
                )
            else:
                new_rows.append((i, g, amt, d))
        for _ in range(rng.randrange(8)):
            new_rows.append(
                (next_id, f"g{rng.randrange(5)}",
                 round(rng.uniform(1, 100), 2),
                 dt.date(2024, 6, 1) + dt.timedelta(days=rng.randrange(100)))
            )
            next_id += 1
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows or [(0, "g0", 1.0, dt.date(2024, 1, 1))], schema)
        changes = M.table_diff(old, new, ["id"], include_old=True)
        got = RU.mv_apply_changes_minmax(
            partials(old), changes, new, ["g"], "n", {"s": "amt"},
            {"lo": ("min", "d"), "hi": ("max", "d")},
        )
        want = sorted(tuple(r) for r in partials(new).collect())
        assert sorted(tuple(r) for r in got.collect()) == want, f"trial {trial}"


def test_mv_apply_changes_minmax_rejects_bad_extrema(spark):
    import pytest as _pytest

    from database_per_keyword_analysis_spark.operators import rollup as RU

    mv = spark.createDataFrame([("a", 1, 1.0)], "g string, n long, lo double")
    with _pytest.raises(ValueError, match="min/max"):
        RU.mv_apply_changes_minmax(
            mv, mv, mv, ["g"], "n", {}, {"lo": ("avg", "x")}
        )
