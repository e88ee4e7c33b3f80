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
