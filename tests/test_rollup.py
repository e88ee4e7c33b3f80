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
