"""Incremental rollup: coarse aggregates answered from a reusable
fine-grained pre-aggregate.

The reference recomputes each resample granularity from raw rows
(`main.py:812-816` — D/W/M each rescan the frame).  At 100 TB the raw
scan is the cost, so the scale pattern is a ROLLUP TABLE: aggregate once
at the finest granularity (day), persist it (~5-6 orders of magnitude
smaller), and answer every coarser window (month, quarter, year) by
re-aggregating the rollup — no raw rescan, and a streaming job can
append to the rollup incrementally (`streaming/sinks.py`).

Correctness hinges on the partials being re-aggregatable: counts and
DECIMAL sums compose exactly under any regrouping (floating-point sums
would drift with the grouping shape — the same reason oracle-hashed
aggregates use DECIMAL accumulators; avg/percentile must be carried as
sum+count / sketches instead).  `monthly_revenue_rollup` is
oracle-checked against DuckDB computing the SAME months DIRECTLY from
raw rows — proving rollup-then-reaggregate is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_order_rollup(orders: DataFrame) -> DataFrame:
    """Finest-granularity partials: per-day order count and DECIMAL
    revenue sum.  One map-side-combined shuffle over the raw table —
    the only raw scan any downstream granularity will ever need."""
    return orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        # keep the accumulator DECIMAL in the rollup so re-aggregation
        # stays exact under any regrouping
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_partial"),
    )


def reaggregate(daily: DataFrame, unit: str = "month") -> DataFrame:
    """Coarse totals from the daily rollup — any `date_trunc` unit
    (week/month/quarter/year) touches the small rollup, never the raw
    table, with bit-identical results.  One rollup serves every
    granularity: the whole point of building it."""
    return (
        daily.groupBy(F.date_trunc(unit, F.col("day")).cast("date").alias(unit))
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_partial").cast("double").alias("revenue"),
        )
        .orderBy(unit)
    )


def reaggregate_monthly(daily: DataFrame) -> DataFrame:
    return reaggregate(daily, "month")
