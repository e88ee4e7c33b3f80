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


def hll_sketch_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    unit: str = "day",
) -> DataFrame:
    """Per-bucket HyperLogLog sketches of `key_col`'s distinct values
    (round 8): `(bucket, sketch BINARY, n_rows)` via Spark's built-in
    Datasketches `hll_sketch_agg` — the PERSISTABLE form of a distinct
    count.  Unlike `count_distinct` (whose per-bucket results cannot
    be combined) or the incremental sum/count rollup above (which
    needs only addition), a distinct count is only incrementally
    maintainable through a mergeable sketch: store one small binary
    per day, and ANY coarser window's distinct estimate comes from
    `hll_merge_estimate` over the stored sketches — no raw re-scan.
    At 100 TB this is the difference between re-reading a year of
    events to answer "monthly uniques" and merging 365 KB-sized
    sketches.  Union of per-bucket sketches is state-exact: merging
    daily sketches yields the SAME sketch as one pass over the raw
    range (test-pinned bit-for-bit on the estimate)."""
    return (
        df.select(
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("_k"),
        )
        .groupBy("bucket")
        .agg(
            F.expr("hll_sketch_agg(_k)").alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def hll_merge_estimate(
    sketches: DataFrame,
    unit: str = "week",
) -> DataFrame:
    """Coarser-window distinct estimates from persisted fine-grained
    sketches: re-bucket, `hll_union_agg` the binaries, estimate.
    Input is `hll_sketch_rollup` output (possibly read back from
    parquet — the sketch column round-trips as BINARY); cost is
    bucket-cardinality-scale, never raw-data-scale."""
    return (
        sketches.select(
            F.date_trunc(unit, F.col("bucket")).alias("bucket"),
            "sketch",
            "n_rows",
        )
        .groupBy("bucket")
        .agg(
            F.expr(
                "hll_sketch_estimate(hll_union_agg(sketch))"
            ).alias("est_distinct"),
            F.sum("n_rows").alias("n_rows"),
        )
        .orderBy("bucket")
    )
