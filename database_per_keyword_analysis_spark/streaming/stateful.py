"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 — "custom stateful operators" north-star row).

Built-in stateful ops (windowed agg, session_window, stream dedup) live
in ``windows.py``; this module is the ESCAPE HATCH pattern for semantics
they can't express: arbitrary per-key state evolved batch-by-batch in
Arrow-vectorized Python.

Demonstrator: per-user running event statistics (count / value max /
value sum).  Emission is CUMULATIVE in update mode, so the final answer
per key is the row with the highest ``n_events`` — deterministic no
matter how the availableNow trigger slices the input into micro-batches
(counts are monotone).  That property is what makes a custom stateful
operator oracle-checkable in batch: max-over-emissions == batch GROUP BY.

Scale notes: state is partitioned by user_id across executors
(spark.sql.shuffle.partitions state-store instances); each micro-batch
shuffles only that batch's rows; per-key state here is three scalars, so
the state store stays O(distinct users) regardless of stream length.
GroupStateTimeout would bound state for abandoned keys in a real
24/7 pipeline (not used here: the fixture stream is finite).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mx, sm = state.get if state.exists else (0, None, 0.0)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        if len(vals):
            batch_max = float(vals.max())
            mx = batch_max if mx is None else max(mx, batch_max)
            sm += float(vals.sum())
    state.update((n, mx, sm))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "max_value": [mx], "sum_value": [sm]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user aggregator.  Works on both a stream
    (true arbitrary-state path) and a batch frame (applyInPandas with a
    None state shim is NOT used — batch mode groups once, so the same
    function body runs with empty initial state per key)."""
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["value"].dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "max_value": [float(vals.max()) if len(vals) else None],
                "sum_value": [float(vals.sum()) if len(vals) else 0.0],
            }
        )

    return events.groupBy("user_id").applyInPandas(batch_fn, OUTPUT_SCHEMA)


def finalize_cumulative(updates: DataFrame) -> DataFrame:
    """Collapse cumulative update-mode emissions to the final row per
    key: the emission with the largest n_events (monotone counter)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
