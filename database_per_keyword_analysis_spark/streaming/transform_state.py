"""transformWithStateInPandas: Spark 4's arbitrary-state processor API
(the successor to applyInPandasWithState used in `stateful.py` — both are
kept: the old API is the stable workhorse, this is the forward path).

Demonstrator: per-(user, event_type) running counts via a ValueState,
emitted cumulatively each batch (monotone ⇒ final answer = max over
emissions, the same micro-batch-invariance property `stateful.py` uses).

Requires the RocksDB state store provider (set at query start in
`run_transform_with_state`) — which is also the right provider at scale:
state lives off-heap/on-disk with changelog checkpointing instead of in
executor heap.

CONTAINER GATE: the API's Python runner needs `google.protobuf`, which
is not importable in this container (and installs are off-limits), so
`transform_with_state_available()` reports False here and the test suite
skips the live run; `stateful.py`'s applyInPandasWithState is the
working arbitrary-state path.  On a normal Spark 4 deployment this
module runs as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

def transform_with_state_available() -> bool:
    """True when the streaming Python runner's deps are importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


class RunningTypeCounts(StatefulProcessor):
    """ValueState counter per (user_id, event_type) grouping key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("n_events", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "event_type": [key[1]], "n_events": [n]}
        )

    def close(self) -> None:
        pass


def running_type_counts(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id", "event_type").transformWithStateInPandas(
        RunningTypeCounts(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_transform_with_state(stream_df_fn, spark, name: str) -> DataFrame:
    """Drive a transformWithState stream with availableNow under the
    RocksDB provider (required by the API; restored after the run)."""
    from .statestore import rocksdb_state_store

    with rocksdb_state_store(spark):
        q = (
            stream_df_fn()
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)
