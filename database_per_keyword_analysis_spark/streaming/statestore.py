"""State-store provider selection for Structured Streaming.

The default HDFSBackedStateStoreProvider keeps every key of streaming
state in executor heap — fine for windowed counts at test scale, a
hard ceiling at 100 TB/day where keyed state (dedup sets, session maps,
join buffers) outgrows memory.  RocksDBStateStoreProvider (built into
Spark since 3.2, no extra deps) spills state to local disk with
changelog checkpointing, so state size is bounded by disk, not heap —
the provider any large stateful deployment should run.

Provider choice is a session conf read at *query start*, so a context
manager is the safe shape: set, start the query inside, restore.
Correctness is provider-independent — `tests/test_streaming.py::
test_rocksdb_state_store_parity` proves the same query produces
identical results under both providers.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
# Changelog checkpointing uploads per-batch deltas instead of full
# RocksDB snapshots — the recommended setting for large state.
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


@contextmanager
def rocksdb_state_store(spark: SparkSession):
    """Run streaming queries started inside this block on RocksDB state
    storage (with changelog checkpointing); restores prior conf after."""
    prev = {k: spark.conf.get(k, None) for k in (_PROVIDER_KEY, _CHANGELOG_KEY)}
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_KEY, "true")
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
