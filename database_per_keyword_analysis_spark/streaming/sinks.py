"""Streaming file sinks with exactly-once delivery.

The memory sinks in `windows.py` are test harnesses; a production
pipeline lands streams in files.  Spark's file sink is exactly-once by
construction: the checkpoint records which source files/offsets each
micro-batch consumed, and a transaction log under `_spark_metadata`
records which output files each batch committed — a restart replays
nothing and re-commits nothing, and readers only see committed files.

At 100 TB/day this is the canonical landing pattern: availableNow
triggers process the backlog in bounded batches through the same
incremental plan, checkpoints make restarts idempotent, and partitioned
output (`partition_by`) gives downstream scans partition pruning.
`tests/test_streaming.py::test_parquet_sink_exactly_once` proves the
restart-idempotence property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
) -> None:
    """Drive a streaming DataFrame through an availableNow trigger into
    an exactly-once parquet file sink (append mode: rows are emitted
    once finalized — pass-through streams immediately, windowed aggs on
    watermark close)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    q.awaitTermination()
