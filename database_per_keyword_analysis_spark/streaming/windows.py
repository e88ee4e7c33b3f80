"""Structured Streaming surface (SURVEY.md §2.10 — absent from the
reference, which batch-resamples a static table; required by the north
star for the `events` stream shape).

Design: every streaming query is the SAME DataFrame expression as its
batch twin, applied to `readStream` instead of `read` — batch/stream
parity is the correctness strategy (§5.2.5): the batch run is the oracle
for the streaming run.

Watermarks bound state: `withWatermark('ts', ...)` lets Spark drop
window/dedup state once the event-time frontier passes, which is what
makes these operators runnable forever on an unbounded stream — the
100 TB/day posture.  All results are emitted with `availableNow` triggers
in tests (process-everything-then-stop), the recommended pattern for
batch-backfill of a streaming pipeline.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Shuffle-partition count pinned while a STREAMING query starts: every
# stateful operator instantiates one state store per shuffle partition
# per micro-batch, so at the local availableNow/backfill harness's
# micro-batch sizes the session default (32) is nearly pure fixed cost
# — a round-7 interleaved ABAB×4 on stream_view_purchase_left at sf0.1
# measured 32 partitions at 7.3 s warm vs 8 partitions at 2.9 s, same
# results.  This is a CAPACITY knob, not a plan-shape knob: state-store
# count must track per-batch stream volume, so a real deployment sizes
# it to the stream (DPKA_STREAM_SHUFFLE_PARTITIONS or session conf);
# Spark pins the value from the checkpoint's offset log on restart, so
# existing checkpoints keep the partition count they were created with.
STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("DPKA_STREAM_SHUFFLE_PARTITIONS", "8")
)


@contextlib.contextmanager
def _stream_shuffle(spark: SparkSession, n: int = STREAM_SHUFFLE_PARTITIONS):
    """Scope `spark.sql.shuffle.partitions` to a streaming query's
    start+drain; the session default is restored afterwards (the value
    is baked into the query at start, so restoring post-termination
    cannot affect the stream)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as a stream: parquet-directory source; ts normalized to
    µs TimestampType exactly as the batch loader does.

    readStream cannot infer schemas, so the schema is taken from a BATCH
    read of the same file — a footer-only read, no job.  This adapts to
    however the fixture generation encoded ts: TIMESTAMP(NANOS) surfaces
    as a ns long (under nanosAsLong) and is rebuilt by integer division;
    TIMESTAMP(MICROS) surfaces as TimestampNTZ and is cast.  Watermarks
    require TimestampType (not NTZ); under the UTC session timezone the
    values are identical to the batch loader's NTZ."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # FileStreamSource needs a directory; select the single fixture file
    # out of sf_dir with a glob filter.
    raw = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(static_schema["ts"].dataType, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    events: DataFrame,
    width: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling/sliding window counts — works on batch AND stream input
    (parity pair for timeutil.bucketed_counts / events.sliding_window_counts)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = F.window("ts", width, slide) if slide else F.window("ts", width)
    return (
        src.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows via the built-in session_window (the
    streaming-native analog of operators.events.sessionize)."""
    src = events.withWatermark("ts", "1 hour") if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup on event_id with bounded state
    (dropDuplicatesWithinWatermark)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def enriched_event_counts(
    events: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Stream-static enrichment join: the event stream joined to the
    static customer→nation dimension chain, counted per nation.

    This is Structured Streaming's *stream-static* join (vs the
    stream-stream view_purchase_stream_join): the static side is
    re-planned per micro-batch — so a dimension table updated between
    batches is picked up automatically — and the explicit `broadcast`
    keeps it out of the shuffle entirely; a stream-static inner join is
    stateless (no watermark, no join state), which is why it scales to
    an unbounded stream at any dimension size that broadcasts.  Batch
    frames flow through the identical expression (the oracle twin
    contract)."""
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    return (
        events.join(F.broadcast(dims), "user_id")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def stream_pit_enrich(
    facts_stream: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_ts: str,
) -> DataFrame:
    """Streaming temporal-table join (Flink's `FOR SYSTEM_TIME AS OF`
    parity): each streamed fact picks up the SCD2 history row whose
    half-open validity interval contains the fact's event time —
    the stream-static form of :func:`..operators.merge.scd2_pit_join`,
    which it delegates to verbatim (the batch/stream parity contract:
    one expression, two execution modes).  Stateless per event (no
    watermark, no join state — the dimension is static within a
    micro-batch and re-planned between batches), append mode; the
    run-level dimension broadcasts, so the stream never shuffles.

    Dimension-refresh contract (pinned by
    tests/test_streaming.py::test_stream_pit_dimension_rewrite_contract):
    "re-planned per micro-batch" re-reads the file CONTENTS, but the
    dimension's file LISTING is frozen when the query starts — so a
    parquet SCD2 dimension rewritten IN PLACE mid-stream (overwrite,
    compaction, `merge_into_parquet` on its partitions) kills the
    query with FAILED_READ_FILE.FILE_NOT_EXIST.  That failure is the
    designed posture: the stream can never SILENTLY serve a torn or
    stale dimension (the batch merge crash-window story's streaming
    analog).  To pick up a new dimension version either (a) restart
    the query from its checkpoint — the new run re-lists and joins
    pending facts against the NEW rows, exactly-once intact — or
    (b) re-read the dimension inside a foreachBatch body so every
    batch re-resolves the listing (the stream_user_latest_upsert
    pattern)."""
    from ..operators import merge as M

    return M.scd2_pit_join(facts_stream, history, keys, fact_ts)


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming DataFrame to completion with an availableNow
    trigger into a memory sink; returns the materialized result."""
    with _stream_shuffle(stream_df.sparkSession):
        q = (
            stream_df.writeStream.outputMode(
                "complete" if stream_df.isStreaming else "append"
            )
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stream_df.sparkSession.table(name)


def run_append_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Append-mode variant (for dedup/passthrough streams)."""
    with _stream_shuffle(stream_df.sparkSession):
        q = (
            stream_df.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stream_df.sparkSession.table(name)


def run_update_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Update-mode variant (for arbitrary-stateful operators)."""
    with _stream_shuffle(stream_df.sparkSession):
        q = (
            stream_df.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stream_df.sparkSession.table(name)


def view_purchase_stream_join(
    events: DataFrame, horizon: str = "2 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's views in the preceding `horizon`.

    Both sides carry watermarks, and the join condition bounds event-time
    distance — together they let Spark evict join state once the
    frontier passes (unbounded-stream safe; without the time bound the
    state would grow forever).  Works identically on batch frames (the
    oracle twin).
    """
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") < F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "purchase_ts",
        "view_ts",
    )


def view_purchase_stream_left_join(
    events: DataFrame, horizon: str = "2 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every view, matched to the
    same user's purchase within the following `horizon` — views that
    never convert emit with NULL purchase columns.  The streaming
    abandonment feed: inner joins can only say who converted; the outer
    side is what a re-engagement pipeline actually consumes.

    Outer-join semantics under watermarking (the part an inner join
    never exercises): a NULL-extended row for an unmatched view may be
    emitted only once the watermark has passed `view_ts + horizon` —
    before that, a matching purchase could still arrive, so the row sits
    in join state.  Consequently the outer results near the stream's
    tail (views whose horizon the final watermark never crossed) are
    withheld: deterministic, and the batch twin replicates the cutoff as
    `view_ts + horizon < least(max view_ts, max purchase_ts) − watermark`
    — the LEAST because under the default "min" multipleWatermarkPolicy
    each side's frontier advances only on its own rows, so an
    out-of-band max-ts event of a third type must NOT advance the
    cutoff (tests pin exactly that boundary).
    State size stays bounded exactly as in the inner form: both sides
    evict once the frontier passes the interval bound.

    Matched rows stream out immediately (same as inner); only the
    NULL-extension waits for the watermark — Spark's correctness rule
    that a row is null-extended only when no future match is possible.
    """
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        "left_outer",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
    )
