"""Measure the streaming CDC upsert's 10x scaling curve (round 7).

Fixture: .cache/scale_events1/events.parquet — 10 key-offset replicas
of sf0.1 events (user_id/event_id offset by max+1 strides, ts and the
other value columns copied unchanged), so user COUNT grows 10x while
per-user event counts and the ts distribution are bit-identical — the
same geometry-preserving recipe as the TPC-H fixture.

Protocol: the measured unit is the COLD 4-micro-batch drain
(maxFilesPerTrigger=1 over a 4-file split) into a fresh target — the
cached re-run is a zero-batch no-op (~0.3 s) and not informative.
Workdir (table + checkpoint) is wiped per iteration; 3 iterations per
scale, median, taken adjacently after one un-timed warmup drain per
scale (the TPC-H interleaved-warmth lesson).

Usage: python tools/measure_scale_upsert.py   (one JSON line per
measurement; transcribe into SCALE.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from database_per_keyword_analysis_spark.session import get_spark  # noqa: E402
from database_per_keyword_analysis_spark.sources import load  # noqa: E402
from database_per_keyword_analysis_spark.streaming import ingest as ING  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".cache")


def build_events_10x(base_dir: str, out_dir: str, replicas: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    src = f"{base_dir}/events.parquet"
    u_stride, e_stride = con.execute(
        f"SELECT max(user_id) + 1, max(event_id) + 1 FROM '{src}'"
    ).fetchone()
    con.execute(
        f"COPY (SELECT t.* REPLACE (user_id + r.r * {u_stride} AS user_id, "
        f"event_id + r.r * {e_stride} AS event_id) "
        f"FROM '{src}' t CROSS JOIN range({replicas}) r(r)) "
        f"TO '{out_dir}/events.parquet' (FORMAT PARQUET)"
    )


def drain_once(spark, src: str, work: str) -> float:
    shutil.rmtree(work, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    ING.run_streaming_upsert(
        stream,
        table_path=os.path.join(work, "table"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        keys=["user_id"],
        ts_col="ts",
        tiebreak_col="event_id",
        partition_col="event_type",
    )
    return time.perf_counter() - t0


def probe_flat(spark) -> None:
    """Round-8 (r7 verdict item 3 'Done' criterion): apply the SAME
    fixed 100-key STALE batch (ts strictly older than everything in
    the target) via upsert_batch against targets built from 1x / 10x /
    100x events.  A stale batch exercises exactly the term the round-7
    verdict flagged — the dedup window + version-probe join +
    isEmpty — and nothing else (nothing beats, so no merge/rewrite
    happens), so the measured time IS the probe cost, which must stay
    flat as the target grows: the probe scan carries the batch's
    pushed-down key filter against key-clustered files, so parquet
    min/max stats skip every row group holding no batch key.  (A
    WINNING apply additionally pays merge_into_parquet's
    partition-granularity rewrite, which scales with the touched
    partitions' size by documented contract — a separate, unchanged
    term.)  1 warmup + 3 measured per scale, median."""
    import pyspark.sql.functions as F

    base_dir = "/root/testdata/sf0.1"
    big_dir = os.path.join(CACHE, "scale_events1")
    if not os.path.exists(os.path.join(big_dir, "events.parquet")):
        build_events_10x(base_dir, big_dir)
    huge_dir = os.path.join(CACHE, "scale_events100")
    if not os.path.exists(os.path.join(huge_dir, "events.parquet")):
        build_events_10x(base_dir, huge_dir, replicas=100)

    for scale, sf_dir in (
        ("1x", base_dir), ("10x", big_dir), ("100x", huge_dir),
        ("1000x", None),
    ):
        table = os.path.join(CACHE, "upsert_scale", f"probe_target_{scale}")
        if scale == "1000x" and not os.path.isdir(table):
            # building 100M events and draining them is pointless for a
            # PROBE measurement — replicate the 1x TARGET's rows with
            # key offsets directly (same geometry-preserving recipe),
            # written key-clustered exactly as merge_into_parquet does
            one = spark.read.parquet(
                os.path.join(CACHE, "upsert_scale", "probe_target_1x")
            )
            stride = one.agg(F.max("user_id") + 1).collect()[0][0]
            (
                one.crossJoin(
                    spark.range(1000).select(F.col("id").alias("_r"))
                )
                .withColumn(
                    "user_id", F.col("user_id") + F.col("_r") * F.lit(stride)
                )
                .drop("_r")
                .repartitionByRange("user_id")
                .sortWithinPartitions("user_id")
                .write.partitionBy("event_type")
                .parquet(table)
            )
        elif not os.path.isdir(table):
            work = os.path.join(CACHE, "upsert_scale", f"probe_build_{scale}")
            src = os.path.join(CACHE, "upsert_scale", f"src_{scale}")
            if not os.path.isdir(src):
                load(spark, sf_dir, "events").select(
                    "user_id", "event_id", "ts", "event_type", "value"
                ).repartition(4).write.mode("overwrite").parquet(src)
            shutil.rmtree(work, ignore_errors=True)
            drain_once(spark, src, work)
            shutil.copytree(os.path.join(work, "table"), table)
        n_rows = spark.read.parquet(table).count()
        # the SAME batch at every scale: keys 0-99 from the base events
        # (replica offsets only add keys above the base range)
        batch = (
            load(spark, base_dir, "events")
            .select("user_id", "event_id", "ts", "event_type", "value")
            .where(F.col("user_id") < 100)
            .groupBy("user_id")
            .agg(
                F.max("event_id").alias("event_id"),
                F.max("ts").alias("ts"),
                F.first(F.lit("probe")).alias("event_type"),
                F.first(F.lit(0.0)).alias("value"),
            )
            .withColumn("ts", F.col("ts") - F.expr("INTERVAL 1000 DAYS"))
            .localCheckpoint()
        )
        samples = []
        for i in range(4):  # first is warmup
            t0 = time.perf_counter()
            ING.upsert_batch(
                batch, table, ["user_id"], "ts", "event_id", "event_type"
            )
            samples.append(round(time.perf_counter() - t0, 3))
        med = sorted(samples[1:])[1]
        print(json.dumps({
            "q": "upsert_batch_probe", "scale": scale,
            "target_rows": n_rows, "batch_keys": 100,
            "apply_sec_median": med, "samples": samples,
        }))


def main() -> None:
    spark = get_spark("measure-scale-upsert")
    if "--probe" in sys.argv:
        probe_flat(spark)
        return
    base_dir = "/root/testdata/sf0.1"
    big_dir = os.path.join(CACHE, "scale_events1")
    if not os.path.exists(os.path.join(big_dir, "events.parquet")):
        build_events_10x(base_dir, big_dir)

    splits = {}
    for scale, sf_dir in (("1x", base_dir), ("10x", big_dir)):
        src = os.path.join(CACHE, "upsert_scale", f"src_{scale}")
        if not os.path.isdir(src):
            load(spark, sf_dir, "events").select(
                "user_id", "event_id", "ts", "event_type", "value"
            ).repartition(4).write.mode("overwrite").parquet(src)
        splits[scale] = src

    work = os.path.join(CACHE, "upsert_scale", "work")
    for scale in ("1x", "10x"):  # un-timed warmup drain per scale
        drain_once(spark, splits[scale], work)
    for scale in ("1x", "10x"):
        ts = sorted(drain_once(spark, splits[scale], work) for _ in range(3))
        print(json.dumps({"q": "stream_user_latest_upsert", "scale": scale,
                          "cold_drain": round(ts[1], 3)}))


if __name__ == "__main__":
    main()
