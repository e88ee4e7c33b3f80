"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the configuration is
chosen so the same logical plans scale to a multi-executor cluster:
AQE for runtime re-planning (partition coalescing, skew-join handling),
Arrow for any Python boundary crossing, UTC session timezone so results
agree with the (UTC-naive) DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "dpka-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``local[*]``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]" if cpus else "local[*]")
    sp = shuffle_partitions or int(
        os.environ.get("DPKA_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # HARD correctness pin, not a tuning default (r14, r13 advice):
        # operators/scale.py's global_rank/global_cumsums join a
        # sampled range exchange's output with an aggregate of the
        # SAME exchange; the two consumers see identical partition
        # boundaries ONLY because exchange reuse dedupes the sampled
        # shuffle (measured: with this flag off the two branches'
        # per-partition counts disagree on 32/32 partitions and ranks
        # silently corrupt — even over a deterministic parquet input,
        # because each exchange instance samples with its own rdd.id
        # seed).  `true` is Spark's default; pinning it here protects
        # against a caller override.  scale.py re-asserts at runtime.
        .config("spark.sql.exchange.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS), which Spark rejects by
        # default; read as long ns and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("DPKA_SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("DPKA_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
