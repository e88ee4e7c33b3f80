from __future__ import annotations

import pytest
from pyspark.sql import types as T

from database_per_keyword_analysis_spark.sources import TABLES, load


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load(spark, sf_dir, name)
        assert df.count() > 0, name


def test_events_ts_is_timestamp(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    assert isinstance(
        ev.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    # nanos truncate toward zero to µs — first event is known from fixtures
    first = ev.orderBy("ts").first()
    assert first.ts.isoformat() == "2024-01-01T00:09:58.778549"


def test_schema_validation_rejects_drift(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "region")
    bad = df.withColumn("r_regionkey", df.r_regionkey.cast("string"))
    p = str(tmp_path / "region.parquet")
    bad.write.parquet(p)
    with pytest.raises(ValueError, match="r_regionkey"):
        load(spark, str(tmp_path), "region")


def test_missing_column_rejected(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "nation").drop("n_name")
    p = str(tmp_path / "nation.parquet")
    df.write.parquet(p)
    with pytest.raises(ValueError, match="n_name"):
        load(spark, str(tmp_path), "nation")


def test_fan_out_estimator_matches_scan(spark, sf_dir):
    """_estimated_scan_partitions agrees with the real scan partitioning
    on fixture files (the RDD probe it replaced is ground truth here),
    and fan_out raises an under-split scan to cluster parallelism."""
    from database_per_keyword_analysis_spark.sources.loader import (
        _estimated_scan_partitions,
        fan_out,
    )

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert _estimated_scan_partitions(df) == df.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism
    # min_bytes=0 forces the decision down to the partition estimate
    assert fan_out(df, min_bytes=0).rdd.getNumPartitions() == target
    # a scan the estimator says is already wide enough passes through
    # identically (no Repartition node inserted)
    assert fan_out(df, min_partitions=1, min_bytes=0) is df
    # the size floor: a tiny input (fixture documents ≪ FAN_OUT_MIN_BYTES)
    # passes through untouched — the shuffle would cost more than the
    # parallelism it unlocks (measured at sf0.1, see loader.py)
    assert fan_out(df) is df


def test_fan_out_estimator_many_small_files(spark, tmp_path):
    """FilePartition PACKS multiple small files into one partition; a
    per-file ceil(size/split) estimate over-counts and would silently
    skip a needed repartition.  Parity is asserted against the real scan
    over 12 tiny files."""
    from database_per_keyword_analysis_spark.sources.loader import (
        _estimated_scan_partitions,
    )

    p = str(tmp_path / "many")
    spark.range(1200).repartition(12).write.parquet(p)
    df = spark.read.parquet(p)
    assert _estimated_scan_partitions(df) == df.rdd.getNumPartitions()


def test_hadoop_file_sizes_via_fs_api(spark, sf_dir):
    """Size probe through the Hadoop FileSystem API (the non-local-path
    route: s3a/hdfs/abfs) — exercised here via file: URIs against the
    same LocalFileSystem implementation, checked against os.stat."""
    import os

    from database_per_keyword_analysis_spark.sources.loader import (
        _hadoop_file_sizes,
    )

    local = f"{sf_dir}/documents.parquet"
    got = _hadoop_file_sizes(spark, ["file://" + os.path.abspath(local)])
    assert got == [os.path.getsize(local)]
    assert _hadoop_file_sizes(spark, ["file:///nonexistent/nope.parquet"]) is None
