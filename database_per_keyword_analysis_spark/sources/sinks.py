"""Report/cache sinks (SURVEY.md §2.1 S4/S5).

The reference materializes its fetched+filtered working set to a CSV
cache reused across runs (/root/reference/main.py:1077-1096) and exports
audit/debug reports as ``utf-8-sig`` CSVs for Excel
(/root/reference/main.py:894-990, encoding at main.py:922).

Spark-first: the cache tier is PARQUET (columnar, splittable,
predicate-pushdown-able — CSV survives only as the human-facing export
format), written partitioned so downstream scans prune; CSV exports are
single-file only because reports are small top-k results (driver-side
coalesce(1) on a 15-row report is fine; never do that to a fact table).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

UTF8_BOM = b"\xef\xbb\xbf"


def write_parquet_cache(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """S4 cache sink: columnar materialization of an expensive
    intermediate.  ``partition_by`` a low-cardinality pruning column
    (e.g. month bucket) so re-reads skip irrelevant data."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet_cache(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv_report(df: DataFrame, dest_file: str, *, bom: bool = True) -> str:
    """S5 report sink: one headered CSV file at ``dest_file``.

    Excel-compatibility parity with the reference's ``utf-8-sig``: a
    UTF-8 BOM is prepended (Spark itself always writes plain UTF-8).
    Reports are top-k-bounded, so the single-partition write is cheap by
    construction.
    """
    tmp_dir = dest_file + ".__spark_tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
    with open(part, "rb") as src, open(dest_file, "wb") as out:
        if bom:
            out.write(UTF8_BOM)
        shutil.copyfileobj(src, out)
    shutil.rmtree(tmp_dir)
    return dest_file


def read_evolved_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant scan (round 8): union the footers of
    every file under `path` with ``mergeSchema`` so a directory whose
    files were written under DIFFERENT schema versions (columns added
    over time — the normal life of a long-lived ingestion table) reads
    as one frame; rows from pre-evolution files surface NULL for the
    columns they predate.

    At 100 TB the cost model matters: mergeSchema reconciles FOOTERS
    (one metadata read per file, the same footer pass any scan plans),
    not data; Spark parallelizes the footer reads.  Pin the expected
    final schema downstream with an explicit select — mergeSchema
    widens, it never validates."""
    return spark.read.option("mergeSchema", "true").parquet(path)
