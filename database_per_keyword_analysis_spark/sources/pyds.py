"""Custom connector via Spark 4's Python DataSource API: line-delimited
JSON with corrupt-line repair.

The reference ships a CSV-repair ingest path (`sources/csv_repair.py`
mirrors it Spark-side); this module covers the OTHER connector seam — a
format Spark has no suitable native reader for, implemented against the
public `pyspark.sql.datasource` API (Spark 4's sanctioned way to add
sources in pure Python).  Semantics: each input file is one partition;
each line parses as a JSON object; lines that fail to parse, or parse
to a non-object, are SKIPPED (repair-on-read — the same
tolerate-and-continue contract as csv_repair) and counted nowhere.
Fields are extracted by schema name; missing keys surface as NULL.

Scale design: partitions() returns one InputPartition per data file, so
parallelism is the file count — the layout knob a 100 TB jsonl drop
already controls (thousands of part files → thousands of tasks).  The
reader streams line-by-line (no whole-file buffering), and only
schema-named fields are materialized (projection at the source).  A
Python source is Arrow-batched by the runtime but still pays Python
parse cost per line — it is the connector of last resort by design;
once landed, data should be compacted to parquet (`sources/sinks.py`).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlRepairDataSource(DataSource):
    """`spark.read.format("jsonl_repair").schema(...).load(path)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_repair"

    def schema(self):
        # no inference pass: a 100 TB drop should not be scanned twice.
        # The caller supplies the schema (DataFrameReader.schema()).
        raise NotImplementedError(
            "jsonl_repair requires an explicit .schema(...) — no "
            "inference scan over the input"
        )

    def reader(self, schema) -> "JsonlRepairReader":
        return JsonlRepairReader(self.options, schema)


class JsonlRepairReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_repair: load(path) is required")
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                f
                for f in glob.glob(os.path.join(self.path, "*"))
                if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition):
        with open(partition.value, "r", encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue  # repair: skip corrupt lines
                if not isinstance(obj, dict):
                    continue
                yield tuple(obj.get(n) for n in self.field_names)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(JsonlRepairDataSource)
