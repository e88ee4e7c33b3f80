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
Both reader and writer address `path` with plain `open()`/`os` calls:
the contract is a filesystem every task can see (NFS/FUSE-mounted
object store on a cluster; local disk on local[n]).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def _data_files(path: str) -> list[str]:
    """Sorted data files under `path` (sidecars like _SUCCESS, hidden
    files, and the writer's `.inprogress` staged files excluded); a
    plain file path is its own single-element list.  Staged files are
    unpublished by definition — the writer renames them only at job
    commit — so a reader concurrent with a write sees the old dataset,
    never a partial one."""
    if os.path.isdir(path):
        return sorted(
            f
            for f in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(f)
            and not os.path.basename(f).startswith(("_", "."))
            and not f.endswith(".inprogress")
        )
    return [path]


def _parse_file(path: str, field_names):
    """Repair-on-read line parse shared by the batch and stream readers."""
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
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
            yield obj


class JsonlRepairDataSource(DataSource):
    """`spark.read.format("jsonl_repair").schema(...).load(path)` /
    `df.write.format("jsonl_repair").mode(...).save(path)`."""

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

    def writer(self, schema, overwrite: bool) -> "JsonlRepairWriter":
        return JsonlRepairWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema) -> "JsonlStreamReader":
        return JsonlStreamReader(self.options, schema)


_PUSHABLE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)


class JsonlRepairReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_repair: load(path) is required")
        self.field_names = [f.name for f in schema.fields]
        self._preds: list = []

    def pushFilters(self, filters):
        """Accept simple comparison filters on top-level fields and apply
        them DURING the Python parse — rows failing a pushed predicate
        are dropped before crossing the Arrow boundary to the JVM, which
        at 100 TB is the difference between shipping the drop and
        shipping the selection.  Anything else (nested paths, IN,
        string matchers, nulls) is returned to Spark to evaluate above
        the scan — correctness never depends on what gets pushed."""
        remaining = []
        for f in filters:
            if isinstance(f, _PUSHABLE) and len(f.attribute) == 1:
                self._preds.append((f.attribute[0], type(f).__name__, f.value))
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self._preds.append((f.attribute[0], "IsNotNull", None))
            else:
                remaining.append(f)
        return remaining

    def _keep(self, obj: dict) -> bool:
        for name, op, val in self._preds:
            v = obj.get(name)
            if v is None:
                return False  # comparisons and IsNotNull all reject NULL
            if op == "EqualTo" and not v == val:
                return False
            if op == "GreaterThan" and not v > val:
                return False
            if op == "GreaterThanOrEqual" and not v >= val:
                return False
            if op == "LessThan" and not v < val:
                return False
            if op == "LessThanOrEqual" and not v <= val:
                return False
        return True

    def partitions(self):
        return [InputPartition(f) for f in _data_files(self.path)]

    def read(self, partition):
        for obj in _parse_file(partition.value, self.field_names):
            if self._keep(obj):
                yield tuple(obj.get(n) for n in self.field_names)


class JsonlStreamReader(SimpleDataSourceStreamReader):
    """The same drop as an UNBOUNDED stream: each micro-batch picks up
    the data files that appeared since the last committed offset.

    Offsets are the sorted list of already-processed file names — exact
    (no timestamp races: a file is either in the set or not) and
    replayable (`readBetweenOffsets` re-reads exactly the files a
    recovering batch owned, the exactly-once contract Structured
    Streaming needs from a source).  Files are assumed immutable once
    visible — the atomic-rename convention `JsonlRepairWriter` follows;
    in-progress files (dot/underscore-prefixed or `.inprogress`) are
    invisible to `_data_files`.  The offset grows with the file count:
    fine for a drop directory rotated by compaction (the documented
    lifecycle — land, compact to parquet, clear); for an ever-growing
    path a high-water-mark naming scheme belongs in the source, not
    this reader."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_repair: load(path) is required")
        self.field_names = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows(self, files):
        # a LIST ITERATOR, not a generator: the runtime's prefetch cache
        # shallow-copies the iterator (list iterators pickle-copy,
        # generators don't) and probes empty batches with next()
        # (expecting StopIteration, which a bare list doesn't raise).
        # Simple stream readers materialize on the driver by design —
        # per-batch volume is the new-files delta, not the corpus.
        return iter(
            [
                tuple(obj.get(n) for n in self.field_names)
                for f in files
                for obj in _parse_file(f, self.field_names)
            ]
        )

    def read(self, start: dict):
        current = _data_files(self.path)
        seen = set(start.get("seen", []))
        new = [f for f in current if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        owned = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return self._rows(owned)


class _JsonlCommit(WriterCommitMessage):
    """Carries the task's staged file name to the job-level commit."""

    def __init__(self, staged: str):
        self.staged = staged


class JsonlRepairWriter(DataSourceWriter):
    """One jsonl file per task, published at JOB commit, not task
    completion (round-5 advice): each task writes only a `.inprogress`
    staged file and ships its name in the `WriterCommitMessage`;
    `commit` performs the overwrite-delete, renames exactly the staged
    files of the winning task attempts to their final names, clears
    speculative losers' litter, and stamps `_SUCCESS`.  Consequences:

    * a speculative/retried task that completes twice publishes ONCE —
      Spark delivers one commit message per partition, and only
      message-listed files are renamed (the loser stays `.inprogress`
      and is swept);
    * a job that dies after some tasks succeeded publishes NOTHING —
      readers glob `*.jsonl`, staged files are invisible;
    * overwrite deletes the prior dataset inside `commit`, so a failed
      overwrite job leaves the existing data untouched (the delete used
      to run at planning time in `__init__`).

    NULL fields are emitted as JSON null so the reader round-trips
    them."""

    def __init__(self, options, schema, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_repair: save(path) is required")
        self.field_names = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # Per-JOB id, chosen once on the driver and pickled to every
        # task: staged names carry it so commit/abort sweep ONLY this
        # job's `.inprogress` litter — a concurrent job writing to the
        # same path keeps its staged files (round-6 advice: a blanket
        # sweep made the other job's commit os.replace fail or silently
        # lose partitions).
        self.job_id = uuid.uuid4().hex
        # driver-side: prepare the directory before tasks launch
        os.makedirs(self.path, exist_ok=True)

    def _staged_glob(self) -> str:
        return os.path.join(self.path, f"part-{self.job_id}-*.inprogress")

    def write(self, iterator) -> WriterCommitMessage:
        import uuid

        name = f"part-{self.job_id}-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, name + ".inprogress")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                obj = {k: row[i] for i, k in enumerate(self.field_names)}
                fh.write(json.dumps(obj, ensure_ascii=False) + "\n")
        return _JsonlCommit(name)

    def commit(self, messages) -> None:
        staged = [m.staged for m in messages if m is not None]
        if self.overwrite:
            for f in glob.glob(os.path.join(self.path, "*")):
                if os.path.isfile(f) and not f.endswith(".inprogress"):
                    os.remove(f)
        for name in staged:
            os.replace(
                os.path.join(self.path, name + ".inprogress"),
                os.path.join(self.path, name),
            )
        # sweep staged litter from THIS job's losing speculative
        # attempts only (job-id prefixed; other jobs' staging survives)
        for f in glob.glob(self._staged_glob()):
            os.remove(f)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        # nothing was published; drop ALL of this job's staged files
        # (message-listed winners AND speculative losers — both carry
        # the job-id prefix), leaving concurrent jobs' staging intact
        for f in glob.glob(self._staged_glob()):
            os.remove(f)


def register(spark) -> None:
    """Idempotently register the source with a session.  Also enables
    Python-source filter pushdown (runtime-settable SQL conf): a reader
    that implements pushFilters() is an ERROR with the conf off, and a
    vanilla session (the driver's) has it off by default."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlRepairDataSource)
