"""Parquet source layer with an explicit schema registry.

The reference infers schemas from ``read_sql``/``read_csv`` and patches
types afterwards (/root/reference/main.py:1036-1042).  We instead declare
every table's ``StructType`` up front (SURVEY.md §1.4) — no inference, and
a read that drifts from the contract fails loudly.

Tables are the driver fixtures (TESTDATA.md / FIXTURES.md §5): a TPC-H-ish
star schema + ``events`` (stream-shaped) + ``documents``/``embeddings``
(LLM-data-pipeline fixtures).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas for each fixture table (FIXTURES.md §5).  `events.ts`
# is TIMESTAMP(NANOS) in the parquet footer; Spark surfaces it as
# TimestampNTZ/Timestamp depending on version, so it is validated
# specially in `load` rather than pinned here.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # ts validated at load time (nanos parquet type), see module docstring.
    "events": None,  # type: ignore[dict-item]
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = tuple(SCHEMAS)

_EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")

_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def _compatible(got: T.DataType, expected: T.DataType) -> bool:
    # Parquet timestamps surface as TimestampNTZ on Spark 4 (isAdjustedToUTC
    # =false footers); both behave identically under a UTC session timezone
    # and NTZ matches DuckDB's naive timestamps, so accept either.
    if isinstance(expected, _TS_TYPES) and isinstance(got, _TS_TYPES):
        return True
    return got == expected


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf value ('134217728b', '128MB', '4m')."""
    s = conf_val.strip().lower().removesuffix("b")
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _hadoop_file_sizes(spark: SparkSession, uris: list[str]) -> list[int] | None:
    """File sizes for non-local URIs via the Hadoop FileSystem API
    (s3a://, hdfs://, abfs://, ...) — a metadata-only getFileStatus per
    file, no job.  None when any status call fails (then the caller must
    not assume under-splitting)."""
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        sizes = []
        for u in uris:
            p = jvm.org.apache.hadoop.fs.Path(u)
            sizes.append(int(p.getFileSystem(conf).getFileStatus(p).getLen()))
        return sizes
    except Exception:
        return None


def _pack_partitions(sizes: list[int], split: int, open_cost: int) -> int:
    """Replicate FilePartition.getFilePartitions' greedy packing: split
    each file into ≤`split`-byte chunks, sort chunks size-descending,
    then pack sequentially into bins closed when adding the next chunk
    would exceed `split` (each chunk also carries `open_cost`).  Modeling
    the packing matters for many-small-file scans, where per-file
    ceil(size/split) over-counts and would make fan_out skip a needed
    repartition."""
    chunks: list[int] = []
    for sz in sizes:
        if sz == 0:
            chunks.append(0)
        else:
            full, rem = divmod(sz, split)
            chunks.extend([split] * full)
            if rem:
                chunks.append(rem)
    chunks.sort(reverse=True)
    n_parts, current = 0, 0
    for c in chunks:
        if current + c > split and current > 0:
            n_parts += 1
            current = 0
        current += c + open_cost
    return n_parts + (1 if current > 0 else 0)


def _scan_file_sizes(df: DataFrame) -> list[int] | None:
    """Byte sizes of the files under `df`'s scan — a pure metadata
    lookup (os.stat locally, Hadoop getFileStatus for s3a/hdfs/abfs).
    None when sizes are unobtainable (then the caller must not assume
    under-splitting)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if any("://" in f and not f.startswith("file:") for f in files):
        return _hadoop_file_sizes(df.sparkSession, files)
    try:
        return [os.path.getsize(f.removeprefix("file:")) for f in files]
    except OSError:
        return None


def _estimated_scan_partitions(
    df: DataFrame, sizes: list[int] | None = None
) -> int | None:
    """Estimate how many partitions the scan under `df` yields, from file
    sizes and Spark's own split-and-pack formula
    (FilePartition.maxSplitBytes + getFilePartitions) — no job, no
    plan-to-RDD conversion; the previous `df.rdd.getNumPartitions()`
    probe forced a full plan-to-RDD conversion per load."""
    if sizes is None:
        sizes = _scan_file_sizes(df)
    if not sizes:
        return None
    conf = df.sparkSession.conf
    max_part = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _size_bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    bytes_per_core = (sum(sizes) + open_cost * len(sizes)) / max(parallelism, 1)
    split = max(1, min(max_part, int(max(open_cost, bytes_per_core))))
    return _pack_partitions(sizes, split, open_cost)


# Below this input size the round-robin shuffle costs more than the
# parallelism it unlocks: measured at sf0.1 (0.59 MB documents,
# local[32]) fan-out made EVERY consumer slower — doc_fingerprints
# 0.28→0.69 s, word_frequency 0.85→1.10 s, even shingle-heavy
# minhash_near_dups 1.62→2.05 s — because the extra stage + 32-task
# scheduling is a fixed ~0.2-0.4 s cost while the single-threaded
# compute it displaces is itself sub-second.  Compute scales linearly
# with bytes while the overhead stays fixed, so a size floor is the
# right gate; 2 MiB sits above the sf0.1 fixtures and safely below the
# regime where single-threaded text work reaches multi-second cost
# (≈2.7 s/MB measured for the heaviest shingling path).
FAN_OUT_MIN_BYTES = 2 * 1024**2


def fan_out(
    df: DataFrame,
    min_partitions: int | None = None,
    min_bytes: int = FAN_OUT_MIN_BYTES,
) -> DataFrame:
    """Raise partition count to cluster parallelism for CPU-bound
    downstream work when the scan under-splits.

    The fixtures are single-row-group parquet files, so a scan yields ONE
    partition no matter how many cores exist — every per-row-expensive
    operator downstream (regex matching, shingling, vector math) would
    run single-threaded.  At 100 TB a scan naturally yields ≫ cores
    partitions and this is a no-op (checked, not assumed); the
    round-robin shuffle only fires on under-split inputs LARGE enough
    that the unlocked parallelism beats the shuffle's fixed cost
    (`min_bytes`, see FAN_OUT_MIN_BYTES) — tiny inputs finish faster
    single-threaded than the repartition stage alone would take.
    Under-splitting is detected from file sizes + Spark's split formula
    (`_estimated_scan_partitions`) — a pure metadata computation.
    Catalyst still pushes filters/pruning through the Repartition node
    into the scan (PushPredicateThroughNonJoin).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    sizes = _scan_file_sizes(df)
    if sizes is None or sum(sizes) < min_bytes:
        return df
    est = _estimated_scan_partitions(df, sizes)
    if est is None or est >= target:
        return df
    return df.repartition(target)


def load(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load one fixture table as a DataFrame, validating its schema.

    Equivalent of the reference's JDBC scan S1 (/root/reference/main.py:269-280)
    — but the projection/predicate pushdown the reference hand-writes in SQL
    is left to Catalyst: callers `.select()`/`.where()` and the parquet scan
    prunes columns and row groups automatically.

    ``parallel=True`` applies :func:`fan_out` — use for queries whose
    per-row compute dominates scan cost.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # TIMESTAMP(NANOS) parquet is illegal for Spark's converter; read
        # nanos as long and rebuild the timestamp below.  Runtime-settable,
        # so this also works under a session we didn't construct.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    expected = SCHEMAS.get(name)
    if expected is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        for f in expected.fields:
            if f.name not in got:
                raise ValueError(f"{name}: missing column {f.name}; got {list(got)}")
            if not _compatible(got[f.name], f.dataType):
                raise ValueError(
                    f"{name}.{f.name}: expected {f.dataType}, got {got[f.name]}"
                )
    elif name == "events":
        missing = [c for c in _EVENTS_COLS if c not in df.columns]
        if missing:
            raise ValueError(f"events: missing columns {missing}")
        # Normalize ts to microsecond TimestampType regardless of how this
        # Spark version surfaces parquet NANOS (TimestampNTZ or long).
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # ns-since-epoch → µs via integer division (double would lose
            # precision past 2^53), then to a naive timestamp.  DuckDB's
            # TIMESTAMP read of the same file truncates ns→µs identically.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        elif not isinstance(ts_type, _TS_TYPES):
            df = df.withColumn("ts", df["ts"].cast("timestamp_ntz"))
    return fan_out(df) if parallel else df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each fixture table as a temp view for `spark.sql` queries."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
