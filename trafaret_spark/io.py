"""Table scan/sink (SURVEY.md E1): Iceberg when a catalog is configured,
bucketed-Parquet layout otherwise — same call surface either way.

The design target is an Iceberg table partitioned by
``bucket(N, conv_id)`` (+ optionally ``days(ts)``): bucketing co-locates a
conversation's turns in one file group, so the as-of join and window stages
shuffle at most once, and snapshot IDs give exactly-once resume. This
sandbox has no Iceberg runtime jar, so the default implementation is the
Parquet fallback with an explicit ``bucket`` column (identical layout
semantics: hash(conv_id) mod N directory partitions); `use_iceberg()`
flips the path-based API to catalog tables when the jar + catalog exist.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["add_bucket", "write_bucketed", "read_table", "iceberg_available"]

DEFAULT_BUCKETS = 64

# Sidecar directory holding one zero-row parquet file with the table's full
# schema, written only when a write leaves NO partition directories. The
# leading underscore makes it invisible to Spark's file-source discovery, so
# it can coexist with later non-empty writes — unlike the previous design
# (a zero-row file at the table ROOT), where dynamic partition overwrite
# never deleted the root file and a later bucketed write produced
# 'Conflicting directory structures' on read (ADVICE r5).
_EMPTY_MARKER = "_EMPTY_SCHEMA"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None)
                    and "iceberg" in spark.conf.get(
                        "spark.sql.catalog.spark_catalog"))
    except Exception:
        return False


def add_bucket(df: DataFrame, key: str = "conv_id",
               n_buckets: int = DEFAULT_BUCKETS,
               bucket_col: str = "bucket") -> DataFrame:
    """Stable hash bucket of the entity key — the Parquet analogue of
    Iceberg's ``bucket(N, conv_id)`` partition transform."""
    return df.withColumn(bucket_col,
                         F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def write_bucketed(df: DataFrame, path: str, key: str = "conv_id",
                   n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite",
                   bucket_col: str = "bucket",
                   extra_partition_cols: Optional[Sequence[str]] = None) -> None:
    """Write partitioned by the entity bucket (+ any extra partition cols,
    e.g. a ``ts_day`` column for days(ts) layout). Dynamic partition
    overwrite so a resume rewrites only the buckets it recomputes.

    Empty results: an empty partitioned write leaves only _SUCCESS — no
    schema — yet an empty table is a legitimate outcome (a quarantine with
    zero invalid conversations, a fully-deduped shard). When the write
    leaves NO partition directories, a zero-row parquet file carrying the
    full schema is written to the hidden ``_EMPTY_SCHEMA/`` sidecar, which
    :func:`read_table` falls back to; when partition directories DO exist
    the sidecar (and any legacy root-level marker file) is removed, so the
    empty → non-empty rerun sequence reads back cleanly.

    Dynamic-overwrite caveat (by design, matching the resume contract): an
    empty result over a path that already holds partition directories
    rewrites nothing — read-back returns the PREVIOUS rows. "This table is
    now empty" cannot be expressed as a dynamic partition overwrite; delete
    the path first when a full overwrite is intended.
    """
    if bucket_col not in df.columns:
        df = add_bucket(df, key, n_buckets, bucket_col)
    cols = [bucket_col] + list(extra_partition_cols or [])
    (df.write.mode(mode)
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*cols)
       .parquet(path))
    # One FileSystem listing (HDFS/S3A/local alike, no count job) decides
    # between writing the empty-schema sidecar and cleaning stale markers.
    spark = df.sparkSession
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    jpath = jvm_path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = list(fs.listStatus(jpath))

    def _hidden(name: str) -> bool:
        return name.startswith("_") or name.startswith(".")

    has_partitions = any(s.isDirectory() and not _hidden(s.getPath().getName())
                         for s in statuses)
    marker = jvm_path(path.rstrip("/") + "/" + _EMPTY_MARKER)
    if has_partitions:
        # table holds data: drop the sidecar from any previous empty write
        # and any legacy root-level zero-row data file (pre-r6 marker) —
        # either would corrupt read-back next to partition directories
        if fs.exists(marker):
            fs.delete(marker, True)
        for s in statuses:
            if not s.isDirectory() and not _hidden(s.getPath().getName()):
                fs.delete(s.getPath(), False)
    else:
        df.limit(0).write.mode("overwrite").parquet(
            path.rstrip("/") + "/" + _EMPTY_MARKER)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed table back (Iceberg: spark.read.table(name)).

    An empty table (no partition directories) raises UNABLE_TO_INFER_SCHEMA
    on the plain path read; fall back to the ``_EMPTY_SCHEMA/`` sidecar
    :func:`write_bucketed` left, which carries the schema with zero rows.
    """
    if "/" not in path and iceberg_available(spark):
        return spark.read.table(path)
    try:
        return spark.read.parquet(path)
    except Exception:
        marker = path.rstrip("/") + "/" + _EMPTY_MARKER
        jm = spark._jvm.org.apache.hadoop.fs.Path(marker)
        fs = jm.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jm):
            return spark.read.parquet(marker)
        raise
