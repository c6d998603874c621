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
    overwrite so a resume rewrites only the buckets it recomputes."""
    if bucket_col not in df.columns:
        df = add_bucket(df, key, n_buckets, bucket_col)
    cols = [bucket_col] + list(extra_partition_cols or [])
    (df.write.mode(mode)
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*cols)
       .parquet(path))
    # An EMPTY partitioned write leaves only _SUCCESS — no schema, and
    # spark.read.parquet raises on read-back. An empty table is a
    # legitimate outcome (a quarantine with zero invalid conversations,
    # a fully-deduped shard), so detect it post-write (one FileSystem
    # listing — works for HDFS/S3A/local alike, no count job) and append
    # one zero-row file carrying the full schema; the partition columns
    # ride along as ordinary columns, which is consistent because there
    # are no partition directories to conflict with.
    spark = df.sparkSession
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not any(s.isDirectory() for s in fs.listStatus(jpath)):
        df.limit(0).write.mode("append").parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed table back (Iceberg: spark.read.table(name))."""
    if "/" not in path and iceberg_available(spark):
        return spark.read.table(path)
    return spark.read.parquet(path)
