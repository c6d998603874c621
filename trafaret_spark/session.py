"""SparkSession factory with the engine's standard tuning.

Defaults target correctness-at-scale semantics:
  * AQE on (runtime shuffle coalescing, skew-join splitting) — SURVEY.md E11/E12;
  * Arrow on (pandas UDF batches for the Call escape hatch);
  * ANSI off — guards use null-on-failure cast semantics (try-cast model);
  * UTC session timezone — timestamps compare bitwise with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ENGINE_CONF"]

ENGINE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # generous broadcast ceiling for dimension tables; AQE may still demote
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # deep nested-schema compiles produce large expression trees; the JVM
    # default 1g driver heap is the binding constraint, not the data
    "spark.driver.memory": "8g",
    # wide generated validation projections can fill the default 240 MB JIT
    # code cache; when it fills, HotSpot silently disables compilation and
    # every task thread drops to the interpreter (measured 10× slowdowns
    # with wild run-to-run variance). Size it up and let it flush.
    "spark.driver.extraJavaOptions":
        "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing "
        "-XX:-DontCompileHugeMethods",
    "spark.ui.enabled": "false",
}


def get_spark(app: str = "trafaret_spark", cores: int | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    """Build (or reuse) a session. ``cores`` sets local[N]; on a real cluster
    pass master via spark-submit and leave cores=None."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    builder = SparkSession.builder.appName(app)
    if cores:
        builder = builder.master(f"local[{cores}]")
        shuffle_partitions = shuffle_partitions or max(cores, 8)
    elif not SparkSession.getActiveSession():
        builder = builder.master("local[*]")
    conf = dict(ENGINE_CONF)
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
