"""SparkSession construction and runtime configuration.

The reference engine's "cluster bring-up" (master RPC server + worker
registration, src/mapreduce.go:280-288, src/worker.go:59-91) maps to a
single ``SparkSession`` here — executors, scheduling, shuffle, and retry
are Spark-managed (SURVEY.md §2.1 O8-O14).

Two entry points:

- :func:`get_spark` — build our own tuned local session (tests, bench).
- :func:`apply_runtime_conf` — apply the runtime-settable confs we need
  to a session we did NOT build (the driver's).  Critical: the testdata
  parquet files carry ``TIMESTAMP(NANOS)`` columns which Spark refuses to
  read unless ``spark.sql.legacy.parquet.nanosAsLong`` is set.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to set on an already-running session.
RUNTIME_CONF = {
    # testdata timestamps are parquet TIMESTAMP(NANOS); read them as int64
    # epoch-nanos and convert explicitly (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # runtime re-planning: partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a foreign session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; leave the session as-is
    return spark


def get_spark(
    app_name: str = "simplex-mapreduce-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local session sized like the driver's bench environment.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to the core count — at sf<=0.1 there
    is no reason to exceed it (AQE coalesces anyway); on a real cluster
    this would be ~2-3x total cores.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or 32)
    shuffle = int(shuffle_partitions or cpus)
    # local[N,2]: allow one task retry, mirroring the reference's
    # re-execute-on-failure scheduler (src/master.go:39-72) — local mode
    # defaults to maxFailures=1 (fail-fast), which would turn any
    # transient task error into a job failure.
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus},2]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata tables are single small parquet files; the default
        # 128 MiB split size would scan each on ONE core.  8 MiB keeps
        # local[32] busy at sf<=1 and is harmless at cluster scale where
        # files outnumber cores.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_conf(spark)
