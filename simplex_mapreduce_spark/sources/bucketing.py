"""Bucketed tables: co-located joins without a per-query shuffle.

At 100 TB, the biggest recurring cost in a fact-fact join
(orders ⋈ lineitem) is shuffling both tables on the join key for every
query.  Bucketing pre-partitions the stored table by key hash so a join
between two tables bucketed on the same key with the same bucket count
needs NO exchange at all — the SortMergeJoin reads co-located buckets
directly (asserted in tests/test_scale_utils.py).

This is the storage-layout decision a real deployment makes once at
ingest; Spark's managed-table catalog carries the bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _remove_orphan_location(spark: SparkSession, table: str) -> None:
    """Delete a managed table's data directory when it outlived the
    catalog entry.  With a per-session in-memory catalog (the default
    here and in the driver), files in spark-warehouse/ survive session
    restarts while the table registration does not — a subsequent
    ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS.  Only runs
    when the catalog does NOT know the table (a registered table is
    handled by mode("overwrite") normally)."""
    if spark.catalog.tableExists(table):
        return
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(  # type: ignore[union-attr]
        spark.conf.get("spark.sql.warehouse.dir"), table.lower()
    )
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[attr-defined]
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist as a managed bucketed table (overwrites; survives a
    leftover data directory from a previous session)."""
    _remove_orphan_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    writer = writer.sortBy(sort_key or bucket_key)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
