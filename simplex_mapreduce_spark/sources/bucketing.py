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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist as a managed bucketed table (overwrites)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    writer = writer.sortBy(sort_key or bucket_key)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
