"""Sinks: distributed writes in the formats the engine supports.

The reference's sinks are JSON-lines shuffle files and a single sorted
``"key: value"`` text file built on one node (src/mapreduce.go:199,
291-329).  Spark replaces both: the shuffle is internal, and final
outputs are written distributed (one part per partition) in columnar or
text formats.  The merge-format text sink lives on
``MapReduceJob.save_text``; these are the general-purpose ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from simplex_mapreduce_spark.session import apply_runtime_conf

# orc ships in Spark's JVM (no extra package, unlike avro); included for
# parity with warehouses where ORC is the incumbent columnar layout
FORMATS = ("parquet", "orc", "json", "csv", "text")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Distributed write.  ``partition_by`` produces hive-style
    directory partitioning — the layout that enables partition pruning
    on re-read (the 100 TB table layout primitive)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_compacted(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
    cluster_by: list[str] | None = None,
) -> None:
    """Small-files-safe parquet write — the compaction knob every 100 TB
    pipeline needs (a shuffle with 2000 reducers writing one file each
    per partition directory kills the downstream scan with metadata
    overhead, and tiny row groups defeat columnar encoding).

    Two Spark-native mechanisms, no size estimation games:

    - AQE partition coalescing collapses shuffle output to few,
      full-size partitions (enabled session-wide in session.py);
    - ``maxRecordsPerFile`` bounds the other direction — one oversized
      partition splits into capped files instead of one giant file.

    ``cluster_by`` range-partitions + sorts before writing, so re-reads
    that filter on those columns prune whole files via parquet min/max
    footer stats (the poor-man's Z-order for the 1-column case)."""
    out = df
    if cluster_by:
        out = df.repartitionByRange(*cluster_by).sortWithinPartitions(*cluster_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )


def read_table_format(
    spark: SparkSession, path: str, fmt: str, schema: str | None = None
) -> DataFrame:
    """Read back any supported sink format (csv with header+schema;
    json/text/parquet as-is)."""
    apply_runtime_conf(spark)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)
