"""Sink/source roundtrips: parquet/json/csv/text writes re-read equal,
partitioned writes prune on re-read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplex_mapreduce_spark.plans.explain import formatted_plan
from simplex_mapreduce_spark.sources.sinks import read_table_format, write_table
from simplex_mapreduce_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    src = (
        load_table(spark, SF_DIR, "orders", convert_ts=False)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )
    path = str(tmp_path / f"out_{fmt}")
    write_table(src, path, fmt)
    back = read_table_format(
        spark, path, fmt, schema="o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_text_sink(spark, tmp_path):
    src = spark.range(50).select(F.concat(F.lit("line-"), F.col("id")).alias("value"))
    path = str(tmp_path / "out_text")
    write_table(src, path, "text")
    back = read_table_format(spark, path, "text")
    assert back.count() == 50


def test_partitioned_write_prunes(spark, tmp_path):
    src = load_table(spark, SF_DIR, "orders", convert_ts=False).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "parted")
    write_table(src, path, "parquet", partition_by=["o_orderstatus"])
    back = read_table_format(spark, path, "parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    plan = formatted_plan(back)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan.replace("#", " #").replace(
        "o_orderstatus ", "o_orderstatus"
    ) or "o_orderstatus" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert back.count() == src.filter(F.col("o_orderstatus") == "F").count()


def test_unsupported_format_rejected(spark):
    src = spark.range(1)
    with pytest.raises(ValueError):
        write_table(src, "/tmp/x", "avro")


def test_write_compacted_bounds_file_count(spark, tmp_path):
    """maxRecordsPerFile must split oversized partitions; the default
    must produce few full-size files; roundtrip must be lossless."""
    import glob

    from simplex_mapreduce_spark.sources.sinks import write_compacted
    from simplex_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n = d.count()

    capped = str(tmp_path / "capped")
    write_compacted(d, capped, max_records_per_file=100)
    files = glob.glob(f"{capped}/*.parquet")
    assert len(files) >= n // 100  # oversized partitions were split
    assert spark.read.parquet(capped).count() == n

    clustered = str(tmp_path / "clustered")
    write_compacted(d, clustered, cluster_by=["doc_id"])
    back = spark.read.parquet(clustered)
    assert back.count() == n
    # min/max clustering: each file's doc_id span is disjoint under a
    # range partition + sort, so a point filter scans (at most) one file
    from pyspark.sql import functions as F

    spans = (
        back.select("doc_id", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    ordered = sorted(((r["lo"], r["hi"]) for r in spans))
    assert all(a[1] < b[0] for a, b in zip(ordered, ordered[1:]))
