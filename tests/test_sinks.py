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


def test_zorder_key_matches_python_morton(spark):
    """The Morton key must equal a plain-Python bit interleave on
    already-quantized values (identity ranges, 4 bits)."""
    from simplex_mapreduce_spark.sources.sinks import zorder_key

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key(["x", "y"], {"x": (0, 15), "y": (0, 15)}, bits=4)
        ).collect()
    }

    def morton(a, b):
        out = 0
        for bit in range(4):
            out |= ((a >> bit) & 1) << (2 * bit)
            out |= ((b >> bit) & 1) << (2 * bit + 1)
        return out

    assert got == {(a, b): morton(a, b) for a, b in rows}
    # the key is a bijection on the 16x16 grid
    assert len(set(got.values())) == 256


def _file_span_fraction(path: str, col: str) -> float:
    """Mean per-file (max-min) span of ``col`` as a fraction of the
    global span, from parquet footer stats — the data-skipping metric."""
    import glob

    import pyarrow.parquet as pq

    spans, los, his = [], [], []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(_col_idx(md, col)).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(_col_idx(md, col)).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(hi - lo)
        los.append(lo)
        his.append(hi)
    global_span = max(his) - min(los)
    return (sum(spans) / len(spans)) / global_span if global_span else 0.0


def _col_idx(md, col: str) -> int:
    names = md.schema.to_arrow_schema().names
    return names.index(col)


def test_write_zordered_skips_on_both_columns(spark, tmp_path):
    """Z-order by (l_partkey, l_suppkey): per-file footer spans must be
    materially tighter than the global range on BOTH columns, while
    1-column range clustering leaves the second column's spans at
    ~full range — the reason z-order exists."""
    from simplex_mapreduce_spark.sources.sinks import (
        write_compacted,
        write_zordered,
    )

    li = load_table(spark, SF_DIR, "lineitem", convert_ts=False).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    cpath = str(tmp_path / "cluster1")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], max_records_per_file=250)
    write_compacted(
        li, cpath, cluster_by=["l_partkey"], max_records_per_file=250
    )

    import glob

    assert len(glob.glob(f"{zpath}/*.parquet")) >= 3  # enough files to skip
    z_part = _file_span_fraction(zpath, "l_partkey")
    z_supp = _file_span_fraction(zpath, "l_suppkey")
    c_supp = _file_span_fraction(cpath, "l_suppkey")
    # both dimensions tighter than full range under z-order
    assert z_part < 0.6 and z_supp < 0.6, (z_part, z_supp)
    # the single-column clustering does NOT tighten the other column
    assert c_supp > z_supp
    # and the rows themselves round-trip
    assert (
        spark.read.parquet(zpath).count() == li.count()
    )


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution the lakehouse way: a writer adds a column in a
    later batch; mergeSchema=true reads the union schema with nulls for
    the old files, and the default read (no merge) keeps working."""
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    )
    v1.write.parquet(f"{base}/batch=1")
    v2.write.parquet(f"{base}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None  # old file: evolved column null-filled
    assert rows[2]["score"] == 0.5
    # default read still succeeds on the mixed directory
    assert spark.read.parquet(base).count() == 2
