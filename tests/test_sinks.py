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


def test_partition_overwrite_dynamic(spark, tmp_path):
    """Dynamic partition overwrite replaces only the partitions present
    in the incoming frame — the idempotent-backfill contract (a plain
    overwrite would truncate the whole table)."""
    from simplex_mapreduce_spark.sources.sinks import write_partition_overwrite

    path = str(tmp_path / "dyn")
    full = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "id long, part string, v double",
    )
    write_partition_overwrite(full, path, ["part"])

    # re-run partition 'a' only, with corrected values
    fixed_a = spark.createDataFrame(
        [(1, "a", 11.0), (2, "a", 21.0)], "id long, part string, v double"
    )
    write_partition_overwrite(fixed_a, path, ["part"])

    back = {(r["id"], r["part"], r["v"]) for r in spark.read.parquet(path).collect()}
    # 'a' replaced; 'b' and 'c' untouched
    assert back == {(1, "a", 11.0), (2, "a", 21.0), (3, "b", 30.0), (4, "c", 40.0)}


def test_write_shuffled_deterministic_global_order(spark, tmp_path, duck):
    """The shuffled write replays one fixed md5-keyed permutation:
    reading part files in name order must equal DuckDB's ORDER BY of the
    same seeded key — and a different seed gives a different
    permutation while a re-run gives the identical one."""
    import glob

    import pyarrow.parquet as pq

    from simplex_mapreduce_spark.sources.sinks import write_shuffled

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")

    def read_order(path):
        ids = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        return ids

    p0 = str(tmp_path / "s0")
    write_shuffled(d, p0, "doc_id", seed=0)
    got = read_order(p0)

    want = [
        r[0]
        for r in duck.sql(
            "SELECT doc_id FROM documents "
            "ORDER BY md5('shuf0:' || CAST(doc_id AS VARCHAR))"
        ).fetchall()
    ]
    assert got == want

    # re-run: byte-identical permutation
    p0b = str(tmp_path / "s0b")
    write_shuffled(d, p0b, "doc_id", seed=0)
    assert read_order(p0b) == got

    # new seed: same multiset, different order
    p1 = str(tmp_path / "s1")
    write_shuffled(d, p1, "doc_id", seed=1)
    other = read_order(p1)
    assert sorted(other) == sorted(got) and other != got


def test_write_shuffled_is_range_partitioned_not_single_sort(spark):
    """The plan must distribute the sort (RangePartitioning exchange),
    never collapse to one reducer."""
    from simplex_mapreduce_spark.sources.sinks import shuffle_key

    d = load_table(spark, SF_DIR, "documents").select("doc_id")
    keyed = d.withColumn("__shuf", shuffle_key("doc_id", 0))
    out = keyed.repartitionByRange("__shuf").sortWithinPartitions("__shuf")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_merge_upsert_partitioned(spark, tmp_path):
    """Upsert + insert land, untouched same-partition keys survive, and
    partitions absent from the updates are not even rewritten (their
    files stay byte-identical on disk)."""
    import glob
    import os

    from simplex_mapreduce_spark.sources.sinks import (
        merge_upsert_partitioned,
        write_partition_overwrite,
    )

    path = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [
            (1, "d01", 10.0),
            (2, "d01", 20.0),
            (3, "d02", 30.0),
            (4, "d03", 40.0),
        ],
        "id long, day string, v double",
    )
    write_partition_overwrite(base, path, ["day"])
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=d03/*.parquet")
    }
    assert before

    updates = spark.createDataFrame(
        [
            (1, "d01", 11.0),   # update existing key
            (5, "d01", 50.0),   # insert into existing partition
            (6, "d02", 60.0),   # insert into another partition
        ],
        "id long, day string, v double",
    )
    merge_upsert_partitioned(spark, path, updates, ["id"], "day")

    back = {(r["id"], r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert back == {
        (1, "d01", 11.0),
        (2, "d01", 20.0),
        (5, "d01", 50.0),
        (3, "d02", 30.0),
        (6, "d02", 60.0),
        (4, "d03", 40.0),
    }
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=d03/*.parquet")
    }
    assert after == before  # untouched partition: same files, same mtimes


def test_merge_upsert_reads_only_touched_partitions(spark, tmp_path):
    """The target-side scan must carry a partition filter on the
    affected-partition list (partition pruning, not a full-table read)."""
    from simplex_mapreduce_spark.sources.sinks import write_partition_overwrite

    path = str(tmp_path / "pruned")
    base = spark.createDataFrame(
        [(i, f"d{1 + i % 3:02d}", float(i)) for i in range(30)],
        "id long, day string, v double",
    )
    write_partition_overwrite(base, path, ["day"])
    pruned = spark.read.parquet(path).filter(F.col("day").isin(["d01"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "d01" in plan


def test_merge_upsert_prunes_via_dynamic_partition_pruning(spark, tmp_path):
    """The merge path must restrict the target scan with a RUNTIME
    dynamicpruningexpression (broadcast semi-join against the updates'
    partition values) — no driver-side collect of the partition list
    anywhere in the sink (round-5 change)."""
    from simplex_mapreduce_spark.sources.sinks import (
        merge_survivors,
        write_partition_overwrite,
    )

    path = str(tmp_path / "dpp")
    base = spark.createDataFrame(
        [(i, f"d{1 + i % 5:02d}", float(i)) for i in range(50)],
        "id long, day string, v double",
    )
    write_partition_overwrite(base, path, ["day"])
    updates = spark.createDataFrame(
        [(3, "d04", 99.0), (100, "d04", 1.0)], "id long, day string, v double"
    )
    survivors = merge_survivors(spark, path, updates, ["id"], "day")
    rows = survivors.collect()
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]
    # semantics: only partition d04's non-replaced rows survive
    assert {r["day"] for r in rows} == {"d04"}
    assert 3 not in {r["id"] for r in rows}
