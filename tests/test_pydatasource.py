"""Spark 4 Python DataSource: the custom synthetic-events connector."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplex_mapreduce_spark.sources.pydatasource import (
    SynthEventsReader,
    register_synth_source,
)


def _read(spark, **opts):
    register_synth_source(spark)
    r = spark.read.format("synth_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synth_source_shape_and_partitioning(spark):
    df = _read(spark, partitions=5, rowsPerPartition=40)
    assert df.rdd.getNumPartitions() == 5  # one task per InputPartition
    assert df.count() == 200
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    # event_ids are globally unique across partitions by construction
    assert df.select("event_id").distinct().count() == 200


def test_synth_source_deterministic_and_matches_local(spark):
    """Two reads are identical, and the distributed rows equal a plain
    local run of the same generator — no cluster-layout dependence."""
    df = _read(spark, partitions=3, rowsPerPartition=25)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, partitions=3, rowsPerPartition=25).collect()))
    assert a == b

    reader = SynthEventsReader({"partitions": "3", "rowsperpartition": "25"})

    class _P:
        def __init__(self, v):
            self.value = v

    local = sorted(
        (eid, ts.replace(tzinfo=None), uid, et, val)
        for p in range(3)
        for eid, ts, uid, et, val in reader.read(_P(p))
    )
    got = sorted(
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in df.collect()
    )
    assert got == local


def test_synth_source_composes_with_relational_ops(spark):
    """The custom source is a first-class table: filters and aggregates
    compose (applied Spark-side on top of the Python scan)."""
    df = _read(spark, partitions=2, rowsPerPartition=50, users=7)
    agg = (
        df.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("spend"))
    )
    rows = agg.collect()
    assert all(0 <= r["user_id"] < 7 for r in rows)
    assert df.filter(F.col("user_id") >= 7).count() == 0


def test_pyjsonl_sink_roundtrip_and_manifest(spark, tmp_path):
    """The Python DataSource WRITER half: every task writes its
    deterministic part file, the driver commit writes the _SUCCESS
    manifest, and reading the JSONL back yields exactly the written
    rows."""
    import json
    import os

    from simplex_mapreduce_spark.sources.pydatasource import (
        register_synth_source,
    )

    register_synth_source(spark)
    out = str(tmp_path / "jsonl_out")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "concat('doc-', id) AS name", "id * 1.5 AS score"
    )
    df.write.format("pyjsonl").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["total_rows"] == 100
    assert len(manifest["parts"]) == 4
    assert [p["file"] for p in manifest["parts"]] == sorted(
        p["file"] for p in manifest["parts"]
    )
    assert sum(p["rows"] for p in manifest["parts"]) == 100
    # only manifest-listed parts + the manifest itself exist on disk
    assert sorted(os.listdir(out)) == sorted(
        [p["file"] for p in manifest["parts"]] + ["_SUCCESS"]
    )

    back = spark.read.json(f"{out}/part-*.jsonl")
    got = sorted(
        (int(r["id"]), r["name"], float(r["score"])) for r in back.collect()
    )
    want = sorted(
        (int(r["id"]), r["name"], float(r["score"])) for r in df.collect()
    )
    assert got == want


def test_pyjsonl_sink_requires_path(spark):
    import pytest

    from simplex_mapreduce_spark.sources.pydatasource import (
        register_synth_source,
    )

    register_synth_source(spark)
    df = spark.range(3)
    # Python data sources only accept Append/Overwrite; use a supported
    # mode so the writer's own path validation is what fires
    with pytest.raises(Exception, match="path"):
        df.write.format("pyjsonl").mode("append").save()


def test_pyjsonl_overwrite_removes_stale_parts(spark, tmp_path):
    """mode('overwrite') must replace ALL previous parts — a narrower
    second write may have fewer partitions than the first, and stale
    part files would silently duplicate rows for glob readers."""
    import json
    import os

    from simplex_mapreduce_spark.sources.pydatasource import (
        register_synth_source,
    )

    register_synth_source(spark)
    out = str(tmp_path / "jsonl_ow")
    spark.range(0, 80, 1, 8).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()
    spark.range(0, 40, 1, 4).write.format("pyjsonl").option("path", out).mode(
        "overwrite"
    ).save()
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["total_rows"] == 40
    assert spark.read.json(f"{out}/part-*.jsonl").count() == 40


def test_pyjsonl_failed_overwrite_preserves_previous_output(spark, tmp_path):
    """Overwrite deletion is deferred to commit() (ADVICE r5): a job
    that fails mid-overwrite must leave the PREVIOUS committed parts
    and _SUCCESS manifest fully intact — not an empty directory."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from simplex_mapreduce_spark.sources.pydatasource import (
        register_synth_source,
    )

    register_synth_source(spark)
    out = str(tmp_path / "jsonl_fail")
    spark.range(0, 30, 1, 3).write.format("pyjsonl").option("path", out).mode(
        "overwrite"
    ).save()
    before_parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    before_manifest = json.load(open(os.path.join(out, "_SUCCESS")))

    @F.udf("long")
    def boom(x):
        raise RuntimeError("poison row")

    with pytest.raises(Exception):
        spark.range(0, 10, 1, 2).select(boom("id").alias("id")).write.format(
            "pyjsonl"
        ).option("path", out).mode("overwrite").save()

    assert sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    ) == before_parts
    assert json.load(open(os.path.join(out, "_SUCCESS"))) == before_manifest
    assert spark.read.json(f"{out}/part-*.jsonl").count() == 30


def test_pyjsonl_nested_structs_roundtrip(spark, tmp_path):
    """Nested struct columns must serialize as JSON objects (recursive
    asDict), not stringified Row reprs."""
    from simplex_mapreduce_spark.sources.pydatasource import (
        register_synth_source,
    )

    register_synth_source(spark)
    out = str(tmp_path / "jsonl_nested")
    df = spark.range(3).selectExpr(
        "id", "named_struct('a', id, 'tags', array('x', 'y')) AS s"
    )
    df.write.format("pyjsonl").option("path", out).mode("append").save()
    back = spark.read.json(f"{out}/part-*.jsonl")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[2]["s"]["a"] == 2
    assert list(rows[1]["s"]["tags"]) == ["x", "y"]
