"""Multimodal plumbing tests: binary columns, Arrow-batched decode
pipeline, stub behavior (the decode itself is stubbed — no image libs in
this container — but schema/batching/partitioning are real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplex_mapreduce_spark.operators.multimodal import (
    FAKE_MAGIC,
    decode_image_stub,
    encode_fake_image,
    extract_image_features,
)


def test_decode_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\n....")


def test_decode_stub_deterministic():
    blob = encode_fake_image(b"abcdef")
    assert decode_image_stub(blob) == decode_image_stub(blob)
    w, h, mi = decode_image_stub(blob)
    assert (w, h) == (7, 1)
    assert 0.0 <= mi <= 1.0


def test_extract_features_schema_and_rows(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(FAKE_MAGIC), F.encode(F.col("id").cast("string"), "UTF-8")
        ).alias("img"),
    )
    feats = extract_image_features(df, "doc_id", "img")
    assert [f.name for f in feats.schema.fields] == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "mean_intensity",
    ]
    rows = feats.collect()
    assert len(rows) == 100
    one = {r["doc_id"]: r for r in rows}[7]
    assert one["n_bytes"] == len(FAKE_MAGIC) + 1
    assert one["width"] == 2  # 1-byte payload -> (1 % 64) + 1


def test_corrupt_blobs_dropped_not_nulled(spark):
    df = spark.createDataFrame(
        [(1, encode_fake_image(b"ok")), (2, b"CORRUPT!payload")],
        "doc_id long, img binary",
    )
    rows = extract_image_features(df, "doc_id", "img").collect()
    assert [r["doc_id"] for r in rows] == [1]

def test_udtf_matches_native(spark):
    """The Python UDTF chunker and the pure-JVM native chunker must
    produce identical chunk sets over the documents table."""
    from simplex_mapreduce_spark.operators.custom import (
        chunk_documents_native,
        doc_chunks_udtf,
    )
    from simplex_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    native = chunk_documents_native(load_table(spark, sf, "documents"))
    via_udtf = doc_chunks_udtf(spark, sf)
    key = lambda r: (r["doc_id"], r["chunk_id"])  # noqa: E731
    n_rows = sorted(map(tuple, native.collect()), key=lambda t: t[:2])
    u_rows = sorted(map(tuple, via_udtf.collect()), key=lambda t: t[:2])
    assert len(n_rows) > 0
    assert n_rows == u_rows
