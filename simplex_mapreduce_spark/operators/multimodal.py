"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, plus the Spark-side plumbing for decode / feature-extraction
UDFs.

The container has no image/audio libraries, so the *decode* step is a
clearly marked stub (``decode_image_stub`` raises unless given the
deterministic fake format); everything Spark-cares-about — schema,
Arrow batch shape, ``mapInPandas`` signature, partition-preserving
plumbing — is real and tested (tests/test_multimodal.py).

At 100 TB: payloads stay in binary columns co-located with metadata;
feature extraction is an Arrow-batched ``mapInPandas`` so bytes cross
the JVM/Python boundary once per batch, never per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

# deterministic fake "image": 8-byte magic + payload
FAKE_MAGIC = b"FAKEIMG1"

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, mean_intensity double"
)


def encode_fake_image(payload: bytes) -> bytes:
    """Build a deterministic fake image blob (test/data-gen helper)."""
    return FAKE_MAGIC + payload


def decode_image_stub(blob: bytes) -> tuple[int, int, float]:
    """STUB decode: real image decoding needs PIL/opencv, absent here.

    For the deterministic fake format, derive (width, height,
    mean_intensity) from the payload bytes; for anything else raise —
    plug a real decoder in production.
    """
    if blob is None or not blob.startswith(FAKE_MAGIC):
        raise NotImplementedError(
            "real image decoding requires an image library; "
            "only the FAKEIMG1 test format is supported in this container"
        )
    payload = blob[len(FAKE_MAGIC):]
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) + 1
    mean_intensity = (sum(payload) / n / 255.0) if n else 0.0
    return width, height, mean_intensity


def extract_image_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` (not a scalar UDF) so one Python roundtrip handles a
    whole Arrow batch and the output cardinality is free to differ
    (corrupt blobs are dropped, not nulled)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    w, h, mi = decode_image_stub(bytes(blob))
                except NotImplementedError:
                    continue
                rows.append((doc_id, len(blob), w, h, mi))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "width", "height", "mean_intensity"],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FEATURE_SCHEMA)


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS payload_sha
    FROM documents
    """,
)
def multimodal_binary_meta(spark, sf_dir):
    """Typed metadata over an opaque binary payload column (UTF-8 bytes
    of the text stand in for an image payload): byte length + content
    digest, all JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        # sha2 over the UTF-8 payload == DuckDB sha256(text)
        F.sha2(F.col("text"), 256).alias("payload_sha"),
    )


@register("multimodal_image_features")  # no SQL oracle: Python-UDF pipeline
def multimodal_image_features(spark, sf_dir):
    """End-to-end multimodal plumbing on testdata: synthesize fake image
    blobs from document text (deterministic), then run the Arrow-batched
    decode/feature pipeline.  Rows-only check (mapInPandas is not
    SQL-expressible)."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.concat(F.lit(FAKE_MAGIC), F.encode("text", "UTF-8")).alias("img"),
    )
    return extract_image_features(blobs, "doc_id", "img")


# ------------------------------------------------------------------ #
# Video frame sampling: one binary "video" -> every k-th frame row.
# ------------------------------------------------------------------ #

# deterministic fake "video": 8-byte magic, then fixed-size frames
FAKE_VIDEO_MAGIC = b"FAKEVID1"
FRAME_BYTES = 16
FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_frames int, frame binary"


def sample_video_frames(
    df: DataFrame, id_col: str, blob_col: str, every_k: int = 4
) -> DataFrame:
    """Frame-sample a binary video column: emit every ``every_k``-th
    frame as its own row (the training-data pattern of turning one video
    into a sequence of image examples).

    Row-expanding ``mapInPandas``: bytes cross the Arrow boundary once
    per batch, and output cardinality (n_frames / every_k rows per
    video) is decided Python-side.  The frame SPLIT is a stub for a real
    container demuxer (pyav/ffmpeg, absent here): the fake format is
    fixed-size frames after a magic header; corrupt blobs are dropped
    like in :func:`extract_image_features`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                if not b.startswith(FAKE_VIDEO_MAGIC):
                    continue  # not a video we can demux: drop, don't null
                payload = b[len(FAKE_VIDEO_MAGIC):]
                n_frames = len(payload) // FRAME_BYTES
                for idx in range(0, n_frames, every_k):
                    frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                    rows.append((doc_id, idx, n_frames, frame))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_frames", "frame"]
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FRAME_SCHEMA)


# ------------------------------------------------------------------ #
# Audio feature extraction: binary waveform -> scalar features.
# ------------------------------------------------------------------ #

FAKE_AUDIO_MAGIC = b"FAKEAUD1"
FAKE_SAMPLE_RATE = 16_000
AUDIO_FEATURE_TYPE = (
    "struct<n_samples:int, duration_s:double, rms:double, peak:int,"
    " zcr:double, clip_frac:double, dyn_range:int>"
)


def audio_features_udf():
    """Vectorized scalar ``pandas_udf``: one Arrow batch of binary blobs
    in, one batch of feature structs out, numpy doing the per-sample
    math.  Scalar-UDF (not mapInPandas) because the mapping is strictly
    1:1 and the result is a COLUMN — composable with any surrounding
    projection.  The sample decode (here: payload bytes as unsigned
    8-bit PCM) is the stub for a real soundfile/librosa reader."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(AUDIO_FEATURE_TYPE)
    def features(blobs: pd.Series) -> pd.DataFrame:
        out = []
        for blob in blobs:
            b = bytes(blob) if blob is not None else b""
            if not b.startswith(FAKE_AUDIO_MAGIC):
                out.append((None, None, None, None, None, None, None))
                continue
            samples = np.frombuffer(b[len(FAKE_AUDIO_MAGIC):], dtype=np.uint8)
            n = int(samples.size)
            if n == 0:
                out.append((0, 0.0, 0.0, 0, 0.0, 0.0, 0))
                continue
            centered = samples.astype(np.int16) - 128  # unsigned PCM midpoint
            # zero-crossing rate: fraction of adjacent pairs whose signs
            # differ (exact zeros count with the negative side, the
            # usual sign() convention) — the cheap voiced/unvoiced and
            # noise-vs-tone discriminator
            zcr = (
                float(np.mean(np.signbit(centered[1:]) != np.signbit(centered[:-1])))
                if n > 1
                else 0.0
            )
            out.append(
                (
                    n,
                    n / FAKE_SAMPLE_RATE,
                    float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))),
                    int(samples.max()),
                    zcr,
                    float(np.mean((samples == 0) | (samples == 255))),
                    int(samples.max()) - int(samples.min()),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "n_samples", "duration_s", "rms", "peak",
                "zcr", "clip_frac", "dyn_range",
            ],
        )

    return features


@register("multimodal_audio_features")  # no SQL oracle: Python-UDF pipeline
def multimodal_audio_features(spark, sf_dir):
    """Audio-column plumbing on testdata (document bytes as fake 8-bit
    PCM): duration, RMS level, and peak per blob via the vectorized
    pandas_udf.  Rows-only check; numbers pinned against a plain-Python
    recomputation in tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.concat(F.lit(FAKE_AUDIO_MAGIC), F.encode("text", "UTF-8")).alias("wav"),
    )
    feat = audio_features_udf()(F.col("wav"))
    return blobs.withColumn("_f", feat).select(
        "doc_id",
        F.col("_f.n_samples").alias("n_samples"),
        F.round("_f.duration_s", 6).alias("duration_s"),
        F.round("_f.rms", 4).alias("rms"),
        F.col("_f.peak").alias("peak"),
        F.round("_f.zcr", 4).alias("zcr"),
        F.round("_f.clip_frac", 4).alias("clip_frac"),
        F.col("_f.dyn_range").alias("dyn_range"),
    )


@register("multimodal_frame_sample")  # no SQL oracle: Python-UDF pipeline
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over synthesized fake videos (document bytes as
    fixed-size frames): every 4th frame becomes a row.  Rows-only check;
    the exact row set is pinned against a pure-JVM recomputation in
    tests/test_multimodal.py::test_frame_sample_matches_native."""
    d = load_table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.concat(F.lit(FAKE_VIDEO_MAGIC), F.encode("text", "UTF-8")).alias("vid"),
    )
    return sample_video_frames(blobs, "doc_id", "vid")
