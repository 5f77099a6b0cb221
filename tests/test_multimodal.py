"""Multimodal tests: real pure-Python decoders (BMP / PPM / PGM / WAV)
verified against HAND-BUILT byte fixtures, plus the Arrow-batched
pipeline plumbing (schema, batching, corrupt-drop semantics)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from simplex_mapreduce_spark.operators.multimodal import (
    decode_image,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    extract_image_features,
)

# hand-built 2x2 24-bit BMP: pixels (top-down RGB)
#   (10,20,30) (40,50,60)
#   (70,80,90) (100,110,120)
# stored bottom-up as BGR with rows padded from 6 to 8 bytes
_BMP_2X2 = (
    b"BM"
    + struct.pack("<IHHI", 14 + 40 + 16, 0, 0, 54)      # file hdr
    + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    + bytes([90, 80, 70, 120, 110, 100, 0, 0])           # bottom row, pad
    + bytes([30, 20, 10, 60, 50, 40, 0, 0])              # top row, pad
)


def test_decode_bmp_hand_fixture():
    fmt, w, h, mi = decode_image(_BMP_2X2)
    assert (fmt, w, h) == ("bmp", 2, 2)
    # mean over all 12 channel samples / 255
    assert abs(mi - (10 + 20 + 30 + 40 + 50 + 60 + 70 + 80 + 90 + 100 + 110 + 120) / 12 / 255) < 1e-12


def test_encode_bmp_roundtrips_and_matches_fixture():
    rgb = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    assert encode_bmp(2, 2, rgb) == _BMP_2X2
    fmt, w, h, mi = decode_image(encode_bmp(2, 2, rgb))
    assert (fmt, w, h) == ("bmp", 2, 2)


def test_decode_ppm_hand_fixture():
    # P6 2x1, maxval 255, pixels (0,128,255) (1,2,3); comment in header
    blob = b"P6\n# test\n2 1\n255\n" + bytes([0, 128, 255, 1, 2, 3])
    fmt, w, h, mi = decode_image(blob)
    assert (fmt, w, h) == ("ppm", 2, 1)
    assert abs(mi - (0 + 128 + 255 + 1 + 2 + 3) / 6 / 255) < 1e-12
    assert decode_image(encode_ppm(2, 1, bytes([0, 128, 255, 1, 2, 3])))[3] == mi


def test_decode_pgm_grayscale():
    blob = b"P5\n3 1\n255\n" + bytes([0, 100, 200])
    assert decode_image(blob) == ("pgm", 3, 1, (0 + 100 + 200) / 3 / 255)


def test_decode_rejects_compressed_and_truncated():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")  # needs a codec library
    with pytest.raises(ValueError):
        decode_image(_BMP_2X2[:-4])  # truncated pixel data
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 1\n255\n\x00")  # truncated PNM pixels


def test_decode_wav_hand_fixture_8bit():
    # hand-assembled RIFF: mono 8-bit PCM @ 8000 Hz, samples 0,128,255,64
    data = bytes([0, 128, 255, 64])
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + 4) + b"WAVE"
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 4) + data
    )
    samples, rate, bits, channels = decode_wav(blob)
    assert (list(samples), rate, bits, channels) == ([0, 128, 255, 64], 8000, 8, 1)
    assert encode_wav(data, 8000, bits=8) == blob


def test_decode_wav_16bit_and_chunk_walk():
    # 16-bit signed samples with an extra LIST chunk before data — the
    # parser must walk chunks, not assume data at offset 36
    samples = [-32768, 0, 32767, -1]
    body = struct.pack("<4h", *samples)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 12 + 8 + len(body)) + b"WAVE"
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 16000, 32000, 2, 16)
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(body)) + body
    )
    got, rate, bits, channels = decode_wav(blob)
    assert (list(got), rate, bits) == (samples, 16000, 16)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI ")  # not WAVE
    with pytest.raises(ValueError):  # non-PCM format code
        decode_wav(
            b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 8000, 8000, 1, 8)
            + b"data\x00\x00\x00\x00"
        )
    with pytest.raises(ValueError):  # truncated fmt chunk must raise
        # ValueError (struct.error would escape the UDF's except and
        # kill the task instead of yielding a NULL struct)
        decode_wav(
            b"RIFF" + struct.pack("<I", 10) + b"WAVE"
            + b"fmt " + struct.pack("<I", 2) + b"\x00\x00"
        )


def test_extract_features_schema_and_rows(spark):
    rows_in = [
        (0, encode_bmp(2, 2, bytes(range(12)))),
        (1, encode_ppm(3, 1, bytes(range(9)))),
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, img binary")
    feats = extract_image_features(df, "doc_id", "img")
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "n_bytes", "fmt", "width", "height", "mean_intensity",
    ]
    by_id = {r["doc_id"]: r for r in feats.collect()}
    assert by_id[0]["fmt"] == "bmp" and (by_id[0]["width"], by_id[0]["height"]) == (2, 2)
    assert by_id[1]["fmt"] == "ppm" and (by_id[1]["width"], by_id[1]["height"]) == (3, 1)
    assert abs(by_id[1]["mean_intensity"] - sum(range(9)) / 9 / 255) < 1e-12


def test_resize_nearest_neighbor_exact_pixels():
    """2x2 -> 4x4 upscale must replicate each source pixel into a 2x2
    block (nearest-neighbor with floor(y*h/new_h) index mapping), and a
    4x4 -> 2x2 downscale must sample rows/cols 0 and 2 — checked against
    hand-computed pixel arrays, round-tripping through the real BMP and
    PPM encoders."""
    from simplex_mapreduce_spark.operators.multimodal import (
        decode_image_pixels,
        resize_image,
    )

    # 2x2 RGB: distinct pixel per corner
    px = {"A": (10, 11, 12), "B": (20, 21, 22), "C": (30, 31, 32), "D": (40, 41, 42)}
    rgb = bytes(v for p in ("A", "B", "C", "D") for v in px[p])
    for enc in (encode_bmp, encode_ppm):
        up = resize_image(enc(2, 2, rgb), 4, 4)
        fmt, w, h, ch, mx, pixels = decode_image_pixels(up)
        assert (w, h, ch) == (4, 4, 3)
        want_rows = [
            ("A", "A", "B", "B"),
            ("A", "A", "B", "B"),
            ("C", "C", "D", "D"),
            ("C", "C", "D", "D"),
        ]
        want = bytes(v for row in want_rows for p in row for v in px[p])
        assert pixels == want, fmt
        # format preserved through the round trip
        assert fmt == ("bmp" if enc is encode_bmp else "ppm")

    # downscale: 4x1 -> 2x1 keeps columns 0 and 2
    rgb4 = bytes(v for p in ("A", "B", "C", "D") for v in px[p])
    down = resize_image(encode_ppm(4, 1, rgb4), 2, 1)
    assert decode_image_pixels(down)[5] == bytes(px["A"] + px["C"])


def test_resize_rejects_zero_dimension_image():
    """A 0xN image DECODES (zero pixels) but cannot be index-mapped;
    resize must raise ValueError (the drop contract), not IndexError."""
    from simplex_mapreduce_spark.operators.multimodal import resize_image

    with pytest.raises(ValueError):
        resize_image(b"P6\n0 5\n255\n", 4, 4)


def test_synthesize_handles_empty_text(spark):
    """An empty document text must still synthesize a valid (all-zero)
    image instead of crashing the encoder mid-batch."""
    from simplex_mapreduce_spark.operators.multimodal import (
        synthesize_image_blobs,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, "some text")], "doc_id long, text string"
    )
    out = extract_image_features(
        synthesize_image_blobs(df, "doc_id", "text"), "doc_id", "img"
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {0, 1}
    assert by_id[0]["mean_intensity"] == 0.0  # all-zero placeholder pixels


def test_resize_grayscale_pgm():
    from simplex_mapreduce_spark.operators.multimodal import (
        decode_image_pixels,
        resize_image,
    )

    blob = b"P5\n2 1\n255\n" + bytes([7, 200])
    out = resize_image(blob, 4, 2)
    fmt, w, h, ch, mx, pixels = decode_image_pixels(out)
    assert (fmt, w, h, ch) == ("pgm", 4, 2, 1)
    assert pixels == bytes([7, 7, 200, 200] * 2)


def test_resize_pipeline_normalizes_dimensions(spark):
    """The Spark-side resize stage must emit every image at the target
    resolution in its original format, and the feature extractor must
    agree on the new dimensions."""
    from simplex_mapreduce_spark.operators.multimodal import resize_images

    rows_in = [
        (0, encode_bmp(2, 2, bytes(range(12)))),
        (1, encode_ppm(5, 3, bytes(range(45)))),
        (2, b"NOTANIMAGE"),
    ]
    df = spark.createDataFrame(rows_in, "doc_id long, img binary")
    out = extract_image_features(
        resize_images(df, "doc_id", "img", 4, 4), "doc_id", "img"
    )
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert set(by_id) == {0, 1}  # corrupt blob dropped, not nulled
    assert all((r["width"], r["height"]) == (4, 4) for r in by_id.values())
    assert by_id[0]["fmt"] == "bmp" and by_id[1]["fmt"] == "ppm"


def test_corrupt_blobs_dropped_not_nulled(spark):
    df = spark.createDataFrame(
        [(1, encode_bmp(1, 1, bytes([5, 5, 5]))), (2, b"CORRUPT!payload")],
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


def test_avi_roundtrip_exact_frames():
    """encode_avi -> demux_avi must return the exact input frames
    (top-down RGB), dimensions, and frame timing."""
    from simplex_mapreduce_spark.operators.multimodal import demux_avi, encode_avi

    w, h = 5, 3  # width*3 = 15, not 4-aligned: exercises row padding
    frames = [bytes((i * 40 + j) % 256 for j in range(w * h * 3)) for i in range(4)]
    blob = encode_avi(w, h, frames, fps=10)
    gw, gh, usec, got = demux_avi(blob)
    assert (gw, gh) == (w, h)
    assert usec == 100_000
    assert got == frames


def test_avi_handbuilt_fixture_and_corrupt_blobs():
    """demux_avi against an INDEPENDENTLY hand-built minimal AVI (not
    produced by encode_avi): one 1x1 white frame, plus a JUNK chunk the
    walker must skip.  Corrupt/foreign blobs raise ValueError."""
    import struct

    import pytest

    from simplex_mapreduce_spark.operators.multimodal import demux_avi

    def chunk(cid, body):
        return struct.pack("<4sI", cid, len(body)) + body + b"\x00" * (len(body) % 2)

    strh = struct.pack("<4s4sI", b"vids", b"DIB ", 0)
    strf = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 0, 0, 0, 0)
    avih = struct.pack("<IIIIIIIIIIIIII", 125000, 0, 0, 0x10, 1, 0, 1, 4, 1, 1, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                         + chunk(b"strf", strf)))
    frame_dib = b"\xff\xff\xff\x00"  # 1px BGR white + 1 pad byte to stride 4
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", frame_dib))
    body = b"AVI " + hdrl + chunk(b"JUNK", b"\x00" * 6) + movi
    blob = struct.pack("<4sI", b"RIFF", len(body)) + body

    w, h, usec, frames = demux_avi(blob)
    assert (w, h, usec) == (1, 1, 125000)
    assert frames == [b"\xff\xff\xff"]  # BGR->RGB of white is white

    # strf with NO preceding strh: spec-violating — no stream to bind
    # the format to, so there is no video stream to decode
    no_strh = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                    + chunk(b"LIST", b"strl" + chunk(b"strf", strf)))
    bad_body = b"AVI " + no_strh + movi
    bad_blob = struct.pack("<4sI", b"RIFF", len(bad_body)) + bad_body
    for bad in (b"", b"RIFF\x00\x00\x00\x00WAVE", blob[:-3],
                b"\x89PNG" + b"\x00" * 40, bad_blob):
        with pytest.raises(ValueError):
            demux_avi(bad)


def test_avi_audio_and_second_video_streams_ignored():
    """An AVI whose stream list also carries an audio stream (18-byte
    WAVEFORMATEX strf — NOT parseable as a BITMAPINFOHEADER) and a
    second video stream must decode as the FIRST video stream alone:
    the audio strf is skipped instead of raising 'truncated strf', the
    second video strf does not overwrite dimensions, and only stream
    0's frame chunks are collected (ADVICE r5)."""
    import struct

    from simplex_mapreduce_spark.operators.multimodal import demux_avi

    def chunk(cid, body):
        return struct.pack("<4sI", cid, len(body)) + body + b"\x00" * (len(body) % 2)

    def strl(fcc, handler, strf_body):
        strh = struct.pack("<4s4sI", fcc, handler, 0)
        return chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                     + chunk(b"strf", strf_body))

    vid_strf = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 0, 0, 0, 0)
    # WAVEFORMATEX: PCM, mono, 8kHz, 16-bit — 18 bytes, would raise
    # 'truncated strf' if misparsed as a BITMAPINFOHEADER
    aud_strf = struct.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, 16, 0)
    vid2_strf = struct.pack("<IiiHHIIiiII", 40, 9, 9, 1, 24, 0, 243, 0, 0, 0, 0)
    avih = struct.pack("<IIIIIIIIIIIIII", 125000, 0, 0, 0x10, 1, 0, 3, 4, 1, 1, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + strl(b"vids", b"DIB ", vid_strf)
                 + strl(b"auds", b"\x00\x00\x00\x00", aud_strf)
                 + strl(b"vids", b"DIB ", vid2_strf))
    frame0 = b"\xff\x00\x00\x00"  # stream 0: 1px BGR blue (+pad)
    movi = chunk(b"LIST", b"movi"
                 + chunk(b"00db", frame0)
                 + chunk(b"01wb", b"\x00\x01" * 8)   # audio data chunk
                 + chunk(b"02db", b"\x00" * 28))     # 2nd video stream
    body = b"AVI " + hdrl + movi
    blob = struct.pack("<4sI", b"RIFF", len(body)) + body

    w, h, usec, frames = demux_avi(blob)
    assert (w, h) == (1, 1)  # first video stream, not the 9x9 one
    assert frames == [b"\x00\x00\xff"]  # one frame, BGR->RGB of blue


def test_frame_sample_matches_python_reference(spark):
    """The Spark frame-sampling pipeline (synthesize AVI -> demux ->
    every-4th-frame as BMP) must produce exactly the rows a plain-Python
    recomputation from the raw text produces — same frames (decoded back
    to RGB), same indices, same dimensions."""
    from simplex_mapreduce_spark.operators.multimodal import (
        decode_image_pixels,
        multimodal_frame_sample,
    )
    from simplex_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = multimodal_frame_sample(spark, sf).collect()

    expected = {}
    for r in load_table(spark, sf, "documents").select("doc_id", "text").collect():
        payload = str(r["text"]).encode() or b"\x00"
        w = (len(payload) % 13) + 2
        h = (len(payload) % 7) + 2
        n_frames = (len(payload) % 9) + 1
        need = w * h * 3
        for i in range(0, n_frames, 4):
            rot = payload[i % len(payload):] + payload[: i % len(payload)]
            expected[(r["doc_id"], i)] = (
                n_frames, w, h, (rot * (need // len(rot) + 1))[:need]
            )

    assert len(got) == len(expected) > 0
    for r in got:
        n_frames, w, h, rgb = expected[(r["doc_id"], r["frame_idx"])]
        assert (r["n_frames"], r["width"], r["height"]) == (n_frames, w, h)
        fmt, gw, gh, ch, maxval, pixels = decode_image_pixels(bytes(r["frame"]))
        assert (fmt, gw, gh, ch) == ("bmp", w, h, 3)
        assert pixels == rgb


def test_audio_features_match_python(spark):
    """The vectorized audio pandas_udf (real RIFF/WAV parse) must match
    a plain-Python recomputation of n_samples / duration / rms / peak
    per blob — the synthesized WAVs wrap the text bytes as unsigned
    8-bit PCM, so the expected features are byte statistics."""
    import math

    from simplex_mapreduce_spark.operators.multimodal import (
        DEFAULT_SAMPLE_RATE,
        multimodal_audio_features,
    )
    from simplex_mapreduce_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in multimodal_audio_features(spark, sf).collect()}
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs) > 0
    for r in docs:
        b = r["text"].encode()
        g = got[r["doc_id"]]
        assert g["n_samples"] == len(b)
        # 6dp round, but Spark rounds HALF_UP and Python banker's — an
        # exact .5 at the 7th place (k/16000 terminates there) differs
        # by one ulp of the 6th decimal; compare to the unrounded value
        assert abs(g["duration_s"] - len(b) / DEFAULT_SAMPLE_RATE) < 6e-7
        rms = math.sqrt(sum(x * x for x in b) / len(b)) if b else 0.0
        assert abs(g["rms"] - round(rms, 4)) < 1e-9
        assert g["peak"] == (max(b) if b else 0)
        # waveform stats: zero-crossing rate on centered samples (exact
        # zeros side with negative, np.signbit convention), clipping
        # fraction at the rails, dynamic range
        cent = [x - 128 for x in b]
        zc = (
            sum(1 for i in range(1, len(cent)) if (cent[i] < 0) != (cent[i - 1] < 0))
            / (len(cent) - 1)
            if len(cent) > 1
            else 0.0
        )
        assert abs(g["zcr"] - round(zc, 4)) < 1e-9
        clip = sum(1 for x in b if x in (0, 255)) / len(b) if b else 0.0
        assert abs(g["clip_frac"] - round(clip, 4)) < 1e-9
        assert g["dyn_range"] == ((max(b) - min(b)) if b else 0)


def test_weighted_avg_udaf_matches_jvm(spark):
    """The grouped-agg pandas UDF must agree with the declarative
    sum(p*q)/sum(q) per group (1e-9, both are float64 sums)."""
    from simplex_mapreduce_spark.operators.custom import weighted_avg_udaf
    from simplex_mapreduce_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    got = {
        r["l_returnflag"]: r["wavg_price"]
        for r in weighted_avg_udaf(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem", convert_ts=False)
    want = {
        r["l_returnflag"]: r["w"]
        for r in li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity"),
                4,
            ).alias("w"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6, k


def test_sliding_window_chunking_semantics(spark):
    """Strided chunking must match a Python reference: windows of
    CHUNK_TOKENS starting every `stride` tokens, stopping once a window
    covers the final token (no tail window fully contained in its
    predecessor), and stride=CHUNK_TOKENS must reproduce the
    non-overlapping chunker exactly."""
    from simplex_mapreduce_spark.operators.custom import (
        CHUNK_TOKENS,
        chunk_documents_native,
    )

    texts = [
        (0, " ".join(f"t{i}" for i in range(95))),   # 3 windows at s=30
        (1, " ".join(f"t{i}" for i in range(40))),   # exactly one window
        (2, " ".join(f"t{i}" for i in range(41))),   # boundary +1
        (3, "single"),                               # tiny doc
        (4, " ".join(f"t{i}" for i in range(60))),   # 40 + contained tail
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    def ref(tokens, stride):
        out, start, i = [], 0, 0
        while True:
            piece = tokens[start : start + CHUNK_TOKENS]
            out.append((i, " ".join(piece), len(piece)))
            if start + CHUNK_TOKENS >= len(tokens):
                break
            start += stride
            i += 1
        return out

    for stride in (30, CHUNK_TOKENS):
        got = {}
        for r in chunk_documents_native(docs, stride=stride).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["n_tokens"])
            )
        for doc_id, text in texts:
            want = ref(text.split(), stride)
            assert sorted(got[doc_id]) == want, (stride, doc_id)

    # overlap property: consecutive windows share CHUNK_TOKENS - stride
    # tokens, so any 10-token span is fully inside at least one window
    rows = chunk_documents_native(docs, stride=30).collect()
    w0, w1 = sorted(
        (r["chunk_id"], r["chunk_text"].split()) for r in rows if r["doc_id"] == 0
    )[:2]
    assert w0[1][30:] == w1[1][:10]


def test_avi_roundtrip_property():
    """Property pin (hypothesis): for ANY dimensions and frame count the
    AVI encode/demux pair is the identity on frames, and demux of a
    truncation either raises ValueError or returns a frame prefix —
    never garbage pixels."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from simplex_mapreduce_spark.operators.multimodal import demux_avi, encode_avi

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 6),
        n=st.integers(0, 5),
        seed=st.integers(0, 2**31),
        cut=st.integers(1, 64),
    )
    def check(w, h, n, seed, cut):
        import random

        rng = random.Random(seed)
        frames = [bytes(rng.randrange(256) for _ in range(w * h * 3)) for _ in range(n)]
        blob = encode_avi(w, h, frames)
        gw, gh, usec, got = demux_avi(blob)
        assert (gw, gh, got) == (w, h, frames)
        try:
            _, _, _, part = demux_avi(blob[: len(blob) - cut])
        except ValueError:
            return
        assert part == frames[: len(part)]

    check()


def test_avi_topdown_storage_not_flipped():
    """A spec-valid AVI with NEGATIVE strf biHeight (top-down frame
    storage) must demux in the stored row order — not vertically
    mirrored (the convention decode_image_pixels honors for BMP)."""
    import struct

    from simplex_mapreduce_spark.operators.multimodal import demux_avi

    def chunk(cid, body):
        return struct.pack("<4sI", cid, len(body)) + body + b"\x00" * (len(body) % 2)

    # 1x2 top-down: row 0 = red, row 1 = blue (stored as BGR)
    strh = struct.pack("<4s4sI", b"vids", b"DIB ", 0)
    strf = struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 24, 0, 8, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"LIST", b"strl"
                 + chunk(b"strh", strh) + chunk(b"strf", strf)))
    frame = b"\x00\x00\xff\x00" + b"\xff\x00\x00\x00"  # BGR rows, padded
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", frame))
    body = b"AVI " + hdrl + movi
    blob = struct.pack("<4sI", b"RIFF", len(body)) + body

    w, h, _, frames = demux_avi(blob)
    assert (w, h) == (1, 2)
    assert frames == [b"\xff\x00\x00" + b"\x00\x00\xff"]  # red THEN blue


def test_frame_sample_drops_null_blobs(spark):
    """A NULL video cell must be dropped like a corrupt one — not kill
    the task with a TypeError before the demux guard runs."""
    from simplex_mapreduce_spark.operators.multimodal import (
        encode_avi,
        sample_video_frames,
    )

    good = encode_avi(2, 2, [bytes(range(12))])
    df = spark.createDataFrame(
        [(0, None), (1, good), (2, b"junk")], "doc_id long, vid binary"
    )
    rows = sample_video_frames(df, "doc_id", "vid").collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_resample_wav_exact_samples():
    """4x decimation with block-mean anti-alias, hand-computed: samples
    [0,4,8,12, 100,104,108,112] -> blocks [6, 106] at rate/4; 16-bit
    path incl. negatives uses floor division (-7//4*... exact)."""
    from simplex_mapreduce_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        resample_wav,
    )

    blob = encode_wav(bytes([0, 4, 8, 12, 100, 104, 108, 112]), 16000, bits=8)
    out = resample_wav(blob, 4)
    samples, rate, bits, ch = decode_wav(out)
    assert (list(samples), rate, bits) == ([6, 106], 4000, 8)

    blob16 = encode_wav([-10, -8, -6, -4, 100, 100, 100, 100], 8000, bits=16)
    s2, r2, b2, _ = decode_wav(resample_wav(blob16, 4))
    assert (list(s2), r2, b2) == ([(-10 - 8 - 6 - 4) // 4, 100], 2000, 16)

    # factor=1 is the identity re-encode; trailing partial block dropped
    assert decode_wav(resample_wav(blob, 1))[0].tolist() == [0, 4, 8, 12, 100, 104, 108, 112]
    blob9 = encode_wav(bytes(range(9)), 16000, bits=8)
    assert decode_wav(resample_wav(blob9, 4))[0].size == 2

    import pytest

    with pytest.raises(ValueError):
        resample_wav(blob, 0)
    with pytest.raises(ValueError):
        resample_wav(b"not a wav", 2)


def test_audio_resample_pipeline(spark):
    """The registered pipeline halves nothing silently: every synthesized
    mono WAV survives, at 1/4 the samples and 4 kHz."""
    from simplex_mapreduce_spark import registry

    registry.load_all()
    out = registry.QUERIES["multimodal_audio_resample"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    assert all(r["sample_rate"] == 4000 for r in out)


def test_average_hash_properties():
    """aHash unit behavior: byte-identical images hash equal; one
    flipped pixel moves few bits; an inverted image flips ~all bits;
    undecodable blobs return None."""
    from simplex_mapreduce_spark.operators.multimodal import (
        average_hash,
        encode_bmp,
    )

    w, h = 16, 16
    rgb = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w) for _ in range(3))
    h1 = average_hash(encode_bmp(w, h, rgb))
    h2 = average_hash(encode_bmp(w, h, rgb))
    assert h1 == h2 and h1 is not None
    tweaked = bytearray(rgb)
    tweaked[0] = (tweaked[0] + 128) % 256  # one subpixel nudge
    h3 = average_hash(encode_bmp(w, h, bytes(tweaked)))
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") <= 2
    inverted = bytes(255 - b for b in rgb)
    h4 = average_hash(encode_bmp(w, h, inverted))
    assert bin((h1 ^ h4) & ((1 << 64) - 1)).count("1") >= 48
    assert average_hash(b"not an image") is None


def test_image_phash_pairs_match_bruteforce(spark):
    """The banded pair query recomputed naively in Python over the SAME
    synthesized blobs: candidates = pairs agreeing on >= 1 of the 4
    16-bit bands, kept if Hamming <= max; identical-hash pairs always
    reported at 0.  Pins the rep-collapse + band join end to end."""
    from simplex_mapreduce_spark import registry
    from simplex_mapreduce_spark.operators.multimodal import (
        PHASH_HAM_MAX,
        average_hash,
        synthesize_image_blobs,
    )
    from simplex_mapreduce_spark.sources.tables import load_table

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    blobs = synthesize_image_blobs(d, "doc_id", "text").collect()
    hashes = {
        r["doc_id"]: average_hash(bytes(r["img"])) for r in blobs
    }
    hashes = {k: v for k, v in hashes.items() if v is not None}
    ids = sorted(hashes)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ha, hb = hashes[a] & (1 << 64) - 1, hashes[b] & (1 << 64) - 1
            shares_band = any(
                (ha >> (16 * k)) & 0xFFFF == (hb >> (16 * k)) & 0xFFFF
                for k in range(4)
            )
            ham = bin(ha ^ hb).count("1")
            if shares_band and ham <= PHASH_HAM_MAX:
                expect.add((a, b, ham))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in registry.QUERIES["multimodal_image_phash_pairs"](
            spark, sf
        ).collect()
    }
    assert got == expect
    assert any(h == 0 for _, _, h in got)  # mirrors present
    assert any(h > 0 for _, _, h in got)  # near-misses present
