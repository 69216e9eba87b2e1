"""Multimodal (image/audio/video) column plumbing (extension surface).

Media is carried as an opaque ``binary`` content column plus a typed
metadata struct — the layout a 100 TB training-data pipeline uses:
payloads stay out of every shuffle that doesn't need them (column
pruning drops ``content`` unless a stage touches it), and per-modality
work runs as Arrow-batched ``mapInPandas`` so Python sees zero-copy
byte buffers, never row-at-a-time objects.

Decode status (r6, extended r9/r15/r16): codec-library-free container
formats decode FOR REAL — WAV/PCM16 via the stdlib ``wave`` parser
plus IMA/DVI ADPCM (tag 0x0011, r16 — pure-integer block decoder,
cross-checked against CPython's audioop reference),
BMP (24-bit BI_RGB) and PPM (P6) via struct + numpy, and PNG (every
spec-legal color type / bit depth: gray 1-16, RGB 8/16, palette
1/2/4/8, gray+alpha and RGBA 8/16, sequential and Adam7-interlaced)
via stdlib ``zlib`` inflate + the five spec filter reconstructions —
plus JPEG (baseline AND progressive, ``operators/jpeg.py``, r15) —
and ``resize_image_real`` is a genuine decode → nearest-neighbor
resample → re-encode. ``decode_real`` sniffs the payload magic and
dispatches; only codecs that genuinely need native libraries
(arithmetic-coded JPEG, h264/video) still raise
NotImplementedError, because this container ships no PIL/ffmpeg —
wiring them is a pure function swap inside the same pandas loop. The
synthetic media table's payloads are stand-in text bytes, so the
feature/frame ops on it keep the clearly-marked deterministic fake;
the REAL decoders carry driver-checked evidence through
``media_wav_real_decode`` and ``media_jpeg_real_decode`` (synthesized
valid payloads, decoded stats hash-matched against DuckDB arithmetic
twins) and the round-trip pins in tests/test_multimodal.py and
tests/test_jpeg.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec libraries are optional; the container ships none
    from PIL import Image  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False

N_FEATURES = 8  # byte-histogram bins of the fake decoder

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table over ``documents``: the text
    bytes stand in for an encoded payload; kind and typed metadata derive
    arithmetically from doc_id so a SQL oracle can reproduce them.
    DuckDB twins: encode(text) payload, doc_id % 3 kind selector,
    integer // and % for the metadata fields."""
    d = F.col("doc_id")
    kind = (
        F.when(d % 3 == 0, F.lit("image"))
        .when(d % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        F.when(kind != "audio", (16 + d % 64).cast("int")).alias("width"),
        F.when(kind != "audio", (16 + (d / F.lit(64)).cast("bigint") % 64).cast("int")).alias("height"),
        F.when(kind == "image", F.lit(3)).otherwise(F.lit(None).cast("int")).alias("channels"),
        F.when(kind == "audio", (8000 + 100 * (d % 80)).cast("int")).alias("sample_rate"),
        F.when(kind != "image", (1000 + d % 5000).cast("int")).alias("duration_ms"),
        F.when(kind == "video", (24 + d % 240).cast("int")).alias("n_frames"),
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("pcm16"))
        .otherwise(F.lit("h264"))
        .alias("codec"),
    )
    return docs.select(
        d.alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        meta.alias("meta"),
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Real PCM16 mono WAV encoder (stdlib wave — no codec libs)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real mono WAV decoder: (samples int16, sample_rate). Dispatches
    on the RIFF fmt tag — PCM16 (0x0001) through the stdlib wave
    parser, IMA/DVI ADPCM (0x0011, r16 — the most common compressed
    WAV in crawled corpora) through the pure-integer block decoder
    below. Other tags (A-law, mu-law, MS-ADPCM, float) raise
    NotImplementedError by name."""
    import io
    import wave

    tag = _wav_format_tag(payload)
    if tag == 0x0011:
        return decode_wav_ima(payload)
    if tag != 0x0001:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:04X} is not wired "
            "(PCM16 and IMA ADPCM only)"
        )
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise NotImplementedError("only PCM16 mono WAV is wired")
        samples = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        return samples, w.getframerate()


def _wav_format_tag(payload: bytes) -> int:
    """wFormatTag from the first fmt chunk of a RIFF/WAVE payload."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    for off, size, _body in _riff_chunks(payload):
        if payload[off - 8 : off - 4] == b"fmt ":
            if size < 2:
                raise ValueError("truncated WAV fmt chunk")
            return struct.unpack_from("<H", payload, off)[0]
    raise ValueError("WAV payload has no fmt chunk")


def _riff_chunks(payload: bytes):
    """Yield (body_offset, size, body) for each RIFF sub-chunk; sizes
    are padded to even offsets per the RIFF spec."""
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body_off = pos + 8
        if body_off + size > n:
            raise ValueError("truncated RIFF chunk")
        yield body_off, size, payload[body_off : body_off + size]
        pos = body_off + size + (size & 1)


# IMA/DVI ADPCM (WAVE tag 0x0011) — the 4-bit differential codec from
# the IMA Digital Audio Technical Working Group recommendation (1992),
# as containerized by Microsoft's WAVE spec: per-block header carries
# the exact initial sample and step index, then two samples per byte
# (LOW nibble first). Pure integer arithmetic throughout — the decode
# is bit-deterministic, which is what lets constant-signal fixtures
# round-trip EXACTLY (step 7 quantizes a zero difference to a zero
# reconstruction: 7 >> 3 == 0) and sit under hash-exact compares.
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)
IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)
IMA_BLOCK_ALIGN = 256  # bytes per block -> 505 samples per block


def _ima_reconstruct(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    """One decoder step (the spec's multiply-free expansion of
    diff = (nibble + 1/2) * step / 4): returns (new predictor, new
    index). The ENCODER reuses this exactly so both sides track the
    same state — any asymmetry would compound across a block."""
    step = int(IMA_STEP_TABLE[index])
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(IMA_INDEX_TABLE[nibble & 7])))
    return predictor, index


def encode_wav_ima(
    samples: np.ndarray, sample_rate: int, block_align: int = IMA_BLOCK_ALIGN
) -> bytes:
    """Real IMA ADPCM mono WAV encoder (tag 0x0011). Each block stores
    its first sample verbatim in the 4-byte header (predictor int16,
    step index uint8, reserved), then 4-bit codes low-nibble-first;
    the step index carries across blocks as encoders conventionally
    do (each block stays independently decodable via its header). A
    fact chunk records the true frame count so a partial final block
    trims exactly on decode."""
    import struct

    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    if n == 0:
        raise ValueError("cannot encode an empty signal")
    spb = (block_align - 4) * 2 + 1
    index = 0
    blocks = bytearray()
    for b0 in range(0, n, spb):
        chunk = s[b0 : b0 + spb]
        predictor = int(chunk[0])
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for x in chunk[1:]:
            step = int(IMA_STEP_TABLE[index])
            diff = int(x) - predictor
            code = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            predictor, index = _ima_reconstruct(code, predictor, index)
            nibbles.append(code)
        nibbles += [0] * ((spb - 1) - len(nibbles))  # pad final block
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
    avg_bps = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, avg_bps, block_align, 4, 2, spb
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + 4) + (8 + len(blocks)))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )


def decode_wav_ima(payload: bytes) -> tuple[np.ndarray, int]:
    """Real IMA ADPCM mono WAV decoder -> (samples int16, rate). Pure
    integer state machine per block: header seeds (predictor, index),
    every nibble reconstructs through _ima_reconstruct. Sequential by
    nature (each step's quantizer depends on the last), like the JPEG
    Huffman walk — parallelism is by input split, not within a
    payload."""
    import struct

    fmt = None
    fact_frames = None
    data = None
    for off, size, body in _riff_chunks(payload):
        cid = payload[off - 8 : off - 4]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact" and size >= 4:
            fact_frames = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    tag, channels, rate, _bps, block_align = struct.unpack_from("<HHIIH", fmt, 0)
    if tag != 0x0011:
        raise ValueError("not an IMA ADPCM WAV payload")
    if channels != 1:
        raise NotImplementedError("only mono IMA ADPCM is wired")
    spb = (
        struct.unpack_from("<H", fmt, 18)[0]
        if len(fmt) >= 20
        else (block_align - 4) * 2 + 1
    )
    out = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            raise ValueError("truncated IMA ADPCM block")
        predictor, index, _ = struct.unpack_from("<hBB", block, 0)
        if index > 88:
            raise ValueError("corrupt IMA ADPCM step index")
        got = [predictor]
        for byte in block[4:]:
            for nibble in (byte & 0xF, byte >> 4):
                predictor, index = _ima_reconstruct(nibble, predictor, index)
                got.append(predictor)
        out.extend(got[:spb])  # a block never yields more than spb
    samples = np.array(out, dtype=np.int16)
    if fact_frames is not None:
        samples = samples[:fact_frames]
    return samples, rate


def encode_bmp(img: np.ndarray) -> bytes:
    """Real 24-bit uncompressed (BI_RGB) BMP encoder. ``img`` is
    (h, w, 3) uint8 RGB; rows are bottom-up, BGR, padded to 4 bytes —
    the classic on-disk layout, built with struct + numpy only."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    header_size = 14 + 40
    file_size = header_size + len(body)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Real 24-bit BI_RGB BMP decoder -> (h, w, 3) uint8 RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP is wired")
    stride = (w * 3 + 3) & ~3
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows[::-1] if flip else rows
    return img[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """Real binary PPM (P6) encoder for (h, w, 3) uint8 RGB."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real binary PPM (P6) decoder -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM is wired")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # 8-bit RGB (color type 2): 3 bytes/pixel


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, Filter type 4): pick whichever of
    left/up/upper-left is closest to a+b-c, ties left > up > upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_predict(ftype: int, x: int, cur, prior, bpp: int = _PNG_BPP) -> int:
    """Predictor byte for filter ``ftype`` at byte offset ``x`` of a
    scanline, given the (reconstructed) current row bytes so far and the
    full prior reconstructed row — the shared half of filter (encode)
    and reconstruct (decode), which differ only in add vs subtract.
    ``bpp`` is the spec's filter unit: the number of bytes per complete
    pixel, rounding UP to one for sub-byte depths (spec §9: filters
    operate on the packed bytes, not on unpacked samples)."""
    left = int(cur[x - bpp]) if x >= bpp else 0
    if ftype == 1:  # Sub
        return left
    up = int(prior[x])
    if ftype == 2:  # Up
        return up
    if ftype == 3:  # Average (floor of the EXACT sum — no /2 rounding)
        return (left + up) // 2
    if ftype == 4:  # Paeth
        ul = int(prior[x - bpp]) if x >= bpp else 0
        return _paeth(left, up, ul)
    raise ValueError(f"unknown PNG filter type {ftype}")


# channel count and spec-legal bit depths per PNG color type (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes (spec §8.2): (x_origin, y_origin, x_step, y_step).
# Pass k holds the pixels at (y0 + i*dy, x0 + j*dx); each pass is filtered
# as an INDEPENDENT reduced image (its own scanlines, its own prior row),
# and a pass with zero width or zero height contributes no bytes at all.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)
_PNG_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_rows(flat: np.ndarray, bpp: int, filter_type) -> bytearray:
    """Apply spec filters to packed scanline bytes ``flat`` (h, stride):
    one filter-type byte + filtered bytes per row. ``filter_type`` is a
    spec filter (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth) for every
    scanline, or ``"mixed"`` (row y uses filter y % 5) so one payload
    exercises every reconstruction path. Predictions use the ORIGINAL
    prior-scanline bytes (spec: filtering is lossless, so reconstructed
    == original)."""
    h, stride = flat.shape
    lines = bytearray()
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        cur = flat[y]
        prior = flat[y - 1] if y else zero
        lines.append(ft)
        if ft == 0:
            lines += cur.tobytes()
        elif ft == 2:  # Up vectorizes: no left-neighbor dependency
            lines += ((cur.astype(np.int64) - prior) & 0xFF).astype(
                np.uint8).tobytes()
        else:
            out = bytearray(stride)
            for x in range(stride):
                out[x] = (
                    int(cur[x]) - _png_predict(ft, x, cur, prior, bpp)
                ) & 0xFF
            lines += out
    return lines


def _png_pack_rows(img: np.ndarray, bit_depth: int) -> np.ndarray:
    """Pack (h, w, c) samples into the spec's scanline bytes (h, stride):
    8-bit verbatim, 16-bit big-endian byte pairs, sub-byte MSB-first with
    zero padding to the byte boundary (spec §7.2). Shared by the
    sequential encoder (whole image) and the Adam7 encoder (per pass)."""
    h, w, c = img.shape
    if bit_depth == 8:
        return np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * c)
    if bit_depth == 16:
        v = img.astype(np.uint16).reshape(h, w * c)
        flat = np.zeros((h, w * c * 2), dtype=np.uint8)
        flat[:, 0::2] = (v >> 8).astype(np.uint8)
        flat[:, 1::2] = (v & 0xFF).astype(np.uint8)
        return flat
    vals = img[..., 0].astype(np.uint8)
    if int(vals.max(initial=0)) >= (1 << bit_depth):
        raise ValueError(f"sample exceeds {bit_depth}-bit range")
    shifts = np.arange(bit_depth - 1, -1, -1, dtype=np.uint8)
    bits = ((vals[..., None] >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, w * bit_depth), axis=1)


def encode_png(img: np.ndarray, filter_type: int | str = 0) -> bytes:
    """Real PNG encoder for (h, w, 3) uint8 RGB — pure stdlib zlib +
    struct, no codec libraries. 8-bit color type 2, no interlace; the
    general-shape twin is encode_png_ex below."""
    return encode_png_ex(img, color_type=2, bit_depth=8,
                         filter_type=filter_type)


def encode_png_ex(
    img: np.ndarray,
    color_type: int,
    bit_depth: int,
    filter_type: int | str = 0,
    palette: np.ndarray | None = None,
    interlace: int = 0,
) -> bytes:
    """PNG encoder for EVERY spec-legal (color type, bit depth) pair,
    sequential or Adam7-interlaced — the fixture factory for the full
    decode_png surface.
    ``img`` shapes: (h, w) or (h, w, 1) gray/palette-index, (h, w, 2)
    gray+alpha, (h, w, 3) RGB, (h, w, 4) RGBA; dtype uint8 (depths
    1-8; sub-byte values must fit the depth) or uint16 (depth 16).
    Sub-byte rows pack MSB-first with zero padding to the byte
    boundary (spec §7.2); 16-bit samples are big-endian. ``palette``
    is the (n, 3) uint8 PLTE for color type 3. ``interlace=1`` emits
    the seven Adam7 reduced images in pass order, each packed and
    filtered as an independent image (spec §8.2), empty passes omitted."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or c != channels:
        raise ValueError(
            f"color type {color_type} wants {channels} channel(s), got {c}"
        )
    if bit_depth not in _PNG_VALID_DEPTHS[color_type]:
        raise ValueError(
            f"bit depth {bit_depth} is not spec-legal for color type "
            f"{color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    bpp = max(1, channels * bit_depth // 8)
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines += _png_filter_rows(
                _png_pack_rows(sub, bit_depth), bpp, filter_type
            )
    else:
        lines = _png_filter_rows(
            _png_pack_rows(img, bit_depth), bpp, filter_type
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace
    )
    parts = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("color type 3 requires a palette")
        parts += _png_chunk(
            b"PLTE", np.ascontiguousarray(palette, dtype=np.uint8).tobytes()
        )
    return (
        parts
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(
    raw: bytes, h: int, stride: int, bpp: int, offset: int = 0
) -> np.ndarray:
    """Reconstruct ``h`` filtered scanlines of ``stride`` bytes starting
    at ``offset`` in the inflated stream -> (h, stride) uint8. The prior
    row starts at zero (spec: the row above the first scanline of an
    image — or of an Adam7 reduced image — is all zeroes)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1)
        prior = out[y - 1] if y else zero
        if ftype == 0:
            out[y] = line
        elif ftype == 2:
            out[y] = (line.astype(np.int64) + prior) & 0xFF
        else:
            rec = out[y]  # filled left-to-right; Sub/Avg/Paeth read it back
            for x in range(stride):
                rec[x] = (
                    int(line[x]) + _png_predict(ftype, x, rec, prior, bpp)
                ) & 0xFF
    return out


def _png_unpack(
    out: np.ndarray, w: int, h: int, channels: int, depth: int, color: int
) -> np.ndarray:
    """Unpack reconstructed scanline bytes (h, stride) -> (h, w,
    channels) uint8 samples: 16-bit scales (v*255+32767)//65535,
    sub-byte GRAY scales v*255//(2^d-1), palette indices stay raw."""
    if depth == 8:
        return out.reshape(h, w, channels)
    if depth == 16:
        wide = out.reshape(h, w, channels, 2).astype(np.uint32)
        v16 = (wide[..., 0] << 8) | wide[..., 1]
        return ((v16 * 255 + 32767) // 65535).astype(np.uint8)
    # 1/2/4-bit gray values or palette indices, packed MSB-first
    bits = np.unpackbits(out, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (bits.astype(np.uint16) * weights).sum(axis=2)
    if color == 0:
        vals = vals * 255 // ((1 << depth) - 1)
    return vals.astype(np.uint8)[..., None]


def decode_png(payload: bytes, keep_alpha: bool = False) -> np.ndarray:
    """Real PNG decoder — stdlib zlib inflate + the five spec filter
    reconstructions (None/Sub/Up/Average/Paeth), per-chunk CRC
    verified, multi-IDAT concatenated. EVERY spec-legal (color type,
    bit depth) pair decodes (r15, VERDICT r14 item 2 — the r9 decoder
    gated everything but 8-bit RGB): grayscale 1/2/4/8/16, RGB 8/16,
    palette 1/2/4/8 (PLTE lookup, index-range checked), gray+alpha and
    RGBA 8/16 — sequential AND Adam7-interlaced (the seven reduced
    images unfilter independently and scatter back onto the pass grid,
    spec §8.2; the r15 gate-opening round closed this last PNG gate
    too). jpeg/h264 still genuinely need PIL/PyAV and keep their
    raising hooks in decode_real.

    Returns (h, w, 3) uint8 RGB by default. Alpha policy: PNG color
    samples are NON-premultiplied (spec §12.8), so dropping the alpha
    channel returns the stored color bytes exactly — deterministic and
    lossless on RGB, no compositing convention smuggled in; pass
    ``keep_alpha=True`` to get (h, w, 4) RGBA from color types 4/6.
    The ancillary tRNS chunk is ignored for the same reason (it IS an
    alpha channel). Sample scaling to 8 bits is exact: sub-byte v maps
    to v*255 // (2**depth - 1) (integer — 255 is divisible by every
    sub-byte max), 16-bit v to (v*255 + 32767) // 65535 (correctly
    rounded v*255/65535, the spec §12.5 resampling)."""
    import struct
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG {ctype!r} chunk CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = _PNG_CHANNELS.get(color)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color}")
    if depth not in _PNG_VALID_DEPTHS[color]:
        raise ValueError(
            f"bit depth {depth} is not spec-legal for color type {color}"
        )
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # contract: garbage payloads fail inside the decoder's sane
        # error set (ValueError), never a raw zlib.error
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    bpp = max(1, channels * depth // 8)
    if interlace:
        # Adam7: seven reduced images, each unfiltered/unpacked as an
        # independent image, scattered back onto the (y0+i*dy, x0+j*dx)
        # grid; passes with zero extent contribute no bytes (spec §8.2)
        passes = []
        total = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = max(0, (w - x0 + dx - 1) // dx)
            hp = max(0, (h - y0 + dy - 1) // dy)
            if wp == 0 or hp == 0:
                continue
            sp = (wp * channels * depth + 7) // 8
            passes.append((x0, y0, dx, dy, wp, hp, sp, total))
            total += hp * (sp + 1)
        if len(raw) != total:
            raise ValueError("PNG scanline payload size mismatch")
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        for x0, y0, dx, dy, wp, hp, sp, off in passes:
            rec = _png_unfilter(raw, hp, sp, bpp, offset=off)
            samples[y0::dy, x0::dx] = _png_unpack(rec, wp, hp, channels,
                                                  depth, color)
    else:
        stride = (w * channels * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline payload size mismatch")
        rec = _png_unfilter(raw, h, stride, bpp)
        samples = _png_unpack(rec, w, h, channels, depth, color)

    alpha = None
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
    elif color == 0:
        rgb = np.repeat(samples, 3, axis=2)
    elif color == 2:
        rgb = samples
    elif color == 4:
        rgb = np.repeat(samples[..., :1], 3, axis=2)
        alpha = samples[..., 1:]
    else:  # 6
        rgb = samples[..., :3]
        alpha = samples[..., 3:]
    if keep_alpha and alpha is not None:
        return np.concatenate([rgb, alpha], axis=2).copy()
    return np.ascontiguousarray(rgb)


def resample_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (h, w, 3) -> (height, width, 3): pure
    integer index arithmetic (src = floor(dst * src_dim / dst_dim)), so
    an arithmetic oracle can reproduce every output pixel."""
    h, w, _ = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[np.ix_(ys, xs)]


def decode_real(payload: bytes, kind: str | None = None):
    """Real decoder: sniffs the payload magic and dispatches to the
    codec-free decoders above. Returns (modality, decoded):
    ("audio", (samples, rate)) for WAV, ("image", ndarray) for
    BMP/PPM/PNG (PNG decoded for real via stdlib zlib + the five filter
    reconstructions — r9) and JPEG — baseline AND
    progressive (r15 — pure numpy Huffman + IDCT in operators/jpeg.py;
    arithmetic/lossless frames raise NotImplementedError by name
    inside that decoder). Codecs that
    genuinely need native libraries (h264/...) require PyAV, which this
    container does not ship — they raise NotImplementedError until
    wired here (a pure function swap)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio", decode_wav(payload)
    if payload[:2] == b"BM":
        return "image", decode_bmp(payload)
    if payload[:2] == b"P6":
        return "image", decode_ppm(payload)
    if payload[:8] == PNG_SIG:
        return "image", decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from erathia_market_etl_spark.operators.jpeg import decode_jpeg

        return "image", decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from erathia_market_etl_spark.operators.gif import decode_gif

        return "image", decode_gif(payload)
    if not HAVE_CODECS:
        raise NotImplementedError(
            "compressed-video decode requires libraries (PyAV/ffmpeg) "
            "not present in this environment; WAV/BMP/PPM/PNG/JPEG "
            "decode for real above"
        )
    raise NotImplementedError("compressed-codec path not wired yet")


def _fake_decode_features(buf: bytes, bins: int = N_FEATURES) -> np.ndarray:
    """Deterministic FAKE decode: byte histogram normalized to sum 1 —
    stands in for pixel/spectral statistics. Pure numpy over the Arrow
    buffer, vectorized per batch."""
    if len(buf) == 0:
        return np.zeros(bins)
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return hist / len(arr)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: mapInPandas over (media_id,
    kind, content) — metadata and any other columns are pruned before
    the Python boundary, so the Arrow transfer carries exactly the bytes
    being decoded. Output is a fixed-width feature vector per row.

    The whole batch histograms in ONE vectorized pass (r16, guide
    §4.2): all payloads concatenate into one uint8 array, the bin of
    every byte is ``byte >> 5`` (identical to np.histogram with 8
    equal bins over [0, 256) — bin edges are exact multiples of 32),
    and one bincount over ``row_index * 8 + bin`` yields every row's
    histogram — the old per-row np.histogram call paid ~50 µs of numpy
    dispatch per payload. Counts are identical integers and the
    normalization is the same single IEEE division, so features are
    bit-identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads decode like empty ones (zeros histogram,
            # n_bytes 0) instead of raising len(None) deep in the worker
            bufs = [b if b is not None else b"" for b in pdf["content"]]
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64,
                               count=len(bufs))
            if lens.sum():
                data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
                row = np.repeat(np.arange(len(bufs)), lens)
                counts = np.bincount(
                    row * N_FEATURES + (data >> 5),
                    minlength=len(bufs) * N_FEATURES,
                ).reshape(len(bufs), N_FEATURES)
            else:
                counts = np.zeros((len(bufs), N_FEATURES), dtype=np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                feats = np.where(
                    lens[:, None] > 0, counts / lens[:, None], 0.0
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "features": list(feats),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: 1→N row expansion inside
    mapInPandas (one output row per sampled frame index). The fake
    "frame decode" fingerprints payload + '|' + decimal index — that
    exact byte layout so the DuckDB oracle can reproduce it as
    md5(text || '|' || idx) (r3 VERDICT item 1c: frame indices are
    pure arithmetic, the whole op is oracle-checkable). A real decoder
    would seek/extract the frame here. Filter to kind='video' happens
    Spark-side so non-video payloads never cross the Arrow boundary."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, buf, n_frames in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                # a video row missing its payload or frame count has
                # nothing to sample — skip rather than crash the batch
                if buf is None or pd.isna(n_frames):
                    continue
                for i in range(0, int(n_frames), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(bytes(buf) + b"|" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content", F.col("meta.n_frames").alias("n_frames"))
        .mapInPandas(fn, FRAMES_SCHEMA)
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas and rewrites
    the metadata to the target dimensions. STUB — the payload bytes are
    returned unchanged (a real implementation decodes, resamples, and
    re-encodes inside the loop); the schema contract and batch flow are
    the production shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    flat = media.filter(F.col("kind") == "image").select(
        "media_id", "content",
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    )
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return flat.mapInPandas(fn, schema)


def resize_image_real(images: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize — decode (BMP/PPM, codec-free), nearest-
    neighbor resample, re-encode BMP — inside the same Arrow-batched
    shape as resize_stub. Input: (media_id, content) with decodable
    payloads; NULL, undecodable, or corrupt payloads are dropped (a
    production pipeline would route them to a quarantine sink) — the
    catch is deliberately broad because decoder failure modes span
    NotImplementedError/ValueError (sniffing), struct.error (truncated
    BMP headers), wave.Error (corrupt RIFF), and IndexError
    (degenerate zero-dimension images); none may crash the task.
    Narrow: payloads never shuffle, parallelism = input splits."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                try:
                    modality, img = decode_real(bytes(buf))
                    if modality != "image":
                        continue
                    out = encode_bmp(resample_nearest(img, width, height))
                except Exception:
                    continue
                outs.append(out)
                ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "content": pd.Series(outs, dtype="object"),
                    "width": pd.Series([width] * len(ids), dtype="int32"),
                    "height": pd.Series([height] * len(ids), dtype="int32"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return images.select("media_id", "content").mapInPandas(fn, schema)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)


def wav_decode_stats(wavs: DataFrame) -> DataFrame:
    """REAL audio decode: parse each WAV payload (stdlib wave — the
    sample rate and samples come OUT of the container, not from
    metadata columns) and emit per-clip stats. Exact integer stats
    (count/sum/peak) plus RMS computed as one IEEE double
    division+sqrt over exact integer sums, rounded 6dp with the
    floor-trick — bit-reproducible by an arithmetic oracle. Corrupt or
    NULL payloads are dropped (quarantine-sink pattern)."""
    import math

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "sample_rate", "n_samples",
                     "sum_samples", "peak", "rms")}
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                try:
                    samples, rate = decode_wav(bytes(buf))
                except Exception:
                    continue
                v = samples.astype(np.int64)
                n = len(v)
                sumsq = int((v * v).sum()) if n else 0
                rms = math.sqrt(sumsq / n) if n else 0.0
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["sum_samples"].append(int(v.sum()) if n else 0)
                rows["peak"].append(int(np.abs(v).max()) if n else 0)
                rows["rms"].append(math.floor(rms * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "sample_rate": pd.Series(rows["sample_rate"], dtype="int32"),
                    "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
                    "sum_samples": pd.Series(rows["sum_samples"], dtype="int64"),
                    "peak": pd.Series(rows["peak"], dtype="int32"),
                    "rms": pd.Series(rows["rms"], dtype="float64"),
                }
            )

    return wavs.select("media_id", "content").mapInPandas(fn, WAV_STATS_SCHEMA)


AHASH_SIZE = 8           # 8x8 downsample -> 64-bit perceptual hash
AHASH_BLOCKS = 4         # pigeonhole blocks of 16 bits each
AHASH_HAMMING_MAX = 3    # pairs within 3 bit flips; < AHASH_BLOCKS, so
                         # the pigeonhole guarantee holds (no misses)


def ahash_bits(img: np.ndarray) -> int:
    """Average-hash (aHash) of a decoded (h, w, 3) image: nearest-
    neighbor downsample to 8x8, integer grayscale (channel sum DIV 3),
    threshold at the integer mean (sum DIV 64), pack row-major into 64
    bits. Every step is integer arithmetic — the hash is a pure
    function of the pixel bytes, reproducible anywhere (no float
    luminance weights, no library resampler variance)."""
    small = resample_nearest(img, AHASH_SIZE, AHASH_SIZE)
    gray = small.astype(np.int64).sum(axis=2) // 3
    mean = int(gray.sum()) // (AHASH_SIZE * AHASH_SIZE)
    bits = (gray > mean).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    # signed-long view so the value rides a Spark LongType unchanged
    return int(np.int64(np.uint64(h)))


def dhash_bits(img: np.ndarray) -> int:
    """Difference-hash (dHash) of a decoded (h, w, 3) image: nearest-
    neighbor downsample to 8 rows x 9 columns, integer grayscale
    (channel sum DIV 3), bit (y, x) = gray[y, x+1] > gray[y, x],
    packed row-major into 64 bits. Complements aHash: comparing
    ADJACENT pixels makes the hash invariant under smooth illumination
    GRADIENTS (a left-to-right light ramp adds a near-constant delta
    to each neighbor difference), where aHash's global-mean threshold
    flips half its bits — the classic reason production image dedup
    runs both. All integer arithmetic, container-independent."""
    small = resample_nearest(img, AHASH_SIZE + 1, AHASH_SIZE)  # (8, 9, 3)
    gray = small.astype(np.int64).sum(axis=2) // 3
    bits = (gray[:, 1:] > gray[:, :-1]).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return int(np.int64(np.uint64(h)))


def _media_hash64(images: DataFrame, hash_fn) -> DataFrame:
    """Shared narrow Arrow stage for 64-bit image hashes: decode every
    payload, apply ``hash_fn(img) -> int64``, emit (media_id, ahash).
    Payloads never shuffle; only the 8-byte hash rides downstream
    joins. Undecodable/NULL/audio payloads are dropped (quarantine-sink
    pattern, as the other real-decode ops)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                try:
                    modality, img = decode_real(bytes(buf))
                    if modality != "image":
                        continue
                    h = hash_fn(img)
                except Exception:
                    continue
                ids.append(mid)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hs, dtype="int64"),
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("ahash", LongType())]
    )
    return images.select("media_id", "content").mapInPandas(fn, schema)


def media_ahash(images: DataFrame) -> DataFrame:
    """Average-hash table: (media_id, ahash) for every decodable image
    payload (BMP/PPM/PNG; the codec-free decode path)."""
    return _media_hash64(images, ahash_bits)


def media_dhash(images: DataFrame) -> DataFrame:
    """Difference-hash table — same contract as media_ahash (the output
    column keeps the ``ahash`` name so hash64_near_pairs serves every
    64-bit hash family unchanged)."""
    return _media_hash64(images, dhash_bits)


def dhash_near_pairs(
    images: DataFrame,
    hamming_max: int = AHASH_HAMMING_MAX,
    max_bucket: int = 256,
) -> DataFrame:
    """Image near-dup pairs by gradient hash: dHash every decodable
    image payload, then the shared 64-bit pigeonhole pairing."""
    return hash64_near_pairs(media_dhash(images), hamming_max, max_bucket)


def hash64_near_pairs(
    hashes: DataFrame,
    hamming_max: int = AHASH_HAMMING_MAX,
    max_bucket: int = 256,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit perceptual hash table
    (media_id, ahash): pigeonhole the 64 bits into AHASH_BLOCKS (4)
    16-bit blocks (hamming <= hamming_max < blocks implies at least one
    block matches exactly — candidate generation has NO false negatives
    within the radius), block-bucket self-join with a deterministic
    per-bucket cap, exact popcount verify on the full hash. Shared by
    the image (media_ahash) and audio (media_wav_energy_hash) dedup
    passes.

    At scale: payloads stay in the upstream narrow hash stage; the
    banding shuffle carries (media_id, block_idx, 16-bit key); pair
    expansion is O(cap²) per bucket; verification is one xor+bit_count
    per surviving pair."""
    from pyspark.sql import Window

    if not 0 <= hamming_max < AHASH_BLOCKS:
        # the pigeonhole guarantee is exactly hamming_max < #blocks; a
        # wider radius would silently lose candidates whose flips hit
        # every block (r8 self-review) — refuse rather than under-recall
        raise ValueError(
            f"hamming_max must be in [0, {AHASH_BLOCKS}) for the "
            f"{AHASH_BLOCKS}-block pigeonhole guarantee, got {hamming_max}"
        )
    blocks = hashes.select(
        "media_id", "ahash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("block_idx"),
                    F.shiftright("ahash", i * 16).bitwiseAND(F.lit(0xFFFF))
                    .alias("block_key"),
                )
                for i in range(AHASH_BLOCKS)
            ])
        ).alias("b"),
    ).select("media_id", "ahash", "b.block_idx", "b.block_key")
    rn = F.row_number().over(
        Window.partitionBy("block_idx", "block_key").orderBy("media_id")
    )
    capped = blocks.withColumn("rn", rn).filter(F.col("rn") <= max_bucket)
    a = capped.select(
        F.col("media_id").alias("media_a"), F.col("ahash").alias("hash_a"),
        "block_idx", "block_key",
    )
    b = capped.select(
        F.col("media_id").alias("media_b"), F.col("ahash").alias("hash_b"),
        "block_idx", "block_key",
    )
    return (
        a.join(b, ["block_idx", "block_key"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "hash_a", "hash_b")
        .distinct()
        .select(
            "media_a", "media_b",
            F.bit_count(
                F.col("hash_a").bitwiseXOR(F.col("hash_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
        .orderBy("media_a", "media_b")
    )


def ahash_near_pairs(
    images: DataFrame,
    hamming_max: int = AHASH_HAMMING_MAX,
    max_bucket: int = 256,
) -> DataFrame:
    """Image near-dup pairs: aHash every decodable image payload, then
    the shared 64-bit pigeonhole pairing (hash64_near_pairs). The image
    analog of simhash_near_pairs for the multimodal dedup pass."""
    return hash64_near_pairs(media_ahash(images), hamming_max, max_bucket)


def wav_energy_bits(samples: np.ndarray, n_windows: int = 64) -> int:
    """64-bit audio fingerprint: split the clip into 64 equal windows,
    integer mean |amplitude| per window (sum DIV len), threshold at the
    integer mean of the window means. Pure integer arithmetic over the
    decoded PCM — reproducible anywhere, robust to low-amplitude noise
    (a perturbation must move a window's mean energy across the global
    mean to flip a bit). Clips shorter than n_windows samples repeat
    windows via the same nearest-neighbor index math as the image
    resampler."""
    v = np.abs(samples.astype(np.int64))
    n = len(v)
    if n == 0:
        return 0
    idx = (np.arange(n_windows + 1) * n) // n_windows
    means = np.array(
        [int(v[idx[i]:max(idx[i + 1], idx[i] + 1)].mean())
         for i in range(n_windows)],
        dtype=np.int64,
    )
    mean = int(means.sum()) // n_windows
    h = 0
    for b in means > mean:
        h = (h << 1) | int(b)
    return int(np.int64(np.uint64(h)))


def media_wav_energy_hash(wavs: DataFrame) -> DataFrame:
    """Audio fingerprint table: (media_id, ahash) for every decodable
    WAV payload — the audio twin of media_ahash (same output contract,
    so hash64_near_pairs serves both). Narrow Arrow stage; payloads
    never shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                try:
                    samples, _rate = decode_wav(bytes(buf))
                    h = wav_energy_bits(samples)
                except Exception:
                    continue
                ids.append(mid)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hs, dtype="int64"),
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("ahash", LongType())]
    )
    return wavs.select("media_id", "content").mapInPandas(fn, schema)


def wav_near_pairs(
    wavs: DataFrame,
    hamming_max: int = AHASH_HAMMING_MAX,
    max_bucket: int = 256,
) -> DataFrame:
    """Audio near-dup pairs: energy-envelope fingerprint + the shared
    64-bit pigeonhole pairing — completes the text/image/audio dedup
    modality matrix."""
    return hash64_near_pairs(
        media_wav_energy_hash(wavs), hamming_max, max_bucket
    )


def resample_audio_real(wavs: DataFrame, target_n: int) -> DataFrame:
    """REAL audio resample — decode (stdlib wave), nearest-neighbor
    resample the PCM16 sample vector to exactly ``target_n`` samples
    (src index = (dst·n) DIV target — the same exact integer mapping
    as the image path), re-encode WAV at the ORIGINAL rate. The audio
    twin of resize_image_real: fixed-length clips are what embedding /
    feature models consume. Corrupt/NULL payloads are dropped
    (quarantine-sink pattern, same broad-catch rationale as the image
    path). Narrow mapInPandas: payloads never shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                if buf is None:
                    continue
                try:
                    samples, rate = decode_wav(bytes(buf))
                    n = len(samples)
                    if n == 0:
                        continue
                    idx = (np.arange(target_n, dtype=np.int64) * n) // target_n
                    out = samples[idx]
                    outs.append(encode_wav(out, rate))
                    ids.append(mid)
                except Exception:
                    continue
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": pd.Series(outs, dtype="object")}
            )

    return wavs.select("media_id", "content").mapInPandas(
        fn, "media_id long, content binary"
    )
