"""Multimodal column handling — binary payloads with typed metadata.

Image/audio/video are opaque ``binary`` columns processed by Arrow-batched
``mapInPandas`` kernels, exactly like the text-extraction kernel (U1).

Decode is REAL for the header-parsable part: PNG/GIF/JPEG/BMP container
headers carry dimensions in plain bytes, so ``_parse_image_header``
extracts (format, width, height) with no codec library at all — that is
the metadata a curation pipeline filters on (drop tiny images, bucket by
aspect ratio) before any pixel work. Pixel decode is REAL for
uncompressed 24-bit BMP (``_parse_bmp_pixels``: numpy over the raw padded
pixel array → channel sums / luminance, oracle-verified via
mm_pixel_stats) AND for non-interlaced 8-bit PNG — the dominant web
format — via stdlib zlib inflate + per-row unfilter
(``_parse_png_pixels``, oracle-verified via mm_png_pixels). Formats that
genuinely need a codec library (JPEG entropy decode, GIF LZW, resizing,
perceptual hashing, frame sampling) are absent from this container, so
those payloads fall back to a deterministic md5-derived STUB and
``phash`` is a content hash stand-in, documented as such. Swap the
fallback for PIL/ffmpeg on a real cluster without touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "url string, n_bytes long, format string, width long, height long, "
    "phash long"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_image_header(p: bytes):
    """Real container-header parse → (format, width, height) or None.

    PNG: IHDR is always the first chunk — width/height BE u32 at 16/20.
    GIF: logical screen w/h LE u16 at 6/8.  BMP: i32 LE at 18/22.
    JPEG: scan markers for a SOFn (C0-C3, C5-C7, C9-CB, CD-CF) segment;
    height BE u16 at +5, width at +7 inside it.
    """
    if p[:8] == _PNG_SIG and len(p) >= 24 and p[12:16] == b"IHDR":
        return ("png", int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"))
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        return ("gif", int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"))
    if p[:2] == b"BM" and len(p) >= 26:
        return ("bmp", int.from_bytes(p[18:22], "little", signed=True),
                abs(int.from_bytes(p[22:26], "little", signed=True)))
    if p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                return None  # corrupt marker stream
            marker = p[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(p[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return ("jpeg", int.from_bytes(p[i + 7:i + 9], "big"),
                        int.from_bytes(p[i + 5:i + 7], "big"))
            i += 2 + seg_len
    return None


def _decode_image(payload: bytes) -> dict:
    """Header-real decode with a deterministic stub fallback (see module
    docstring). ``phash`` is always the md5 content hash — a dedup
    fingerprint, not a perceptual hash (needs pixel decode)."""
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "format": "empty", "width": 0, "height": 0, "phash": 0}
    payload = bytes(payload)
    h = hashlib.md5(payload).digest()
    parsed = _parse_image_header(payload)
    if parsed is not None:
        fmt, w, ht = parsed
        return {"n_bytes": len(payload), "format": fmt, "width": w,
                "height": ht, "phash": int.from_bytes(h[3:11], "big", signed=True)}
    return {
        "n_bytes": len(payload),
        "format": "unknown",
        "width": 64 + (h[1] % 64) * 16,
        "height": 64 + (h[2] % 64) * 16,
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


PIXEL_SCHEMA = (
    "url string, n_px long, sum_r long, sum_g long, sum_b long, "
    "mean_lum double"
)


def _parse_bmp_pixels(p: bytes):
    """REAL pixel decode for uncompressed 24-bit BMP — the one raster
    format whose pixel array is plain bytes (no codec library needed):
    BITMAPINFOHEADER, biCompression=0, biBitCount=24, rows bottom-up and
    4-byte padded. → channel sums + pixel count, or None for anything
    else (compressed/paletted/other containers still need the codec libs
    absent from this sandbox)."""
    if p[:2] != b"BM" or len(p) < 54:
        return None
    off = int.from_bytes(p[10:14], "little")
    hsz = int.from_bytes(p[14:18], "little")
    w = int.from_bytes(p[18:22], "little", signed=True)
    h = int.from_bytes(p[22:26], "little", signed=True)
    bitcount = int.from_bytes(p[28:30], "little")
    comp = int.from_bytes(p[30:34], "little")
    if hsz < 40 or bitcount != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    rows = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    if len(p) < off + rows * stride:
        return None
    import numpy as np

    a = (
        np.frombuffer(p, dtype=np.uint8, count=rows * stride, offset=off)
        .reshape(rows, stride)[:, : w * 3]
        .reshape(-1, 3)
        .astype(np.int64)
    )
    sb, sg, sr = (int(s) for s in a.sum(axis=0))  # BMP stores B,G,R
    return {"n_px": w * rows, "sum_r": sr, "sum_g": sg, "sum_b": sb}


def _paeth_predictor(a: int, b: int, c: int) -> int:
    """PNG spec §9.4: the Paeth predictor over left/up/up-left bytes."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _parse_png_pixels(p: bytes):
    """REAL pixel decode for non-interlaced 8-bit-depth PNG using ONLY
    stdlib zlib + numpy — no codec library: walk the chunk stream
    (CRC-checked), inflate the concatenated IDAT payload, undo the per-row
    filters (types 0-4: None/Sub/Up/Average/Paeth) against the previous
    reconstructed scanline, and accumulate channel sums. Color types
    0 (gray), 2 (RGB), 4 (gray+alpha) and 6 (RGBA) are supported; gray
    maps to r=g=b and alpha never enters the sums. Returns None for
    palette (needs PLTE indirection), interlaced, 16-bit, or corrupt
    streams — those still fall through to the documented stub.

    Sub is a per-lane cumsum (vectorized); Average/Paeth have a true
    sequential left-dependency, so they run as per-byte loops — fine for
    the web's small-image tail, and the seam to swap in PIL/libpng on a
    real cluster is this one function.

    Untrusted-corpus bounds: declared dimensions are checked against
    ``max_px`` BEFORE any inflate (a crafted IHDR must not drive a
    multi-GB zlib.decompress), and the inflate itself is capped at the
    exact expected scanline volume via decompressobj — a deflate bomb
    yields None, never an allocation."""
    import zlib

    import numpy as np

    max_px = 16_000_000  # ~16 MP: covers web images; beyond it → stub path
    if p[:8] != _PNG_SIG:
        return None
    i = 8
    w = h = None
    channels = colortype = None
    idat: list[bytes] = []
    while i + 12 <= len(p):
        ln = int.from_bytes(p[i:i + 4], "big")
        typ = p[i + 4:i + 8]
        data = p[i + 8:i + 8 + ln]
        crc = p[i + 8 + ln:i + 12 + ln]
        if len(data) < ln or len(crc) < 4:
            return None
        if zlib.crc32(typ + data) != int.from_bytes(crc, "big"):
            return None
        if typ == b"IHDR":
            if ln != 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitdepth, colortype = data[8], data[9]
            comp, filt, interlace = data[10], data[11], data[12]
            if bitdepth != 8 or comp != 0 or filt != 0 or interlace != 0:
                return None
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
            if channels is None:
                return None
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat or w <= 0 or h <= 0 or w * h > max_px:
        return None
    rowlen = w * channels
    expected = h * (1 + rowlen)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected)
        if d.unconsumed_tail or d.decompress(b"", 1):
            return None  # stream inflates past the declared dimensions
    except zlib.error:
        return None
    if len(raw) != expected:
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + rowlen)
    bpp = channels
    prev = np.zeros(rowlen, dtype=np.int64)
    sums = np.zeros(channels, dtype=np.int64)
    for y in range(h):
        ft = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int64)
        if ft == 0:
            recon = line
        elif ft == 1:  # Sub — additive recurrence per byte lane → cumsum
            recon = line.copy()
            for lane in range(bpp):
                recon[lane::bpp] = np.cumsum(recon[lane::bpp]) % 256
        elif ft == 2:  # Up
            recon = (line + prev) % 256
        elif ft == 3:  # Average
            recon = np.empty(rowlen, dtype=np.int64)
            for j in range(rowlen):
                left = recon[j - bpp] if j >= bpp else 0
                recon[j] = (line[j] + (left + prev[j]) // 2) % 256
        elif ft == 4:  # Paeth
            recon = np.empty(rowlen, dtype=np.int64)
            for j in range(rowlen):
                a = int(recon[j - bpp]) if j >= bpp else 0
                c = int(prev[j - bpp]) if j >= bpp else 0
                recon[j] = (line[j] + _paeth_predictor(a, int(prev[j]), c)) % 256
        else:
            return None
        sums += recon.reshape(w, channels).sum(axis=0)
        prev = recon
    if colortype in (0, 4):  # gray(+alpha) → r = g = b
        s = int(sums[0])
        return {"n_px": w * h, "sum_r": s, "sum_g": s, "sum_b": s}
    return {"n_px": w * h, "sum_r": int(sums[0]), "sum_g": int(sums[1]),
            "sum_b": int(sums[2])}


def _pixel_stats(payload: bytes) -> dict:
    if payload is None or len(payload) == 0:
        parsed = None
    else:
        b = bytes(payload)
        parsed = _parse_bmp_pixels(b)
        if parsed is None:
            parsed = _parse_png_pixels(b)
    if parsed is None:
        return {"n_px": 0, "sum_r": 0, "sum_g": 0, "sum_b": 0, "mean_lum": None}
    lum = (
        0.299 * parsed["sum_r"] + 0.587 * parsed["sum_g"] + 0.114 * parsed["sum_b"]
    ) / parsed["n_px"]
    return {**parsed, "mean_lum": lum}


def decode_pixel_stats(df: DataFrame, binary_col: str = "payload",
                       key_col: str = "url") -> DataFrame:
    """df(key, binary) → per-image pixel statistics via the same Arrow-
    batched mapInPandas shape as decode_binary_column. Real for 24-bit
    uncompressed BMP (numpy over the raw pixel array) and non-interlaced
    8-bit PNG (stdlib zlib + unfilter); JPEG/GIF payloads yield n_px=0 /
    NULL mean until codec libs exist."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_pixel_stats(p) for p in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "url", list(pdf[key_col]))
            yield out

    return df.select(key_col, binary_col).mapInPandas(run, PIXEL_SCHEMA)


def decode_binary_column(df: DataFrame, binary_col: str = "payload",
                         key_col: str = "url") -> DataFrame:
    """df(key, binary) → typed metadata rows via mapInPandas.

    Arrow batch sizing matters for large blobs — the session sets
    spark.sql.execution.arrow.maxRecordsPerBatch low (2048) so a batch of
    multi-MB payloads stays within executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image(p) for p in pdf[binary_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "url", list(pdf[key_col]))
            yield out

    return df.select(key_col, binary_col).mapInPandas(run, DECODED_SCHEMA)
