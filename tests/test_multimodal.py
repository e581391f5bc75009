"""Multimodal binary-column plumbing: schema, Arrow batching, determinism.
The decode itself is a documented deterministic stub (no codec libs in
this container) — what's under test is the real Spark-side path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gossiphs_spark.operators.multimodal import decode_binary_column


@pytest.mark.smoke
def test_decode_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [("u1", b"payload-one"), ("u2", b"payload-two"), ("u3", b""), ("u4", None)],
        "url string, payload binary",
    )
    out = decode_binary_column(df)
    assert out.schema.simpleString() == (
        "struct<url:string,n_bytes:bigint,format:string,width:bigint,"
        "height:bigint,phash:bigint>"
    )
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["n_bytes"] == len(b"payload-one")
    assert rows["u3"]["format"] == "empty"
    assert rows["u4"]["n_bytes"] == 0
    # determinism across repartitioning (Arrow batch boundaries move)
    rows2 = {r["url"]: r for r in decode_binary_column(df.repartition(3)).collect()}
    for k in rows:
        assert tuple(rows[k]) == tuple(rows2[k])


def test_decode_over_document_bytes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    binarized = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = decode_binary_column(binarized)
    assert out.count() == 50
    assert out.filter(F.col("n_bytes") <= 0).count() == 0


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x08\x06\x00\x00\x00")


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")


def _bmp(w, h):
    return b"BM" + b"\x00" * 16 + w.to_bytes(4, "little") + h.to_bytes(4, "little")


def _jpeg(w, h):
    # SOI + APP0 (len 4, empty) + SOF0 header
    return (b"\xff\xd8" + b"\xff\xe0" + (4).to_bytes(2, "big") + b"\x00\x00"
            + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03")


@pytest.mark.smoke
def test_real_header_parse(spark):
    """PNG/GIF/BMP/JPEG dimensions come from REAL byte parsing (no codec
    libs needed for container headers); non-image payloads fall back to
    the documented stub with format 'unknown'."""
    df = spark.createDataFrame(
        [
            ("png", _png(640, 480)),
            ("gif", _gif(320, 200)),
            ("bmp", _bmp(800, 600)),
            ("jpeg", _jpeg(1024, 768)),
            ("txt", b"just some text bytes"),
        ],
        "url string, payload binary",
    )
    rows = {r["url"]: r for r in decode_binary_column(df).collect()}
    assert (rows["png"]["format"], rows["png"]["width"], rows["png"]["height"]) == ("png", 640, 480)
    assert (rows["gif"]["format"], rows["gif"]["width"], rows["gif"]["height"]) == ("gif", 320, 200)
    assert (rows["bmp"]["format"], rows["bmp"]["width"], rows["bmp"]["height"]) == ("bmp", 800, 600)
    assert (rows["jpeg"]["format"], rows["jpeg"]["width"], rows["jpeg"]["height"]) == ("jpeg", 1024, 768)
    assert rows["txt"]["format"] == "unknown"


def _mk_bmp(w, h, px):
    """Build an uncompressed 24-bit BMP; px[y][x] = (r, g, b)."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for y in range(h):
        row = b"".join(bytes([b, g, r]) for (r, g, b) in px[y])
        rows += row + b"\x00" * (stride - w * 3)
    header = (
        b"BM" + struct.pack("<I", 54 + h * stride) + b"\x00" * 4
        + struct.pack("<I", 54) + struct.pack("<I", 40)
        + struct.pack("<i", w) + struct.pack("<i", h)
        + struct.pack("<H", 1) + struct.pack("<H", 24)
        + struct.pack("<I", 0) + b"\x00" * 20
    )
    return header + rows


def test_bmp_pixel_parse_golden():
    from gossiphs_spark.operators.multimodal import _parse_bmp_pixels

    px = [[(10, 20, 30), (40, 50, 60)], [(1, 2, 3), (200, 100, 255)]]
    got = _parse_bmp_pixels(_mk_bmp(2, 2, px))
    assert got == {
        "n_px": 4,
        "sum_r": 10 + 40 + 1 + 200,
        "sum_g": 20 + 50 + 2 + 100,
        "sum_b": 30 + 60 + 3 + 255,
    }
    # width 3 exercises nonzero row padding (stride 12, 3 pad bytes)
    px3 = [[(i, i, i) for i in (5, 6, 7)]]
    got3 = _parse_bmp_pixels(_mk_bmp(3, 1, px3))
    assert got3 == {"n_px": 3, "sum_r": 18, "sum_g": 18, "sum_b": 18}


def test_bmp_pixel_parse_rejects_undecodable():
    from gossiphs_spark.operators.multimodal import _parse_bmp_pixels, _pixel_stats

    good = _mk_bmp(2, 1, [[(1, 1, 1), (2, 2, 2)]])
    assert _parse_bmp_pixels(good) is not None
    # 8-bit, compressed, truncated, and non-BMP payloads all decline
    bad_bits = bytearray(good); bad_bits[28] = 8
    assert _parse_bmp_pixels(bytes(bad_bits)) is None
    bad_comp = bytearray(good); bad_comp[30] = 1
    assert _parse_bmp_pixels(bytes(bad_comp)) is None
    assert _parse_bmp_pixels(good[:-3]) is None
    assert _parse_bmp_pixels(b"\x89PNG\r\n\x1a\nxxxx") is None
    # the kernel-level wrapper degrades to an honest empty row, not a crash
    assert _pixel_stats(b"not an image")["n_px"] == 0
    assert _pixel_stats(b"")["mean_lum"] is None


def _filter_rows(img_rows, w, ch, filter_types):
    """Forward-filter one pass worth of scanlines (independent of the
    decoder's inverse)."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    prev = [0] * (w * ch)
    lines = []
    for y, raw in enumerate(img_rows):
        ft = filter_types[y]
        if ft == 0:
            filt = list(raw)
        elif ft == 1:
            filt = [(raw[j] - (raw[j - ch] if j >= ch else 0)) % 256
                    for j in range(w * ch)]
        elif ft == 2:
            filt = [(raw[j] - prev[j]) % 256 for j in range(w * ch)]
        elif ft == 3:
            filt = [(raw[j] - ((raw[j - ch] if j >= ch else 0) + prev[j]) // 2)
                    % 256 for j in range(w * ch)]
        else:
            filt = [(raw[j] - paeth(raw[j - ch] if j >= ch else 0, prev[j],
                                    prev[j - ch] if j >= ch else 0)) % 256
                    for j in range(w * ch)]
        lines.append(bytes([ft]) + bytes(filt))
        prev = list(raw)
    return lines


def _mk_png(w, h, ct, img_rows, filter_types, plte=None, interlace=0):
    """Independent forward-filter PNG construction (never shares code with
    the decoder): img_rows is h lists of w*channels raw byte values
    (palette indices for ct=3). With interlace=1 the rows are re-cut into
    the seven Adam7 sub-images, each filtered independently
    (filter_types then indexes the global scanline counter)."""
    import zlib

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    if interlace == 0:
        lines = _filter_rows(img_rows, w, ch, filter_types)
    else:
        adam7 = ((0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
                 (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1))
        lines = []
        fct = 0
        for r0, c0, rs, cs in adam7:
            if r0 >= h or c0 >= w:
                continue
            sub = []
            for y in range(r0, h, rs):
                row = []
                for x in range(c0, w, cs):
                    row.extend(img_rows[y][x * ch:(x + 1) * ch])
                sub.append(row)
            fts = [filter_types[(fct + i) % len(filter_types)]
                   for i in range(len(sub))]
            fct += len(sub)
            lines.extend(_filter_rows(sub, len(sub[0]) // ch, ch, fts))
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, ct, 0, 0, interlace]))
    plte_chunk = chunk(b"PLTE", plte) if plte is not None else b""
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + plte_chunk
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def test_png_pixel_parse_all_filters_all_colortypes():
    """The zlib-inflate + unfilter path must reconstruct exact channel
    sums for every filter type (0-4) and color type (gray/RGB/gray-alpha/
    RGBA), against an independently forward-filtered construction."""
    import random

    from gossiphs_spark.operators.multimodal import _parse_png_pixels

    rnd = random.Random(11)
    for ct in (0, 2, 4, 6):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        w, h = 7, 5
        img = [[rnd.randrange(256) for _ in range(w * ch)] for _ in range(h)]
        png = _mk_png(w, h, ct, img, [0, 1, 2, 3, 4])
        got = _parse_png_pixels(png)
        pix = [[row[x * ch:(x + 1) * ch] for x in range(w)] for row in img]
        flat = [p for row in pix for p in row]
        if ct in (0, 4):
            s = sum(p[0] for p in flat)
            want = {"n_px": w * h, "sum_r": s, "sum_g": s, "sum_b": s}
        else:
            want = {
                "n_px": w * h,
                "sum_r": sum(p[0] for p in flat),
                "sum_g": sum(p[1] for p in flat),
                "sum_b": sum(p[2] for p in flat),
            }
        assert got == want, f"colortype {ct}"


def test_png_pixel_parse_rejects_undecodable():
    from gossiphs_spark.operators.multimodal import _parse_png_pixels, _pixel_stats

    good = _mk_png(3, 2, 2, [[9] * 9, [7] * 9], [0, 1])
    assert _parse_png_pixels(good) is not None
    # corrupt CRC, truncated IDAT, 16-bit, PLTE-less palette, bogus
    # interlace mode, and palette-index-overflow all decline
    bad_crc = bytearray(good)
    bad_crc[20] ^= 0x01  # flip a bit in IHDR data → CRC mismatch
    assert _parse_png_pixels(bytes(bad_crc)) is None
    assert _parse_png_pixels(good[:-20]) is None  # cuts into IDAT
    import zlib

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    for depth, ct, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 2)):
        ihdr = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
            [depth, ct, 0, 0, interlace]
        )
        p = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 20)) + chunk(b"IEND", b""))
        assert _parse_png_pixels(p) is None, (depth, ct, interlace)
    # palette image whose indices run past the PLTE → corrupt, declined
    over = _mk_png(2, 1, 3, [[0, 5]], [0], plte=bytes(6))  # 2-entry PLTE
    assert _parse_png_pixels(over) is None
    # and the kernel wrapper routes PNG payloads to real stats now
    stats = _pixel_stats(good)
    assert stats["n_px"] == 6 and stats["sum_r"] == 9 * 3 + 7 * 3

def _png_sums(img_rows, w, h, ct):
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    flat = [row[x * ch:(x + 1) * ch] for row in img_rows for x in range(w)]
    if ct in (0, 4):
        s = sum(p[0] for p in flat)
        return {"n_px": w * h, "sum_r": s, "sum_g": s, "sum_b": s}
    return {"n_px": w * h, "sum_r": sum(p[0] for p in flat),
            "sum_g": sum(p[1] for p in flat),
            "sum_b": sum(p[2] for p in flat)}


def test_png_palette_and_interlace():
    """PLTE indirection and Adam7 pass geometry, against independent
    forward construction (r5 verdict item 4)."""
    import random

    from gossiphs_spark.operators.multimodal import _parse_png_pixels

    rnd = random.Random(23)
    # palette: 5-entry PLTE, random index image, all five filter types
    plte = bytes(rnd.randrange(256) for _ in range(15))
    w, h = 6, 5
    idx_rows = [[rnd.randrange(5) for _ in range(w)] for _ in range(h)]
    png = _mk_png(w, h, 3, idx_rows, [0, 1, 2, 3, 4], plte=plte)
    got = _parse_png_pixels(png)
    want = {"n_px": w * h}
    for c, nm in enumerate(("sum_r", "sum_g", "sum_b")):
        want[nm] = sum(plte[i * 3 + c] for row in idx_rows for i in row)
    assert got == want
    # Adam7 interlace: every color type, dims that exercise empty and
    # single-pixel passes
    for ct in (0, 2, 4, 6):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        for w, h in ((1, 1), (3, 2), (8, 8), (9, 5), (2, 10)):
            img = [[rnd.randrange(256) for _ in range(w * ch)]
                   for _ in range(h)]
            png = _mk_png(w, h, ct, img, [0, 1, 2, 3, 4], interlace=1)
            assert _parse_png_pixels(png) == _png_sums(img, w, h, ct), (ct, w, h)
    # palette + interlace composed
    idx_rows = [[rnd.randrange(5) for _ in range(9)] for _ in range(9)]
    png = _mk_png(9, 9, 3, idx_rows, [4, 3, 2, 1, 0], plte=plte, interlace=1)
    got = _parse_png_pixels(png)
    assert got["n_px"] == 81
    assert got["sum_r"] == sum(plte[i * 3] for row in idx_rows for i in row)


def test_png_wavefront_matches_scalar_path(monkeypatch):
    """Long Average/Paeth runs go through the vectorized anti-diagonal
    wavefront; forcing the same image down the tuned scalar path must
    give identical sums (r5 verdict item 2 — the unfilter rewrite cannot
    change semantics)."""
    import random

    from gossiphs_spark.operators import multimodal as mm

    rnd = random.Random(37)
    w, h = 23, 40
    for ct in (2, 6):
        ch = {2: 3, 6: 4}[ct]
        img = [[rnd.randrange(256) for _ in range(w * ch)] for _ in range(h)]
        # rows 0..3 cycle all filters, the rest alternate Average/Paeth in
        # one long run (R=36 ≥ _WAVEFRONT_MIN_RUN → wavefront)
        fts = [0, 1, 2, 3] + [3 if y % 2 else 4 for y in range(h - 4)]
        png = _mk_png(w, h, ct, img, fts)
        want = _png_sums(img, w, h, ct)
        assert mm._parse_png_pixels(png) == want, f"wavefront ct={ct}"
        monkeypatch.setattr(mm, "_WAVEFRONT_MIN_RUN", 10 ** 9)
        assert mm._parse_png_pixels(png) == want, f"scalar ct={ct}"
        monkeypatch.undo()


def test_png_scalar_budget_bounds_cpu(monkeypatch):
    """Adversarial filter-alternating images (every 3/4 run shorter than
    the wavefront threshold) draw down the per-image scalar budget and
    fall to the stub instead of stalling the task (r5 ADVICE)."""
    from gossiphs_spark.operators import multimodal as mm

    w, h = 16, 12
    img = [[(x * 7 + y) % 256 for x in range(w * 3)] for y in range(h)]
    fts = [4 if y % 2 else 2 for y in range(h)]  # runs of exactly 1
    png = _mk_png(w, h, 2, img, fts)
    assert mm._parse_png_pixels(png) == _png_sums(img, w, h, 2)
    monkeypatch.setattr(mm, "_SCALAR_PX_BUDGET", 50)  # 6 scalar rows × 16 px
    assert mm._parse_png_pixels(png) is None
    assert mm._pixel_stats(png)["n_px"] == 0  # honest stub row, no crash


def test_gif_lzw_roundtrip_properties():
    """The fixture ENCODER (queries.lzw_encode_gif) and the kernel DECODER
    (multimodal._lzw_decode) pin each other's variable-width/table-cap
    conventions: random, run-heavy, and periodic index streams round-trip
    exactly, including past the 4096-entry freeze."""
    import random

    from gossiphs_spark.operators.multimodal import _lzw_decode
    from gossiphs_spark.plans.queries import lzw_encode_gif

    rnd = random.Random(91)
    for trial in range(30):
        n = rnd.randrange(1, 4000)
        kind = trial % 3
        if kind == 0:
            data = bytes(rnd.randrange(16) for _ in range(n))
        elif kind == 1:
            data = bytes([rnd.randrange(4)] * n)
        else:
            pat = bytes(rnd.randrange(16) for _ in range(rnd.randrange(1, 9)))
            data = (pat * (n // len(pat) + 1))[:n]
        enc = lzw_encode_gif(data, 4)
        assert _lzw_decode(enc, 4, n) == data, (trial, n)
    # table-cap freeze (deferred clear) and the smallest legal code size
    big = bytes(rnd.randrange(16) for _ in range(30000))
    assert _lzw_decode(lzw_encode_gif(big, 4), 4, len(big)) == big
    small = bytes(rnd.randrange(4) for _ in range(3000))
    assert _lzw_decode(lzw_encode_gif(small, 2), 2, len(small)) == small
    # output cap: a stream that would emit more than max_out declines
    assert _lzw_decode(lzw_encode_gif(b"\x01" * 100, 4), 4, 99) is None


def test_gif_pixel_parse_golden_and_rejects():
    from gossiphs_spark.operators.multimodal import (_parse_gif_pixels,
                                                     _pixel_stats)
    from gossiphs_spark.plans.queries import make_gif_bytes

    # golden: 2x2, 4-entry global table, hand-assembled uncompressed-style
    # LZW (clear before every literal keeps the table empty and the code
    # width fixed at min_code+1 = 3 bits) — decoder verified against a
    # stream the fixture ENCODER never produced
    pal = bytes([10, 20, 30,  40, 50, 60,  70, 80, 90,  200, 210, 220])
    # codes, 3 bits LSB-first: clear=4, literals 0,3,1,2 interleaved with
    # clears, end=5  →  4,0,4,3,4,1,4,2,5
    bits = []
    for code in (4, 0, 4, 3, 4, 1, 4, 2, 5):
        bits += [(code >> k) & 1 for k in range(3)]
    data = bytes(sum(b << k for k, b in enumerate(bits[i:i + 8]))
                 for i in range(0, len(bits), 8))
    gif = (b"GIF89a" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + bytes([0xF1, 0, 0]) + pal
           + b"\x2c" + bytes(4) + (2).to_bytes(2, "little")
           + (2).to_bytes(2, "little") + b"\x00"
           + bytes([2]) + bytes([len(data)]) + data + b"\x00\x3b")
    got = _parse_gif_pixels(gif)
    assert got == {"n_px": 4, "sum_r": 10 + 200 + 40 + 70,
                   "sum_g": 20 + 210 + 50 + 80,
                   "sum_b": 30 + 220 + 60 + 90}
    # the constructor's variants: global/local table, interlace, GCE skip
    for did in (0, 1, 2, 3, 4, 5, 6):
        w, h = did % 7 + 2, did % 5 + 2
        got = _parse_gif_pixels(make_gif_bytes(did, w, h))
        want_r = sum((did * 7 + ((did + 5 * x + 3 * y) % 16) * 31) % 256
                     for x in range(w) for y in range(h))
        assert got["n_px"] == w * h and got["sum_r"] == want_r, did
    # rejects: truncated, no color table, trailer before frame, index
    # past palette, LZW bomb capped at the declared frame size
    good = make_gif_bytes(5, 4, 3)
    assert _parse_gif_pixels(good[:20]) is None
    no_tbl = (b"GIF89a" + bytes(4) + bytes([0x00, 0, 0])
              + b"\x2c" + bytes(4) + (2).to_bytes(2, "little")
              + (1).to_bytes(2, "little") + b"\x00\x02\x01\x44\x00\x3b")
    assert _parse_gif_pixels(no_tbl) is None
    assert _parse_gif_pixels(b"GIF89a" + bytes(4) + bytes([0, 0, 0]) + b"\x3b") is None
    # 2-entry palette (size bits 0) but indices up to 3 → overflow declined
    over = bytearray(make_gif_bytes(1, 3, 2))  # local table, 16 entries
    # shrink the declared local-table size: packed byte after 9-desc bytes
    # (find 0x2c; its packed byte is at +9)
    i = over.index(0x2C, 13)
    over[i + 9] = (over[i + 9] & 0xF8) | 0x00  # now 2 entries
    del over[i + 10 + 6: i + 10 + 48]  # drop palette bytes past 2 entries
    assert _parse_gif_pixels(bytes(over)) is None
    # kernel wrapper: real stats for GIF now
    st = _pixel_stats(good)
    assert st["n_px"] == 12 and st["mean_lum"] is not None


def test_gif_first_frame_of_animation():
    """Multi-frame GIFs decode the FIRST image descriptor only — the
    documented curation-stat semantics."""
    from gossiphs_spark.operators.multimodal import _parse_gif_pixels
    from gossiphs_spark.plans.queries import lzw_encode_gif

    pal = bytes([1, 2, 3, 9, 8, 7, 0, 0, 0, 0, 0, 0])
    le2 = lambda v: v.to_bytes(2, "little")  # noqa: E731

    def frame(idx_bytes, w, h):
        lzw = lzw_encode_gif(idx_bytes, 2)
        return (b"\x2c" + le2(0) + le2(0) + le2(w) + le2(h) + b"\x00"
                + bytes([2, len(lzw)]) + lzw + b"\x00")

    gif = (b"GIF89a" + le2(2) + le2(1) + bytes([0xF1, 0, 0]) + pal
           + frame(bytes([0, 1]), 2, 1) + frame(bytes([1, 1]), 2, 1)
           + b"\x3b")
    got = _parse_gif_pixels(gif)
    assert got == {"n_px": 2, "sum_r": 1 + 9, "sum_g": 2 + 8, "sum_b": 3 + 7}


def test_png_unfilter_workspace_memory_bound():
    """r6 verdict item 4: the unfilter stages in uint8/int16, not int64.
    A 2000x2000 RGBA all-Paeth pass (4 MP, 16 MB of pixel bytes) must
    reconstruct within ~80 MB traced peak: recon uint8 (16 MB) + the
    int16 wavefront workspace (~32 MB) + per-diagonal temps. The old
    int64 staging needed ~380 MB at this size (~1 GB at the 16 MP cap);
    extrapolated to 16 MP RGBA the new peak is ~192 MB — under the
    ~250 MB executor-safety target."""
    import tracemalloc

    import numpy as np

    from gossiphs_spark.operators import multimodal as mm

    h, w, bpp = 2000, 2000, 4
    arr = np.zeros((h, 1 + w * bpp), dtype=np.uint8)
    arr[:, 0] = 4  # one maximal Paeth run -> single wavefront call
    arr[:, 1:] = np.random.default_rng(5).integers(
        0, 256, (h, w * bpp), dtype=np.uint8)
    tracemalloc.start()
    rec = mm._unfilter_pass(arr, h, w, bpp, [mm._SCALAR_PX_BUDGET])
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert rec is not None and rec.dtype == np.uint8
    assert peak < 80 * 1024 * 1024, f"unfilter peak {peak/1e6:.0f} MB"
    # the workspace math must stay exact: spot-check row 0 (a=c=0 -> b)
    assert int(rec[0, 0]) == int(arr[0, 1])  # prev row is zeros


def test_gif_px_budget_bounds_cpu(monkeypatch):
    """r6 ADVICE: GIF gets its own pixel cap (LZW is a pure-Python
    per-code loop with no wavefront analog) — frames above
    _GIF_PX_BUDGET degrade to the stub instead of monopolizing a task
    slot; frames within it still decode for real."""
    from gossiphs_spark.operators import multimodal as mm
    from gossiphs_spark.plans.queries import make_gif_bytes

    good = make_gif_bytes(3, 5, 4)  # 20 px
    assert mm._parse_gif_pixels(good)["n_px"] == 20
    monkeypatch.setattr(mm, "_GIF_PX_BUDGET", 19)
    assert mm._parse_gif_pixels(good) is None
    assert mm._pixel_stats(good)["n_px"] == 0  # honest stub row, no crash
    monkeypatch.undo()
    # the budget is checked BEFORE any LZW work: a huge declared frame
    # with a tiny payload must return None without decoding
    big = bytearray(make_gif_bytes(3, 5, 4))
    i = big.index(0x2C, 13)
    big[i + 5:i + 7] = (60000).to_bytes(2, "little")
    big[i + 7:i + 9] = (60000).to_bytes(2, "little")
    assert mm._parse_gif_pixels(bytes(big)) is None


def test_lzw_adversarial_streams():
    """r6 verdict item 8: no crafted LZW stream may raise or emit more
    than max_out — deferred clear at the 4096 table boundary, truncation
    at every byte, code == next_code + 1 corruption, and seeded random
    bytes all return bytes-or-None."""
    import random

    from gossiphs_spark.operators.multimodal import _lzw_decode
    from gossiphs_spark.plans.queries import lzw_encode_gif

    rnd = random.Random(1234)
    # stream long enough to freeze the table (deferred clear), then
    # truncate at EVERY byte boundary: decode must never raise and never
    # exceed max_out
    data = bytes(rnd.randrange(16) for _ in range(20000))
    enc = lzw_encode_gif(data, 4)
    assert _lzw_decode(enc, 4, len(data)) == data
    for cut in range(0, len(enc), 97):
        out = _lzw_decode(enc[:cut], 4, len(data))
        assert out is None or (isinstance(out, bytes) and len(out) <= len(data))
    # corrupt: splice a code beyond next_code+1 (invalid per spec) by
    # flipping high bits mid-stream; every variant returns bytes-or-None
    for flip in range(10, min(len(enc), 400), 13):
        bad = bytearray(enc)
        bad[flip] ^= 0xFF
        out = _lzw_decode(bytes(bad), 4, len(data))
        assert out is None or len(out) <= len(data)
    # pure random garbage at several min_code widths
    for mc in (1, 2, 4, 8, 11):
        for trial in range(40):
            blob = bytes(rnd.randrange(256)
                         for _ in range(rnd.randrange(0, 300)))
            out = _lzw_decode(blob, mc, 4096)
            assert out is None or len(out) <= 4096
    # invalid min_code widths decline outright
    assert _lzw_decode(b"\x00\x01", 0, 10) is None
    assert _lzw_decode(b"\x00\x01", 12, 10) is None


def test_png_chunk_walk_adversarial():
    """r6 verdict item 8: the PNG chunk walk survives overlapping/
    duplicate IDAT layouts, bogus PLTE sizes, dimension lies, and random
    corruption of a valid stream — always None-or-stats, never an
    exception into the Arrow batch."""
    import random
    import zlib

    from gossiphs_spark.operators.multimodal import (_parse_png_pixels,
                                                     _pixel_stats)

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + zlib.crc32(typ + body).to_bytes(4, "big"))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = ((3).to_bytes(4, "big") + (2).to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    raw = b"\x00" + bytes(range(9)) + b"\x00" + bytes(range(9, 18))
    comp = zlib.compress(raw)
    good = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    base = _parse_png_pixels(good)
    assert base is not None and base["n_px"] == 6
    # split IDAT across chunks (legal) and duplicate whole IDATs (stream
    # then inflates past the declared size -> decline, no allocation)
    split = (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp[:5])
             + chunk(b"IDAT", comp[5:]) + chunk(b"IEND", b""))
    assert _parse_png_pixels(split) == base
    dup = (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
           + chunk(b"IDAT", comp) + chunk(b"IEND", b""))
    assert _parse_png_pixels(dup) is None
    # bogus PLTE sizes: not a multiple of 3, empty, oversized
    for plte in (b"\x01\x02", b"", b"\x00" * 771):
        bad = (sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
               + chunk(b"IDAT", comp) + chunk(b"IEND", b""))
        assert _parse_png_pixels(bad) is None
    # dimension lie: IHDR claims 100x100 but payload holds 2 scanlines
    lie = ((100).to_bytes(4, "big") + (100).to_bytes(4, "big")
           + bytes([8, 2, 0, 0, 0]))
    assert _parse_png_pixels(
        sig + chunk(b"IHDR", lie) + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")) is None
    # deflate bomb behind honest dims: inflates past expected -> None
    bomb = zlib.compress(b"\x00" * 1_000_000)
    assert _parse_png_pixels(
        sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")) is None
    # random single-byte corruption across the whole valid stream: CRC or
    # structure check declines; nothing raises
    rnd = random.Random(7)
    for _ in range(300):
        bad = bytearray(good)
        bad[rnd.randrange(len(bad))] ^= 1 << rnd.randrange(8)
        st = _pixel_stats(bytes(bad))
        assert st["n_px"] >= 0  # never raised
    # truncation at every boundary
    for cut in range(len(good)):
        assert _pixel_stats(good[:cut])["n_px"] >= 0


def test_bmp_and_header_adversarial():
    """Fuzz the remaining decoder surfaces the PNG/GIF suites don't
    cover: _parse_bmp_pixels and _parse_image_header must return
    stats-or-None on truncation at every boundary, random single-byte
    corruption, and pure garbage — never an exception into the Arrow
    batch."""
    import random

    from gossiphs_spark.operators.multimodal import (_parse_bmp_pixels,
                                                     _parse_image_header,
                                                     _pixel_stats)

    px = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (1, 2, 3)]]
    good = _mk_bmp(2, 2, px)
    base = _parse_bmp_pixels(good)
    assert base is not None and base["n_px"] == 4
    rnd = random.Random(99)
    for cut in range(len(good)):
        out = _parse_bmp_pixels(good[:cut])
        assert out is None or out["n_px"] >= 0
        _parse_image_header(good[:cut])  # must not raise
    for _ in range(300):
        bad = bytearray(good)
        bad[rnd.randrange(len(bad))] ^= 1 << rnd.randrange(8)
        st = _pixel_stats(bytes(bad))
        assert st["n_px"] >= 0
        _parse_image_header(bytes(bad))
    for _ in range(200):
        blob = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 200)))
        assert _pixel_stats(blob)["n_px"] >= 0
        _parse_image_header(blob)
    # dimension lies: huge declared dims with a tiny payload decline
    lie = bytearray(_mk_bmp(2, 2, px))
    lie[18:22] = (1 << 30).to_bytes(4, "little")
    assert _parse_bmp_pixels(bytes(lie)) is None


# ---------------------------------------------------------------------------
# JPEG — baseline sequential decoder (_parse_jpeg_pixels)
# ---------------------------------------------------------------------------


def test_jpeg_canonical_huffman_convention():
    """Pin the canonical-code convention ITSELF (T.81 C.2) with
    hand-computed codes, independent of the fixture encoder: BITS with
    one code each at lengths 1/2/3 must yield 0b0, 0b10, 0b110 — so an
    encoder/decoder PAIR sharing a wrong convention cannot slip through
    the round-trip unnoticed."""
    from gossiphs_spark.operators.multimodal import (
        _JpegBitReader, _jpeg_build_huffman)
    from gossiphs_spark.plans.queries import jpeg_canonical_codes

    bits = [1, 1, 1] + [0] * 13
    assert jpeg_canonical_codes(bits) == [(0b0, 1), (0b10, 2), (0b110, 3)]
    tab = _jpeg_build_huffman(bits, [5, 6, 7])
    # bitstream 0 | 10 | 110 | (pad 11) = 0b01011011 = 0x5B
    rd = _JpegBitReader(b"\x5b", 0, 1 << 10)
    assert [rd.huff(tab) for _ in range(3)] == [5, 6, 7]


def test_jpeg_idct_basis_matches_formula():
    """The decoder's cached basis equals the T.81 A.3.3 definition
    computed independently here (float tolerance — no rounding cliff)."""
    import math

    import numpy as np

    from gossiphs_spark.operators.multimodal import _jpeg_idct_basis

    m = _jpeg_idct_basis()
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            want = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
            assert abs(m[u, x] - want) < 1e-12
    # orthonormality: M Mᵀ = I  → the matrix-form IDCT is exact inverse
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_jpeg_zigzag_order():
    """First/last entries of the generated zigzag against the published
    sequence (T.81 Figure 5), plus permutation completeness."""
    from gossiphs_spark.operators.multimodal import _ZIGZAG

    assert _ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))


def _encode_jpeg_coeffs(w, h, blocks_zig, qtab=None):
    """Test-side GENERAL baseline encoder: arbitrary quantized
    coefficient blocks (zigzag order, one 64-list per 8x8 block,
    row-major grid) → a grayscale baseline JPEG with general AC
    run/size coding incl. ZRL and EOB. Independent of the fixture
    encoder's DC-only path — this is what exercises the decoder's AC
    loop, ZRL skips, and long-code Huffman fallback."""
    from gossiphs_spark.plans.queries import jpeg_canonical_codes

    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    # all 162 AC symbols at length 8 (Kraft 162/256; all-ones unused)
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)
    dc_codes = jpeg_canonical_codes(dc_bits)
    ac_codes = dict(zip(ac_vals, jpeg_canonical_codes(ac_bits)))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    out = bytearray(b"\xff\xd8")
    q = qtab or [1] * 64
    out += seg(0xDB, bytes([0x00]) + bytes(q))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
               + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    buf = bytearray()
    acc = nbits = 0

    def put(code, ln):
        nonlocal acc, nbits
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            buf.append(byte)
            if byte == 0xFF:
                buf.append(0x00)
        acc &= (1 << nbits) - 1

    pred = 0
    for blk in blocks_zig:
        diff = blk[0] - pred
        pred = blk[0]
        t = abs(diff).bit_length()
        put(*dc_codes[t])
        if t:
            put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and blk[k] == 0:
                run += 1
                k += 1
            if k == 64:
                put(*ac_codes[0x00])  # EOB
                break
            while run >= 16:
                put(*ac_codes[0xF0])  # ZRL
                run -= 16
            v = blk[k]
            s = abs(v).bit_length()
            put(*ac_codes[(run << 4) | s])
            put(v if v >= 0 else v + (1 << s) - 1, s)
            k += 1
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)
    return bytes(out) + bytes(buf) + b"\xff\xd9"


def _expected_gray_sums(w, h, blocks_zig, qtab=None):
    """Expected sums via the decoder's OWN basis matrix (isolating
    Huffman/zigzag/dequant/assembly from cos-value ulps, which
    test_jpeg_idct_basis_matches_formula pins separately)."""
    import numpy as np

    from gossiphs_spark.operators.multimodal import (
        _ZIGZAG, _jpeg_idct_basis)

    q = np.asarray(qtab or [1] * 64, dtype=np.int64)
    m = _jpeg_idct_basis()
    nbx = -(-w // 8)
    plane = np.zeros((-(-h // 8) * 8, nbx * 8))
    for i, blk in enumerate(blocks_zig):
        deq = np.asarray(blk, dtype=np.int64) * q
        spat = np.zeros(64)
        spat[np.asarray(_ZIGZAG)] = deq
        f = m.T @ spat.reshape(8, 8) @ m
        by, bx = divmod(i, nbx)
        plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = f
    plane = np.clip(np.floor(plane + 128.0 + 0.5), 0, 255)[:h, :w]
    s = int(plane.astype(np.int64).sum())
    return {"n_px": w * h, "sum_r": s, "sum_g": s, "sum_b": s}


def test_jpeg_general_ac_roundtrip():
    """Arbitrary AC coefficients (runs, ZRL, EOB, signed EXTEND, a
    non-trivial quant table) through the general test encoder decode to
    exactly the IDCT the test computes independently."""
    import random

    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels

    rng = random.Random(1234)
    for trial in range(25):
        w = rng.randrange(1, 25)
        h = rng.randrange(1, 21)
        nblocks = (-(-w // 8)) * (-(-h // 8))
        qtab = [rng.randrange(1, 9) for _ in range(64)]
        blocks = []
        for _ in range(nblocks):
            blk = [0] * 64
            blk[0] = rng.randrange(-200, 201)
            for _ in range(rng.randrange(0, 12)):
                blk[rng.randrange(1, 64)] = rng.randrange(-63, 64) or 1
            blocks.append(blk)
        p = _encode_jpeg_coeffs(w, h, blocks, qtab)
        assert _parse_jpeg_pixels(p) == _expected_gray_sums(w, h, blocks, qtab)


def test_jpeg_zrl_and_long_runs():
    """A block whose only AC lives past four ZRL skips, and one whose
    run ends exactly at k=63 (no EOB needed)."""
    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels

    blk1 = [0] * 64
    blk1[0] = 50
    blk1[63] = 7  # 62 zeros → 3 ZRLs + run-14
    blk2 = [0] * 64
    blk2[0] = -50
    blk2[1] = -1
    p = _encode_jpeg_coeffs(16, 8, [blk1, blk2])
    assert _parse_jpeg_pixels(p) == _expected_gray_sums(16, 8, [blk1, blk2])


def test_jpeg_fixture_variants_golden():
    """make_jpeg_bytes round-trips EXACTLY (quant=1 constant blocks) for
    all four variants, against sums computed from the pixel formulas —
    the same arithmetic the mm_jpeg_pixels oracle pins in SQL."""
    import math

    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels
    from gossiphs_spark.plans.queries import make_jpeg_bytes

    def clip(v):
        return max(0, min(255, v))

    for did in (0, 1, 2, 3, 16, 37, 58, 119, 253):
        w, h = did % 21 + 4, did % 13 + 4
        variant = did % 4
        sr = sg = sb = 0
        for y in range(h):
            for x in range(w):
                yv = (did * 3 + (x // 8) * 5 + (y // 8) * 7) % 256
                if variant == 0:
                    r = g = b = yv
                else:
                    cx, cy = {1: (x // 8, y // 8), 2: (x // 16, y // 16),
                              3: (x // 16, y // 8)}[variant]
                    cb = (did * 7 + cx * 11 + cy * 13) % 256
                    cr = (did * 5 + cx * 3 + cy * 17) % 256
                    r = clip(math.floor(yv + 1.402 * (cr - 128) + 0.5))
                    g = clip(math.floor(yv - 0.344136 * (cb - 128)
                                        - 0.714136 * (cr - 128) + 0.5))
                    b = clip(math.floor(yv + 1.772 * (cb - 128) + 0.5))
                sr += r
                sg += g
                sb += b
        assert _parse_jpeg_pixels(make_jpeg_bytes(did, w, h)) == {
            "n_px": w * h, "sum_r": sr, "sum_g": sg, "sum_b": sb}


def test_jpeg_rejects_undecodable():
    """Non-baseline and structurally corrupt streams fall to None (the
    stub), never raise: progressive SOF2, arithmetic SOF9, 16-bit quant,
    4-component, oversized dims (px budget), bad restart sequence,
    truncation at EVERY byte boundary, and random bit flips."""
    import random

    from gossiphs_spark.operators.multimodal import (
        _JPEG_PX_BUDGET, _parse_jpeg_pixels)
    from gossiphs_spark.plans.queries import make_jpeg_bytes

    # did=19 → variant 3 (4:2:2 + DRI), 23x10 → 4 MCUs → a real RST0
    good = make_jpeg_bytes(19, 19 % 21 + 4, 19 % 13 + 4)
    assert _parse_jpeg_pixels(good) is not None

    # marker-type rewrites: SOF0 → progressive / arithmetic
    i = good.find(b"\xff\xc0")
    for marker in (0xC2, 0xC9, 0xCA):
        assert _parse_jpeg_pixels(
            good[:i + 1] + bytes([marker]) + good[i + 2:]) is None
    # 16-bit quant table flag
    j = good.find(b"\xff\xdb")
    assert _parse_jpeg_pixels(
        good[:j + 4] + bytes([good[j + 4] | 0x10]) + good[j + 5:]) is None
    # dimension lie past the px budget (SOF height = 0xFFFF, width big)
    side = int(_JPEG_PX_BUDGET ** 0.5) + 80
    lied = good[:i + 5] + side.to_bytes(2, "big") + side.to_bytes(2, "big") \
        + good[i + 9:]
    assert _parse_jpeg_pixels(lied) is None
    # dimension lie within budget but larger than the entropy data: the
    # reader starves at a marker and the decode degrades to None
    lied2 = good[:i + 5] + (64).to_bytes(2, "big") + (64).to_bytes(2, "big") \
        + good[i + 9:]
    assert _parse_jpeg_pixels(lied2) is None
    # corrupt restart ordinal: first RST0 (0xFFD0) → RST5
    k = good.find(b"\xff\xd0")
    assert k > 0
    assert _parse_jpeg_pixels(
        good[:k + 1] + bytes([0xD5]) + good[k + 2:]) is None
    # truncation at every byte boundary: None or a dict, never a raise
    for ln in range(len(good)):
        r = _parse_jpeg_pixels(good[:ln])
        assert r is None or isinstance(r, dict)
    # seeded random single-bit flips anywhere in the stream
    rng = random.Random(99)
    for _ in range(300):
        pos = rng.randrange(len(good))
        flipped = bytearray(good)
        flipped[pos] ^= 1 << rng.randrange(8)
        r = _parse_jpeg_pixels(bytes(flipped))
        assert r is None or isinstance(r, dict)


def test_jpeg_scan_budget_bounds_cpu(monkeypatch):
    """A stream whose entropy segment exceeds _JPEG_SCAN_BUDGET degrades
    to None after at most budget+1 consumed bytes — the executor-stall
    bound for crafted scans."""
    import gossiphs_spark.operators.multimodal as mmod

    good = make = None
    from gossiphs_spark.plans.queries import make_jpeg_bytes as make
    good = make(1, 24, 16)
    monkeypatch.setattr(mmod, "_JPEG_SCAN_BUDGET", 4)
    assert mmod._parse_jpeg_pixels(good) is None


# ---------------------------------------------------------------------------
# WAV — PCM16 RIFF audio decoder (_parse_wav_stats)
# ---------------------------------------------------------------------------


def test_wav_golden_and_chunk_walk():
    """Hand-computable clip: mono, 4 frames [100, -5, 0, 7] → sums,
    zero crossings (sign pairs: +/-, -/+(0 counts as non-negative),
    +/+) and exact RMS; the did%3==0 fixture variant prepends an
    odd-length LIST chunk the walk must skip with its pad byte."""
    import math
    import struct

    from gossiphs_spark.operators.multimodal import _parse_wav_stats
    from gossiphs_spark.plans.queries import make_wav_bytes

    samp = struct.pack("<4h", 100, -5, 0, 7)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(samp)).to_bytes(4, "little")
           + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
           + b"data" + len(samp).to_bytes(4, "little") + samp)
    got = _parse_wav_stats(wav)
    assert got == {
        "n_frames": 4, "n_channels": 1, "sample_rate": 8000,
        "sum_abs": 112, "sum_sq": 10074, "zero_cross": 2,
        "rms": math.sqrt(10074 / 4),
    }
    # fixture variant with the skippable odd LIST chunk (did=3 → %3==0)
    p = make_wav_bytes(3, 25, 2, 12000)
    st = _parse_wav_stats(p)
    assert st is not None and st["n_frames"] == 25 and st["n_channels"] == 2
    # interleave check: stereo [L0 R0 L1 R1] with a sign flip only on R
    samp2 = struct.pack("<4h", 10, -1, 20, 1)
    fmt2 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav2 = (b"RIFF" + (4 + 8 + len(fmt2) + 8 + len(samp2)).to_bytes(4, "little")
            + b"WAVE" + b"fmt " + len(fmt2).to_bytes(4, "little") + fmt2
            + b"data" + len(samp2).to_bytes(4, "little") + samp2)
    st2 = _parse_wav_stats(wav2)
    assert st2["n_frames"] == 2 and st2["zero_cross"] == 1  # R channel only


def test_wav_rejects_undecodable(monkeypatch):
    """Float/ADPCM formats, other bit depths, truncation at every byte,
    bit flips, and over-budget clips all return None-or-dict, never
    raise."""
    import random

    import gossiphs_spark.operators.multimodal as mmod
    from gossiphs_spark.plans.queries import make_wav_bytes

    good = make_wav_bytes(7, 40, 2, 16000)
    assert mmod._parse_wav_stats(good) is not None
    fmt_at = good.find(b"fmt ")
    # audio format 3 (IEEE float) and 8-bit depth → None (codec seam)
    fl = bytearray(good)
    fl[fmt_at + 8] = 3
    assert mmod._parse_wav_stats(bytes(fl)) is None
    bd = bytearray(good)
    bd[fmt_at + 8 + 14] = 8
    assert mmod._parse_wav_stats(bytes(bd)) is None
    # truncation at every byte boundary
    for ln in range(len(good)):
        r = mmod._parse_wav_stats(good[:ln])
        assert r is None or isinstance(r, dict)
    # seeded bit flips
    rng = random.Random(5)
    for _ in range(200):
        f = bytearray(good)
        f[rng.randrange(len(f))] ^= 1 << rng.randrange(8)
        r = mmod._parse_wav_stats(bytes(f))
        assert r is None or isinstance(r, dict)
    # sample budget: a tiny cap rejects the clip before any numpy work
    monkeypatch.setattr(mmod, "_WAV_SAMPLE_BUDGET", 10)
    assert mmod._parse_wav_stats(good) is None


def test_wav_fixture_matches_formula():
    """make_wav_bytes round-trips exactly against sums computed from the
    sample formula — the same arithmetic the mm_wav_stats oracle pins."""
    from gossiphs_spark.operators.multimodal import _parse_wav_stats
    from gossiphs_spark.plans.queries import make_wav_bytes

    for did in (0, 1, 2, 3, 11, 58, 123):
        f, ch = did % 300 + 20, did % 2 + 1
        st = _parse_wav_stats(make_wav_bytes(did, f, ch, 8000))
        sa = sq = zc = 0
        for c in range(ch):
            prev = None
            for i in range(f):
                s = ((did * 7 + i * 13 + c * 5) % 4096) - 2048
                sa += abs(s)
                sq += s * s
                if prev is not None and (prev < 0) != (s < 0):
                    zc += 1
                prev = s
        assert (st["sum_abs"], st["sum_sq"], st["zero_cross"]) == (sa, sq, zc)
        assert st["n_frames"] == f and st["n_channels"] == ch


# ---------------------------------------------------------------------------
# AVI — RIFF video container metadata (_parse_avi_meta)
# ---------------------------------------------------------------------------


def test_avi_meta_golden_and_rejects():
    """Fixture round-trip against the header formulas, non-AVI RIFF
    rejection (a WAV must not parse as video), truncation at every byte,
    and seeded bit flips — None-or-dict, never a raise."""
    import random

    from gossiphs_spark.operators.multimodal import _parse_avi_meta
    from gossiphs_spark.plans.queries import make_avi_bytes, make_wav_bytes

    for did in (0, 1, 4, 9, 57, 444):
        st = _parse_avi_meta(make_avi_bytes(did))
        assert st is not None
        assert st["n_frames"] == did % 1000 + 10
        assert (st["width"], st["height"]) == (did % 640 + 16, did % 480 + 16)
        assert st["us_per_frame"] == 33333 + (did % 5) * 8333
        assert (st["n_streams"], st["n_video"], st["n_audio"]) == (
            1 + did % 2, 1, did % 2)
        assert st["fps"] == 1000000.0 / st["us_per_frame"]
    assert _parse_avi_meta(make_wav_bytes(5, 30, 1, 8000)) is None
    good = make_avi_bytes(3)
    for ln in range(len(good)):
        r = _parse_avi_meta(good[:ln])
        assert r is None or isinstance(r, dict)
    rng = random.Random(17)
    for _ in range(300):
        f = bytearray(good)
        f[rng.randrange(len(f))] ^= 1 << rng.randrange(8)
        r = _parse_avi_meta(bytes(f))
        assert r is None or isinstance(r, dict)
    # depth bomb: LISTs nested past the cap are rejected, not recursed
    bomb = b"AVI "
    for _ in range(10):
        bomb = b"LIST" + (len(bomb) + 4).to_bytes(4, "little") + b"hdrl" + bomb
    bomb = b"RIFF" + len(bomb).to_bytes(4, "little") + bomb
    assert _parse_avi_meta(bomb) is None


# ---------------------------------------------------------------------------
# aHash — REAL perceptual average-hash over decoded BMP planes
# ---------------------------------------------------------------------------


def test_ahash_plane_orientation_and_bits():
    """An asymmetric image pins the BMP bottom-up flip: the hash must be
    computed in IMAGE orientation, so flipping the image vertically MUST
    change the hash (and a hand-built 8x8 black/white half image must
    yield exactly the bright half's bits)."""
    import numpy as np

    from gossiphs_spark.operators.multimodal import (
        _parse_bmp_plane, ahash64)
    from gossiphs_spark.plans.queries import make_bmp_bytes

    plane = _parse_bmp_plane(make_bmp_bytes(5, 9, 7))
    assert plane is not None and plane.shape == (7, 9, 3)
    # image orientation: pixel (x=0, y=0) must be the FORMULA's (0,0)
    assert tuple(plane[0, 0]) == ((5 * 5) % 256, (5 * 3) % 256, 5 % 256)
    flipped = plane[::-1]
    assert ahash64(plane) != ahash64(flipped)
    # top half black, bottom half white → bits 32..63 set exactly
    half = np.zeros((8, 8, 3), dtype=np.uint8)
    half[4:] = 255
    hi, lo = ahash64(half)
    assert (hi, lo) == (0xFFFFFFFF, 0)


def test_ahash_groups_identical_content():
    """Same content key → same hash regardless of which doc carries it;
    different keys almost always differ (the fixture's 64 groups map to
    tens of distinct hashes — pinned exactly by the dd_image_phash
    oracle; here just sanity)."""
    from gossiphs_spark.operators.multimodal import (
        _parse_bmp_plane, ahash64)
    from gossiphs_spark.plans.queries import make_bmp_bytes

    h1 = ahash64(_parse_bmp_plane(make_bmp_bytes(7, 10, 5)))
    h2 = ahash64(_parse_bmp_plane(make_bmp_bytes(7, 10, 5)))
    h3 = ahash64(_parse_bmp_plane(make_bmp_bytes(8, 11, 5)))
    assert h1 == h2
    assert h1 != h3
    # halves fit signed-64 columns
    for v in (*h1, *h3):
        assert 0 <= v <= 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) — successive approximation, EOBRUN, refinement
# ---------------------------------------------------------------------------


def _encode_prog_gray(w, h, blocks_zig, scans):
    """Test-side GENERAL progressive encoder (grayscale): arbitrary
    quantized coefficients (zigzag order) emitted over caller-chosen
    (Ss, Se, Ah, Al) scans. Implements the standard bit order the
    decoder must consume: DC first diff-codes value >> Al (arithmetic),
    DC refine emits the Al bit raw; AC first run/size-codes
    sign·(|v| >> Al) with per-block EOB0; AC refine emits new-coefficient
    symbols with buffered correction bits for nonzero-history positions
    (libjpeg encode_mcu_AC_refine order), ZRL when 16 zero-history
    positions accumulate, and EOB0 + trailing correction bits."""
    from gossiphs_spark.plans.queries import (
        _JpegBitWriter, jpeg_canonical_codes)

    dc_bits = [0, 0, 0, 12] + [0] * 12
    ac_vals = [r << 4 for r in range(16)] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)
    dc_codes = jpeg_canonical_codes(dc_bits)
    ac_codes = dict(zip(ac_vals, jpeg_canonical_codes(ac_bits)))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + b"\x01" * 64)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
               + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    for ss, se, ah, al in scans:
        bw = _JpegBitWriter()
        if ss == 0:
            pred = 0
            for blk in blocks_zig:
                dc = blk[0]
                if ah == 0:
                    val = dc >> al
                    diff = val - pred
                    pred = val
                    t = abs(diff).bit_length()
                    code, ln = dc_codes[t]
                    bw.put(code, ln)
                    if t:
                        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
                else:
                    bw.put((dc >> al) & 1, 1)
        elif ah == 0:  # AC first: run/size over sign·(|v| >> Al), EOB0
            for blk in blocks_zig:
                run = 0
                for k in range(ss, se + 1):
                    v = blk[k]
                    aval = abs(v) >> al
                    if aval == 0:
                        run += 1
                        continue
                    while run >= 16:
                        bw.put(*ac_codes[0xF0])
                        run -= 16
                    s = aval.bit_length()
                    bw.put(*ac_codes[(run << 4) | s])
                    sv = aval if v >= 0 else -aval
                    bw.put(sv if sv >= 0 else sv + (1 << s) - 1, s)
                    run = 0
                if run:
                    bw.put(*ac_codes[0x00])  # EOB0
        else:  # AC refinement: corrections buffered, EOB0 tail
            p_bit = al  # the bit this pass transmits
            for blk in blocks_zig:
                run = 0
                pend = []
                for k in range(ss, se + 1):
                    v = blk[k]
                    hist = abs(v) >> (al + 1)
                    aval = abs(v) >> al
                    if hist != 0:  # nonzero history → correction bit
                        pend.append(aval & 1)
                    elif aval == 1:  # newly significant at this precision
                        while run >= 16:
                            bw.put(*ac_codes[0xF0])
                            for b in pend:
                                bw.put(b, 1)
                            pend = []
                            run -= 16
                        bw.put(*ac_codes[(run << 4) | 1])
                        bw.put(1 if v >= 0 else 0, 1)
                        for b in pend:
                            bw.put(b, 1)
                        pend = []
                        run = 0
                    else:
                        run += 1
                        while run >= 16:
                            bw.put(*ac_codes[0xF0])
                            for b in pend:
                                bw.put(b, 1)
                            pend = []
                            run -= 16
                # EOB0 only if the decoder still has symbols to read:
                # uncovered zero-history tail (run) or pending correction
                # bits. A band fully covered by emitted symbols (e.g.
                # trailing ZRLs consuming the exact remainder) must NOT
                # get one — the decoder's band walk has already ended.
                if run or pend:
                    bw.put(*ac_codes[0x00])  # EOB0 covers this block
                    for b in pend:
                        bw.put(b, 1)
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        out += seg(0xDA, body) + bw.flush()
    return bytes(out) + b"\xff\xd9"


def test_jpeg_progressive_fixture_matches_sequential():
    """The progressive fixture decodes to EXACTLY the same stats as the
    sequential fixture for the same did — the two encoders share only
    the pixel formulas, so agreement pins the whole multi-scan path."""
    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels
    from gossiphs_spark.plans.queries import (
        make_jpeg_bytes, make_jpeg_progressive_bytes)

    for did in (0, 1, 2, 3, 17, 38, 59, 120, 251):
        w, h = did % 21 + 4, did % 13 + 4
        seq = _parse_jpeg_pixels(make_jpeg_bytes(did, w, h))
        prog = _parse_jpeg_pixels(make_jpeg_progressive_bytes(did, w, h))
        assert seq is not None and seq == prog


def test_jpeg_progressive_general_ac_roundtrip():
    """Arbitrary AC coefficients through successive approximation —
    first pass at Al=1, refinement to Al=0, spectral band split at
    k=5 — decode to exactly the full-precision IDCT. This drives the
    refinement correction-bit machinery (nonzero history, new
    coefficients mid-run, ZRL-in-refine) the DC-only fixture cannot."""
    import random

    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels

    rng = random.Random(4321)
    for trial in range(25):
        w = rng.randrange(1, 25)
        h = rng.randrange(1, 21)
        nblocks = (-(-w // 8)) * (-(-h // 8))
        blocks = []
        for _ in range(nblocks):
            blk = [0] * 64
            blk[0] = rng.randrange(-400, 401)
            for _ in range(rng.randrange(0, 14)):
                blk[rng.randrange(1, 64)] = rng.randrange(-80, 81) or 3
            blocks.append(blk)
        scans = [
            (0, 0, 0, 1),   # DC first, Al=1
            (1, 5, 0, 1),   # AC low band first
            (6, 63, 0, 1),  # AC high band first
            (0, 0, 1, 0),   # DC refine
            (1, 5, 1, 0),   # AC low band refine
            (6, 63, 1, 0),  # AC high band refine
        ]
        p = _encode_prog_gray(w, h, blocks, scans)
        assert _parse_jpeg_pixels(p) == _expected_gray_sums(w, h, blocks), \
            f"trial {trial} w={w} h={h}"


def test_jpeg_progressive_zrl_refine_and_sparse():
    """Deterministic hard cases: a refinement ZRL (17+ zero-history gap
    before a new coefficient), corrections interleaved across the gap,
    and a block whose band is pure corrections (no new coefficients)."""
    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels

    blk1 = [0] * 64
    blk1[0] = 100
    blk1[2] = 6    # nonzero history through both passes
    blk1[40] = 1   # appears only at full precision, 37 zeros before it
    blk2 = [0] * 64
    blk2[0] = -300
    blk2[1] = -7   # history + correction bit 1
    blk2[3] = -2   # history, correction bit 0
    p = _encode_prog_gray(16, 8, [blk1, blk2],
                          [(0, 0, 0, 1), (1, 63, 0, 1),
                           (0, 0, 1, 0), (1, 63, 1, 0)])
    assert _parse_jpeg_pixels(p) == _expected_gray_sums(16, 8, [blk1, blk2])


def test_jpeg_progressive_rejects_and_fuzz():
    """Progressive streams with invalid scan shapes fall to None, and
    truncation/bit flips never raise."""
    import random

    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels
    from gossiphs_spark.plans.queries import make_jpeg_progressive_bytes

    good = make_jpeg_progressive_bytes(37, 37 % 21 + 4, 37 % 13 + 4)
    assert _parse_jpeg_pixels(good) is not None
    for ln in range(len(good)):
        r = _parse_jpeg_pixels(good[:ln])
        assert r is None or isinstance(r, dict)
    rng = random.Random(31)
    for _ in range(400):
        f = bytearray(good)
        f[rng.randrange(len(f))] ^= 1 << rng.randrange(8)
        r = _parse_jpeg_pixels(bytes(f))
        assert r is None or isinstance(r, dict)


def test_jpeg_progressive_scan_budget_is_cumulative(monkeypatch):
    """The entropy-byte budget is shared across ALL progressive scans —
    a many-scan stream cannot multiply the per-image CPU bound. With the
    budget set just below the fixture's total scan bytes, decode must
    degrade to None even though each individual scan fits."""
    import gossiphs_spark.operators.multimodal as mmod
    from gossiphs_spark.plans.queries import make_jpeg_progressive_bytes

    good = make_jpeg_progressive_bytes(2, 24, 16)  # 4:2:0, several scans
    assert mmod._parse_jpeg_pixels(good) is not None
    monkeypatch.setattr(mmod, "_JPEG_SCAN_BUDGET", 8)
    assert mmod._parse_jpeg_pixels(good) is None


def test_downsample_plane_exact_box_mean():
    """Hand-computable 4x2 image downsampled by 2 → two output pixels,
    each the floor of its 2x2 block mean; non-multiple dims crop; a
    factor larger than the image returns None."""
    import numpy as np

    from gossiphs_spark.operators.multimodal import downsample_plane

    plane = np.array([
        [[0, 0, 0], [10, 10, 10], [100, 0, 0], [101, 0, 0]],
        [[1, 2, 3], [9, 8, 7], [103, 0, 0], [107, 0, 0]],
    ], dtype=np.uint8)
    small = downsample_plane(plane, 2)
    assert small.shape == (1, 2, 3)
    assert small[0, 0].tolist() == [5, 5, 5]       # (0+10+1+9)//4 exact
    assert small[0, 1].tolist() == [102, 0, 0]     # 411 // 4 floors
    # crop: 5x3 by 2 → 2x1 output, column 2 and row 4 dropped
    p2 = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    s2 = downsample_plane(p2, 2)
    assert s2.shape == (2, 1, 3)
    assert downsample_plane(p2, 7) is None


def test_downsample_plane_factor_zero_and_negative():
    """factor <= 0 returns None (r8 ADVICE: the // f ran before the
    guard, so factor=0 raised ZeroDivisionError inside the Spark task)."""
    import numpy as np

    from gossiphs_spark.operators.multimodal import downsample_plane

    plane = np.zeros((4, 4, 3), dtype=np.uint8)
    assert downsample_plane(plane, 0) is None
    assert downsample_plane(plane, -3) is None


def test_jpeg_progressive_eobn_run_fast_path():
    """AC-refinement EOBn runs spanning many blocks (r8 ADVICE shape):
    the decoder's zero-history fast path must skip the band walk WITHOUT
    changing results — both for all-zero bands (no correction bits) and
    for runs whose blocks carry nonzero history (correction bits still
    consumed, in k order). The test encoder only emits per-block EOB0,
    so the EOBn refinement scan is crafted by hand here."""
    from gossiphs_spark.operators.multimodal import _parse_jpeg_pixels
    from gossiphs_spark.plans.queries import (
        _JpegBitWriter, jpeg_canonical_codes)

    # same canonical AC table the test encoder builds
    ac_vals = [r << 4 for r in range(16)] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)
    ac_codes = dict(zip(ac_vals, jpeg_canonical_codes(ac_bits)))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    def crafted(blocks, w, h):
        # base scans: DC first at Al=1, AC first at Al=1, DC refine —
        # leaves the AC refinement (1,63,1,0) to the hand-built EOBn scan
        base = _encode_prog_gray(
            w, h, blocks, [(0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0)]
        )[:-2]
        nb = len(blocks)
        r = nb.bit_length() - 1
        assert (1 << r) == nb, "test wants a power-of-two block count"
        bw = _JpegBitWriter()
        bw.put(*ac_codes[(r << 4) | 0])      # EOBn symbol
        if r:
            bw.put(0, r)                     # eobrun = 1 << r exactly
        for blk in blocks:                   # correction bits, k order
            for k in range(1, 64):
                if abs(blk[k]) >> 1 != 0:    # nonzero history at Al=1
                    bw.put(abs(blk[k]) & 1, 1)
        body = bytes([1, 1, 0x00, 1, 63, (1 << 4) | 0])
        return base + seg(0xDA, body) + bw.flush() + b"\xff\xd9"

    # case 1: 64 blocks, all-zero AC — every block takes the vectorized
    # no-history skip inside one EOBn run
    w, h = 64, 64
    blocks = [[200 - 3 * i] + [0] * 63 for i in range(64)]
    assert _parse_jpeg_pixels(crafted(blocks, w, h)) == \
        _expected_gray_sums(w, h, blocks)

    # case 2: half the blocks carry nonzero history (even and odd
    # refinement bits) — the run must still read their correction bits
    blocks2 = []
    for i in range(64):
        blk = [100 - i] + [0] * 63
        if i % 2 == 0:
            blk[5] = 6   # history 3, correction bit 0
            blk[17] = 7  # history 3, correction bit 1
        blocks2.append(blk)
    assert _parse_jpeg_pixels(crafted(blocks2, w, h)) == \
        _expected_gray_sums(w, h, blocks2)
