"""Micro-bench of the PNG unfilter kernel (r5 verdict item 2).

Measures _parse_png_pixels throughput (px/s) on large synthetic RGB
images per filter regime:

* fast    — all rows filter 0/2 (whole-row vectorized)
* sub     — all rows filter 1 (per-lane cumsum)
* paeth   — all rows filter 4, one long run → anti-diagonal wavefront
* average — all rows filter 3, one long run → anti-diagonal wavefront
* mixed   — r5 code's worst case: rows alternate 2,4,2,4 → every Paeth
            row is a run of 1 → tuned scalar loop (budget-capped)

Prints one JSON line; paste into BENCH/NOTES_r{N}.md.
Usage: python scripts/png_kernel_bench.py [w] [h]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_png(w: int, h: int, fts) -> bytes:
    import zlib

    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(h, w * 3), dtype=np.int64)

    def paeth_vec(a, b, c):
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a,
                        np.where(pb <= pc, b, c))

    lines = []
    prev = np.zeros(w * 3, dtype=np.int64)
    for y in range(h):
        raw = img[y]
        ft = fts[y % len(fts)]
        left = np.concatenate([np.zeros(3, dtype=np.int64), raw[:-3]])
        ul = np.concatenate([np.zeros(3, dtype=np.int64), prev[:-3]])
        if ft == 0:
            filt = raw
        elif ft == 1:
            filt = (raw - left) % 256
        elif ft == 2:
            filt = (raw - prev) % 256
        elif ft == 3:
            filt = (raw - (left + prev) // 2) % 256
        else:
            filt = (raw - paeth_vec(left, prev, ul)) % 256
        lines.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
        prev = raw

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines), 1))
            + chunk(b"IEND", b""))


def main() -> None:
    from gossiphs_spark.operators.multimodal import _parse_png_pixels

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    cases = {
        "fast_0_2": [0, 2], "sub_1": [1], "paeth_4": [4],
        "average_3": [3], "mixed_2_4_scalar": [2, 4],
    }
    out = {"w": w, "h": h, "px": w * h, "px_per_sec": {}}
    for name, fts in cases.items():
        png = build_png(w, h, fts)
        t0 = time.perf_counter()
        res = _parse_png_pixels(png)
        dt = time.perf_counter() - t0
        decoded = res is not None
        out["px_per_sec"][name] = round(w * h / dt) if decoded else None
        out.setdefault("sec", {})[name] = round(dt, 3)
        out.setdefault("decoded", {})[name] = decoded
    print(json.dumps(out))


if __name__ == "__main__":
    main()
