"""Image payload codecs, pHash and PSNR — pure numpy (SURVEY.md §2.10).

The sandbox has no PIL/cv2/imageio, so codecs are numpy-only:

* ``raw`` — ``w*h*3`` uint8, C order.
* ``ppm`` — binary P6 (header + raw), the classic netpbm format.
* ``png`` — RGB8, zlib-deflated scanlines; encoder can emit any single
  filter type 0-4 (None/Sub/Up/Average/Paeth — all vectorized, since the
  encoder predicts from ORIGINAL pixels), decoder un-filters all five:
  None/Up are whole-row numpy ops, Sub is a per-channel ``cumsum % 256``
  (the spec's left-dependency is exactly a prefix sum), Average and Paeth
  reconstruct from the already-reconstructed left pixel so they are
  inherently sequential in x — those two use a bounded numpy loop over
  scanline columns (3-channel vector per step), documented cost, and only
  run for foreign PNGs that actually chose those filters.

These run inside Arrow-batched pandas UDFs / ``mapInArrow`` on the engine
side (see ``operators/payload.py``); per-image work is numpy on decoded
buffers, never per-pixel Python.

pHash is the public 64-bit DCT perceptual hash: resize to 32x32 grayscale
(area mean), 2-D DCT-II, take the top-left 8x8 low-frequency block minus DC,
threshold at the median.  JPEG-style lossy formats are format-pluggable via
``DECODERS`` but untestable in this container (no codec libs) — the fidelity
gate for lossy is PSNR >= 40 dB (BASELINE.json:15), exact ``allclose`` for
lossless.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------


def encode_raw(pix: np.ndarray) -> bytes:
    return np.ascontiguousarray(pix, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    return b"P6\n%d %d\n255\n" % (w, h) + encode_raw(pix)


def decode_ppm(data: bytes, w: int = 0, h: int = 0) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM")
    # header: magic, width, height, maxval — whitespace separated, then one
    # whitespace byte before the raster
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment line
            i = data.index(b"\n", i) + 1
            continue
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        fields.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    pw, ph, maxv = (int(f) for f in fields)
    if maxv != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(data, dtype=np.uint8, count=pw * ph * 3, offset=i).reshape(
        ph, pw, 3
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Spec Paeth predictor, elementwise over int arrays (returns int32)."""
    a = a.astype(np.int32)
    b = b.astype(np.int32)
    c = c.astype(np.int32)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pix: np.ndarray, filter_type: int = 0) -> bytes:
    """RGB8 PNG with one filter type for every scanline (0-4).

    All encoder filters are whole-image vectorized: predictions use the
    ORIGINAL pixel values (unlike decode, which must use reconstructed
    ones), so Sub/Up/Average/Paeth are shifted-array arithmetic mod 256."""
    h, w, _ = pix.shape
    bpp = 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    rows = pix.reshape(h, w * bpp).astype(np.int32)
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]  # raw(x - bpp), 0 left of first pixel
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]  # prev scanline, 0 above first row
    upleft = np.zeros_like(rows)
    upleft[1:, bpp:] = rows[:-1, :-bpp]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:  # Sub
        filt = rows - left
    elif filter_type == 2:  # Up
        filt = rows - up
    elif filter_type == 3:  # Average
        filt = rows - (left + up) // 2
    elif filter_type == 4:  # Paeth
        filt = rows - _paeth_predict(left, up, upleft)
    else:
        raise ValueError(f"unknown PNG filter {filter_type}")
    raster = np.zeros((h, 1 + w * bpp), dtype=np.uint8)
    raster[:, 0] = filter_type
    raster[:, 1:] = (filt & 0xFF).astype(np.uint8)
    idat = zlib.compress(raster.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int = 0, h: int = 0) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    i = len(_PNG_SIG)
    idat = b""
    pw = ph = 0
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if typ == b"IHDR":
            pw, ph, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
        i += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + pw * 3
    rows = raw.reshape(ph, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].astype(np.int32).copy()
    bpp = 3
    n = pw * bpp
    zero_row = np.zeros(n, dtype=np.int32)
    for r in range(ph):
        f = filters[r]
        prev = out[r - 1] if r > 0 else zero_row  # already reconstructed
        if f == 0:  # None
            pass
        elif f == 1:  # Sub: recon(x) = raw(x) + recon(x-bpp) — a prefix
            # sum per channel; mod-256 commutes with addition, so one
            # vectorized cumsum then & 0xFF reconstructs the whole row
            out[r] = np.cumsum(
                out[r].reshape(pw, bpp).astype(np.int64), axis=0
            ).reshape(n) & 0xFF
        elif f == 2:  # Up: add reconstructed row above (whole-row vector op)
            out[r] = (out[r] + prev) & 0xFF
        elif f == 3:  # Average: recon(x) = raw(x) + (recon(x-bpp)+prev(x))//2
            # — depends on the reconstructed LEFT pixel, sequential in x by
            # spec; bounded loop over pw columns, 3-channel vector per step
            row = out[r].reshape(pw, bpp)
            pv = prev.reshape(pw, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(pw):
                left = (row[x] + (left + pv[x]) // 2) & 0xFF
                row[x] = left
        elif f == 4:  # Paeth: predictor of reconstructed left/up/upleft —
            # sequential in x by spec; same bounded column loop
            row = out[r].reshape(pw, bpp)
            pv = prev.reshape(pw, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(pw):
                left = (row[x] + _paeth_predict(left, pv[x], upleft)) & 0xFF
                row[x] = left
                upleft = pv[x]
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(ph, pw, 3)


DECODERS = {"raw": decode_raw, "ppm": decode_ppm, "png": decode_png}
ENCODERS = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png}
#: formats whose round-trip is bit-exact (allclose); others gate on PSNR>=40
LOSSLESS_FMTS = frozenset(DECODERS)


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    return DECODERS[fmt](data, w, h)


# ---------------------------------------------------------------------------
# pHash / PSNR
# ---------------------------------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def _resize_area(gray: np.ndarray, n: int = 32) -> np.ndarray:
    """Area-style resample to n×n via index-mapped block means."""
    h, w = gray.shape
    ys = (np.arange(n + 1) * h // n).astype(np.int64)
    xs = (np.arange(n + 1) * w // n).astype(np.int64)
    # integral image for O(1) block sums
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    y0, y1 = ys[:-1][:, None], ys[1:][:, None]
    x0, x1 = xs[:-1][None, :], xs[1:][None, :]
    # guard degenerate bins when h or w < n
    y1 = np.maximum(y1, y0 + 1)
    x1 = np.maximum(x1, x0 + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    y0 = np.minimum(y0, y1 - 1)
    x0 = np.minimum(x0, x1 - 1)
    s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    return s / ((y1 - y0) * (x1 - x0))


def phash64(pix: np.ndarray) -> int:
    """Public 64-bit DCT pHash of an RGB8 image (signed int64 for Spark)."""
    gray = pix.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_area(gray, 32)
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].flatten()
    med = np.median(block[1:])  # skip DC term
    bits = (block > med).astype(np.uint64)
    bits[0] = d[0, 0] > np.mean(block[1:])  # DC bit vs mean
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
