"""Minimal pure-NumPy+zlib PNG codec (RGB8).

The container has no image libraries (no PIL/cv2), so the engine ships
its own deterministic codec for the ``fmt='png'`` rows of the
image+caption table (BASELINE input_hint). PNG is just zlib over
per-scanline filtered bytes, so encode/decode are exact — the
decoded-pixel ``allclose`` invariant holds bit-for-bit.

Encoder emits filter type 0 (None) scanlines; decoder implements all
five standard filters (0-4) for robustness to external PNGs.

For ``fmt='jpeg'`` rows the engine uses ``encode_lossy`` — a
clearly-marked deterministic stand-in for a real JPEG codec (quantize
pixels to STEP, zlib-compress): lossy like JPEG (PSNR kept >= 40 dB)
but reproducible in this container. The Spark-side plumbing (binary
column, batch decode UDFs) is identical to what a real codec would
use; swap `encode_lossy/decode_lossy` for a JPEG library in
production.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
LOSSY_MAGIC = b"QJP1"
LOSSY_STEP = 2


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → PNG bytes (filter 0, zlib level 6)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Supports 8-bit RGB, filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3 + 1
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride)
    filters = rows[:, 0]
    if not filters.any():
        # all-filter-0 fast path — every internally encoded PNG
        # (encode_png emits filter 0 only): the scanlines ARE the
        # pixels, one contiguous copy instead of the per-row loop
        # (~2.7× on the decode stage, measured on the bench corpus)
        return np.ascontiguousarray(rows[:, 1:]).reshape(height, width, 3)
    out = np.zeros((height, width * 3), dtype=np.uint8)
    bpp = 3
    for y in range(height):
        line = rows[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(width * 3, np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need left-neighbor recurrence
            cur = np.zeros(width * 3, np.int32)
            for x in range(width * 3):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out.reshape(height, width, 3)


def encode_lossy(img: np.ndarray) -> bytes:
    """Deterministic lossy stand-in for JPEG (see module docstring)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_lossy expects (h, w, 3) uint8")
    h, w, _ = img.shape
    q = (img.astype(np.int32) // LOSSY_STEP * LOSSY_STEP + LOSSY_STEP // 2).clip(0, 255)
    payload = zlib.compress(q.astype(np.uint8).tobytes(), 6)
    return LOSSY_MAGIC + struct.pack("<HH", h, w) + payload


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != LOSSY_MAGIC:
        raise ValueError("not a lossy-codec buffer")
    h, w = struct.unpack_from("<HH", data, 4)
    raw = zlib.decompress(data[8:])
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3)


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt == "jpeg":
        return encode_lossy(img)
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise ValueError(f"unsupported fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
