"""Perceptual hash (pHash) — DCT-based 64-bit image fingerprint.

Deterministic NumPy implementation (no image libs in the container):

1. grayscale: ITU-R BT.601 luma (0.299 R + 0.587 G + 0.114 B);
2. downscale to 32x32 by exact area averaging when dimensions divide
   (our synthetic dims {32, 64, 128} always do), else by
   nearest-neighbor index sampling;
3. 2-D DCT-II (orthonormal) via precomputed basis matrix multiply;
4. take the low-frequency top-left 8x8 block; bit i = coefficient >
   median of the 63 non-DC coefficients; the DC bit is forced 0.

The 64-bit output plays the role of the reference's fixed-width
bit-vector signatures (SimHash analog; bloom-style word ops,
`datasketches/src/bloom/sketch.rs:174-253`): Hamming distance ≈
perceptual distance; chunk banding (functions/simhash.py) generates
candidates with guaranteed recall for Hamming <= num_chunks − 1.
"""

from __future__ import annotations

import numpy as np

_N = 32
_DCT = None


def _dct_matrix(n: int = _N) -> np.ndarray:
    global _DCT
    if _DCT is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0] /= np.sqrt(2.0)
        _DCT = m
    return _DCT


_LUMA = np.array([0.299, 0.587, 0.114])


def to_gray(img: np.ndarray) -> np.ndarray:
    # one BLAS matvec over the channel axis — ~1.5× the three-term
    # multiply-add (same coefficients; summation order differs by
    # ≤1e-13 per pixel, and every phash/simhash consumer shares this
    # single path so signatures stay internally consistent)
    return img.astype(np.float64) @ _LUMA


def downscale(gray: np.ndarray, n: int = _N) -> np.ndarray:
    h, w = gray.shape
    if h % n == 0 and w % n == 0:
        return gray.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    yi = (np.arange(n) * h // n).clip(0, h - 1)
    xi = (np.arange(n) * w // n).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def phash64_from_gray(gray: np.ndarray) -> int:
    """Grayscale float (h, w) → 64-bit perceptual hash.

    Split out of :func:`phash64` so pipelines that already computed the
    luma plane (signature stage: gray feeds BOTH the 8×8 SimHash
    feature and the phash) don't pay the RGB→luma conversion twice —
    to_gray is ~half of the per-image phash cost. Numerics are
    identical to phash64 (same downscale → DCT → median path), so the
    output is bit-equal.
    """
    small = downscale(gray)
    d = _dct_matrix()
    coefs = (d @ small @ d.T)[:8, :8].reshape(-1)
    med = np.median(coefs[1:])
    bits = coefs > med
    bits[0] = False
    return int(_BIT_WEIGHTS[bits].sum())


def phash64(img: np.ndarray) -> int:
    """RGB uint8 (h, w, 3) → 64-bit perceptual hash (as signed-safe int)."""
    return phash64_from_gray(to_gray(img))


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def phash64_i64(img: np.ndarray) -> int:
    """phash64 viewed as int64 (Spark LongType-safe)."""
    return _to_i64(phash64(img))


def phash64_i64_from_gray(gray: np.ndarray) -> int:
    """phash64_from_gray viewed as int64 (Spark LongType-safe)."""
    return _to_i64(phash64_from_gray(gray))
