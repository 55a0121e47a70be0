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


def to_gray(img: np.ndarray) -> np.ndarray:
    return (
        0.299 * img[..., 0].astype(np.float64)
        + 0.587 * img[..., 1].astype(np.float64)
        + 0.114 * img[..., 2].astype(np.float64)
    )


def downscale(gray: np.ndarray, n: int = _N) -> np.ndarray:
    h, w = gray.shape
    if h % n == 0 and w % n == 0:
        return gray.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    yi = (np.arange(n) * h // n).clip(0, h - 1)
    xi = (np.arange(n) * w // n).clip(0, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(img: np.ndarray) -> int:
    """RGB uint8 (h, w, 3) → 64-bit perceptual hash (as signed-safe int)."""
    small = downscale(to_gray(img))
    d = _dct_matrix()
    coefs = (d @ small @ d.T)[:8, :8].reshape(-1)
    med = np.median(coefs[1:])
    bits = coefs > med
    bits[0] = False
    out = 0
    for i in range(64):
        if bits[i]:
            out |= 1 << i
    return out


def phash64_i64(img: np.ndarray) -> int:
    """phash64 viewed as int64 (Spark LongType-safe)."""
    v = phash64(img)
    return v - (1 << 64) if v >= (1 << 63) else v
