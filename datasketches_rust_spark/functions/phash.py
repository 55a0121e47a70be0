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


def downscale_batch(grays: list, n: int) -> np.ndarray:
    """Batched :func:`downscale` over same-shape groups — one
    reshape-mean per distinct shape instead of one per image
    (bit-identical per element, equivalence pytest-gated). Returns
    (len(grays), n*n) float64 flattened features in input order."""
    out = np.empty((len(grays), n * n), dtype=np.float64)
    by_shape: dict = {}
    for i, g in enumerate(grays):
        by_shape.setdefault(g.shape, []).append(i)
    for (h, w), idxs in by_shape.items():
        stack = np.stack([grays[i] for i in idxs])
        b = len(idxs)
        if h % n == 0 and w % n == 0:
            small = stack.reshape(b, n, h // n, n, w // n).mean(axis=(2, 4))
        else:
            yi = (np.arange(n) * h // n).clip(0, h - 1)
            xi = (np.arange(n) * w // n).clip(0, w - 1)
            small = stack[:, yi[:, None], xi[None, :]]
        out[idxs] = small.reshape(b, -1)
    return out


def phash64_i64_batch_from_grays(grays: list) -> np.ndarray:
    """Batched phash64_i64_from_gray: same-size luma planes are
    stacked so the downscale mean, median threshold, and bit packing
    run once per batch instead of once per image (the per-image
    ufunc/median dispatch was ~30% of the signature stage). The DCT
    GEMM stays a per-image (32,32)@(32,32) matmul — a broadcast
    batched GEMM may route to a different BLAS kernel whose summation
    order could flip a bit at a median tie; the per-image GEMM keeps
    the output provably bit-equal to the scalar path (equivalence
    pytest-gated). Returns int64 array aligned with the input order.
    """
    out = np.zeros(len(grays), dtype=np.int64)
    if not len(grays):
        return out
    d = _dct_matrix()
    by_shape: dict = {}
    for i, g in enumerate(grays):
        by_shape.setdefault(g.shape, []).append(i)
    for (h, w), idxs in by_shape.items():
        stack = np.stack([grays[i] for i in idxs])
        b = len(idxs)
        if h % _N == 0 and w % _N == 0:
            small = stack.reshape(b, _N, h // _N, _N, w // _N).mean(axis=(2, 4))
        else:
            yi = (np.arange(_N) * h // _N).clip(0, h - 1)
            xi = (np.arange(_N) * w // _N).clip(0, w - 1)
            small = stack[:, yi[:, None], xi[None, :]]
        coefs = np.empty((b, 64), dtype=np.float64)
        for j in range(b):
            coefs[j] = (d @ small[j] @ d.T)[:8, :8].reshape(-1)
        med = np.median(coefs[:, 1:], axis=1)
        bits = coefs > med[:, None]
        bits[:, 0] = False
        packed = (bits.astype(np.uint64) * _BIT_WEIGHTS[None, :]).sum(axis=1)
        out[idxs] = packed.view(np.int64)
    return out
