"""SimHash kernels — 64-bit similarity-preserving bit vectors.

Two variants, per the north rule:

* ``simhash_tokens``: token-frequency-weighted SimHash over text
  (captions). Each distinct token's murmur3 h1 (seed 9001, theta
  convention `hash_table.rs:123-128`) votes its count on each of the
  64 bit positions; bit = sign of the vote sum. Hamming distance then
  approximates angular distance between the token-count vectors.
* ``simhash_pixels``: random-hyperplane SimHash over an 8x8
  grayscale downscale (64-dim feature); hyperplanes drawn from a PRNG
  seeded by the config seed — deterministic across runs/partitions.

The bit-vector union/intersection machinery mirrors the reference
bloom bit ops (`datasketches/src/bloom/sketch.rs:174-253`) in spirit:
fixed-width word-wise operations, vectorized with NumPy.
"""

from __future__ import annotations

import numpy as np

from ..config import SimHashConfig
from ..hashes import pack_bytes, theta_hash_bytes

_U64 = np.uint64
_BITS = np.arange(64, dtype=np.uint64)


def simhash_tokens(texts: list[str], cfg: SimHashConfig) -> np.ndarray:
    """(n,) uint64 token SimHash. Empty/null texts hash to 0.

    The per-token ±1 vote matrix is materialized in bounded chunks of
    documents (~64k tokens per chunk) instead of one (T, 64) block:
    the peak working set stays ~32 MB regardless of batch size, which
    keeps the hot loop in cache and — on lazily-faulted VMs — avoids
    paying first-touch cost for hundreds of MB of fresh pages
    (measured 28 s cold → <2 s for a 270k-token batch)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    token_lists = [t.lower().split() if t else [] for t in texts]
    counts = np.fromiter((len(t) for t in token_lists), np.int64, n)
    all_tokens = [tok.encode("utf-8") for toks in token_lists for tok in toks]
    if not all_tokens:
        return out
    buf, starts, lengths = pack_bytes(all_tokens)
    th = theta_hash_bytes(buf, starts, lengths, cfg.seed)
    row_splits = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=row_splits[1:])

    chunk_tokens = 1 << 16
    doc_start = 0
    while doc_start < n:
        doc_end = doc_start
        while (
            doc_end < n
            and (row_splits[doc_end + 1] - row_splits[doc_start] <= chunk_tokens or doc_end == doc_start)
        ):
            doc_end += 1
        t0, t1 = int(row_splits[doc_start]), int(row_splits[doc_end])
        sub = slice(doc_start, doc_end)
        sub_counts = counts[sub]
        nonempty = sub_counts > 0
        if t1 > t0 and nonempty.any():
            bits = ((th[t0:t1, None] >> _BITS) & _U64(1)).astype(np.int32)
            votes = bits * 2 - 1  # (chunk_T, 64), ±1
            offsets = (row_splits[doc_start:doc_end][nonempty] - t0).astype(np.int64)
            sums = np.add.reduceat(votes, offsets, axis=0)
            sig_bits = (sums > 0).astype(np.uint64)
            chunk_out = np.zeros(doc_end - doc_start, dtype=np.uint64)
            chunk_out[nonempty] = (sig_bits << _BITS).sum(axis=1, dtype=np.uint64)
            out[sub] = chunk_out
        doc_start = doc_end
    return out


def simhash_vectors(vecs: np.ndarray, cfg: SimHashConfig) -> np.ndarray:
    """(n,) uint64 random-hyperplane SimHash of float vectors (n, d).

    Vectors are mean-centered per row first. Without centering, any
    all-positive feature family (pixel intensities) shares a dominant
    DC component, projections correlate through it, and unrelated rows
    land within small Hamming distance — measured 162k spurious
    candidate pairs among 25k synthetic images (6.5 pairs/image) vs
    near-zero after centering. Centering also makes the signature
    brightness-invariant, which is what perceptual near-dup wants.
    """
    planes = cfg.hyperplanes(vecs.shape[1])  # (64, d)
    centered = vecs - vecs.mean(axis=1, keepdims=True)
    proj = centered @ planes.T  # (n, 64)
    bits = (proj > 0).astype(np.uint64)
    return (bits << _BITS).sum(axis=1, dtype=np.uint64)


def simhash_vectors_multi(
    vecs: np.ndarray, seed: int, n_reps: int, center: bool = True
) -> np.ndarray:
    """(n, n_reps) uint64 — ``n_reps`` independent random-hyperplane
    SimHashes per row, all drawn from ONE PRNG stream seeded by
    ``seed + 1`` (deterministic across partitionings / cluster sizes).

    Multiple repetitions are the amplification knob for cosine-LSH at
    moderate thresholds: a pair with bitwise agreement probability
    p = 1 − θ/π survives banding with prob 1 − (1 − p^w)^(reps·64/w),
    so reps × band width trade selectivity against recall without
    touching the per-hash kernel.
    """
    rng = np.random.default_rng(seed + 1)
    planes = rng.standard_normal((n_reps * 64, vecs.shape[1]))
    if center:
        vecs = vecs - vecs.mean(axis=1, keepdims=True)
    proj = vecs @ planes.T  # (n, n_reps*64)
    bits = (proj > 0).astype(np.uint64).reshape(len(vecs), n_reps, 64)
    return (bits << _BITS).sum(axis=2, dtype=np.uint64)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rowwise popcount(a ^ b) — vectorized 64-bit Hamming distance."""
    x = (a ^ b).view(np.uint64)
    return np.bitwise_count(x).astype(np.int64) if hasattr(np, "bitwise_count") else _popcount64(x)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


def hamming_chunks(h: np.ndarray, cfg: SimHashConfig) -> np.ndarray:
    """(n, num_chunks) int64 chunk keys for Hamming-LSH banding.

    Splitting 64 bits into ``c`` chunks guarantees any pair within
    Hamming distance ``c - 1`` shares at least one identical chunk
    (pigeonhole) — the SimHash analog of MinHash banding.
    """
    c = cfg.num_chunks
    width = 64 // c
    mask = _U64((1 << width) - 1)
    out = np.empty((len(h), c), dtype=np.int64)
    hu = h.view(np.uint64) if h.dtype != np.uint64 else h
    for j in range(c):
        out[:, j] = ((hu >> _U64(j * width)) & mask).astype(np.int64)
    return out
