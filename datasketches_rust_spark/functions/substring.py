"""Substring matching: winnowed rolling-hash fingerprints + suffix-array
longest-common-substring verification.

The north rule's third signature family next to MinHash and SimHash:
detect document pairs sharing a run of raw text of length >= t.

* **Fingerprinting (scale path)** — all char k-grams are hashed
  (murmur3 x64-128 h1>>1, the engine hash convention, seed 9001) and
  *winnowed* (Schleimer/Wilkerson/Aiken, SIGMOD'03 — public
  algorithm): keep the minimum hash in every window of w consecutive
  k-gram hashes (rightmost minimum on ties). Guarantee: any substring
  shared by two documents of length >= k + w − 1 yields at least one
  shared fingerprint; no fingerprint matches for shared runs shorter
  than k. Fingerprints explode to (doc, fp) rows and reuse the LSH
  bucket machinery (operators/lsh.py) — the shuffle topology is
  identical to MinHash banding.
* **Verification (exact path)** — candidate pairs get their true
  longest common substring from a suffix array over
  ``s1 + SEP + s2`` with Kasai LCP (textbook construction): scan
  adjacent LCP entries whose suffixes come from different documents,
  take the max. O((n+m) log(n+m)) per pair via numpy argsort of
  suffix ranks (prefix-doubling).
"""

from __future__ import annotations

import numpy as np

from ..hashes import DEFAULT_UPDATE_SEED, murmur3_x64_128_arr

_U64 = np.uint64


def kgram_hashes(text: bytes, k: int, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Hashes of every k-byte window of `text` (uint64, h1 >> 1)."""
    data = np.frombuffer(text, dtype=np.uint8)
    n = len(data) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    starts = np.arange(n, dtype=np.int64)
    lengths = np.full(n, k, dtype=np.int64)
    h1, _ = murmur3_x64_128_arr(data, starts, lengths, seed)
    return h1 >> _U64(1)


def winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection: the minimum of every window of
    w consecutive hashes (rightmost on ties), deduplicated.

    Guarantees: a shared substring of length >= k + w − 1 shares a
    fingerprint (Schleimer et al. §2).
    """
    n = len(hashes)
    if n == 0:
        return hashes
    if n <= w:
        return np.unique(hashes.min(keepdims=True))
    # sliding window minimum via stride trick (w is small, <= 64)
    sw = np.lib.stride_tricks.sliding_window_view(hashes, w)
    mins = sw.min(axis=1)
    return np.unique(mins)


def document_fingerprints(
    text: str | None, k: int = 16, w: int = 8, seed: int = DEFAULT_UPDATE_SEED
) -> np.ndarray:
    """Winnowed fingerprints of a document (uint64)."""
    if not text:
        return np.zeros(0, dtype=np.uint64)
    return winnow(kgram_hashes(text.encode("utf-8"), k, seed), w)


# ---------------------------------------------------------------------------
# suffix array + LCP (verification path)
# ---------------------------------------------------------------------------


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (O(n log² n), numpy argsort)."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = data.astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        # recompute ranks
        tmp[sa[0]] = 0
        prev = sa[0]
        r = 0
        k1 = rank[sa]
        k2 = key2[sa]
        neq = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        tmp[sa[1:]] = np.cumsum(neq)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
        del prev, r
    return sa


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm: lcp[i] = LCP(suffix sa[i], suffix sa[i-1])."""
    n = len(data)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and data[i + h] == data[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Exact LCS length via suffix array over a + SEP + b."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if not ab or not bb:
        return 0
    # separator byte 0xFF cannot appear inside UTF-8 text
    data = np.frombuffer(ab + b"\xff" + bb, dtype=np.uint8).astype(np.int64)
    boundary = len(ab)
    sa = suffix_array(data)
    lcp = lcp_array(data, sa)
    from_a = sa < boundary
    best = 0
    for i in range(1, len(sa)):
        if from_a[i] != from_a[i - 1]:
            # cap at distance to the separator for the a-side suffix
            cand = int(lcp[i])
            sa_a = int(sa[i] if from_a[i] else sa[i - 1])
            cand = min(cand, boundary - sa_a)
            best = max(best, cand)
    return best
