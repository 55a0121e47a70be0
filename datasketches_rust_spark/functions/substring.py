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
* **Verification (exact path)** — binary search on the answer length
  with vectorized double-modulus rolling hashes: LCS >= L iff the two
  documents share an L-gram, checked by sorted-intersecting the two
  window-hash arrays (O((n+m) log) per probe, ~log(min(n,m)) probes,
  all NumPy — replaces a per-pair pure-Python Kasai loop that was the
  single slowest stage of the whole bench at 26.5 s/sf0.1). The final
  claimed match is confirmed byte-for-byte; on any hash anomaly
  (probability ~(n+m)²/2^60 per probe) the pair falls back to the
  textbook suffix-array + Kasai path, which is kept as the exactness
  oracle (tests cross-check the two).
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


def document_fingerprints_batch(
    texts: list[str | None], k: int = 16, w: int = 8, seed: int = DEFAULT_UPDATE_SEED
) -> list[np.ndarray]:
    """Winnowed fingerprints for a whole Arrow batch in ONE murmur
    kernel call: all documents' k-gram windows are hashed together
    (the kernel's fixed setup cost amortizes over the batch — per-doc
    calls spent more time in NumPy dispatch than hashing for typical
    ~300-char docs), then winnowing runs per-document over segments."""
    enc = [t.encode("utf-8") if t else b"" for t in texts]
    lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    n_windows = np.maximum(lens - k + 1, 0)
    total = int(n_windows.sum())
    if total == 0:
        return [np.zeros(0, dtype=np.uint64) for _ in enc]
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    doc_offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # starts = concat_i (doc_offsets[i] + arange(n_windows[i]))
    seg_ends = np.cumsum(n_windows)
    seg_starts = seg_ends - n_windows
    idx = np.arange(total, dtype=np.int64)
    owner = np.searchsorted(seg_ends, idx, side="right")
    starts = doc_offsets[owner] + (idx - seg_starts[owner])
    h1, _ = murmur3_x64_128_arr(buf, starts, np.full(total, k, dtype=np.int64), seed)
    hashes = h1 >> _U64(1)
    return [
        winnow(hashes[int(seg_starts[i]) : int(seg_ends[i])], w) for i in range(len(enc))
    ]


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


def _lcs_suffix_array(a: str, b: str) -> int:
    """Exact LCS length via suffix array over a + SEP + b — the slow
    textbook oracle, kept for the hash-anomaly fallback and tests."""
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


# -- fast verification: binary search + double-modulus rolling hash ----------

_M1 = (1 << 31) - 1  # Mersenne prime 2^31-1
_M2 = (1 << 29) - 3  # prime
_B1, _B2 = 1000003, 131
_INV_B1 = pow(_B1, -1, _M1)
_INV_B2 = pow(_B2, -1, _M2)


def _mod_powers(base: int, n: int, mod: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod `mod`, by length-doubling (log n
    NumPy steps; products < mod² < 2^62 stay inside uint64)."""
    p = np.ones(1, dtype=np.uint64)
    while len(p) < n:
        p = np.concatenate([p, (p * (p[-1] * np.uint64(base) % np.uint64(mod))) % np.uint64(mod)])
    return p[:n]


class _PrefixHash:
    """Positional prefix hashes G[i] = Σ_{j<i} data[j]·B^j (two mods),
    built once per document; window hashes of any length L come out
    vectorized as (G[l+L] − G[l])·B^−l."""

    __slots__ = ("n", "g1", "g2", "ip1", "ip2")

    def __init__(self, data: np.ndarray) -> None:
        n = len(data)
        self.n = n
        for which, (base, mod, inv) in enumerate(
            ((_B1, _M1, _INV_B1), (_B2, _M2, _INV_B2))
        ):
            pw = _mod_powers(base, n + 1, mod)
            terms = (data.astype(np.uint64) * pw[:n]) % np.uint64(mod)
            g = np.zeros(n + 1, dtype=np.uint64)
            # chunked cumsum keeps partial sums < 2^62 for any doc size
            # (terms < 2^31, chunk 2^20 → chunk sums < 2^51)
            chunk = 1 << 20
            carry = np.uint64(0)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                cs = (np.cumsum(terms[s:e]) + carry) % np.uint64(mod)
                g[s + 1 : e + 1] = cs
                carry = cs[-1]
            ip = _mod_powers(inv, n + 1, mod)
            if which == 0:
                self.g1, self.ip1 = g, ip
            else:
                self.g2, self.ip2 = g, ip

    def window_hashes(self, length: int) -> np.ndarray:
        """Combined (h1 << 32 | h2) hash of every `length`-window."""
        n = self.n
        m = n - length + 1
        idx = np.arange(m)
        mod1, mod2 = np.uint64(_M1), np.uint64(_M2)
        # add mod before subtracting: uint64 wraparound then % mod is
        # NOT modular subtraction (2^64 mod M != 0)
        h1 = ((self.g1[idx + length] + mod1 - self.g1[idx]) % mod1) * self.ip1[idx] % mod1
        h2 = ((self.g2[idx + length] + mod2 - self.g2[idx]) % mod2) * self.ip2[idx] % mod2
        return (h1 << np.uint64(32)) | h2


class _LcsBatchContext:
    """Shared state for verifying a whole Arrow batch of candidate
    pairs (round 3, VERDICT r2 #7): prefix hashes are built ONCE per
    unique document (documents recur across pairs after the
    candidate-pair join), and the sorted window-hash array for each
    (document, probe length) is computed once and shared by every pair
    that probes that length — the 'shared hash tables per length
    round'. Replaces the per-pair loop that rebuilt everything."""

    __slots__ = ("ph", "wh")

    def __init__(self) -> None:
        self.ph: dict = {}  # text -> _PrefixHash
        self.wh: dict = {}  # (id(ph), length) -> (sorted hashes, positions)

    def prefix(self, text: str) -> "_PrefixHash":
        p = self.ph.get(text)
        if p is None:
            p = self.ph[text] = _PrefixHash(
                np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            )
        return p

    def sorted_windows(self, p: "_PrefixHash", length: int):
        key = (id(p), length)
        entry = self.wh.get(key)
        if entry is None:
            h = p.window_hashes(length)
            order = np.argsort(h, kind="stable")
            entry = self.wh[key] = (h[order], order)
        return entry

    def common_window(self, pa, pb, length: int):
        """(found, (pos_a, pos_b)) — does a shared length-gram exist?
        Sorted-array searchsorted probe over the cached tables (no
        per-call re-sort, unlike np.intersect1d)."""
        sa, oa = self.sorted_windows(pa, length)
        sb, ob = self.sorted_windows(pb, length)
        if len(sa) == 0 or len(sb) == 0:
            return False, None
        if len(sb) < len(sa):  # probe the smaller into the larger
            sa, oa, sb, ob, swapped = sb, ob, sa, oa, True
        else:
            swapped = False
        idx = np.searchsorted(sb, sa)
        idx_c = np.minimum(idx, len(sb) - 1)
        hit = sb[idx_c] == sa
        if not hit.any():
            return False, None
        i0 = int(np.flatnonzero(hit)[0])
        pa_pos, pb_pos = int(oa[i0]), int(ob[idx_c[i0]])
        return True, ((pb_pos, pa_pos) if swapped else (pa_pos, pb_pos))


def lcs_at_least_batch(
    texts_a: list, texts_b: list, min_len: int
) -> np.ndarray:
    """Exact LCS length for each pair IF >= min_len, else 0 — the
    thresholded contract of the substring-match operator (pairs below
    min_len are filtered out downstream, so their exact value is never
    observable). One threshold probe eliminates hash-coincidence false
    candidates in a single shared-table round; survivors gallop up
    (LCS is typically near min_len) then binary-search, reusing every
    (document, length) table across the batch. Final matches are
    byte-verified with suffix-array fallback, like the per-pair path."""
    ctx = _LcsBatchContext()
    out = np.zeros(len(texts_a), dtype=np.int64)
    for i, (a, b) in enumerate(zip(texts_a, texts_b)):
        a = a or ""
        b = b or ""
        if not a or not b:
            continue
        pa, pb = ctx.prefix(a), ctx.prefix(b)
        hi = min(pa.n, pb.n)
        if hi < min_len or min_len < 1:
            continue
        ok, pos = ctx.common_window(pa, pb, min_len)
        if not ok:
            continue
        lo, best_pos = min_len, pos
        # gallop: double until a probe fails or we hit the ceiling
        cur = min_len
        while cur < hi:
            nxt = min(cur * 2, hi)
            ok, pos = ctx.common_window(pa, pb, nxt)
            if ok:
                lo, best_pos, cur = nxt, pos, nxt
            else:
                hi = nxt - 1
                break
        # binary search in (lo, hi]
        while lo < hi:
            mid = (lo + hi + 1) // 2
            ok, pos = ctx.common_window(pa, pb, mid)
            if ok:
                lo, best_pos = mid, pos
            else:
                hi = mid - 1
        ia, ib = best_pos
        ab = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
        bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
        if np.array_equal(ab[ia : ia + lo], bb[ib : ib + lo]):
            out[i] = lo
        else:
            # hash collision steered the search — exact oracle
            exact = _lcs_suffix_array(a, b)
            out[i] = exact if exact >= min_len else 0
    return out


def longest_common_substring_len(a: str, b: str) -> int:
    """Exact LCS length: binary search on L over shared-L-gram
    existence (sorted hash intersect), final match byte-verified;
    falls back to the suffix-array oracle on hash anomalies."""
    ab = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(ab) == 0 or len(bb) == 0:
        return 0
    pa, pb = _PrefixHash(ab), _PrefixHash(bb)
    lo, hi = 0, min(len(ab), len(bb))  # invariant: LCS >= lo (hash-wise)
    best_pos: tuple[int, int] | None = None
    while lo < hi:
        mid = (lo + hi + 1) // 2
        wa = pa.window_hashes(mid)
        wb = pb.window_hashes(mid)
        common, ia, ib = np.intersect1d(wa, wb, return_indices=True)
        if len(common):
            lo = mid
            best_pos = (int(ia[0]), int(ib[0]))
        else:
            hi = mid - 1
    if lo == 0:
        return 0
    i, j = best_pos
    if np.array_equal(ab[i : i + lo], bb[j : j + lo]):
        return lo
    # hash collision steered the search — fall back to the exact oracle
    return _lcs_suffix_array(a, b)
