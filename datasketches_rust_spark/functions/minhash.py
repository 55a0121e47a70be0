"""MinHash signature kernel — vectorized, deterministic, mergeable.

The reference has no MinHash type; its theta/KMV core
(`datasketches/src/theta/hash_table.rs:168-284`) is the bottom-k
signature primitive this module generalizes to fixed-slot MinHash
(num_perm independent minima) so LSH banding has aligned slots.

Reference config (the determinism contract every run shares —
`datasketches/src/hash/mod.rs:37` seed 9001):

* tokenization: NFC-free lowercase + whitespace split;
* token hash: murmur3 x64-128 (seed) → ``h1 >> 1`` (theta convention,
  `hash_table.rs:123-128`);
* word k-shingle hash: murmur3 x64-128 over the k token hashes packed
  as little-endian u64s (fixed k*8-byte input → fully vectorizable;
  texts with fewer than k tokens contribute one shingle over all
  tokens). This matches the reference's integer-key hashing convention
  (`hash/mod.rs:63-67`: integers hash as LE bytes);
* permutation i: ``a_i * x + b_i (mod 2^64)`` with odd ``a_i`` from a
  PRNG seeded by the config seed — a bijection on u64, so each slot is
  a valid min-wise hash; slot j of the signature is the minimum over
  shingles.

Merge semantics: elementwise ``min`` of signatures — commutative,
associative, idempotent (the Spark partial/final aggregation contract,
mirroring theta union; SURVEY.md §A.2). Signatures of empty texts are
all-ones (u64 max) — the identity of the merge.
"""

from __future__ import annotations

import numpy as np

from ..config import MinHashConfig
from ..hashes import murmur3_x64_128_arr, pack_bytes, theta_hash_bytes

_U64 = np.uint64
EMPTY_SLOT = np.uint64(0xFFFFFFFFFFFFFFFF)


def tokenize(text: str) -> list[str]:
    return text.lower().split()


def shingle_hashes(texts: list[str], cfg: MinHashConfig) -> tuple[np.ndarray, np.ndarray]:
    """Per-text word-k-shingle hashes.

    Returns ``(flat_hashes, row_splits)`` where row i's shingle hashes
    are ``flat[row_splits[i]:row_splits[i+1]]`` (uint64, theta
    convention).
    """
    k = cfg.shingle_k
    token_lists = [tokenize(t) if t is not None else [] for t in texts]
    counts = np.fromiter((len(t) for t in token_lists), np.int64, len(token_lists))
    all_tokens = [tok.encode("utf-8") for toks in token_lists for tok in toks]
    buf, starts, lengths = pack_bytes(all_tokens)
    tok_h = theta_hash_bytes(buf, starts, lengths, cfg.seed)

    # shingle counts: max(tokens - k + 1, 1) for non-empty rows, 0 for empty
    n_sh = np.where(counts == 0, 0, np.maximum(counts - (k - 1), 1))
    row_splits = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(n_sh, out=row_splits[1:])

    tok_starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_starts[1:])

    # full k-shingles (rows with >= k tokens): fixed-width k*8-byte keys
    full_rows = counts >= k
    short_rows = (counts > 0) & (counts < k)

    out = np.zeros(int(row_splits[-1]), dtype=np.uint64)

    if full_rows.any():
        # global start index of each shingle window in tok_h
        starts_per_row = tok_starts[:-1][full_rows]
        wins_per_row = (counts - (k - 1))[full_rows]
        base = np.repeat(starts_per_row, wins_per_row)
        offset = _ranges(wins_per_row)
        win_start = base + offset  # (n_windows,)
        win_idx = win_start[:, None] + np.arange(k)
        keys = tok_h[win_idx].astype("<u8")  # (n_windows, k)
        flat = keys.reshape(-1).view(np.uint8).reshape(len(win_start), k * 8)
        kbuf = flat.reshape(-1)
        kstarts = np.arange(len(win_start), dtype=np.int64) * (k * 8)
        klens = np.full(len(win_start), k * 8, dtype=np.int64)
        h1, _ = murmur3_x64_128_arr(kbuf, kstarts, klens, cfg.seed)
        # scatter into out at the right row positions
        dest_base = np.repeat(row_splits[:-1][full_rows], wins_per_row)
        out[dest_base + offset] = h1 >> _U64(1)

    if short_rows.any():
        idxs = np.nonzero(short_rows)[0]
        keys = [
            tok_h[tok_starts[i] : tok_starts[i + 1]].astype("<u8").tobytes() for i in idxs
        ]
        kbuf, kstarts, klens = pack_bytes(keys)
        h1, _ = murmur3_x64_128_arr(kbuf, kstarts, klens, cfg.seed)
        out[row_splits[:-1][idxs]] = h1 >> _U64(1)

    return out, row_splits


def _ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized arange per row)."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    out[ends[:-1]] = -(lengths[:-1] - 1)
    return np.cumsum(out)


def minhash_signatures(texts: list[str], cfg: MinHashConfig) -> np.ndarray:
    """(n_texts, num_perm) uint64 signature matrix."""
    flat, row_splits = shingle_hashes(texts, cfg)
    return signatures_from_shingles(flat, row_splits, cfg)


_PV_BUF: np.ndarray | None = None


def _pv_buffer(n: int) -> np.ndarray:
    """Reused permuted-values scratch buffer (module-level: Spark
    Python workers are long-lived single-threaded processes, so the
    pages stay faulted-in across Arrow batches — a fresh ~32 MB
    allocation per batch spent ~10× the multiply itself in first-touch
    page faults, measured 0.44 s vs 0.035 s on a 128×72k block)."""
    global _PV_BUF
    if _PV_BUF is None or _PV_BUF.size < n:
        _PV_BUF = np.empty(n, dtype=np.uint64)
    return _PV_BUF


def signatures_from_shingles(
    flat: np.ndarray, row_splits: np.ndarray, cfg: MinHashConfig
) -> np.ndarray:
    a, b = cfg.permutations()
    n = len(row_splits) - 1
    sig = np.full((n, cfg.num_perm), EMPTY_SLOT, dtype=np.uint64)
    if len(flat) == 0:
        return sig
    nonempty = np.diff(row_splits) > 0
    starts = row_splits[:-1][nonempty]
    rows_idx = np.nonzero(nonempty)[0]
    # (chunk, n_shingles) permuted values; mod 2^64 wraparound
    # intended. Perm-major layout so the segmented min runs over
    # CONTIGUOUS memory (reduceat along axis=1) — the shingle-major
    # variant strides by num_perm per element and measured 4-60x
    # slower. Chunked to ~32 MB, written into the reused scratch
    # buffer (_pv_buffer) so the pages are faulted in once per worker.
    chunk = max(1, (1 << 22) // max(len(flat), 1))
    cols = np.arange(cfg.num_perm)
    for p0 in range(0, cfg.num_perm, chunk):
        p1 = min(p0 + chunk, cfg.num_perm)
        w = p1 - p0
        buf = _pv_buffer(w * len(flat))[: w * len(flat)].reshape(w, len(flat))
        pv = np.multiply(a[p0:p1, None], flat[None, :], out=buf)
        pv += b[p0:p1, None]
        # reduceat segments are [starts[i], starts[i+1]): strictly
        # increasing because empty rows are excluded
        sig[rows_idx[:, None], cols[None, p0:p1]] = np.minimum.reduceat(
            pv, starts, axis=1
        ).T
    return sig


def merge_signatures(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise min — the mergeable-sketch union for MinHash."""
    return np.minimum(a, b)


def band_hashes(sig: np.ndarray, cfg: MinHashConfig) -> np.ndarray:
    """(n, bands) uint64 band bucket keys.

    Band j's key = murmur3 h1 (seed) over the r slot values packed as
    LE u64s. Rows with empty signatures get EMPTY_SLOT keys (callers
    must filter those out before banding — empty texts never pair).
    """
    n, p = sig.shape
    r = cfg.rows_per_band
    bands = cfg.bands
    out = np.empty((n, bands), dtype=np.uint64)
    if n == 0:
        return out
    for j in range(bands):
        chunk = sig[:, j * r : (j + 1) * r].astype("<u8")
        flat = chunk.reshape(-1).view(np.uint8)
        starts = np.arange(n, dtype=np.int64) * (r * 8)
        lens = np.full(n, r * 8, dtype=np.int64)
        h1, _ = murmur3_x64_128_arr(flat, starts, lens, cfg.seed + j)
        out[:, j] = h1
    empty = (sig == EMPTY_SLOT).all(axis=1)
    out[empty] = EMPTY_SLOT
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Rowwise MinHash Jaccard estimate: fraction of matching slots.

    The fixed-slot analog of the theta intersection estimate
    (`datasketches/src/theta/intersection.rs:152-154` ordered
    early-exit intersect → |A∩B| / |A∪B|).
    """
    return (sig_a == sig_b).mean(axis=1)
