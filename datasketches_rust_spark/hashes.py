"""Deterministic hash kernels: MurmurHash3 x64-128 and XxHash64.

Bit-compatible with the reference implementations
(`datasketches/src/hash/murmurhash.rs:28-167`,
`datasketches/src/hash/xxhash.rs:32-168`), verified against the golden
vectors in those files' test modules (`murmurhash.rs:189-231`,
`xxhash.rs:200-236`).

Two layers:

* scalar pure-Python implementations (``murmur3_x64_128``, ``xxhash64``)
  used by tests and driver-side config (e.g. seed-hash computation,
  `hash/mod.rs:47-56`);
* vectorized NumPy implementations over Arrow-style
  ``(flat uint8 buffer, starts, lengths)`` string batches and over
  fixed-width ``uint64`` key arrays. These run inside pandas/Arrow UDFs
  — no per-row Python in the hot path.

Spark's built-in ``F.hash`` (murmur3-32) / ``F.xxhash64`` hash Spark SQL
type encodings, not raw byte streams, so they are NOT byte-compatible
with the reference; these kernels are.

Default seed 9001 per `datasketches/src/hash/mod.rs:37`.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1

DEFAULT_UPDATE_SEED = 9001

# murmur3 x64-128 constants (`murmurhash.rs:22-23`)
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

# xxhash64 primes (`xxhash.rs:23-27`)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


# ---------------------------------------------------------------------------
# scalar reference implementations (pure python, used in tests / driver side)
# ---------------------------------------------------------------------------


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    return k ^ (k >> 33)


def murmur3_x64_128(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> tuple[int, int]:
    """Scalar murmur3 x64-128 over a raw byte buffer (LE reads)."""
    h1 = seed & MASK64
    h2 = seed & MASK64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64
    tail = data[nblocks * 16 :]
    rem = len(tail)
    if rem > 0:
        if rem > 8:
            k2 = int.from_bytes(tail[8:rem], "little")
            k2 = (k2 * _C2) & MASK64
            k2 = _rotl(k2, 33)
            k2 = (k2 * _C1) & MASK64
            h2 ^= k2
        k1 = int.from_bytes(tail[: min(rem, 8)], "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1, h2


def xxhash64(data: bytes, seed: int = 0) -> int:
    """Scalar xxhash64 over a raw byte buffer."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        i = 0
        while i + 32 <= n:
            v1 = _xx_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            h = _xx_merge_round(h, v)
    else:
        h = (seed + _P5) & MASK64
        i = 0
    h = (h + n) & MASK64
    buf = data[i:]
    j = 0
    while j + 8 <= len(buf):
        k1 = int.from_bytes(buf[j : j + 8], "little")
        k1 = (k1 * _P2) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _P1) & MASK64
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        j += 8
    if j + 4 <= len(buf):
        k1 = int.from_bytes(buf[j : j + 4], "little")
        h ^= (k1 * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        j += 4
    while j < len(buf):
        h ^= (buf[j] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        j += 1
    return _xx_finalize(h)


def _xx_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & MASK64


def _xx_merge_round(acc: int, val: int) -> int:
    val = (val * _P2) & MASK64
    val = _rotl(val, 31)
    val = (val * _P1) & MASK64
    acc ^= val
    return (acc * _P1 + _P4) & MASK64


def _xx_finalize(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    return h ^ (h >> 32)


def compute_seed_hash(seed: int) -> int:
    """16-bit seed check value (`datasketches/src/hash/mod.rs:47-56`)."""
    h1, _ = murmur3_x64_128(int(seed).to_bytes(8, "little"), 0)
    seed_hash = h1 & 0xFFFF
    if seed_hash == 0:
        raise ValueError(f"seed {seed} hashes to zero seed_hash")
    return seed_hash


# ---------------------------------------------------------------------------
# vectorized NumPy kernels
# ---------------------------------------------------------------------------

_U64 = np.uint64
_SHIFTS8 = (np.arange(8, dtype=np.uint64) * _U64(8))


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    r = _U64(r)
    return (x << r) | (x >> (_U64(64) - r))


def _vfmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> _U64(33))


def clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros of uint64 values.

    frexp of the (round-to-nearest) float64 image gives an exponent
    equal to the bit length b — except when the conversion rounds up
    to exactly 2^b, overestimating by one; ``v >> (b-1) == 0`` detects
    that exactly (and exponent 65, only reachable by rounding up to
    2^64, is always an overestimate). clz(0) = 64, matching the
    pre-round binary-search kernel this replaces.
    """
    v = x.astype(np.uint64, copy=False)
    _, be = np.frexp(v.astype(np.float64))
    be = be.astype(np.int64)
    pos = be > 0
    sh = np.where((be > 0) & (be <= 64), be - 1, 0).astype(np.uint64)
    over = pos & (np.where(be <= 64, (v >> sh) == 0, True))
    return 64 - (be - over)


def pack_bytes(items: list[bytes]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack a python list of bytes into (flat uint8 buf, starts, lengths)."""
    lengths = np.fromiter((len(b) for b in items), dtype=np.int64, count=len(items))
    starts = np.zeros(len(items), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:]) if len(items) > 1 else None
    buf = np.frombuffer(b"".join(items), dtype=np.uint8) if items else np.zeros(0, np.uint8)
    return buf, starts, lengths


def _gather_u64(buf: np.ndarray, base: np.ndarray) -> np.ndarray:
    """Read LE uint64s at byte offsets `base` from flat uint8 `buf`."""
    idx = base[:, None] + np.arange(8)
    return np.bitwise_or.reduce(buf[idx].astype(np.uint64) << _SHIFTS8, axis=1)


def _murmur_body_round(h1, h2, k1, k2):
    k1 = k1 * _U64(_C1)
    k1 = _vrotl(k1, 31)
    k1 = k1 * _U64(_C2)
    h1 = h1 ^ k1
    h1 = _vrotl(h1, 27)
    h1 = h1 + h2
    h1 = h1 * _U64(5) + _U64(0x52DCE729)
    k2 = k2 * _U64(_C2)
    k2 = _vrotl(k2, 33)
    k2 = k2 * _U64(_C1)
    h2 = h2 ^ k2
    h2 = _vrotl(h2, 31)
    h2 = h2 + h1
    h2 = h2 * _U64(5) + _U64(0x38495AB5)
    return h1, h2


def _murmur_finalize(h1, h2, total_len):
    h1 = h1 ^ total_len
    h2 = h2 ^ total_len
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _vfmix64(h1)
    h2 = _vfmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


_MURMUR_CHUNK = 1 << 17  # rows per kernel pass


def murmur3_x64_128_arr(
    buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = DEFAULT_UPDATE_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3 x64-128 over n variable-length byte strings,
    processed in bounded chunks (the gather scratch is rows × 8 × 8 B
    per block pass; chunking keeps the working set ~20 MB so buffers
    stay warm — see BASELINE.md on this host's first-touch costs)."""
    n = len(starts)
    if n <= _MURMUR_CHUNK:
        return _murmur3_x64_128_arr_impl(buf, starts, lengths, seed)
    h1 = np.empty(n, dtype=np.uint64)
    h2 = np.empty(n, dtype=np.uint64)
    for s in range(0, n, _MURMUR_CHUNK):
        e = min(s + _MURMUR_CHUNK, n)
        h1[s:e], h2[s:e] = _murmur3_x64_128_arr_impl(
            buf, starts[s:e], lengths[s:e], seed
        )
    return h1, h2


def _murmur3_x64_128_arr_impl(
    buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = DEFAULT_UPDATE_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """Single-pass kernel: block loop masked per 16-byte block index so
    rows of different lengths batch together; the tail (≤15 bytes) is
    gathered with a masked byte loop. Matches `murmurhash.rs:47-116` +
    `finish128`."""
    n = len(starts)
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = h1.copy()
    if n == 0:
        return h1, h2
    starts = starts.astype(np.int64)
    lengths = lengths.astype(np.int64)
    nblocks = lengths // 16
    maxb = int(nblocks.max())
    for j in range(maxb):
        m = nblocks > j
        base = starts[m] + j * 16
        k1 = _gather_u64(buf, base)
        k2 = _gather_u64(buf, base + 8)
        nh1, nh2 = _murmur_body_round(h1[m], h2[m], k1, k2)
        h1[m] = nh1
        h2[m] = nh2
    # tail: rem in [0,16)
    rem = lengths - nblocks * 16
    tail_start = starts + nblocks * 16
    k1 = np.zeros(n, dtype=np.uint64)
    k2 = np.zeros(n, dtype=np.uint64)
    for b in range(15):
        m = rem > b
        if not m.any():
            break
        byte = buf[tail_start[m] + b].astype(np.uint64)
        if b < 8:
            k1[m] |= byte << _U64(8 * b)
        else:
            k2[m] |= byte << _U64(8 * (b - 8))
    m2 = rem > 8
    if m2.any():
        t2 = k2[m2] * _U64(_C2)
        t2 = _vrotl(t2, 33)
        t2 = t2 * _U64(_C1)
        h2[m2] ^= t2
    m1 = rem > 0
    if m1.any():
        t1 = k1[m1] * _U64(_C1)
        t1 = _vrotl(t1, 31)
        t1 = t1 * _U64(_C2)
        h1[m1] ^= t1
    return _murmur_finalize(h1, h2, lengths.astype(np.uint64))


def murmur3_x64_128_u64s(
    vals: np.ndarray, seed: int = DEFAULT_UPDATE_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3 x64-128 of uint64 keys encoded as 8 LE bytes.

    Matches hashing ``&seed.to_le_bytes()``-style integer keys
    (`datasketches/src/hash/mod.rs:63-67`): an 8-byte input is pure
    tail (rem=8 → only k1 mixed), then finalization with total_len=8.
    """
    vals = vals.astype(np.uint64, copy=False)
    n = len(vals)
    h1 = np.full(n, seed, dtype=np.uint64)
    h2 = h1.copy()
    k1 = vals * _U64(_C1)
    k1 = _vrotl(k1, 31)
    k1 = k1 * _U64(_C2)
    h1 = h1 ^ k1
    return _murmur_finalize(h1, h2, _U64(8))


def popcount_u64(words: np.ndarray) -> int:
    """Total set bits of a uint64 array. np.bitwise_count where the
    numpy build has it (>= 2.0); else a vectorized byte-unpack — the
    per-word ``bin(int(w)).count`` fallback was ~2 ms per 2048-word
    CPC matrix and ran once per update chunk."""
    if hasattr(np, "bitwise_count"):
        return int(np.bitwise_count(words).sum())
    return int(np.unpackbits(words.view(np.uint8)).sum())


def theta_hash_u64s(vals: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Theta-convention 63-bit hash of uint64 keys: murmur h1 >> 1
    (`datasketches/src/theta/hash_table.rs:123-128`)."""
    h1, _ = murmur3_x64_128_u64s(vals, seed)
    return h1 >> _U64(1)


def canonical_double(vals: np.ndarray) -> np.ndarray:
    """Java-compatible float canonicalization (`common/mod.rs:31-41`):
    every NaN collapses to Java's Double.doubleToLongBits NaN
    (0x7ff8000000000000) and −0.0 to +0.0 (via the branch-free
    ``x + 0.0`` identity the reference uses), so float items hash
    identically across Java/C++/Rust/this engine. Returns the uint64
    bit patterns ready for the u64 update path
    (`theta/sketch.rs:134-152`)."""
    # signaling-NaN inputs make the +0.0 identity raise numpy's
    # "invalid value" FP warning — semantically fine (every NaN is
    # collapsed right after), and at 10^12 rows warning emission in a
    # hot kernel is measurable overhead, so silence it here
    with np.errstate(invalid="ignore"):
        v = np.asarray(vals, np.float64) + 0.0  # −0.0 + 0.0 → +0.0
    bits = v.view(np.uint64).copy()
    bits[np.isnan(v)] = np.uint64(0x7FF8000000000000)
    return bits


def theta_hash_f64s(vals: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Theta-convention hash of float64 items: canonicalize, then hash
    the bit pattern as a u64 — the reference's ``update_f64`` path
    (`theta/sketch.rs:134-152`); f32 items widen first
    (`theta/sketch.rs:150-152`), which NumPy does on asarray."""
    return theta_hash_u64s(canonical_double(vals), seed)


def theta_hash_bytes(
    buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = DEFAULT_UPDATE_SEED
) -> np.ndarray:
    """Theta-convention 63-bit hash of raw byte strings: murmur h1 >> 1."""
    h1, _ = murmur3_x64_128_arr(buf, starts, lengths, seed)
    return h1 >> _U64(1)


def xxhash64_u64s(vals: np.ndarray, seeds) -> np.ndarray:
    """Vectorized xxhash64 of uint64 keys encoded as 8 LE bytes, with
    a scalar or per-row-vector seed — the 8-byte specialization of
    ``xxhash64_arr`` (no stripes, one 8-byte tail chunk, avalanche),
    bit-identical to it on the same inputs (equivalence pytest-gated).
    Skips the flat-buffer pack and every ``_gather_u64``."""
    v = vals.astype(np.uint64, copy=False)
    if np.ndim(seeds) == 0:
        h = np.full(len(v), (int(seeds) + _P5 + 8) & MASK64, dtype=np.uint64)
    else:
        h = seeds.astype(np.uint64, copy=False) + _U64(_P5 + 8)
    k1 = v * _U64(_P2)
    k1 = _vrotl(k1, 31)
    k1 = k1 * _U64(_P1)
    h = h ^ k1
    h = _vrotl(h, 27) * _U64(_P1) + _U64(_P4)
    h = h ^ (h >> _U64(33))
    h = h * _U64(_P2)
    h = h ^ (h >> _U64(29))
    h = h * _U64(_P3)
    return h ^ (h >> _U64(32))


def xxhash64_arr(
    buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Vectorized xxhash64 over n variable-length byte strings.

    Matches `xxhash.rs:57-103` (finish64) + stripe accumulation.
    """
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    starts = starts.astype(np.int64)
    lengths = lengths.astype(np.int64)
    seed_i = int(seed) & MASK64
    nstripes = lengths // 32
    long_mask = lengths >= 32

    v1 = np.full(n, (seed_i + _P1 + _P2) & MASK64, dtype=np.uint64)
    v2 = np.full(n, (seed_i + _P2) & MASK64, dtype=np.uint64)
    v3 = np.full(n, seed_i, dtype=np.uint64)
    v4 = np.full(n, (seed_i - _P1) & MASK64, dtype=np.uint64)

    def vround(acc, inp):
        acc = acc + inp * _U64(_P2)
        acc = _vrotl(acc, 31)
        return acc * _U64(_P1)

    maxs = int(nstripes.max()) if n else 0
    for j in range(maxs):
        m = nstripes > j
        base = starts[m] + j * 32
        v1[m] = vround(v1[m], _gather_u64(buf, base))
        v2[m] = vround(v2[m], _gather_u64(buf, base + 8))
        v3[m] = vround(v3[m], _gather_u64(buf, base + 16))
        v4[m] = vround(v4[m], _gather_u64(buf, base + 24))

    h = np.full(n, (seed_i + _P5) & MASK64, dtype=np.uint64)
    if long_mask.any():
        acc = (
            _vrotl(v1[long_mask], 1)
            + _vrotl(v2[long_mask], 7)
            + _vrotl(v3[long_mask], 12)
            + _vrotl(v4[long_mask], 18)
        )
        for v in (v1, v2, v3, v4):
            vv = v[long_mask] * _U64(_P2)
            vv = _vrotl(vv, 31)
            vv = vv * _U64(_P1)
            acc = (acc ^ vv) * _U64(_P1) + _U64(_P4)
        h[long_mask] = acc
    h = h + lengths.astype(np.uint64)

    # remainder after full 32-byte stripes: 0..31 bytes
    rem_start = starts + nstripes * 32
    rem = lengths - nstripes * 32
    # 8-byte chunks (up to 3)
    pos = np.zeros(n, dtype=np.int64)
    for _ in range(3):
        m = (rem - pos) >= 8
        if not m.any():
            break
        k1 = _gather_u64(buf, rem_start[m] + pos[m])
        k1 = k1 * _U64(_P2)
        k1 = _vrotl(k1, 31)
        k1 = k1 * _U64(_P1)
        h[m] ^= k1
        h[m] = _vrotl(h[m], 27) * _U64(_P1) + _U64(_P4)
        pos[m] += 8
    # one 4-byte chunk
    m = (rem - pos) >= 4
    if m.any():
        idx = (rem_start[m] + pos[m])[:, None] + np.arange(4)
        k1 = np.bitwise_or.reduce(
            buf[idx].astype(np.uint64) << (_SHIFTS8[:4]), axis=1
        )
        h[m] ^= k1 * _U64(_P1)
        h[m] = _vrotl(h[m], 23) * _U64(_P2) + _U64(_P3)
        pos[m] += 4
    # leftover single bytes (up to 3)
    for _ in range(3):
        m = (rem - pos) >= 1
        if not m.any():
            break
        k1 = buf[rem_start[m] + pos[m]].astype(np.uint64)
        h[m] ^= k1 * _U64(_P5)
        h[m] = _vrotl(h[m], 11) * _U64(_P1)
        pos[m] += 1

    h = h ^ (h >> _U64(33))
    h = h * _U64(_P2)
    h = h ^ (h >> _U64(29))
    h = h * _U64(_P3)
    return h ^ (h >> _U64(32))


def xxhash64_u64s(vals: np.ndarray, seed) -> np.ndarray:
    """Vectorized `XxHash64::hash_u64` (`xxhash.rs:106-117`): 8-byte
    fast path with per-row seeds allowed (``seed`` may be an array)."""
    vals = vals.astype(np.uint64, copy=False)
    seed = np.asarray(seed, dtype=np.uint64)
    h = seed + _U64(_P5) + _U64(8)
    k1 = vals * _U64(_P2)
    k1 = _vrotl(k1, 31)
    k1 = k1 * _U64(_P1)
    h = h ^ k1
    h = _vrotl(h, 27) * _U64(_P1) + _U64(_P4)
    h = h ^ (h >> _U64(33))
    h = h * _U64(_P2)
    h = h ^ (h >> _U64(29))
    h = h * _U64(_P3)
    return h ^ (h >> _U64(32))
