"""Bloom filter — NumPy kernel mirroring the reference semantics
(`datasketches/src/bloom/`).

* sizing (`builder.rs:183-215`): m = ⌈−n·ln p / ln²2⌉ bits (rounded up
  to 64-bit words), k = ⌈(m/n)·ln 2⌉ hashes;
* bit selection (`bloom/sketch.rs:499-543`, Kirsch–Mitzenmacher double
  hashing): h0 = xxhash64(item, seed), h1 = xxhash64(item, h0),
  bit_i = ((h0 + i·h1) >> 1) mod m for i = 1..=k;
* union/intersect/invert: word-wise OR/AND/NOT with size+k+seed
  compatibility check (`bloom/sketch.rs:174-253, 314-318`);
* stats: bits_used, load_factor, estimated_fpp = load^k
  (`bloom/sketch.rs:256-306`).

Items hash as raw bytes (ints → 8 LE bytes), engine-wide convention.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from math import ceil, log

import numpy as np

from ..hashes import pack_bytes, xxhash64_arr, xxhash64_u64s

_U64 = np.uint64


def optimal_bits(max_items: int, fpp: float) -> int:
    bits = ceil(-max_items * log(fpp) / (log(2) ** 2))
    return ((bits + 63) // 64) * 64


def optimal_hashes(max_items: int, num_bits: int) -> int:
    return ceil(num_bits / max_items * log(2))


@dataclass
class BloomFilter:
    num_bits: int
    num_hashes: int
    # DEFAULT_UPDATE_SEED = 9001 (reference hash/mod.rs:37) — a
    # default-config build is bit-identical to the reference's
    # (REFBENCH check parity); the seed travels in the family-21 blob
    # either way, so foreign reads never depended on the default.
    # COMPATIBILITY NOTE (changed in round 4, default was 0 before):
    # union/intersect require matching (num_bits, num_hashes, seed),
    # so filters persisted under the old default 0 cannot be merged
    # with freshly default-built filters — deserialize them (the blob
    # carries seed 0) and merge against filters built with seed=0
    # explicitly, or rebuild.
    seed: int = 9001
    words: np.ndarray = None  # uint64 array

    def __post_init__(self) -> None:
        if self.num_bits % 64:
            self.num_bits = ((self.num_bits + 63) // 64) * 64
        if self.words is None:
            self.words = np.zeros(self.num_bits // 64, dtype=np.uint64)

    @staticmethod
    def with_accuracy(max_items: int, fpp: float, seed: int = 9001) -> "BloomFilter":
        m = optimal_bits(max_items, fpp)
        return BloomFilter(m, optimal_hashes(max_items, m), seed)

    @staticmethod
    def _to_bytes(item) -> bytes:
        if isinstance(item, bytes):
            return item
        if isinstance(item, (int, np.integer)):
            return int(item).to_bytes(8, "little", signed=int(item) < 0)
        return str(item).encode("utf-8")

    def _bit_positions(self, items: list) -> np.ndarray:
        """(n, num_hashes) bit indices via double hashing.

        Integer numpy arrays skip the per-item ``_to_bytes`` loop:
        each int64 hashes over its 8 LE two's-complement bytes —
        exactly what ``_to_bytes`` packs — so the flat buffer is just
        the array's own LE byte image (equivalence pytest-gated)."""
        arr = items if isinstance(items, np.ndarray) else None
        if arr is not None and arr.dtype.kind in ("i", "u") and len(arr):
            # 8-byte integer keys: the dedicated u64 xxhash kernel skips
            # the flat-buffer pack and gathers entirely (bit-identical,
            # equivalence pytest-gated)
            u = (
                arr.astype(np.uint64)
                if arr.dtype.kind == "u"
                else arr.astype(np.int64).view(np.uint64)
            )
            h0 = xxhash64_u64s(u, self.seed)
            h1 = xxhash64_u64s(u, h0)  # per-row seed, reference order
        else:
            bts = [self._to_bytes(i) for i in items]
            buf, starts, lengths = pack_bytes(bts)
            h0 = xxhash64_arr(buf, starts, lengths, self.seed)
            # h1 = xxhash64(item, seed=h0) — mirror the reference
            # exactly by re-running the kernel with per-row seeds
            h1 = _xxhash64_arr_per_row_seed(buf, starts, lengths, h0)
        i = np.arange(1, self.num_hashes + 1, dtype=np.uint64)
        pos = ((h0[:, None] + i[None, :] * h1[:, None]) >> _U64(1)) % _U64(self.num_bits)
        return pos

    def insert_batch(self, items: list) -> None:
        pos = self._bit_positions(items).reshape(-1)
        if len(pos) == 0:
            return
        # group-OR via sort + reduceat: faster than np.bitwise_or.at's
        # unbuffered scatter, same result (OR is commutative/
        # idempotent). Bit indices fit u32 up to 2^32 filter bits
        # (num_bits is capped far below); u32 sort is ~2x the u64 sort.
        if self.num_bits < (1 << 32):
            pos = np.sort(pos.astype(np.uint32))
            words = pos >> np.uint32(6)
            masks = _U64(1) << (pos & np.uint32(63)).astype(np.uint64)
        else:
            pos = np.sort(pos)
            words = pos >> _U64(6)
            masks = _U64(1) << (pos & _U64(63))
        group_starts = np.flatnonzero(words[1:] != words[:-1]) + 1
        group_starts = np.concatenate(([0], group_starts))
        orred = np.bitwise_or.reduceat(masks, group_starts)
        widx = words[group_starts].astype(np.int64)  # unique → fancy assign safe
        self.words[widx] |= orred

    def insert(self, item) -> None:
        self.insert_batch([item])

    def contains_batch(self, items: list) -> np.ndarray:
        pos = self._bit_positions(items)
        words, bits = np.divmod(pos, _U64(64))
        hit = (self.words[words.astype(np.int64)] >> bits) & _U64(1)
        return hit.all(axis=1)

    def contains(self, item) -> bool:
        return bool(self.contains_batch([item])[0])

    def contains_and_insert_batch(self, items: list) -> np.ndarray:
        """One-pass membership-check-then-insert — the dedup idiom of
        `bloom/sketch.rs:499-543` (query_and_update): row i reports the
        presence it would see if the batch were processed one item at a
        time (query i after inserting items 0..i-1), and every item is
        inserted. Bit-identical to the reference's sequential order —
        including the case where a distinct item's bits were all set by
        OTHER items earlier in the same batch.

        Vectorized via first-setter ranks: for each bit position
        touched by the batch, the earliest row that sets it; row i's
        bit b is visible iff it was set pre-batch OR first_setter[b] < i.
        """
        pos = self._bit_positions(items)  # (n, num_hashes)
        n = pos.shape[0]
        if n == 0:
            return np.zeros(0, dtype=bool)
        words, bits = np.divmod(pos, _U64(64))
        widx = words.astype(np.int64)
        pre_hit = ((self.words[widx] >> bits) & _U64(1)).astype(bool)
        # earliest batch row setting each distinct position (positions
        # only from this batch — never O(num_bits) state)
        flat_pos = pos.reshape(-1)
        flat_row = np.repeat(np.arange(n, dtype=np.int64), self.num_hashes)
        uniq, inv = np.unique(flat_pos, return_inverse=True)
        first_setter = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_setter, inv, flat_row)
        seen_in_batch = (first_setter[inv] < flat_row).reshape(n, self.num_hashes)
        hit = (pre_hit | seen_in_batch).all(axis=1)
        np.bitwise_or.at(
            self.words, widx.reshape(-1), _U64(1) << bits.reshape(-1)
        )
        return hit

    def contains_and_insert(self, item) -> bool:
        return bool(self.contains_and_insert_batch([item])[0])

    # -- set ops (`bloom/sketch.rs:174-253, 314-318`) ------------------------

    def _check_compat(self, other: "BloomFilter") -> None:
        if (self.num_bits, self.num_hashes, self.seed) != (
            other.num_bits,
            other.num_hashes,
            other.seed,
        ):
            raise ValueError("incompatible bloom filters")

    def union(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        self.words |= other.words
        return self

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compat(other)
        self.words &= other.words
        return self

    def invert(self) -> "BloomFilter":
        self.words = ~self.words
        return self

    # -- stats ---------------------------------------------------------------

    def bits_used(self) -> int:
        from ..hashes import popcount_u64

        return popcount_u64(self.words)

    def load_factor(self) -> float:
        return self.bits_used() / self.num_bits

    def estimated_fpp(self) -> float:
        return self.load_factor() ** self.num_hashes

    # -- serde: reference family-21 wire format ------------------------------
    # (`bloom/sketch.rs:335-492`): [pre_longs, serVer=1, family=21,
    # flags] [num_hashes u16 LE][unused u16] [seed u64 LE]
    # [num_longs i32 LE][unused u32] + non-empty: [num_bits_set u64 LE]
    # [bit words u64 LE…]. pre_longs 3 empty / 4 non-empty
    # (`codec/family.rs:85-90`).

    _EMPTY_FLAG = 1 << 2
    _DIRTY_BITS = 0xFFFFFFFFFFFFFFFF

    def serialize(self) -> bytes:
        nbs = self.bits_used()
        empty = nbs == 0
        out = struct.pack(
            "<BBBBHHQiI",
            3 if empty else 4,
            1,
            21,
            self._EMPTY_FLAG if empty else 0,
            self.num_hashes,
            0,
            self.seed,
            len(self.words),
            0,
        )
        if not empty:
            out += struct.pack("<Q", nbs)
            out += self.words.astype("<u8").tobytes()
        return out

    @staticmethod
    def deserialize(data: bytes) -> "BloomFilter":
        if len(data) < 24:
            raise ValueError("bloom filter bytes too short")
        pre_longs, ver, family, flags, nh, _u, seed, num_longs, _u2 = struct.unpack_from(
            "<BBBBHHQiI", data, 0
        )
        if family != 21:
            raise ValueError(f"not a bloom filter (family {family})")
        if ver != 1:
            raise ValueError(f"unsupported bloom serial version {ver}")
        if not 3 <= pre_longs <= 4:
            raise ValueError(f"invalid bloom preamble longs {pre_longs}")
        if not 1 <= nh <= 0x7FFF:
            raise ValueError(f"invalid num_hashes {nh}")
        if num_longs <= 0:
            raise ValueError(f"invalid num_longs {num_longs}")
        if flags & BloomFilter._EMPTY_FLAG:
            if num_longs > (1 << 28):
                # the non-empty path's allocation is backed 1:1 by blob
                # payload, but an EMPTY blob is 24 bytes regardless of
                # the claimed size — cap it (2^28 longs = 2 GiB words,
                # beyond any buildable config) so a crafted header
                # can't OOM the decoder
                raise ValueError(f"empty bloom num_longs {num_longs} too large")
            return BloomFilter(num_longs * 64, nh, seed)
        if len(data) < 32:
            raise ValueError("truncated bloom preamble")
        (raw_bits_set,) = struct.unpack_from("<Q", data, 24)
        if len(data) < 32 + num_longs * 8:
            raise ValueError("truncated bloom bit array")
        words = np.frombuffer(data, dtype="<u8", count=num_longs, offset=32).copy()
        # dirty sentinel → recount (`bloom/sketch.rs:474-487`); we always
        # recount on query, but still validate a clean count
        if raw_bits_set != BloomFilter._DIRTY_BITS:
            if (raw_bits_set + 63) // 64 > num_longs:
                raise ValueError(f"invalid num_bits_set {raw_bits_set}")
        return BloomFilter(num_longs * 64, nh, seed, words)


def _xxhash64_arr_per_row_seed(buf, starts, lengths, seeds) -> np.ndarray:
    """xxhash64 with a different seed per row.

    Short inputs (< 32 bytes, the common key case) share the same
    seed-dependent code path, so the kernel vectorizes directly; long
    inputs fall back to grouping identical-seed rows (rare for keys).
    """
    from ..hashes import xxhash64 as _scalar

    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    short = lengths < 32
    if short.any():
        out[short] = _xx_short_per_seed(buf, starts[short], lengths[short], seeds[short])
    long_idx = np.nonzero(~short)[0]
    for i in long_idx:
        s, ln = int(starts[i]), int(lengths[i])
        out[i] = _scalar(buf[s : s + ln].tobytes(), int(seeds[i]))
    return out


def _xx_short_per_seed(buf, starts, lengths, seeds) -> np.ndarray:
    """Vectorized xxhash64 for inputs < 32 bytes with per-row seeds:
    h = seed + P5 (no stripes), then the standard tail loop."""
    from ..hashes import _P1, _P2, _P3, _P4, _P5, _SHIFTS8, _gather_u64, _vrotl

    n = len(starts)
    h = seeds.astype(np.uint64) + _U64(_P5)
    h = h + lengths.astype(np.uint64)
    pos = np.zeros(n, dtype=np.int64)
    rem = lengths.astype(np.int64)
    for _ in range(3):
        m = (rem - pos) >= 8
        if not m.any():
            break
        k1 = _gather_u64(buf, starts[m] + pos[m])
        k1 = k1 * _U64(_P2)
        k1 = _vrotl(k1, 31)
        k1 = k1 * _U64(_P1)
        h[m] ^= k1
        h[m] = _vrotl(h[m], 27) * _U64(_P1) + _U64(_P4)
        pos[m] += 8
    m = (rem - pos) >= 4
    if m.any():
        idx = (starts[m] + pos[m])[:, None] + np.arange(4)
        k1 = np.bitwise_or.reduce(buf[idx].astype(np.uint64) << _SHIFTS8[:4], axis=1)
        h[m] ^= k1 * _U64(_P1)
        h[m] = _vrotl(h[m], 23) * _U64(_P2) + _U64(_P3)
        pos[m] += 4
    for _ in range(3):
        m = (rem - pos) >= 1
        if not m.any():
            break
        k1 = buf[starts[m] + pos[m]].astype(np.uint64)
        h[m] ^= k1 * _U64(_P5)
        h[m] = _vrotl(h[m], 11) * _U64(_P1)
        pos[m] += 1
    h = h ^ (h >> _U64(33))
    h = h * _U64(_P2)
    h = h ^ (h >> _U64(29))
    h = h * _U64(_P3)
    return h ^ (h >> _U64(32))
