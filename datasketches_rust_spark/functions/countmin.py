"""Count-Min sketch — NumPy kernel mirroring the reference semantics
(`datasketches/src/countmin/sketch.rs`).

* sizing: num_buckets = ⌈e/ε⌉ (`sketch.rs:131-134`), num_hashes =
  ⌈ln(1/(1−confidence))⌉ (`sketch.rs:141-151`);
* per-row hash seeds derived ``murmur(seed).write(i as u64 LE).h1``
  (`sketch.rs:493-503`) — reproduced bit-for-bit;
* bucket index: ``murmur(seed_i, item_bytes).h1 % num_buckets``
  (`sketch.rs:405-410`). Items hash as raw bytes (ints → 8 LE bytes),
  the engine-wide convention (SURVEY.md §7 hard-parts note);
* update: add weight to one bucket per row (vectorized scatter-add,
  ``np.add.at``);
* estimate: min over rows (`sketch.rs:201-211`); bounds: LB = est −
  ε·W is NOT the reference's (it uses est & est + ε·W); we mirror:
  UB = est + ε·total_weight, LB = est (`sketch.rs:213-225`);
* merge: element-wise add, config+seed checked (`sketch.rs:246-259`);
* halve/decay: exponential counter decay (`sketch.rs:427-458`).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from math import ceil, e, log

import numpy as np

from ..hashes import (
    DEFAULT_UPDATE_SEED,
    compute_seed_hash,
    murmur3_x64_128,
    murmur3_x64_128_arr,
    murmur3_x64_128_u64s,
    pack_bytes,
)


def suggest_num_buckets(relative_error: float) -> int:
    if relative_error < 0:
        raise ValueError("relative_error must be >= 0")
    return ceil(e / relative_error)


def suggest_num_hashes(confidence: float) -> int:
    if not 0.0 <= confidence <= 1.0:
        raise ValueError("confidence must be in [0, 1]")
    if confidence == 1.0:
        return 127
    return min(ceil(log(1.0 / (1.0 - confidence))), 127)


def _derive_seeds(seed: int, num_hashes: int) -> np.ndarray:
    out = np.empty(num_hashes, dtype=np.uint64)
    for i in range(num_hashes):
        h1, _ = murmur3_x64_128(int(i).to_bytes(8, "little"), seed)
        out[i] = h1
    return out


@dataclass
class CountMinSketch:
    num_hashes: int
    num_buckets: int
    seed: int = DEFAULT_UPDATE_SEED
    counts: np.ndarray = field(default=None)  # (num_hashes, num_buckets) int64
    total_weight: int = 0

    def __post_init__(self) -> None:
        if self.num_buckets < 3:
            raise ValueError("num_buckets must be at least 3")
        if self.counts is None:
            self.counts = np.zeros((self.num_hashes, self.num_buckets), dtype=np.int64)
        self.hash_seeds = _derive_seeds(self.seed, self.num_hashes)
        self.seed_hash = compute_seed_hash(self.seed)

    @property
    def relative_error(self) -> float:
        return e / self.num_buckets

    def _buckets(self, items: list[bytes]) -> np.ndarray:
        """(num_hashes, n) bucket indices."""
        buf, starts, lengths = pack_bytes(items)
        out = np.empty((self.num_hashes, len(items)), dtype=np.int64)
        for r in range(self.num_hashes):
            h1, _ = murmur3_x64_128_arr(buf, starts, lengths, int(self.hash_seeds[r]))
            out[r] = (h1 % np.uint64(self.num_buckets)).astype(np.int64)
        return out

    def _buckets_any(self, items) -> np.ndarray:
        """(num_hashes, n) buckets for a batch of items of any type.

        Integer numpy arrays / pandas values skip the per-item
        ``_to_bytes`` Python loop: every int64 hashes over its 8 LE
        two's-complement bytes, exactly what ``_to_bytes`` packs, so
        the vectorized u64 murmur kernel is bit-identical (equivalence
        pytest-gated). Everything else takes the byte-packing path."""
        arr = items if isinstance(items, np.ndarray) else None
        if arr is not None and arr.dtype.kind in ("i", "u"):
            # sign-extend signed ints to the 8-byte two's complement
            # _to_bytes packs; u64 values >= 2^63 keep their raw bits
            u = (
                arr.astype(np.uint64)
                if arr.dtype.kind == "u"
                else arr.astype(np.int64).view(np.uint64)
            )
            out = np.empty((self.num_hashes, len(u)), dtype=np.int64)
            for r in range(self.num_hashes):
                h1, _ = murmur3_x64_128_u64s(u, int(self.hash_seeds[r]))
                out[r] = (h1 % np.uint64(self.num_buckets)).astype(np.int64)
            return out
        return self._buckets([self._to_bytes(i) for i in items])

    @staticmethod
    def _to_bytes(item) -> bytes:
        if isinstance(item, bytes):
            return item
        if isinstance(item, (int, np.integer)):
            return int(item).to_bytes(8, "little", signed=int(item) < 0)
        return str(item).encode("utf-8")

    def update_batch(self, items, weights: np.ndarray | None = None) -> None:
        w = np.ones(len(items), np.int64) if weights is None else np.asarray(weights, np.int64)
        bk = self._buckets_any(items)
        for r in range(self.num_hashes):
            np.add.at(self.counts[r], bk[r], w)
        self.total_weight += int(w.sum())

    def update(self, item, weight: int = 1) -> None:
        self.update_batch([item], np.array([weight], np.int64))

    def estimate_batch(self, items) -> np.ndarray:
        bk = self._buckets_any(items)
        vals = np.stack([self.counts[r, bk[r]] for r in range(self.num_hashes)])
        return vals.min(axis=0)

    def estimate(self, item) -> int:
        return int(self.estimate_batch([item])[0])

    def lower_bound(self, item) -> int:
        return self.estimate(item)

    def upper_bound(self, item) -> int:
        return int(self.estimate(item) + self.relative_error * self.total_weight)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if other is self:
            raise ValueError("cannot merge a sketch with itself")
        if (other.num_hashes, other.num_buckets, other.seed) != (
            self.num_hashes,
            self.num_buckets,
            self.seed,
        ):
            raise ValueError("incompatible CountMin configs")
        self.counts += other.counts
        self.total_weight += other.total_weight
        return self

    def halve(self) -> None:
        """Divide every counter AND the total weight by two, truncating
        toward zero (`countmin/sketch.rs:427-432`; counters are
        non-negative under the unsigned contract, `value.rs:55-62`)."""
        self.counts //= 2
        self.total_weight //= 2

    def decay(self, decay: float) -> None:
        """Multiply every counter (and total weight) by ``decay`` and
        truncate toward zero (`countmin/sketch.rs:434-458`) — the
        exponential-forgetting knob for sliding-relevance streams."""
        from math import isfinite

        if not isfinite(decay) or not 0.0 < decay <= 1.0:
            raise ValueError("decay must be within (0, 1]")
        self.counts = np.floor(self.counts * decay).astype(np.int64)
        self.total_weight = int(self.total_weight * decay)

    # -- serde: reference family-18 wire format ------------------------------
    # (`countmin/sketch.rs:273-405`, `countmin/serialization.rs:18-20`):
    # [pre_longs=2, serVer=1, family=18, flags][unused u32]
    # [num_buckets u32][num_hashes u8][seed_hash u16 LE][pad u8]
    # + non-empty: [total_weight 8B LE][counts 8B LE each, row-major].
    # The wire carries only the 16-bit seed hash (like theta), so
    # deserialize validates it against the expected seed.

    _EMPTY_FLAG = 1 << 0

    def serialize(self) -> bytes:
        empty = self.total_weight == 0 and not self.counts.any()
        out = struct.pack(
            "<BBBBIIBHB",
            2,
            1,
            18,
            self._EMPTY_FLAG if empty else 0,
            0,
            self.num_buckets,
            self.num_hashes,
            self.seed_hash,
            0,
        )
        if empty:
            return out
        return out + struct.pack("<q", self.total_weight) + self.counts.astype("<i8").tobytes()

    @staticmethod
    def deserialize(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> "CountMinSketch":
        if len(data) < 16:
            raise ValueError("countmin bytes too short")
        pre, ver, family, flags, _u, nb, nh, seed_hash, _pad = struct.unpack_from(
            "<BBBBIIBHB", data, 0
        )
        if family != 18:
            raise ValueError(f"not a countmin sketch (family {family})")
        if ver != 1:
            raise ValueError(f"unsupported countmin serial version {ver}")
        if seed_hash != compute_seed_hash(seed):
            raise ValueError(f"seed hash mismatch: {seed_hash}")
        if flags & CountMinSketch._EMPTY_FLAG:
            if nh * nb > (1 << 28):
                # EMPTY blobs carry no counter payload to back the
                # nh*nb allocation — cap it (2^28 i64 counters = 2 GiB)
                # so a crafted 16-byte header can't OOM the decoder;
                # the non-empty path is already payload-length-checked
                raise ValueError(f"empty countmin table {nh}x{nb} too large")
            return CountMinSketch(nh, nb, seed)
        if len(data) < 16 + 8 + nh * nb * 8:
            raise ValueError("truncated countmin counters")
        (tw,) = struct.unpack_from("<q", data, 16)
        counts = np.frombuffer(data, dtype="<i8", count=nh * nb, offset=24).reshape(nh, nb)
        return CountMinSketch(nh, nb, seed, counts.copy(), tw)
