"""HLL sketch — dense 8-bit register implementation.

Coupon generation is bit-parity with the reference
(`datasketches/src/hll/mod.rs:162-192`): murmur3 x64-128 (seed 9001)
→ slot = h1 & (2^26 − 1) masked to k, value = min(lz(h2), 62) + 1.
Registers are the dense Array8 form (`hll/array8.rs`): Spark
partitions are large, so the List→Set→Array promotion ladder
(`hll/sketch.rs:181-210`) is unnecessary — we go dense immediately
(SURVEY.md §4 "mode promotion: n/a").

Union = register-wise max for equal lg_k, slot-masking downsample for
mixed lg_k (`hll/union.rs:407-513`, `array8.rs:204-224`) — the
textbook commutative merge.

Estimator: the raw-HLL correction factors are the reference's
(`hll/estimator.rs:176-186`); small cardinalities use linear counting
below the reference's crossover (0.64·k for lg_k ≥ 6,
`estimator.rs:247-260`). The reference's cubic-interpolated bias
tables (4,806 generated lines) are NOT ported — estimates are
tolerance-gated (HLL test gates ±20 @ n=100, BASELINE.md), and
`approx_count_distinct` (Spark's HLL++) covers the query when only
the answer matters. Documented deviation per SURVEY.md §7 hard parts.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from math import log

import numpy as np

from ..hashes import (
    DEFAULT_UPDATE_SEED,
    murmur3_x64_128_arr,
    murmur3_x64_128_u64s,
    pack_bytes,
)

_U64 = np.uint64
_KEY_MASK_26 = (1 << 26) - 1


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros via binary bit-length."""
    v = x.astype(np.uint64).copy()
    bl = np.zeros(len(v), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (_U64(1) << _U64(s))
        bl[m] += s
        v[m] >>= _U64(s)
    bl += (v == 1).astype(np.int64)
    return 64 - bl


def _coupons_from_h(h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    slot26 = (h1 & _U64(_KEY_MASK_26)).astype(np.int64)
    lz = _clz64(h2)
    value = np.minimum(lz, 62) + 1
    return slot26, value.astype(np.uint8)


@dataclass
class HllSketch:
    lg_k: int = 12
    seed: int = DEFAULT_UPDATE_SEED
    registers: np.ndarray = field(default=None)  # uint8, length k

    def __post_init__(self) -> None:
        if not 4 <= self.lg_k <= 21:
            raise ValueError("lg_k must be in [4, 21]")
        if self.registers is None:
            self.registers = np.zeros(1 << self.lg_k, dtype=np.uint8)

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def _absorb(self, slot26: np.ndarray, value: np.ndarray) -> None:
        slot = slot26 & (self.k - 1)
        np.maximum.at(self.registers, slot, value)

    def update_u64s(self, vals: np.ndarray) -> None:
        h1, h2 = murmur3_x64_128_u64s(vals.astype(np.uint64, copy=False), self.seed)
        self._absorb(*_coupons_from_h(h1, h2))

    def update_bytes(self, items: list[bytes]) -> None:
        buf, starts, lengths = pack_bytes(items)
        h1, h2 = murmur3_x64_128_arr(buf, starts, lengths, self.seed)
        self._absorb(*_coupons_from_h(h1, h2))

    def update_strings(self, items: list[str]) -> None:
        self.update_bytes([s.encode("utf-8") for s in items])

    # -- estimate -----------------------------------------------------------

    def estimate(self) -> float:
        k = self.k
        regs = self.registers
        num_zero = int((regs == 0).sum())
        # raw HLL with the reference's correction factors
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(self.lg_k, 0.7213 / (1.0 + 1.079 / k))
        raw = alpha * k * k / float(np.power(2.0, -regs.astype(np.float64)).sum())
        # classical small-range correction (Flajolet et al. §4): linear
        # counting while raw <= 2.5k and zero registers remain — this
        # replaces the reference's cubic-interpolated bias tables
        # (`hll/composite_interpolation.rs`, generated data we do not
        # port); see module docstring for the deviation rationale
        if num_zero > 0 and raw <= 2.5 * k:
            return k * log(k / num_zero)
        return raw

    def relative_std_error(self, merged: bool = True) -> float:
        # `hll/estimator.rs:346-357`
        factor = 1.03896 if merged else 0.8325546
        return factor / np.sqrt(self.k)

    def upper_bound(self, num_std_dev: int = 2) -> float:
        return self.estimate() / (1.0 - num_std_dev * self.relative_std_error())

    def lower_bound(self, num_std_dev: int = 2) -> float:
        return self.estimate() / (1.0 + num_std_dev * self.relative_std_error())

    # -- union ----------------------------------------------------------------

    def union(self, other: "HllSketch") -> "HllSketch":
        if other.seed != self.seed:
            raise ValueError("seed mismatch in HLL union")
        if other.lg_k == self.lg_k:
            np.maximum(self.registers, other.registers, out=self.registers)
            return self
        if other.lg_k > self.lg_k:
            # downsample other by slot masking (`array8.rs:204-224`)
            folded = other.registers.reshape(-1, self.k).max(axis=0)
            np.maximum(self.registers, folded, out=self.registers)
            return self
        # self is larger: downsample self into other's size
        folded = self.registers.reshape(-1, other.k).max(axis=0)
        merged = np.maximum(folded, other.registers)
        self.lg_k = other.lg_k
        self.registers = merged
        return self

    # -- serde (family 7; engine dense layout) ----------------------------------

    def serialize(self) -> bytes:
        head = struct.pack("<BBBQ", 7, 1, self.lg_k, self.seed)
        return head + self.registers.tobytes()

    @staticmethod
    def deserialize(data: bytes) -> "HllSketch":
        family, _ver, lg_k, seed = struct.unpack_from("<BBBQ", data, 0)
        if family != 7:
            raise ValueError(f"not an HLL sketch (family {family})")
        off = struct.calcsize("<BBBQ")
        regs = np.frombuffer(data, np.uint8, count=1 << lg_k, offset=off).copy()
        return HllSketch(lg_k, seed, regs)
