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

Estimator — full port of `hll/estimator.rs`:

* **composite** (out-of-order mode, i.e. after any merge/deserialize —
  the normal state for Spark partial aggregation): raw HLL with the
  reference's correction factors (`estimator.rs:174-187`) through the
  cubic-interpolated X tables (`composite_interpolation.rs`, the
  published Apache DataSketches constants — see _hll_tables.py),
  Lagrange cubic interpolation (`cubic_interpolation.rs:112-141`),
  blended with the harmonic-number bitmap (linear counting) estimate
  (`harmonic_numbers.rs:92-103`) below the crossover
  (`estimator.rs:241-264`).
* **HIP** (in-order mode): the historical-inverse-probability
  accumulator over the sequence of register *changes*
  (`estimator.rs:76-105`) with the kxq0/kxq1 split registers. Valid
  only for a sketch built by sequential updates that was never merged;
  batch `update_*` calls preserve it by replaying register-raising
  events in arrival order (vectorized event extraction, tiny Python
  loop over the <= O(k log n) changes).
* **bounds**: the measured relative-error quantile tables for
  lg_k <= 12 and the analytic RSE factors above
  (`estimator.rs:328-372` + RelativeErrorTables constants).
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
    """Exact vectorized count-leading-zeros (shared frexp kernel)."""
    from ..hashes import clz64

    return clz64(x)


def _coupons_from_h(h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    slot26 = (h1 & _U64(_KEY_MASK_26)).astype(np.int64)
    lz = _clz64(h2)
    value = np.minimum(lz, 62) + 1
    return slot26, value.astype(np.uint8)


def _harmonic_number(n: int) -> float:
    """H(n) — exact table below 25, asymptotic expansion above
    (`hll/harmonic_numbers.rs:23-82`)."""
    if n < len(_EXACT_HARMONIC):
        return _EXACT_HARMONIC[n]
    x = float(n)
    inv_sq = 1.0 / (x * x)
    s = log(x) + 0.5772156649015329 + 1.0 / (2.0 * x)
    p = inv_sq
    s -= p / 12.0
    p *= inv_sq
    s += p / 120.0
    p *= inv_sq
    s -= p / 252.0
    p *= inv_sq
    s += p / 240.0
    return s


_EXACT_HARMONIC = [0.0]
for _i in range(1, 25):
    _EXACT_HARMONIC.append(_EXACT_HARMONIC[-1] + 1.0 / _i)


def _cubic_interpolate(x0, y0, x1, y1, x2, y2, x3, y3, x) -> float:
    """Lagrange cubic (`hll/cubic_interpolation.rs:112-141`)."""
    t0 = y0 * ((x - x1) * (x - x2) * (x - x3)) / ((x0 - x1) * (x0 - x2) * (x0 - x3))
    t1 = y1 * ((x - x0) * (x - x2) * (x - x3)) / ((x1 - x0) * (x1 - x2) * (x1 - x3))
    t2 = y2 * ((x - x0) * (x - x1) * (x - x3)) / ((x2 - x0) * (x2 - x1) * (x2 - x3))
    t3 = y3 * ((x - x0) * (x - x1) * (x - x2)) / ((x3 - x0) * (x3 - x1) * (x3 - x2))
    return t0 + t1 + t2 + t3


def _interp_x_arr_y_stride(x_arr: np.ndarray, y_stride: float, x: float) -> float:
    """`using_x_arr_and_y_stride` (`cubic_interpolation.rs:66-115`):
    pick the 4-point window around the straddle index."""
    last = len(x_arr) - 1
    if x == x_arr[last]:
        return y_stride * last
    offset = int(np.searchsorted(x_arr, x, side="right")) - 1
    if offset == 0:
        base = 0
    elif offset == len(x_arr) - 2:
        base = offset - 2
    else:
        base = offset - 1
    xs = x_arr[base : base + 4]
    return _cubic_interpolate(
        xs[0], y_stride * base, xs[1], y_stride * (base + 1),
        xs[2], y_stride * (base + 2), xs[3], y_stride * (base + 3), x,
    )


def _get_rel_err(lg_k: int, upper: bool, ooo: bool, num_std_dev: int) -> float:
    """`hll/estimator.rs:328-372` + the measured quantile tables."""
    from ._hll_tables import HIP_LB, HIP_UB, NON_HIP_LB, NON_HIP_UB

    if lg_k > 12:
        factor = 1.03896 if ooo else 0.8325546
        sign = -1.0 if upper else 1.0
        return sign * num_std_dev * factor / np.sqrt(1 << lg_k)
    idx = (lg_k - 4) * 3 + (num_std_dev - 1)
    table = {
        (False, False): HIP_LB,
        (False, True): HIP_UB,
        (True, False): NON_HIP_LB,
        (True, True): NON_HIP_UB,
    }[(ooo, upper)]
    return float(table[idx])


def _coupon_estimate(count: int) -> float:
    """LIST/SET-mode estimator (`hll/container.rs:108-113`): cubic
    interpolation of the coupon-collector mapping, floored at the
    observed count."""
    from ._hll_tables import COUPON_X_ARR, COUPON_Y_ARR

    x = float(count)
    last = len(COUPON_X_ARR) - 1
    if x == COUPON_X_ARR[last]:
        return float(COUPON_Y_ARR[last])
    offset = int(np.searchsorted(COUPON_X_ARR, x, side="right")) - 1
    if offset == 0:
        base = 0
    elif offset == last - 1:
        base = offset - 2
    else:
        base = offset - 1
    est = _cubic_interpolate(
        COUPON_X_ARR[base], COUPON_Y_ARR[base],
        COUPON_X_ARR[base + 1], COUPON_Y_ARR[base + 1],
        COUPON_X_ARR[base + 2], COUPON_Y_ARR[base + 2],
        COUPON_X_ARR[base + 3], COUPON_Y_ARR[base + 3], x,
    )
    return max(x, est)


_LG_INIT_LIST = 3  # `hll/list.rs:46`
_LG_INIT_SET = 5  # `hll/hash_set.rs:48`


@dataclass
class HllSketch:
    lg_k: int = 12
    seed: int = DEFAULT_UPDATE_SEED
    registers: np.ndarray = field(default=None)  # uint8, length k
    # HIP state (`hll/estimator.rs:42-63`): valid only while in-order
    hip_accum: float = 0.0
    out_of_order: bool = False
    # promotion-ladder state (`hll/sketch.rs:181-210`): a fresh in-order
    # sketch walks List -> Set -> dense exactly like the reference; any
    # merge-semantics construction (out_of_order=True or explicit
    # registers) starts dense.
    mode: str = field(default=None)
    coupon_list: list = field(default=None)  # LIST: insertion order
    set_table: list = field(default=None)  # SET: open-addressed table
    set_lg: int = _LG_INIT_SET
    set_count: int = 0
    # incremental kxq halves — authoritative when built sequentially or
    # decoded from a dense wire blob; None -> recompute from registers
    kxq0: float = None
    kxq1: float = None

    def __post_init__(self) -> None:
        if not 4 <= self.lg_k <= 21:
            raise ValueError("lg_k must be in [4, 21]")
        if self.mode is None:
            self.mode = (
                "list" if self.registers is None and not self.out_of_order else "hll"
            )
        if self.registers is None:
            self.registers = np.zeros(1 << self.lg_k, dtype=np.uint8)
        if self.mode == "list" and self.coupon_list is None:
            self.coupon_list = []

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def _kxq(self) -> float:
        """kxq0 + kxq1 = Σ 2^-reg, split in the reference only for
        accumulation precision (`estimator.rs:92-105`); computing it
        fresh from registers is exact."""
        return float(np.power(2.0, -self.registers.astype(np.float64)).sum())

    def _absorb(self, slot26: np.ndarray, value: np.ndarray) -> None:
        """Absorb coupons with merge semantics (vectorized register
        max). Only reachable on out-of-order sketches — in-order HIP
        updates route through ``_update_sequential``, which maintains
        the accumulator per register-raising event (`estimator.rs:
        76-90`)."""
        slot = (slot26 & (self.k - 1)).astype(np.int64)
        self.kxq0 = self.kxq1 = None
        np.maximum.at(self.registers, slot, value)

    def update_u64s(self, vals: np.ndarray) -> None:
        h1, h2 = murmur3_x64_128_u64s(vals.astype(np.uint64, copy=False), self.seed)
        self._update_coupons(*_coupons_from_h(h1, h2))

    def update_bytes(self, items: list[bytes]) -> None:
        buf, starts, lengths = pack_bytes(items)
        h1, h2 = murmur3_x64_128_arr(buf, starts, lengths, self.seed)
        self._update_coupons(*_coupons_from_h(h1, h2))

    def update_strings(self, items: list[str]) -> None:
        self.update_bytes([s.encode("utf-8") for s in items])

    # -- reference promotion ladder (sequential, byte-parity path) ----------

    def _update_coupons(self, slot26: np.ndarray, value: np.ndarray) -> None:
        if self.out_of_order:
            # merge-semantics sketch: vectorized dense absorb, no HIP
            self._ensure_dense()
            self._absorb(slot26, value)
            return
        coupons = (
            (value.astype(np.uint32) << np.uint32(26)) | slot26.astype(np.uint32)
        )
        self._update_sequential(coupons)

    def _set_insert(self, coupon: int) -> bool:
        """`hll/hash_set.rs:61-90`: linear probe with odd stride; True
        if novel."""
        mask = (1 << self.set_lg) - 1
        tbl = self.set_table
        probe = coupon & mask
        while True:
            v = tbl[probe]
            if v == 0:
                tbl[probe] = coupon
                self.set_count += 1
                return True
            if v == coupon:
                return False
            stride = ((coupon & _KEY_MASK_26) >> self.set_lg) | 1
            probe = (probe + stride) & mask

    def _grow_set(self) -> None:
        """`hll/sketch.rs:409-420`: re-insert in table-scan order."""
        old = self.set_table
        self.set_lg += 1
        self.set_table = [0] * (1 << self.set_lg)
        self.set_count = 0
        for c in old:
            if c:
                self._set_insert(c)

    @staticmethod
    def _dense_coupon_loop(
        regs: bytearray, coupons, k: int, kxq0: float, kxq1: float, hip: float
    ) -> tuple[float, float, float]:
        """The reference's per-coupon dense register update
        (`array8.rs:81-103` + `estimator.rs:64-105`): on each
        register-raising event, hip += k/kxq BEFORE the kxq halves are
        adjusted — the single bit-exact float schedule shared by
        promotion and the streaming tail."""
        kmask = k - 1
        for c in coupons:
            slot = (c & _KEY_MASK_26) & kmask
            v = c >> 26
            old = regs[slot]
            if v > old:
                hip += k / (kxq0 + kxq1)
                if old < 32:
                    kxq0 -= 2.0**-old
                else:
                    kxq1 -= 2.0**-old
                if v < 32:
                    kxq0 += 2.0**-v
                else:
                    kxq1 += 2.0**-v
                regs[slot] = v
        return kxq0, kxq1, hip

    def _promote_to_dense(self, coupons_in_order: list) -> None:
        """`hll/sketch.rs:422-449`: insert the container's coupons into
        a fresh array (incrementally evolving kxq), then overwrite the
        HIP accumulator with the coupon estimate."""
        count = len(coupons_in_order)
        regs = bytearray(self.k)
        # the hip accumulated during promotion is discarded below,
        # exactly like the reference's set_hip_accum overwrite
        kxq0, kxq1, _hip = self._dense_coupon_loop(
            regs, coupons_in_order, self.k, float(self.k), 0.0, 0.0
        )
        self.registers = np.frombuffer(bytes(regs), dtype=np.uint8).copy()
        self.kxq0, self.kxq1 = kxq0, kxq1
        self.hip_accum = _coupon_estimate(count)  # set_hip_accum
        self.mode = "hll"
        self.coupon_list = None
        self.set_table = None

    def _update_sequential(self, coupons: np.ndarray) -> None:
        """The reference's exact single-stream schedule
        (`hll/sketch.rs:181-210`): List (8 slots) promotes when full —
        to dense for lg_k < 8, else to Set; Set grows at 75% load and
        promotes to dense when its table would exceed lg_k-3. Dense
        updates maintain HIP/kxq per register-raising event
        (`hll/estimator.rs:76-105`), bit-exactly."""
        it = iter(coupons.tolist())
        for c in it:
            if self.mode == "list":
                lst = self.coupon_list
                if c not in lst:
                    lst.append(c)
                    # >= not ==: a wire-decoded list may already hold a
                    # full 8 (deserialize_wire caps it there); strict
                    # equality would then never fire and the list would
                    # grow unboundedly (O(n^2) scans, serialize overflow)
                    if len(lst) >= (1 << _LG_INIT_LIST):  # is_full
                        if self.lg_k < 8:
                            self._promote_to_dense(lst)
                        else:
                            self.set_table = [0] * (1 << _LG_INIT_SET)
                            self.set_lg = _LG_INIT_SET
                            self.set_count = 0
                            for lc in lst:
                                self._set_insert(lc)
                            self.mode = "set"
                            self.coupon_list = None
            elif self.mode == "set":
                self._set_insert(c)
                if 4 * self.set_count > 3 * (1 << self.set_lg):
                    # >= not ==: deserialize_wire bounds set_lg to
                    # lg_k-3, but a defensive >= keeps promotion firing
                    # even if that invariant is ever relaxed
                    if self.set_lg >= self.lg_k - 3:
                        self._promote_to_dense([x for x in self.set_table if x])
                    else:
                        self._grow_set()
            else:
                break
        else:
            return
        # dense in-order tail: sequential HIP loop over the remainder
        rest = [c] + list(it)
        regs = bytearray(self.registers.tobytes())
        if self.kxq0 is None:
            regsf = self.registers.astype(np.float64)
            self.kxq0 = float(np.power(2.0, -regsf[self.registers < 32]).sum())
            self.kxq1 = float(np.power(2.0, -regsf[self.registers >= 32]).sum())
        kxq0, kxq1, hip = self._dense_coupon_loop(
            regs, rest, self.k, self.kxq0, self.kxq1, self.hip_accum
        )
        self.registers = np.frombuffer(bytes(regs), dtype=np.uint8).copy()
        self.kxq0, self.kxq1 = kxq0, kxq1
        self.hip_accum = hip

    # -- coupon-level API (sparse write side, `hll/sketch.rs:62-65`) --------
    # A coupon is the 32-bit (value << 26 | slot26) packing the reference
    # uses in LIST/SET mode — independent of lg_k, so coupon buffers can
    # be accumulated before a sketch (or its k-masked registers) exists.

    @staticmethod
    def coupons_from_u64s(vals: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
        h1, h2 = murmur3_x64_128_u64s(vals.astype(np.uint64, copy=False), seed)
        slot26, value = _coupons_from_h(h1, h2)
        return (value.astype(np.uint32) << np.uint32(26)) | slot26.astype(np.uint32)

    @staticmethod
    def coupons_from_bytes(items: list[bytes], seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
        buf, starts, lengths = pack_bytes(items)
        h1, h2 = murmur3_x64_128_arr(buf, starts, lengths, seed)
        slot26, value = _coupons_from_h(h1, h2)
        return (value.astype(np.uint32) << np.uint32(26)) | slot26.astype(np.uint32)

    def absorb_coupons(self, coupons: np.ndarray) -> None:
        """Fold packed coupons into the dense registers (order lost —
        this is the promotion step of the List→Set→Dense ladder, so the
        sketch goes out-of-order like any merge)."""
        self.out_of_order = True
        self.hip_accum = 0.0
        self.mode = "hll"
        self.coupon_list = None
        self.set_table = None
        self.kxq0 = self.kxq1 = None
        slot = (coupons & np.uint32(_KEY_MASK_26)).astype(np.int64) & (self.k - 1)
        value = (coupons >> np.uint32(26)).astype(np.uint8)
        np.maximum.at(self.registers, slot, value)

    @staticmethod
    def from_coupons(
        coupons: np.ndarray, lg_k: int, seed: int = DEFAULT_UPDATE_SEED
    ) -> "HllSketch":
        sk = HllSketch(lg_k, seed, out_of_order=True)
        sk.absorb_coupons(coupons)
        return sk

    # -- estimate -----------------------------------------------------------

    def raw_estimate(self) -> float:
        """Raw HLL: alpha · k² / Σ2^-reg (`estimator.rs:174-187`)."""
        k = self.k
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(self.lg_k, 0.7213 / (1.0 + 1.079 / k))
        return alpha * k * k / self._kxq()

    def _bitmap_estimate(self) -> float:
        """Linear counting via harmonic numbers
        (`estimator.rs:189-205`, `harmonic_numbers.rs:92-103`)."""
        k = self.k
        num_unhit = int((self.registers == 0).sum())
        if num_unhit == 0:
            return k * log(k / 0.5)
        num_hit = k - num_unhit
        return k * (_harmonic_number(k) - _harmonic_number(k - num_hit))

    def composite_estimate(self) -> float:
        """`estimator.rs:207-264`: cubic-interpolated raw estimate,
        blended with linear counting below the crossover."""
        from ._hll_tables import NUM_X_VALUES, X_ARRS, Y_STRIDES

        raw = self.raw_estimate()
        x_arr = X_ARRS[self.lg_k - 4]
        y_stride = float(Y_STRIDES[self.lg_k - 4])
        if raw < x_arr[0]:
            return 0.0
        last = NUM_X_VALUES - 1
        if raw > x_arr[last]:
            return raw * (y_stride * last / x_arr[last])
        adj = _interp_x_arr_y_stride(x_arr, y_stride, raw)
        k = self.k
        if adj > 3 * k:
            return adj
        lin = self._bitmap_estimate()
        crossover = {4: 0.718, 5: 0.672}.get(self.lg_k, 0.64)
        return adj if (adj + lin) / 2.0 > crossover * k else lin

    def estimate(self) -> float:
        """LIST/SET: coupon-mapping estimate (`container.rs:108-113`);
        dense: HIP when in-order, composite otherwise
        (`estimator.rs:112-121`) — merged/deserialized dense sketches
        are always composite."""
        if self.mode in ("list", "set"):
            return _coupon_estimate(self._coupon_count())
        return self.composite_estimate() if self.out_of_order else self.hip_accum

    _COUPON_RSE = 0.409 / (1 << 13)  # `hll/mod.rs:154-155`

    def upper_bound(self, num_std_dev: int = 2) -> float:
        if self.mode in ("list", "set"):
            n = self._coupon_count()
            return max(
                float(n),
                _coupon_estimate(n) / (1.0 - num_std_dev * self._COUPON_RSE),
            )
        rse = _get_rel_err(self.lg_k, True, self.out_of_order, num_std_dev)
        return self.estimate() / (1.0 + rse)

    def lower_bound(self, num_std_dev: int = 2) -> float:
        if self.mode in ("list", "set"):
            n = self._coupon_count()
            return max(
                float(n),
                _coupon_estimate(n) / (1.0 + num_std_dev * self._COUPON_RSE),
            )
        rse = _get_rel_err(self.lg_k, False, self.out_of_order, num_std_dev)
        return self.estimate() / (1.0 + rse)

    def _coupon_count(self) -> int:
        if self.mode == "list":
            return len(self.coupon_list)
        if self.mode == "set":
            return self.set_count
        raise ValueError("not in a coupon mode")

    def _coupons_in_container_order(self) -> list:
        """LIST: insertion order; SET: table-scan order — the
        serialization/promotion iteration orders of `container.iter()`."""
        if self.mode == "list":
            return list(self.coupon_list)
        return [c for c in self.set_table if c]

    def _ensure_dense(self) -> None:
        """Fold coupon-mode state into the dense registers with merge
        semantics (HIP lost) — used before union/shuffle operations."""
        if self.mode == "hll":
            return
        coupons = np.array(self._coupons_in_container_order(), dtype=np.uint32)
        self.mode = "hll"
        self.coupon_list = None
        self.set_table = None
        self.kxq0 = self.kxq1 = None
        self.absorb_coupons(coupons)

    # -- union ----------------------------------------------------------------

    def union(self, other: "HllSketch") -> "HllSketch":
        if other.seed != self.seed:
            raise ValueError("seed mismatch in HLL union")
        self._ensure_dense()
        if other.mode != "hll":
            other = HllSketch.from_coupons(
                np.array(other._coupons_in_container_order(), dtype=np.uint32),
                other.lg_k,
                other.seed,
            )
        # merged sketches lose HIP validity (`estimator.rs:286-301`)
        self.out_of_order = True
        self.hip_accum = 0.0
        self.kxq0 = self.kxq1 = None
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

    # -- serde: reference family-7 wire format -------------------------------
    # (`hll/serialization.rs`, `hll/array8.rs:256-347`,
    # `hll/sketch.rs:274-374`). ``serialize_wire``/``deserialize_wire``
    # speak the Apache DataSketches HLL layout: 8-byte header
    # [preints, serVer=1, family=7, lg_k, lg_arr, flags, state, mode]
    # then mode-specific payload. We always WRITE HLL-mode/HLL8 (the
    # engine is dense Array8) and READ LIST, SET, and HLL/HLL8 blobs;
    # HLL4/HLL6 register packings are rejected with a clear message
    # (4/6-bit nibble + aux-map decoding — not needed for interop with
    # sketches this engine writes). Note the DS wire format carries no
    # seed, so cross-impl exchange assumes the default seed — the
    # engine-internal ``serialize`` (below) keeps the seed for the
    # Spark shuffle path's compatibility checks.

    _WIRE_EMPTY, _WIRE_COMPACT, _WIRE_OOO = 4, 8, 16
    _MODE_LIST, _MODE_SET, _MODE_HLL = 0, 1, 2
    _TGT_HLL8 = 2

    def serialize_wire(self, target: str = "hll8") -> bytes:
        """``target``: 'hll8' (raw register bytes), 'hll6' (6-bit LE
        packing, `array6.rs:104-130`), or 'hll4' (cur_min-offset
        nibbles + aux coupon list for overflows, `array4.rs:118-180` —
        datasketches-java's default, the smallest wire form).

        A sketch still in LIST/SET mode writes the coupon forms
        (`hll/list.rs:105-155`, `hll/hash_set.rs:146-203`): LIST keeps
        insertion order, SET sorts its coupons; both byte-identical to
        the reference (foreign-fixture gated)."""
        tgt_code = {"hll4": 0, "hll6": 1, "hll8": 2}[target]
        if self.mode == "list":
            coupons = self.coupon_list
            flags = self._WIRE_COMPACT | (self._WIRE_EMPTY if not coupons else 0)
            out = struct.pack(
                "<BBBBBBBB", 2, 1, 7, self.lg_k, _LG_INIT_LIST, flags,
                len(coupons), self._MODE_LIST | (tgt_code << 2),
            )
            return out + np.array(coupons, dtype="<u4").tobytes()
        if self.mode == "set":
            coupons = sorted(c for c in self.set_table if c)
            out = struct.pack(
                "<BBBBBBBB", 3, 1, 7, self.lg_k, self.set_lg,
                self._WIRE_COMPACT, 0, self._MODE_SET | (tgt_code << 2),
            )
            out += struct.pack("<I", self.set_count)
            return out + np.array(coupons, dtype="<u4").tobytes()
        regs = self.registers
        if self.kxq0 is not None:
            # incremental halves from the sequential build / wire decode
            # (`estimator.rs:89-105`) — authoritative to the last ulp
            kxq0, kxq1 = self.kxq0, self.kxq1
        else:
            regsf = regs.astype(np.float64)
            kxq0 = float(np.power(2.0, -regsf[regs < 32]).sum())
            kxq1 = float(np.power(2.0, -regsf[regs >= 32]).sum())
        flags = self._WIRE_OOO if self.out_of_order else 0
        tgt = {"hll4": 0, "hll6": 1, "hll8": 2}[target]
        cur_min = 0
        aux = np.zeros(0, dtype="<u4")
        if target == "hll8":
            payload = regs.tobytes()
        elif target == "hll6":
            bits = ((regs[:, None] >> np.arange(6, dtype=np.uint8)) & 1).astype(np.uint8)
            stream = np.packbits(bits.reshape(-1), bitorder="little")
            num_bytes = ((self.k * 3) >> 2) + 1
            payload = stream.tobytes().ljust(num_bytes, b"\x00")[:num_bytes]
        else:  # hll4
            cur_min = int(regs.min())
            delta = regs.astype(np.int64) - cur_min
            over = np.flatnonzero(delta >= 15)
            nibbles = np.minimum(delta, 15).astype(np.uint8)
            payload = (nibbles[0::2] | (nibbles[1::2] << 4)).astype(np.uint8).tobytes()
            aux = (
                (regs[over].astype("<u4") << np.uint32(26)) | over.astype("<u4")
            ).astype("<u4")
        num_at_min = int((regs == cur_min).sum()) if target == "hll4" else int(
            (regs == 0).sum()
        )
        mode_byte = self._MODE_HLL | (tgt << 2)
        out = struct.pack(
            "<BBBBBBBB", 10, 1, 7, self.lg_k, 0, flags, cur_min, mode_byte
        )
        out += struct.pack("<dddII", self.hip_accum, kxq0, kxq1, num_at_min, len(aux))
        return out + payload + aux.tobytes()

    @staticmethod
    def deserialize_wire(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> "HllSketch":
        if len(data) < 8:
            raise ValueError("HLL wire bytes too short")
        preints, ver, family, lg_k, lg_arr, flags, state, mode_byte = struct.unpack_from(
            "<BBBBBBBB", data, 0
        )
        if family != 7:
            raise ValueError(f"not an HLL sketch (family {family})")
        if ver != 1:
            raise ValueError(f"unsupported HLL serial version {ver}")
        if not 4 <= lg_k <= 21:
            raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
        cur_mode = mode_byte & 0x3
        tgt = (mode_byte >> 2) & 0x3
        empty = bool(flags & HllSketch._WIRE_EMPTY)
        compact = bool(flags & HllSketch._WIRE_COMPACT)
        ooo = bool(flags & HllSketch._WIRE_OOO)
        sk = HllSketch(lg_k, seed, out_of_order=True)

        if cur_mode == HllSketch._MODE_LIST:
            if preints != 2:
                raise ValueError(f"LIST preamble ints {preints} != 2")
            if not compact and lg_arr > 8:
                # reference lists are 2^3 slots (`hll/list.rs:46`); a
                # generous 2^8 cap rejects corrupt headers before the
                # length math below trusts them
                raise ValueError(f"HLL LIST lg_arr {lg_arr} out of range")
            n = 0 if empty else (state if compact else 1 << lg_arr)
            if len(data) < 8 + 4 * n:
                raise ValueError("truncated HLL LIST coupon array")
            coupons = np.frombuffer(data, dtype="<u4", count=n, offset=8)
            # preserve LIST mode: wire order IS insertion order
            sk.mode = "list"
            sk.out_of_order = False
            sk.coupon_list = [int(c) for c in coupons if c]
            if len(sk.coupon_list) > (1 << _LG_INIT_LIST):
                # a valid list promotes at 8 coupons (`hll/sketch.rs:
                # 181-195`); more than 8 nonzero entries is corruption
                raise ValueError(
                    f"HLL LIST blob holds {len(sk.coupon_list)} coupons (max 8)"
                )
        elif cur_mode == HllSketch._MODE_SET:
            if preints != 3:
                raise ValueError(f"SET preamble ints {preints} != 3")
            if lg_k < 8 or not (_LG_INIT_SET <= lg_arr <= lg_k - 3):
                # SET mode only exists for lg_k >= 8 and its probe table
                # grows from 2^5 to at most 2^(lg_k-3) before promoting
                # to dense (`hll/sketch.rs:196-206`); an unbounded lg_arr
                # would size the table allocation below from a crafted
                # header (up to OOM) and admit counts that overflow the
                # coupon-estimate tables
                raise ValueError(
                    f"HLL SET lg_arr {lg_arr} out of range for lg_k {lg_k}"
                )
            (count,) = struct.unpack_from("<I", data, 8)
            n = count if compact else 1 << lg_arr
            if count >= (1 << lg_arr):
                # a full probe table would loop forever on the next
                # miss; valid blobs are ≤75% loaded (`hll/sketch.rs:196`)
                raise ValueError(
                    f"HLL SET coupon count {count} overflows 2^{lg_arr} table"
                )
            if len(data) < 12 + 4 * n:
                raise ValueError("truncated HLL SET coupon array")
            coupons = np.frombuffer(data, dtype="<u4", count=n, offset=12)
            # preserve SET mode; compact decode re-inserts one by one
            # (`hash_set.rs:106-121`), reproducing the probe layout
            sk.mode = "set"
            sk.out_of_order = False
            sk.set_lg = lg_arr
            sk.set_table = [0] * (1 << lg_arr)
            sk.set_count = 0
            for c in coupons:
                if c:
                    sk._set_insert(int(c))
        elif cur_mode == HllSketch._MODE_HLL:
            if preints != 10:
                raise ValueError(f"HLL preamble ints {preints} != 10")
            if len(data) < 40:
                raise ValueError("truncated HLL wire preamble")
            hip, kxq0, kxq1, _nmin, aux_count = struct.unpack_from("<dddII", data, 8)
            k = sk.k
            if tgt == HllSketch._TGT_HLL8:
                # `hll/array8.rs:256-305`: k raw register bytes
                if len(data) < 40 + k:
                    raise ValueError("truncated HLL8 register array")
                sk.registers = np.frombuffer(data, np.uint8, count=k, offset=40).copy()
            elif tgt == 1:  # HLL6 (`hll/array6.rs:72-97,182-232`)
                num_bytes = ((k * 3) >> 2) + 1
                if len(data) < 40 + num_bytes:
                    raise ValueError("truncated HLL6 register array")
                raw = np.frombuffer(data, np.uint8, count=num_bytes, offset=40)
                bits = np.unpackbits(raw, bitorder="little")[: k * 6].reshape(k, 6)
                sk.registers = (
                    bits.astype(np.uint8) << np.arange(6, dtype=np.uint8)
                ).sum(axis=1).astype(np.uint8)
            elif tgt == 0:  # HLL4 (`hll/array4.rs:78-106,300-370`)
                cur_min = state
                num_bytes = k >> 1
                if len(data) < 40 + num_bytes:
                    raise ValueError("truncated HLL4 register array")
                raw_bytes = np.frombuffer(data, np.uint8, count=num_bytes, offset=40)
                nibbles = np.empty(k, np.uint8)
                nibbles[0::2] = raw_bytes & 0x0F  # even slots: low nibble
                nibbles[1::2] = raw_bytes >> 4  # odd slots: high nibble
                regs = (cur_min + nibbles).astype(np.uint8)
                aux_covered = np.zeros(k, dtype=bool)
                if aux_count:
                    # overflow slots (raw == 15) live in the aux coupon
                    # list appended after the register array
                    off = 40 + num_bytes
                    if len(data) < off + 4 * aux_count:
                        raise ValueError("truncated HLL4 aux map")
                    aux = np.frombuffer(data, "<u4", count=aux_count, offset=off)
                    slots = (aux & np.uint32(_KEY_MASK_26)).astype(np.int64) & (k - 1)
                    vals = (aux >> np.uint32(26)).astype(np.uint8)
                    regs[slots] = vals
                    aux_covered[slots] = True
                # AUX_TOKEN nibbles without an aux entry fall back to
                # cur_min, mirroring `array4.rs:100-105`
                regs[(nibbles == 15) & ~aux_covered] = cur_min
                sk.registers = regs
            else:
                raise ValueError(f"invalid HLL target type {tgt}")
            sk.out_of_order = ooo
            sk.kxq0, sk.kxq1 = kxq0, kxq1
            if not ooo:
                sk.hip_accum = hip
        else:
            raise ValueError(f"invalid HLL mode {cur_mode}")
        return sk

    # -- serde (engine layout, seed-carrying; used for the shuffle path) ------
    # ver=1: dense — k raw register bytes.
    # ver=2: sparse — u32 coupon count + packed (value<<26|slot) coupons,
    #        the engine equivalent of the reference's LIST/SET wire modes
    #        (`hll/sketch.rs:181-210`): a 5-item key at lg_k=16 shuffles
    #        ~35 B instead of 64 KB. ``serialize`` picks whichever is
    #        smaller; both decode to identical registers (pytest-gated),
    #        and the family-7 DS wire encode above is unchanged.

    def serialize(self) -> bytes:
        if self.mode != "hll":
            # the shuffle layout is merge-semantics (registers only);
            # densify a COPY — serializing must not flip the live
            # sketch's estimator class (coupon HIP → dense composite)
            # for callers that checkpoint a partial and keep updating it
            return HllSketch.from_coupons(
                np.array(self._coupons_in_container_order(), dtype=np.uint32),
                self.lg_k,
                self.seed,
            ).serialize()
        nnz = int((self.registers != 0).sum())
        if 4 * nnz + 4 < self.k:
            slots = np.flatnonzero(self.registers)
            coupons = (
                self.registers[slots].astype(np.uint32) << np.uint32(26)
            ) | slots.astype(np.uint32)
            return serialize_coupons(coupons, self.lg_k, self.seed)
        head = struct.pack("<BBBQ", 7, 1, self.lg_k, self.seed)
        return head + self.registers.tobytes()

    @staticmethod
    def deserialize(data: bytes) -> "HllSketch":
        if len(data) < struct.calcsize("<BBBQ"):
            raise ValueError("hll sketch bytes too short")
        family, ver, lg_k, seed = struct.unpack_from("<BBBQ", data, 0)
        if family != 7:
            raise ValueError(f"not an HLL sketch (family {family})")
        if not 4 <= lg_k <= 21:
            raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
        off = struct.calcsize("<BBBQ")
        if ver == 2:  # sparse coupon list
            if len(data) < off + 4:
                raise ValueError("truncated HLL coupon count")
            (count,) = struct.unpack_from("<I", data, off)
            off += 4
            if len(data) < off + 4 * count:
                raise ValueError("truncated HLL coupon list")
            coupons = np.frombuffer(data, "<u4", count=count, offset=off)
            return HllSketch.from_coupons(coupons.astype(np.uint32), lg_k, seed)
        if ver != 1:
            raise ValueError(f"unsupported HLL engine serial version {ver}")
        if len(data) < off + (1 << lg_k):
            raise ValueError("truncated HLL register array")
        regs = np.frombuffer(data, np.uint8, count=1 << lg_k, offset=off).copy()
        # deserialized sketches are out-of-order (`estimator.rs:286-297`)
        return HllSketch(lg_k, seed, regs, out_of_order=True)


def serialize_coupons(
    coupons: np.ndarray, lg_k: int, seed: int = DEFAULT_UPDATE_SEED
) -> bytes:
    """Sparse (ver=2) engine blob straight from a coupon buffer — no
    dense 2^lg_k materialization, so a partition with 10^6 low-
    cardinality keys never allocates 10^6 × k register arrays. Coupons
    are deduplicated; multiple values per slot are fine (decode takes
    the register max)."""
    u = np.unique(np.asarray(coupons, dtype=np.uint32))
    head = struct.pack("<BBBQ", 7, 2, lg_k, seed)
    return head + struct.pack("<I", len(u)) + u.astype("<u4").tobytes()
