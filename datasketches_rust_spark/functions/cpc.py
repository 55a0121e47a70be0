"""CPC-style sketch — FM85/PCSA coupon bit-matrix implementation.

Coupon generation is semantic parity with the reference CPC
(`datasketches/src/cpc/sketch.rs:176-192`): murmur3 x64-128 (seed
9001) → row = h1 & (k − 1), col = min(leading-zeros(h2), 63);
`row_col = row<<6 | col` is one bit of a k×64 bit matrix.

State: we keep the FULL bit matrix (k uint64 words) in memory instead
of the reference's Sparse/Hybrid/Pinned/Sliding flavor ladder
(`cpc/mod.rs:59-102`) — dense state makes merge the trivial
commutative word-wise OR (`cpc/union.rs:18-62` describes the same
bit-matrix OR as its general case), exactly Spark's partial/final
aggregation contract. This matches the reference's own union, which
also accumulates a plain bit matrix and only materializes the
flavored representation on output (`cpc/union.rs:141-209`).

Serialization is two-layer, like HLL:

* the ENGINE layout (``serialize``/``deserialize`` below) for the
  Spark shuffle path — seed-carrying, dense or sparse-coupon chosen
  by size;
* the reference FM85 compressed WIRE format
  (``serialize_wire``/``deserialize_wire``, functions/cpc_wire.py) —
  byte-compatible with Apache DataSketches java/cpp/rust for
  cross-system checkpoint exchange (round 3; the flavor ladder and
  entropy coder live there, where the wire is the point).

Estimator: the reference's ICON estimator, ported exactly
(`cpc/estimator.rs:236-429`): N̂ = f(lg_k, num_coupons) via the
degree-19 characterization polynomials (published Apache DataSketches
constants, see _cpc_tables.py) below C = 5.6-5.7·k and the exponential
approximation 0.794·k·2^(C/k) above. ICON's input is only the count of
distinct (row, col) coupons — exactly popcount(bit matrix) here — so
it applies to the dense state unchanged. This is the reference's
*post-merge* estimator and applies whenever ``merge_flag`` is set —
i.e. on every sketch in the Spark agg topology.  The sequential HIP
accumulator (`cpc/sketch.rs:210-338`) IS ported for the single-stream
``update_*`` path (round 4): an un-merged sketch maintains
kxp/hip_est_accum/window_offset/first_interesting_column with the
reference's exact per-coupon schedule (including the every-8th-offset
kxp refresh, `cpc/sketch.rs:391-411`), reproduces its estimates to
the last bit, and serializes the HIP block on the wire
(`tests/test_foreign_fixtures.py` gates byte parity on blobs written
by the reference crate itself).
Bounds use the measured kappa tables for lg_k <= 14 and the ln2-based
constants above (`cpc/estimator.rs:93-212`). Meets the reference's
own gate: 2% at lg_k=11, n=10k (`cpc_update_test.rs:25,49-62`).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from ..hashes import (
    DEFAULT_UPDATE_SEED,
    murmur3_x64_128_arr,
    murmur3_x64_128_u64s,
    pack_bytes,
)

_U64 = np.uint64
_LN2 = 0.6931471805599453  # ICON_ERROR_CONSTANT (`cpc/estimator.rs:22`)


def icon_estimate(lg_k: int, num_coupons: int) -> float:
    """The ICON estimator (`cpc/estimator.rs:391-429`): maps the count
    of distinct coupons C to N̂ via the degree-19 characterization
    polynomial of C/(2k) below the 5.6-5.7·k threshold, and the
    exponential approximation 0.7940236163830469·k·2^(C/k) above."""
    from ._cpc_tables import ICON_POLYNOMIAL_COEFFICIENTS

    if not 4 <= lg_k <= 26:
        raise ValueError(f"lg_k out of range; got {lg_k}")
    if num_coupons == 0:
        return 0.0
    if num_coupons == 1:
        return 1.0
    k = float(1 << lg_k)
    c = float(num_coupons)
    threshold_factor = 5.7 if lg_k < 14 else 5.6
    if c > threshold_factor * k:
        return 0.7940236163830469 * k * 2.0 ** (c / k)
    coeffs = ICON_POLYNOMIAL_COEFFICIENTS[lg_k - 4]
    # Horner, highest degree first (`evaluate_polynomial`, :377-385)
    x = c / (2.0 * k)
    factor = 0.0
    for a in coeffs[::-1]:
        factor = factor * x + a
    ratio = c / k
    result = c * factor * (1.0 + ratio * ratio * ratio / 66.774757)
    return max(result, c)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros (shared frexp kernel)."""
    from ..hashes import clz64

    return clz64(x)


def _kxp_byte_table() -> list[float]:
    """`cpc/kxp_byte_lookup.rs`: table[b] = Σ over ZERO bits i of b of
    2^-(i+1) — all dyadic, so recomputation is exactly the reference
    constants."""
    return [
        sum(2.0 ** -(i + 1) for i in range(8) if not (b >> i) & 1) for b in range(256)
    ]


_KXP_BYTE = _kxp_byte_table()
_INV_POW2 = [2.0**-i for i in range(65)]  # INVERSE_POWERS_OF_2


@dataclass
class CpcSketch:
    lg_k: int = 11
    seed: int = DEFAULT_UPDATE_SEED
    matrix: np.ndarray = field(default=None)  # uint64, length k
    # -- HIP state (`cpc/sketch.rs:81-127`): live only while the sketch
    # has never been merged (merge_flag False). A fresh sketch starts
    # un-merged like the reference's new(); absorb_coupons/union flip
    # merge_flag and the estimator to ICON.
    merge_flag: bool = field(default=None)
    kxp: float = 0.0
    hip_est_accum: float = 0.0
    window_offset: int = 0
    first_interesting_column: int = 0

    def __post_init__(self) -> None:
        if not 4 <= self.lg_k <= 26:
            raise ValueError("lg_k must be in [4, 26]")
        if self.matrix is None:
            self.matrix = np.zeros(1 << self.lg_k, dtype=np.uint64)
            if self.merge_flag is None:
                self.merge_flag = False
                self.kxp = float(1 << self.lg_k)
        elif self.merge_flag is None:
            # constructed straight from a matrix: HIP history unknown
            self.merge_flag = True

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def _absorb(self, h1: np.ndarray, h2: np.ndarray) -> None:
        rows = (h1 & _U64(self.k - 1)).astype(np.int64)
        cols = np.minimum(_clz64(h2), 63).astype(np.uint64)
        if not self.merge_flag:
            # Exactness-preserving pre-filter: a coupon whose matrix
            # bit is already set causes NO state change in the
            # sequential schedule (it exits via the col<fic fast path
            # or the novelty check, both side-effect-free), and update
            # never clears bits — so dropping those up front leaves
            # every surviving update's view of the state identical.
            novel = (self.matrix[rows] & (_U64(1) << cols)) == 0
            if not novel.all():
                rows = rows[novel]
                cols = cols[novel]
            self._update_sequential(rows, cols.astype(np.int64))
        else:
            np.bitwise_or.at(self.matrix, rows, _U64(1) << cols)

    def _refresh_kxp_from(self, rows: list[int]) -> float:
        """`cpc/sketch.rs:391-411`: byte-bucketed sums in row order,
        then combined highest byte first — bit-exact float schedule."""
        byte_sums = [0.0] * 8
        for w in rows:
            for j in range(8):
                byte_sums[j] += _KXP_BYTE[(w >> (8 * j)) & 0xFF]
        total = 0.0
        for i in range(7, -1, -1):
            total += _INV_POW2[i * 8] * byte_sums[i]
        return total

    def _update_sequential(self, rows: np.ndarray, cols: np.ndarray) -> None:
        """The reference's exact single-stream update schedule
        (`cpc/sketch.rs:210-338`): per-novel-coupon HIP accumulation,
        sparse→windowed promotion at 32C ≥ 3K, window shifts at
        8C ≥ (27 + 8·offset)·K with a kxp refresh every 8th offset and
        a first_interesting_column recompute per shift."""
        k = self.k
        m = [int(x) for x in self.matrix]
        c = self.num_coupons()
        kxp = self.kxp
        hip = self.hip_est_accum
        offset = self.window_offset
        fic = self.first_interesting_column
        windowed = 32 * c >= 3 * k
        mask64 = (1 << 64) - 1
        for row, col in zip(rows.tolist(), cols.tolist()):
            if col < fic:
                continue  # `row_col_update` fast path
            bit = 1 << col
            w = m[row]
            if w & bit:
                continue  # not novel
            m[row] = w | bit
            c += 1
            hip += k / kxp
            kxp -= _INV_POW2[col + 1]
            if not windowed:
                if (c << 5) >= 3 * k:
                    windowed = True  # promote_sparse_to_windowed
            elif (c << 3) >= (27 + (offset << 3)) * k:
                offset += 1  # move_window
                if (offset & 7) == 0:
                    kxp = self._refresh_kxp_from(m)
                mask_clear = ~(0xFF << offset) & mask64
                mask_flip = (1 << offset) - 1
                ored = 0
                for p in m:
                    ored |= (p & mask_clear) ^ mask_flip
                tz = (ored & -ored).bit_length() - 1 if ored else 64
                fic = min(tz, offset)
        self.matrix = np.array(m, dtype=np.uint64)
        self.kxp = kxp
        self.hip_est_accum = hip
        self.window_offset = offset
        self.first_interesting_column = fic

    def update_u64s(self, vals: np.ndarray) -> None:
        h1, h2 = murmur3_x64_128_u64s(vals.astype(np.uint64, copy=False), self.seed)
        self._absorb(h1, h2)

    def update_bytes(self, items: list[bytes]) -> None:
        buf, starts, lengths = pack_bytes(items)
        h1, h2 = murmur3_x64_128_arr(buf, starts, lengths, self.seed)
        self._absorb(h1, h2)

    def update_strings(self, items: list[str]) -> None:
        self.update_bytes([s.encode("utf-8") for s in items])

    # -- coupon-level API (sparse write side, like the reference's
    # Sparse flavor `cpc/mod.rs:59-102`). A coupon packs the full
    # 26-bit row with the column: (row26 << 6 | col), lg_k-independent
    # (row is masked to k on absorb), mirroring the HLL coupon design.

    @staticmethod
    def coupons_from_u64s(vals: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
        h1, h2 = murmur3_x64_128_u64s(vals.astype(np.uint64, copy=False), seed)
        return CpcSketch._pack_coupons(h1, h2)

    @staticmethod
    def coupons_from_bytes(items: list[bytes], seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
        buf, starts, lengths = pack_bytes(items)
        h1, h2 = murmur3_x64_128_arr(buf, starts, lengths, seed)
        return CpcSketch._pack_coupons(h1, h2)

    @staticmethod
    def _pack_coupons(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        row26 = (h1 & _U64((1 << 26) - 1)).astype(np.uint32)
        col = np.minimum(_clz64(h2), 63).astype(np.uint32)
        return (row26 << np.uint32(6)) | col

    def absorb_coupons(self, coupons: np.ndarray) -> None:
        # bulk coupon ingestion is merge semantics: HIP history is
        # unknowable, so the estimator switches to ICON (`union.rs`)
        self.merge_flag = True
        self.hip_est_accum = 0.0
        rows = ((coupons >> np.uint32(6)).astype(np.int64)) & (self.k - 1)
        cols = (coupons & np.uint32(63)).astype(np.uint64)
        np.bitwise_or.at(self.matrix, rows, _U64(1) << cols)

    @staticmethod
    def from_coupons(
        coupons: np.ndarray, lg_k: int, seed: int = DEFAULT_UPDATE_SEED
    ) -> "CpcSketch":
        sk = CpcSketch(lg_k, seed)
        sk.absorb_coupons(coupons)
        return sk

    # -- estimate: ICON (`cpc/estimator.rs:236-429`) ------------------------

    def num_coupons(self) -> int:
        """Count of distinct (row, col) coupons = set bits."""
        from ..hashes import popcount_u64

        return popcount_u64(self.matrix)

    def estimate(self) -> float:
        """HIP for a never-merged update-path sketch, ICON otherwise
        (`cpc/sketch.rs:137-141`)."""
        if not self.merge_flag:
            return self.hip_est_accum
        return icon_estimate(self.lg_k, self.num_coupons())

    def upper_bound(self, num_std_dev: int = 2) -> float:
        """`icon_confidence_ub` (`cpc/estimator.rs:155-174`): measured
        kappa table (low-side data) below lg_k 15, ln2 above; ceil for
        conservative coverage."""
        from math import ceil

        from ._cpc_tables import ICON_LOW_SIDE_DATA

        c = self.num_coupons()
        if c == 0:
            return 0.0
        x = _LN2
        if self.lg_k <= 14:
            x = float(ICON_LOW_SIDE_DATA[3 * (self.lg_k - 4) + (num_std_dev - 1)]) / 10000.0
        eps = num_std_dev * x / np.sqrt(self.k)
        return float(ceil(icon_estimate(self.lg_k, c) / (1.0 - eps)))

    def lower_bound(self, num_std_dev: int = 2) -> float:
        """`icon_confidence_lb` (`cpc/estimator.rs:128-153`)."""
        from ._cpc_tables import ICON_HIGH_SIDE_DATA

        c = self.num_coupons()
        if c == 0:
            return 0.0
        x = _LN2
        if self.lg_k <= 14:
            x = float(ICON_HIGH_SIDE_DATA[3 * (self.lg_k - 4) + (num_std_dev - 1)]) / 10000.0
        eps = num_std_dev * x / np.sqrt(self.k)
        return max(float(c), icon_estimate(self.lg_k, c) / (1.0 + eps))

    # -- union (`cpc/union.rs:18-62`: bit-matrix OR general case) -----------

    def union(self, other: "CpcSketch") -> "CpcSketch":
        if other.seed != self.seed:
            raise ValueError("seed mismatch in CPC union")
        self.merge_flag = True
        self.hip_est_accum = 0.0
        if other.lg_k == self.lg_k:
            np.bitwise_or(self.matrix, other.matrix, out=self.matrix)
            return self
        # downsample the larger-k side by row folding (K-reduction:
        # row' = row mod k_small keeps the coupon distribution)
        if other.lg_k > self.lg_k:
            folded = np.bitwise_or.reduce(other.matrix.reshape(-1, self.k), axis=0)
            np.bitwise_or(self.matrix, folded, out=self.matrix)
            return self
        folded = np.bitwise_or.reduce(self.matrix.reshape(-1, other.k), axis=0)
        self.lg_k = other.lg_k
        self.matrix = np.bitwise_or(folded, other.matrix)
        return self

    # -- serde (reference FM85 compressed wire format) ----------------------

    def serialize_wire(self) -> bytes:
        """Apache DataSketches CPC wire bytes (`cpc/sketch.rs:452-509`,
        functions/cpc_wire.py) — readable by java/cpp/rust."""
        from .cpc_wire import serialize_wire

        return serialize_wire(self)

    @staticmethod
    def deserialize_wire(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> "CpcSketch":
        from .cpc_wire import deserialize_wire

        return deserialize_wire(data, seed)

    # -- serde (family 16 tag; engine layout) -------------------------------
    # ver=1: dense — k uint64 matrix words.
    # ver=2: sparse — u32 coupon count + packed (row<<6|col) coupons,
    #        the engine analog of the reference's Sparse flavor: a key
    #        with 10 items shuffles ~55 B instead of 8·k bytes.
    #        ``serialize`` picks whichever is smaller; both decode to
    #        identical matrices (pytest-gated).

    def serialize(self) -> bytes:
        ncoup = self.num_coupons()
        if 4 * ncoup + 4 < 8 * self.k:
            rows_nz = np.flatnonzero(self.matrix)
            bits = (
                (self.matrix[rows_nz, None] >> np.arange(64, dtype=np.uint64)) & _U64(1)
            ).astype(bool)
            r_idx, c_idx = np.nonzero(bits)
            coupons = (rows_nz[r_idx].astype(np.uint32) << np.uint32(6)) | c_idx.astype(
                np.uint32
            )
            return serialize_cpc_coupons(coupons, self.lg_k, self.seed)
        head = struct.pack("<BBBQ", 16, 1, self.lg_k, self.seed)
        return head + self.matrix.tobytes()

    @staticmethod
    def deserialize(data: bytes) -> "CpcSketch":
        if len(data) < struct.calcsize("<BBBQ"):
            raise ValueError("cpc sketch bytes too short")
        family, ver, lg_k, seed = struct.unpack_from("<BBBQ", data, 0)
        if not 4 <= lg_k <= 26:
            raise ValueError(f"lg_k must be in [4, 26], got {lg_k}")
        if family != 16:
            raise ValueError(f"not a CPC sketch (family {family})")
        off = struct.calcsize("<BBBQ")
        if ver == 2:  # sparse coupon list
            if len(data) < off + 4:
                raise ValueError("truncated CPC coupon count")
            (count,) = struct.unpack_from("<I", data, off)
            off += 4
            if len(data) < off + 4 * count:
                raise ValueError("truncated CPC coupon list")
            coupons = np.frombuffer(data, "<u4", count=count, offset=off)
            return CpcSketch.from_coupons(coupons.astype(np.uint32), lg_k, seed)
        if ver != 1:
            raise ValueError(f"unsupported CPC engine serial version {ver}")
        if len(data) < off + (1 << lg_k) * 8:
            raise ValueError("truncated CPC bit matrix")
        mat = np.frombuffer(data, np.uint64, count=1 << lg_k, offset=off).copy()
        return CpcSketch(lg_k, seed, mat)


def serialize_cpc_coupons(
    coupons: np.ndarray, lg_k: int, seed: int = DEFAULT_UPDATE_SEED
) -> bytes:
    """Sparse (ver=2) engine blob straight from a coupon buffer — no
    dense k×8-byte matrix materialization at emit time."""
    u = np.unique(np.asarray(coupons, dtype=np.uint32))
    head = struct.pack("<BBBQ", 16, 2, lg_k, seed)
    return head + struct.pack("<I", len(u)) + u.astype("<u4").tobytes()
