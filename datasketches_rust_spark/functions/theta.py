"""Theta (bottom-k / KMV) sketch — NumPy kernel + Spark aggregation glue.

Reimplements the query semantics of the reference theta sketch
(`datasketches/src/theta/sketch.rs`, `hash_table.rs`) as an
order-insensitive *batch* kernel suitable for Spark partial/final
aggregation:

* hashing: murmur3 x64-128 (seed 9001 default), ``h1 >> 1``
  (`datasketches/src/theta/hash_table.rs:123-128`), screen
  ``hash == 0 || hash >= theta`` (`hash_table.rs:179-181`);
* state: the canonical *trimmed compact* form — the ``<= k`` smallest
  distinct hash values with ``theta`` = (k+1)-th smallest distinct hash
  when more than k are present (KMV), else ``MAX_THETA``. This equals
  the reference sketch after ``trim()`` + ``compact(true)``
  (`hash_table.rs:249-284` sets theta := k-th order statistic and keeps
  entries < theta). Untrimmed streaming sketches may retain a few more
  entries than k; we always maintain the trimmed canonical form so the
  state is a pure function of the input *set* — exactly the
  commutative/associative/idempotent merge contract Spark's partial+
  final aggregation requires.
* estimate: ``num_retained / (theta / MAX_THETA)``
  (`theta/sketch.rs:394-405`); exact mode (theta == MAX_THETA) equals
  COUNT(DISTINCT ...) → DuckDB-oracle-checkable.
* union: concat entries, theta := min(thetas), re-trim to k — the
  semantics implied by the reference model (`theta/mod.rs:48-52`
  exports no union; SURVEY.md §A.2).
* intersection: keep common hashes under min(theta)
  (`datasketches/src/theta/intersection.rs:64-196`), sorted-array
  intersect since our canonical entries are always sorted (the
  ordered-input early-exit trick of `intersection.rs:152-154`).
* serialization: byte-compatible with the reference wire formats —
  *uncompressed compact v3* encode/decode (`theta/sketch.rs:501-534`),
  *compressed v4* encode/decode (delta + MSB-first bit-packing,
  `theta/sketch.rs:536-617,829-914`, `theta/bit_pack.rs:36-158` — the
  generated pack_bits_N tables are unrolled MSB-first streams, which
  ``np.packbits``/``np.unpackbits`` reproduce exactly, vectorized),
  and legacy v1/v2 decode (`theta/sketch.rs:672-775`). ``deserialize``
  dispatches on the serial-version byte like the reference
  (`theta/sketch.rs:638-654`); ``serialize_compressed`` applies the
  same suitability rule (`theta/sketch.rs:486-499`).
* bounds: FULL port of the reference binomial confidence bounds
  (`datasketches/src/common/binomial_bounds.rs:288-560`): the closed
  forms (theta==1, n==0, n==1, n>120 Gaussian with continuity
  correction) AND the mid-range 2 <= n <= 120 machinery — the
  equivalent-sigma tables (extracted public constants, see
  _binomial_tables.py) for theta < n/360, and the exact Bayesian
  searches ``special_n_star`` / ``special_n_prime_f`` for the
  hardest-to-approximate band in between.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from math import ceil, floor, log, sqrt

import numpy as np
import pandas as pd

from ..config import MAX_THETA, ThetaConfig
from ..hashes import (
    pack_bytes,
    theta_hash_bytes,
    theta_hash_f64s,
    theta_hash_u64s,
)

_FAMILY_THETA = 3
_SERIAL_VERSION = 3  # uncompressed (`theta/serialization.rs:20`)
_SERIAL_VERSION_V4 = 4  # compressed (`theta/serialization.rs:21`)
_FLAG_READ_ONLY = 1 << 1
_FLAG_EMPTY = 1 << 2
_FLAG_COMPACT = 1 << 3
_FLAG_ORDERED = 1 << 4
# v2 preamble-longs sentinels (`theta/serialization.rs:23-25`)
_V2_PRE_EMPTY, _V2_PRE_PRECISE, _V2_PRE_ESTIMATE = 1, 2, 3


def _pack_bits(values: np.ndarray, bits: int) -> bytes:
    """MSB-first bitstream of ``bits``-wide values — byte-identical to
    the reference's ``pack_bits_block``/``BitPacker`` stream
    (`theta/bit_pack.rs:65-97,161-…`): each value's bits are written
    high-bit first, consecutively; the final partial byte is
    zero-padded in its low bits."""
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    bitmat = ((values[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bitmat.reshape(-1)).tobytes()


def _unpack_bits(data: bytes, n: int, bits: int) -> np.ndarray:
    """Inverse of :func:`_pack_bits` (`theta/bit_pack.rs:107-158`)."""
    need = (n * bits + 7) // 8
    if len(data) < need:
        raise ValueError("truncated theta v4 delta stream")
    arr = np.frombuffer(data, np.uint8, count=need)
    bitstream = np.unpackbits(arr)[: n * bits].reshape(n, bits).astype(np.uint64)
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    return (bitstream << shifts).sum(axis=1, dtype=np.uint64)


@dataclass(frozen=True)
class ThetaSketch:
    """Immutable canonical (trimmed, ordered, compact) theta sketch."""

    entries: np.ndarray  # sorted uint64, all < theta, none zero
    theta: int  # in (0, MAX_THETA]
    seed_hash: int
    k: int

    # -- construction -------------------------------------------------------

    @staticmethod
    def empty(cfg: ThetaConfig) -> "ThetaSketch":
        return ThetaSketch(np.zeros(0, np.uint64), MAX_THETA, cfg.seed_hash, cfg.k)

    @staticmethod
    def from_hashes(hashes: np.ndarray, cfg: ThetaConfig) -> "ThetaSketch":
        """Build from precomputed theta-convention hashes (h1 >> 1).

        With ``cfg.sampling_p < 1`` the initial theta is p*MAX_THETA —
        uniform pre-sampling (`theta/hash_table.rs:400-406`)."""
        return _canonicalize(hashes, cfg.starting_theta, cfg.k, cfg.seed_hash)

    @staticmethod
    def from_hashes_sequential(hashes: np.ndarray, cfg: ThetaConfig) -> "ThetaSketch":
        """Insertion-order build with the reference's staged-rebuild
        schedule (`theta/hash_table.rs:196-278`): the table rebuilds —
        trimming to the k smallest and lowering theta to the (k+1)-th —
        only when retained crosses ``15/16 · 2^(lg_k+1)``
        (`theta/mod.rs:65`), so a compact() of a freshly built sketch
        can legitimately retain MORE than k entries.  Byte-for-byte
        reproduces the reference's single-threaded update loop (resizes
        below the max table size are lossless and need no emulation).

        The distributed agg path stays on :meth:`from_hashes`
        (order-independent bottom-k canonicalization) on purpose:
        partition arrival order is not deterministic on a cluster, and
        an order-dependent build would make distributed estimates
        nondeterministic."""
        rebuild_at = (15 * (1 << (cfg.lg_k + 1))) // 16  # rebuild when count exceeds this
        k = cfg.k
        theta = np.uint64(cfg.starting_theta)
        h = hashes.astype(np.uint64, copy=False)
        retained = np.zeros(0, np.uint64)
        pos = 0
        while pos < len(h):
            cand = h[pos:]
            cand = cand[(cand != 0) & (cand < theta)]
            # in-order first occurrences, minus values already retained
            cand = pd.unique(cand)
            if len(retained):
                cand = cand[~np.isin(cand, retained)]
            room = rebuild_at + 1 - len(retained)
            if len(cand) < room:
                retained = np.concatenate([retained, cand])
                break
            # the room-th novel insert crosses the threshold -> rebuild
            retained = np.concatenate([retained, cand[:room]])
            full = np.sort(retained)
            theta = full[k]  # (k+1)-th smallest becomes the new theta
            retained = full[:k]
            pos = len(h)  # re-derive the remaining queue below
            remaining = cand[room:]
            h = remaining
            pos = 0
        return ThetaSketch(np.sort(retained), int(theta), cfg.seed_hash, cfg.k)

    @staticmethod
    def from_u64s(vals: np.ndarray, cfg: ThetaConfig) -> "ThetaSketch":
        return ThetaSketch.from_hashes_sequential(theta_hash_u64s(vals, cfg.seed), cfg)

    @staticmethod
    def from_f64s(vals: np.ndarray, cfg: ThetaConfig) -> "ThetaSketch":
        """Float update path: canonical_double then u64 hashing
        (`theta/sketch.rs:134-152`, `common/mod.rs:31-41`) — NaN/−0.0
        items hash reference-identically."""
        return ThetaSketch.from_hashes_sequential(theta_hash_f64s(vals, cfg.seed), cfg)

    @staticmethod
    def from_byte_items(items: list[bytes], cfg: ThetaConfig) -> "ThetaSketch":
        buf, starts, lengths = pack_bytes(items)
        return ThetaSketch.from_hashes_sequential(
            theta_hash_bytes(buf, starts, lengths, cfg.seed), cfg
        )

    @staticmethod
    def from_strings(items: list[str], cfg: ThetaConfig) -> "ThetaSketch":
        return ThetaSketch.from_byte_items([s.encode("utf-8") for s in items], cfg)

    # -- queries -------------------------------------------------------------

    def is_empty(self) -> bool:
        return len(self.entries) == 0 and self.theta == MAX_THETA

    def is_estimation_mode(self) -> bool:
        return self.theta < MAX_THETA

    def estimate(self) -> float:
        if self.is_empty():
            return 0.0
        n = float(len(self.entries))
        if self.theta == MAX_THETA:
            return n
        return n / (self.theta / MAX_THETA)

    def lower_bound(self, num_std_dev: int = 2) -> float:
        return _binomial_lower_bound(len(self.entries), self.theta / MAX_THETA, num_std_dev)

    def upper_bound(self, num_std_dev: int = 2) -> float:
        return _binomial_upper_bound(
            len(self.entries), self.theta / MAX_THETA, num_std_dev, self.is_empty()
        )

    # -- serde (v3 uncompressed compact) -------------------------------------

    def serialize(self) -> bytes:
        est = self.is_estimation_mode()
        n = len(self.entries)
        if est:
            pre_longs = 3
        elif self.is_empty() or n == 1:
            pre_longs = 1
        else:
            pre_longs = 2
        flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
        if self.is_empty():
            flags |= _FLAG_EMPTY
        out = bytearray()
        out += struct.pack(
            "<BBBHBH", pre_longs, _SERIAL_VERSION, _FAMILY_THETA, 0, flags, self.seed_hash
        )
        if pre_longs > 1:
            out += struct.pack("<I", n)
            out += b"\x00\x00\x00\x00"
        if est:
            out += struct.pack("<Q", self.theta)
        out += self.entries.astype("<u8").tobytes()
        return bytes(out)

    def serialize_compressed(self) -> bytes:
        """serVer 4 when ordered + compressible, else v3 — same
        suitability rule as `theta/sketch.rs:486-499`."""
        n = len(self.entries)
        if n == 0 or (n == 1 and not self.is_estimation_mode()):
            return self.serialize()
        return self._serialize_v4()

    def _serialize_v4(self) -> bytes:
        """Compressed compact layout (`theta/sketch.rs:536-601`):
        [pre_longs, 4, family, entry_bits, num_entries_bytes, flags,
        seed_hash(LE u16)] + theta(LE u64, estimation only) +
        num_entries (LE, num_entries_bytes wide) + delta bitstream."""
        est = self.is_estimation_mode()
        pre_longs = 2 if est else 1
        entries = self.entries.astype(np.uint64)
        deltas = np.diff(entries, prepend=np.uint64(0))
        ored = int(np.bitwise_or.reduce(deltas)) if len(deltas) else 0
        entry_bits = max(ored.bit_length(), 0)
        n = len(entries)
        num_entries_bytes = (n.bit_length() + 7) // 8
        flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
        out = bytearray()
        out += struct.pack(
            "<BBBBBBH",
            pre_longs,
            _SERIAL_VERSION_V4,
            _FAMILY_THETA,
            entry_bits,
            num_entries_bytes,
            flags,
            self.seed_hash,
        )
        if est:
            out += struct.pack("<Q", self.theta)
        out += n.to_bytes(num_entries_bytes, "little")
        out += _pack_bits(deltas, entry_bits)
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes, cfg: ThetaConfig) -> "ThetaSketch":
        """Dispatch on the serial-version byte, accepting v1-v4 like
        the reference (`theta/sketch.rs:638-654`)."""
        if len(data) < 8:
            raise ValueError("theta sketch bytes too short")
        pre_longs, ser_ver, family = data[0], data[1], data[2]
        if family != _FAMILY_THETA:
            raise ValueError(f"not a theta sketch (family {family})")
        if ser_ver == 1:
            return ThetaSketch._deserialize_v1(data, cfg)
        if ser_ver == 2:
            return ThetaSketch._deserialize_v2(data, cfg)
        if ser_ver == _SERIAL_VERSION:
            return ThetaSketch._deserialize_v3(data, cfg)
        if ser_ver == _SERIAL_VERSION_V4:
            return ThetaSketch._deserialize_v4(data, cfg)
        raise ValueError(f"unsupported theta serial version {ser_ver}")

    @staticmethod
    def _read_entries(data: bytes, off: int, n: int, theta: int, cfg: ThetaConfig) -> np.ndarray:
        if len(data) < off + n * 8:
            raise ValueError("truncated theta sketch entries")
        entries = np.frombuffer(data, dtype="<u8", count=n, offset=off).astype(np.uint64)
        if (entries == 0).any() or (entries >= theta).any():
            raise ValueError("theta entry out of range (0, theta)")
        return entries

    @staticmethod
    def _deserialize_v1(data: bytes, cfg: ThetaConfig) -> "ThetaSketch":
        """Legacy v1 (`theta/sketch.rs:672-708`): no seed hash stored —
        trusted to be cfg.seed; 24-byte preamble then entries."""
        if len(data) < 24:
            raise ValueError("truncated theta v1 preamble")
        n, _u, theta = struct.unpack_from("<IIQ", data, 8)
        if n == 0 and theta == MAX_THETA:
            return ThetaSketch.empty(cfg)
        entries = ThetaSketch._read_entries(data, 24, n, theta, cfg)
        entries = np.sort(entries)
        return ThetaSketch(entries, int(theta), cfg.seed_hash, cfg.k)

    @staticmethod
    def _deserialize_v2(data: bytes, cfg: ThetaConfig) -> "ThetaSketch":
        """Legacy v2 (`theta/sketch.rs:710-775`): preamble_longs selects
        empty/precise/estimate layout; seed hash at bytes 6-7."""
        pre_longs = data[0]
        (seed_hash,) = struct.unpack_from("<H", data, 6)
        if seed_hash != cfg.seed_hash:
            raise ValueError(f"seed hash mismatch: {seed_hash} != {cfg.seed_hash}")
        if pre_longs == _V2_PRE_EMPTY:
            return ThetaSketch.empty(cfg)
        if pre_longs == _V2_PRE_PRECISE:
            (n,) = struct.unpack_from("<I", data, 8)
            entries = ThetaSketch._read_entries(data, 16, n, MAX_THETA, cfg)
            return ThetaSketch(np.sort(entries), MAX_THETA, seed_hash, cfg.k)
        if pre_longs == _V2_PRE_ESTIMATE:
            n, _u, theta = struct.unpack_from("<IIQ", data, 8)
            entries = ThetaSketch._read_entries(data, 24, n, theta, cfg)
            return ThetaSketch(np.sort(entries), int(theta), seed_hash, cfg.k)
        raise ValueError(f"invalid v2 preamble longs {pre_longs}")

    @staticmethod
    def _deserialize_v3(data: bytes, cfg: ThetaConfig) -> "ThetaSketch":
        pre_longs, ser_ver, family, _unused, flags, seed_hash = struct.unpack_from(
            "<BBBHBH", data, 0
        )
        if flags & _FLAG_EMPTY:
            return ThetaSketch.empty(cfg)
        if seed_hash != cfg.seed_hash:
            raise ValueError(f"seed hash mismatch: {seed_hash} != {cfg.seed_hash}")
        if len(data) < pre_longs * 8:
            raise ValueError("truncated theta sketch preamble")
        off = 8
        if pre_longs == 1:
            n = 1
            theta = MAX_THETA
        else:
            (n,) = struct.unpack_from("<I", data, off)
            off += 8
            theta = MAX_THETA
            if pre_longs >= 3:
                (theta,) = struct.unpack_from("<Q", data, off)
                off += 8
        entries = ThetaSketch._read_entries(data, off, n, theta, cfg)
        # direct comparison, not np.diff: an unsigned diff of a
        # DECREASING pair wraps to a huge positive and never fires
        if n > 1 and (entries[1:] <= entries[:-1]).any():
            raise ValueError("theta entries not strictly increasing")
        return ThetaSketch(entries, int(theta), seed_hash, cfg.k)

    @staticmethod
    def _deserialize_v4(data: bytes, cfg: ThetaConfig) -> "ThetaSketch":
        """Compressed v4 decode (`theta/sketch.rs:829-914`)."""
        pre_longs, _sv, _fam, entry_bits, num_entries_bytes, flags = struct.unpack_from(
            "<BBBBBB", data, 0
        )
        (seed_hash,) = struct.unpack_from("<H", data, 6)
        if not flags & _FLAG_EMPTY and seed_hash != cfg.seed_hash:
            raise ValueError(f"seed hash mismatch: {seed_hash} != {cfg.seed_hash}")
        off = 8
        theta = MAX_THETA
        if pre_longs > 1:
            if len(data) < off + 8:
                raise ValueError("truncated theta v4 preamble")
            (theta,) = struct.unpack_from("<Q", data, off)
            off += 8
        if len(data) < off + num_entries_bytes:
            raise ValueError("truncated theta v4 entry count")
        n = int.from_bytes(data[off : off + num_entries_bytes], "little")
        off += num_entries_bytes
        deltas = _unpack_bits(data[off:], n, entry_bits)
        entries = np.cumsum(deltas, dtype=np.uint64)
        if len(entries) and ((entries == 0).any() or (entries >= theta).any()):
            raise ValueError("theta entry out of range (0, theta)")
        # a zero delta (corrupt blob) yields duplicate entries, and a
        # near-2^64 delta wraps cumsum into a DECREASING pair that an
        # unsigned np.diff would miss — both pass the range check but
        # violate the sorted-distinct invariant union/intersect/estimate
        # rely on; direct comparison catches both
        if len(entries) > 1 and (entries[1:] <= entries[:-1]).any():
            raise ValueError("theta entries not strictly increasing")
        return ThetaSketch(entries, int(theta), seed_hash, cfg.k)


def hash_series(vals, cfg: ThetaConfig, integral: bool | None = None) -> np.ndarray:
    """Theta-convention hashes for a pandas Series / array batch with
    the reference's typed update dispatch: integers as 8 LE bytes
    (`theta/sketch.rs:118-132` update_u64), floats via canonical_double
    then the u64 path (`theta/sketch.rs:134-152`, `common/mod.rs:31-41`),
    everything else as utf-8 strings. The single source of truth for
    BOTH the DataFrame operators (operators/sketch_aggs.py) and the SQL
    surface (functions/sql_registry.py), so sketches built over the
    same data by either surface — or by another DataSketches
    implementation — hash identically and union correctly.

    ``integral``: the DECLARED column type when the caller knows it.
    Arrow delivers an integer batch that contains a NULL as float64
    (the no-null batches of the same column stay int64), so
    dtype-sniffing alone would hash the same BIGINT value via the
    u64 path in one group and the canonical-double path in another —
    the sketches would then union as if the values differed. DataFrame
    operators pass ``integral`` from the Spark schema; the SQL surface
    (which never sees the declared type) documents the hazard and
    tells users to cast."""
    import pandas as pd

    if isinstance(vals, pd.Series):
        vals = vals.dropna()
    arr = np.asarray(vals)
    if arr.dtype.kind in ("i", "u") or (integral and arr.dtype.kind == "f"):
        return theta_hash_u64s(arr.astype(np.int64).view(np.uint64), cfg.seed)
    if arr.dtype.kind == "f":
        return theta_hash_f64s(arr.astype(np.float64), cfg.seed)
    buf, starts, lengths = pack_bytes([str(v).encode("utf-8") for v in arr])
    return theta_hash_bytes(buf, starts, lengths, cfg.seed)


def _canonicalize(hashes: np.ndarray, theta: int, k: int, seed_hash: int) -> ThetaSketch:
    """Distinct + screen + bottom-k trim → canonical sketch.

    Large inputs take an exact selection fast path: the m+1 smallest
    elements (np.partition, O(n)) contain every distinct value ≤ their
    max, so when > k distinct screened values survive among them, the
    k+1 smallest distinct values of the full input are provably all
    there and the full O(n log n) unique-sort is skipped. Too few
    survivors (heavy duplication or screening) falls back to the full
    path — same answer either way."""
    h = hashes.astype(np.uint64, copy=False)
    m = k + (k >> 2) + 256
    if len(h) > 2 * m:
        cand = np.unique(np.partition(h, m)[: m + 1])
        cand = cand[(cand != 0) & (cand < np.uint64(theta))]
        if len(cand) > k:
            return ThetaSketch(cand[:k], int(cand[k]), seed_hash, k)
    h = np.unique(h)
    h = h[(h != 0) & (h < np.uint64(theta))]
    if len(h) > k:
        theta = int(h[k])  # (k+1)-th smallest distinct → new theta
        h = h[:k]
    return ThetaSketch(h, theta, seed_hash, k)


def theta_union(sketches: list[ThetaSketch]) -> ThetaSketch:
    """Merge: theta := min, concat entries, re-screen, re-trim.

    Commutative, associative, idempotent — safe as a Spark partial/final
    aggregation merge (`SURVEY.md §A.2 union`)."""
    if not sketches:
        raise ValueError("theta_union of nothing")
    sh = sketches[0].seed_hash
    k = sketches[0].k
    for s in sketches[1:]:
        if s.seed_hash != sh:
            raise ValueError("seed hash mismatch in theta_union")
        k = min(k, s.k)
    theta = min(s.theta for s in sketches)
    allh = np.concatenate([s.entries for s in sketches]) if sketches else np.zeros(0, np.uint64)
    return _canonicalize(allh, theta, k, sh)


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """Intersection under min(theta) (`theta/intersection.rs:64-196`)."""
    if a.seed_hash != b.seed_hash:
        raise ValueError("seed hash mismatch in theta_intersect")
    theta = min(a.theta, b.theta)
    common = np.intersect1d(a.entries, b.entries, assume_unique=True)
    common = common[common < np.uint64(theta)]
    return ThetaSketch(common, theta, a.seed_hash, min(a.k, b.k))


def jaccard_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """|A ∩ B| / |A ∪ B| estimated from the two sketches."""
    u = theta_union([a, b])
    i = theta_intersect(a, b)
    ue = u.estimate()
    return (i.estimate() / ue) if ue > 0 else 1.0


# ---------------------------------------------------------------------------
# binomial bounds (port of `common/binomial_bounds.rs:288-360, 484-559`)
# ---------------------------------------------------------------------------

# exact Gaussian tail probabilities 0.5(1+erf(-k/sqrt 2))
# (`common/num_std_dev.rs:24-29`)
_TAIL_PROB = {
    1: 0.1586553191586026479,
    2: 0.0227502618904135701,
    3: 0.0013498126861731796,
}


def _cont_classic_lb(n: int, theta: float, std: float) -> float:
    n_hat = (n - 0.5) / theta
    b = std * sqrt((1.0 - theta) / theta)
    d = 0.5 * b * sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b - d


def _cont_classic_ub(n: int, theta: float, std: float) -> float:
    n_hat = (n + 0.5) / theta
    b = std * sqrt((1.0 - theta) / theta)
    d = 0.5 * b * sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b + d


def _special_n_star(num_samples: int, p: float, delta: float) -> int:
    """Bayesian-inspired exact search: smallest m with
    P(X >= num_samples | n=m, p) > delta (`binomial_bounds.rs:394-418`).
    Only valid for num_samples/p < 500 (enforced by the caller)."""
    q = 1.0 - p
    cur_term = p**num_samples
    if cur_term <= 1e-100:
        raise ValueError("out of range")
    tot = cur_term
    m = num_samples
    while tot <= delta:
        cur_term = (cur_term * q * m) / (m + 1 - num_samples)
        tot += cur_term
        m += 1
    return m - 1


def _special_n_prime_b(num_samples: int, p: float, delta: float) -> int:
    """Smallest m with P(X >= num_samples | n=m, p) >= 1-delta
    (`binomial_bounds.rs:439-459`)."""
    q = 1.0 - p
    one_minus_delta = 1.0 - delta
    cur_term = p**num_samples
    if cur_term <= 1e-100:
        raise ValueError("out of range")
    tot = cur_term
    m = num_samples
    while tot < one_minus_delta:
        cur_term = (cur_term * q * m) / (m + 1 - num_samples)
        tot += cur_term
        m += 1
    return m


def _binomial_lower_bound(n: int, theta: float, num_std_dev: int) -> float:
    """`binomial_bounds.rs:288-302` + `compute_approx_binomial_lower_
    bound` (:484-522), including the 2<=n<=120 equivalent-sigma table
    and exact-search regimes."""
    if not 0.0 < theta <= 1.0:
        raise ValueError("theta must be in (0, 1]")
    est = n / theta
    if theta == 1.0:
        lb = float(n)
    elif n == 0:
        lb = 0.0
    elif n == 1:
        delta = _TAIL_PROB[num_std_dev]
        lb = floor(log(1.0 - delta) / log(1.0 - theta))
    elif n > 120:
        lb = _cont_classic_lb(n, theta, float(num_std_dev)) - 0.5
    elif theta > 1.0 - 1e-5:
        lb = float(n)
    elif theta < n / 360.0:
        from ._binomial_tables import LB_EQUIV_TABLE

        equiv_sigma = float(LB_EQUIV_TABLE[3 * n + (num_std_dev - 1)])
        lb = _cont_classic_lb(n, theta, equiv_sigma) - 0.5
    else:
        # hardest band: exact Bayesian search (est <= 360 here)
        delta = _TAIL_PROB[num_std_dev]
        try:
            lb = float(_special_n_star(n, theta, delta))
        except ValueError:
            lb = float(n)
    return min(est, max(float(n), lb))


def _binomial_upper_bound(n: int, theta: float, num_std_dev: int, no_data_seen: bool) -> float:
    """`binomial_bounds.rs:323-342` + `compute_approx_binomial_upper_
    bound` (:525-560)."""
    if no_data_seen:
        return 0.0
    if not 0.0 < theta <= 1.0:
        raise ValueError("theta must be in (0, 1]")
    est = n / theta
    if theta == 1.0:
        ub = float(n)
    elif n == 0:
        delta = _TAIL_PROB[num_std_dev]
        ub = ceil(log(delta) / log(1.0 - theta))
    elif n > 120:
        ub = _cont_classic_ub(n, theta, float(num_std_dev)) + 0.5
    elif theta > 1.0 - 1e-5:
        ub = float(n + 1)
    elif theta < n / 360.0:
        from ._binomial_tables import UB_EQUIV_TABLE

        equiv_sigma = float(UB_EQUIV_TABLE[3 * n + (num_std_dev - 1)])
        ub = _cont_classic_ub(n, theta, equiv_sigma) + 0.5
    else:
        delta = _TAIL_PROB[num_std_dev]
        try:
            ub = float(_special_n_prime_b(n + 1, theta, delta))
        except ValueError:
            ub = float(n + 1)
    return max(est, ub)
