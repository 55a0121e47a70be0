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
* serialization: byte-compatible with the reference's *uncompressed
  compact v3* layout (`theta/sketch.rs:501-534`,
  `theta/serialization.rs:20-30`): preamble longs 1/2/3, serVer 3,
  family 3, flags (READ_ONLY|COMPACT|EMPTY|ORDERED), LE seed_hash,
  entry count, theta (estimation mode only), sorted LE u64 entries.
* bounds: binomial confidence bounds
  (`datasketches/src/common/binomial_bounds.rs:288-360`). We port the
  closed forms (theta==1, n==0, n==1, n>120 Gaussian with continuity
  correction). For the rare mid-range (2 <= n <= 120 with theta < 1)
  the reference uses empirical equivalence tables / an exact Bayesian
  search; we use the Gaussian form there and document the deviation —
  estimation-mode sketches in this engine always retain k >= 32 >>
  entries, and the recall-gated paths never consult bounds.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from math import ceil, floor, log, sqrt

import numpy as np

from ..config import MAX_THETA, ThetaConfig
from ..hashes import (
    DEFAULT_UPDATE_SEED,
    compute_seed_hash,
    pack_bytes,
    theta_hash_bytes,
    theta_hash_u64s,
)

_FAMILY_THETA = 3
_SERIAL_VERSION = 3
_FLAG_READ_ONLY = 1 << 1
_FLAG_EMPTY = 1 << 2
_FLAG_COMPACT = 1 << 3
_FLAG_ORDERED = 1 << 4


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
    def from_u64s(vals: np.ndarray, cfg: ThetaConfig) -> "ThetaSketch":
        return ThetaSketch.from_hashes(theta_hash_u64s(vals, cfg.seed), cfg)

    @staticmethod
    def from_byte_items(items: list[bytes], cfg: ThetaConfig) -> "ThetaSketch":
        buf, starts, lengths = pack_bytes(items)
        return ThetaSketch.from_hashes(theta_hash_bytes(buf, starts, lengths, cfg.seed), cfg)

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

    @staticmethod
    def deserialize(data: bytes, cfg: ThetaConfig) -> "ThetaSketch":
        if len(data) < 8:
            raise ValueError("theta sketch bytes too short")
        pre_longs, ser_ver, family, _unused, flags, seed_hash = struct.unpack_from(
            "<BBBHBH", data, 0
        )
        if family != _FAMILY_THETA:
            raise ValueError(f"not a theta sketch (family {family})")
        if ser_ver != _SERIAL_VERSION:
            raise ValueError(f"unsupported theta serial version {ser_ver}")
        if seed_hash != cfg.seed_hash:
            raise ValueError(f"seed hash mismatch: {seed_hash} != {cfg.seed_hash}")
        if flags & _FLAG_EMPTY:
            return ThetaSketch.empty(cfg)
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
        if len(data) < off + n * 8:
            raise ValueError("truncated theta sketch entries")
        entries = np.frombuffer(data, dtype="<u8", count=n, offset=off).astype(np.uint64)
        if (entries == 0).any() or (entries >= theta).any():
            raise ValueError("theta entry out of range (0, theta)")
        if n > 1 and (np.diff(entries.view(np.uint64)) <= 0).any():
            raise ValueError("theta entries not strictly increasing")
        return ThetaSketch(entries, int(theta), seed_hash, cfg.k)


def _canonicalize(hashes: np.ndarray, theta: int, k: int, seed_hash: int) -> ThetaSketch:
    """Distinct + screen + bottom-k trim → canonical sketch."""
    h = np.unique(hashes.astype(np.uint64, copy=False))
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

_TAIL_PROB = {1: 0.15866, 2: 0.02275, 3: 0.00135}


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


def _binomial_lower_bound(n: int, theta: float, num_std_dev: int) -> float:
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
    elif n > 120 or theta <= 1.0 - 1e-5:
        lb = _cont_classic_lb(n, theta, float(num_std_dev)) - 0.5
    else:
        lb = float(n)
    return min(est, max(float(n), lb))


def _binomial_upper_bound(n: int, theta: float, num_std_dev: int, no_data_seen: bool) -> float:
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
    elif n > 120 or theta <= 1.0 - 1e-5:
        ub = _cont_classic_ub(n, theta, float(num_std_dev)) + 0.5
    else:
        ub = float(n + 1)
    return max(est, ub)
