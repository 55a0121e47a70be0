"""t-digest — merging digest with the K_2 scale function, matching the
reference semantics (`datasketches/src/tdigest/sketch.rs`).

* config: k >= 10, default 200 (`sketch.rs:39-43`); centroid capacity
  2k + fudge(10), buffer 4x capacity (`sketch.rs:84-94`);
* update: buffered; NaN/±inf ignored (`sketch.rs:171-183`); min/max
  exactly maintained;
* compress/do_merge (`sketch.rs:726-795`): sort buffer+centroids by
  mean, alternate merge direction each pass (``reverse_merge``),
  greedy merge under K_2: proposed_weight <= W · min(max(q0, norm),
  max(q2, norm)) with max(q, n) = q(1−q)/n and normalizer =
  compression/z, z = 4·ln(n/compression) + 24, compression = 2k
  (`sketch.rs:1319-1336`);
* merge(other): concat other's centroids+buffer, re-merge
  (`sketch.rs:231-255`) — commutative up to the documented
  order-sensitivity of t-digest internals; estimates are
  tolerance-gated, not oracle-gated (SURVEY.md §5 layer 2);
* rank/quantile: interpolated with half-weight tail handling — a
  faithful port of `sketch.rs:1040-1212`;
* cdf/pmf over monotone split points (`sketch.rs:1014-1038`).
"""

from __future__ import annotations

import struct
from math import log

import numpy as np

DEFAULT_K = 200
_FUDGE = 10


def _normalizer(compression: float, n: float) -> float:
    return compression / (4.0 * log(n / compression) + 24.0)


def _scale_max(q: float, normalizer: float) -> float:
    return q * (1.0 - q) / normalizer


class TDigest:
    """Mutable merging t-digest over f64 values."""

    def __init__(self, k: int = DEFAULT_K):
        if k < 10:
            raise ValueError("k must be >= 10")
        self.k = k
        self.capacity = 2 * k + _FUDGE
        self.buffer_capacity = 4 * self.capacity
        self.means = np.zeros(0, np.float64)
        self.weights = np.zeros(0, np.float64)
        self.buffer: list[float] = []
        self.min = np.inf
        self.max = -np.inf
        self.reverse_merge = False
        self.centroids_weight = 0.0
        self.frozen = False

    # -- freeze (`tdigest/sketch.rs:268-278`: TDigestMut::freeze) ------------

    def freeze(self) -> "TDigest":
        """Compress the pending buffer and mark this sketch immutable —
        the reference's TDigestMut → TDigest transition. Queries
        (quantile/rank/cdf/pmf/serialize) remain available; further
        update/merge raises. Returns self for chaining."""
        self.compress()
        self.frozen = True
        return self

    def unfreeze(self) -> "TDigest":
        """Back to mutable — the engine's equivalent of the reference's
        deserialize-into-TDigestMut round trip (the immutable type has
        no in-place path there either)."""
        self.frozen = False
        return self

    def _check_mutable(self) -> None:
        if self.frozen:
            raise ValueError("t-digest is frozen; unfreeze() to update")

    # -- update ----------------------------------------------------------------

    def update(self, v: float) -> None:
        self._check_mutable()
        if np.isnan(v) or np.isinf(v):
            return
        self.buffer.append(float(v))
        self.min = min(self.min, v)
        self.max = max(self.max, v)
        if len(self.buffer) >= self.buffer_capacity:
            self.compress()

    def update_batch(self, vals: np.ndarray) -> None:
        self._check_mutable()
        vals = np.asarray(vals, np.float64)
        vals = vals[np.isfinite(vals)]
        if len(vals) == 0:
            return
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        # merge at the same cadence as per-value updates (buffer fills
        # of 4x capacity, `sketch.rs:84-94`) — one giant merge of a
        # sorted batch measurably degrades mid-quantile accuracy
        pos = 0
        n = len(vals)
        cap = self.buffer_capacity
        while pos < n:
            if not self.buffer and n - pos >= cap:
                # full chunk over an empty buffer: feed _do_merge the
                # numpy slice directly — the same float64 values in the
                # same order the tolist()->extend->np.array round trip
                # would produce, so every merge decision is bit-identical
                # (gated by test_tdigest_batch_fastpath_equivalence);
                # skipping the list round trip is ~2x on large batches
                self._do_merge(
                    vals[pos : pos + cap], np.ones(cap, np.float64), float(cap)
                )
                pos += cap
                continue
            room = cap - len(self.buffer)
            take = vals[pos : pos + room]
            self.buffer.extend(take.tolist())
            pos += len(take)
            if len(self.buffer) >= cap:
                self.compress()

    def compress(self) -> None:
        if not self.buffer:
            return
        bm = np.array(self.buffer, np.float64)
        bw = np.ones(len(bm), np.float64)
        self._do_merge(bm, bw, float(len(bm)))
        self.buffer.clear()

    def _do_merge(self, bm: np.ndarray, bw: np.ndarray, new_weight: float) -> None:
        means = np.concatenate([bm, self.means])
        weights = np.concatenate([bw, self.weights])
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        if self.reverse_merge:
            means = means[::-1]
            weights = weights[::-1]
        self.centroids_weight += new_weight
        w_total = self.centroids_weight
        norm = _normalizer(2.0 * self.k, w_total)

        # Hot loop on Python floats: np.float64 scalar arithmetic pays
        # ~10x interpreter overhead per op, and both types are IEEE-754
        # binary64 with correctly-rounded ops, so .tolist() keeps every
        # add/merge decision bit-identical to the prior numpy-scalar
        # form (parity pinned by the foreign-fixture byte tests).
        m_list = means.tolist()
        w_list = weights.tolist()
        out_m: list[float] = []
        out_w: list[float] = []
        weight_so_far = 0.0
        n = len(m_list)
        n_last = n - 1
        ml = m_list[0]
        wl = w_list[0]
        # _scale_max(q0, norm) only changes when a centroid is emitted
        sm0 = 0.0  # q0 = 0 at the start
        emit_m = out_m.append
        emit_w = out_w.append
        for cur, mc, wc in zip(range(1, n), m_list[1:], w_list[1:]):
            proposed = wl + wc
            if 1 < cur < n_last:
                q2 = (weight_so_far + proposed) / w_total
                sm2 = q2 * (1.0 - q2) / norm
                lim = sm0 if sm0 < sm2 else sm2
                if proposed <= w_total * lim:
                    # weighted-mean merge into the last centroid
                    ml += (mc - ml) * wc / proposed
                    wl = proposed
                    continue
            weight_so_far += wl
            emit_m(ml)
            emit_w(wl)
            ml = mc
            wl = wc
            q0 = weight_so_far / w_total
            sm0 = q0 * (1.0 - q0) / norm
        out_m.append(ml)
        out_w.append(wl)
        self.means = np.array(out_m, np.float64)
        self.weights = np.array(out_w, np.float64)
        if self.reverse_merge:
            self.means = self.means[::-1].copy()
            self.weights = self.weights[::-1].copy()
        self.min = min(self.min, float(self.means[0]))
        self.max = max(self.max, float(self.means[-1]))
        self.reverse_merge = not self.reverse_merge

    def merge(self, other: "TDigest") -> "TDigest":
        self._check_mutable()
        if other.total_weight() == 0:
            return self
        om = np.concatenate([np.array(other.buffer, np.float64), other.means])
        ow = np.concatenate([np.ones(len(other.buffer)), other.weights])
        self.compress()
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._do_merge(om, ow, float(ow.sum()))
        return self

    # -- queries ----------------------------------------------------------------

    def total_weight(self) -> int:
        return int(self.centroids_weight + len(self.buffer))

    def is_empty(self) -> bool:
        return self.total_weight() == 0

    def rank(self, value: float) -> float | None:
        self.compress()
        m, w = self.means, self.weights
        if len(m) == 0:
            return None
        if value < self.min:
            return 0.0
        if value > self.max:
            return 1.0
        if len(m) == 1:
            return 0.5
        W = self.centroids_weight
        if value < m[0]:
            if m[0] - self.min > 0:
                if value == self.min:
                    return 0.5 / W
                return (1.0 + ((value - self.min) / (m[0] - self.min)) * (w[0] / 2.0 - 1.0)) / W
            return 0.0
        if value > m[-1]:
            if self.max - m[-1] > 0:
                if value == self.max:
                    return 1.0 - 0.5 / W
                return 1.0 - (
                    (1.0 + ((self.max - value) / (self.max - m[-1])) * (w[-1] / 2.0 - 1.0)) / W
                )
            return 1.0
        lower = int(np.searchsorted(m, value, side="left"))
        if lower < len(m) and value < m[lower]:
            lower -= 1
        upper = int(np.searchsorted(m, value, side="right"))
        if upper == len(m) or m[upper - 1] >= value:
            upper -= 1
        weight_below = float(w[:lower].sum()) + w[lower] / 2.0
        weight_delta = float(w[lower:upper].sum()) - w[lower] / 2.0 + w[upper] / 2.0
        if m[upper] - m[lower] > 0:
            return (weight_below + weight_delta * (value - m[lower]) / (m[upper] - m[lower])) / W
        return (weight_below + weight_delta / 2.0) / W

    def quantile(self, rank: float) -> float | None:
        if not 0.0 <= rank <= 1.0:
            raise ValueError("rank must be in [0, 1]")
        self.compress()
        m, w = self.means, self.weights
        if len(m) == 0:
            return None
        if len(m) == 1:
            return float(m[0])
        W = self.centroids_weight
        weight = rank * W
        if weight < 1.0:
            return self.min
        if weight > W - 1.0:
            return self.max
        if w[0] > 1.0 and weight < w[0] / 2.0:
            return self.min + ((weight - 1.0) / (w[0] / 2.0 - 1.0)) * (m[0] - self.min)
        if w[-1] > 1.0 and W - weight <= w[-1] / 2.0:
            return self.max + ((W - weight - 1.0) / (w[-1] / 2.0 - 1.0)) * (self.max - m[-1])
        weight_so_far = w[0] / 2.0
        for i in range(len(m) - 1):
            dw = (w[i] + w[i + 1]) / 2.0
            if weight_so_far + dw > weight:
                left_weight = 0.0
                if w[i] == 1.0:
                    if weight - weight_so_far < 0.5:
                        return float(m[i])
                    left_weight = 0.5
                right_weight = 0.0
                if w[i + 1] == 1.0:
                    if weight_so_far + dw - weight <= 0.5:
                        return float(m[i + 1])
                    right_weight = 0.5
                w1 = weight - weight_so_far - left_weight
                w2 = weight_so_far + dw - weight - right_weight
                return float((m[i] * w1 + m[i + 1] * w2) / (w1 + w2))
            weight_so_far += dw
        w1 = weight - W - w[-1] / 2.0
        w2 = w[-1] / 2.0 - w1
        return float((m[-1] * w1 + self.max * w2) / (w1 + w2))

    def cdf(self, split_points: list[float]) -> list[float]:
        _check_monotone(split_points)
        return [self.rank(v) for v in split_points] + [1.0]

    def pmf(self, split_points: list[float]) -> list[float]:
        c = self.cdf(split_points)
        return [c[0]] + [c[i] - c[i - 1] for i in range(1, len(c))]

    # -- serde: reference family-20 wire format ------------------------------
    # (`tdigest/sketch.rs:404-474,497-624`, `tdigest/serialization.rs`):
    # [pre_longs, serVer=1, family=20][k u16 LE][flags][unused u16]
    # empty → stop; single-value → f64 value; multiple → [n_centroids
    # u32][n_buffered u32][min f64][max f64] then (mean f64, weight u64)
    # per centroid. Reads both the f64 and the C++ tdigest<float> f32
    # variant; an all-zero first word auto-dispatches to the tdunning
    # compat decoder exactly like the reference (`sketch.rs:507-513`).

    _F_EMPTY, _F_SINGLE, _F_REVERSE = 1, 2, 4

    def serialize(self) -> bytes:
        self.compress()
        n = len(self.means)
        total_w = self.total_weight()
        flags = 0
        if total_w == 0:
            flags |= self._F_EMPTY
        elif total_w == 1 and n == 1:
            flags |= self._F_SINGLE
        if self.reverse_merge:
            flags |= self._F_REVERSE
        single = bool(flags & self._F_SINGLE)
        pre = 1 if (flags & self._F_EMPTY or single) else 2
        out = bytearray(struct.pack("<BBBHBH", pre, 1, 20, self.k, flags, 0))
        if flags & self._F_EMPTY:
            return bytes(out)
        if single:
            out += struct.pack("<d", self.min)
            return bytes(out)
        out += struct.pack("<IIdd", n, 0, self.min, self.max)
        for m, w in zip(self.means, self.weights):
            out += struct.pack("<dQ", float(m), int(w))
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes, is_f32: bool = False) -> "TDigest":
        if len(data) < 8:
            raise ValueError("tdigest bytes too short")
        pre, ver, family, k, flags, _u = struct.unpack_from("<BBBHBH", data, 0)
        if family != 20:
            if pre == 0 and ver == 0 and family == 0:
                return deserialize_compat(data)
            raise ValueError(f"not a tdigest (family {family})")
        if ver != 1:
            raise ValueError(f"unsupported tdigest serial version {ver}")
        if k < 10:
            raise ValueError(f"k must be at least 10, got {k}")
        td = TDigest(k)
        if flags & TDigest._F_EMPTY:
            return td
        td.reverse_merge = bool(flags & TDigest._F_REVERSE)
        off = 8
        if flags & TDigest._F_SINGLE:
            fmt, sz = ("<f", 4) if is_f32 else ("<d", 8)
            if len(data) < off + sz:
                raise ValueError("truncated tdigest single value")
            (v,) = struct.unpack_from(fmt, data, off)
            td.means = np.array([v], np.float64)
            td.weights = np.array([1.0], np.float64)
            td.min = td.max = float(v)
            td.centroids_weight = 1.0
            return td
        if len(data) < off + 8:
            raise ValueError("truncated tdigest preamble")
        n, _nbuf = struct.unpack_from("<II", data, off)
        off += 8
        if is_f32:
            if len(data) < off + 8:
                raise ValueError("truncated tdigest min/max")
            mn, mx = struct.unpack_from("<ff", data, off)
            off += 8
            if len(data) < off + 8 * n:
                raise ValueError("truncated tdigest centroids")
            cent = np.frombuffer(data, "<f4", count=2 * n, offset=off).reshape(n, 2)
            means = cent[:, 0].astype(np.float64)
            weights = cent[:, 1].view("<u4").astype(np.float64)
        else:
            if len(data) < off + 16:
                raise ValueError("truncated tdigest min/max")
            mn, mx = struct.unpack_from("<dd", data, off)
            off += 16
            if len(data) < off + 16 * n:
                raise ValueError("truncated tdigest centroids")
            cent = np.frombuffer(data, "<f8", count=2 * n, offset=off).reshape(n, 2)
            means = cent[:, 0].copy()
            weights = cent[:, 1].view("<u8").astype(np.float64)
        td.means, td.weights = means, weights
        td.min, td.max = float(mn), float(mx)
        td.centroids_weight = float(weights.sum())
        return td


def _check_monotone(points: list[float]) -> None:
    for i in range(1, len(points)):
        if not points[i] > points[i - 1]:
            raise ValueError("split points must be strictly increasing")
    for p in points:
        if np.isnan(p):
            raise ValueError("split points must not be NaN")


def deserialize_compat(data: bytes) -> "TDigest":
    """Decode the PUBLIC tdunning reference-implementation t-digest
    serialization (big-endian ByteBuffer format; the same cross-
    implementation contract the reference consumes,
    `tdigest/sketch.rs:626-718`): type 1 = asBytes() doubles, type 2 =
    asSmallBytes() floats.

    Layouts:
      type 1: u32 type, f64 min, f64 max, f64 k, u32 n_centroids,
              then per centroid (f64 weight, f64 mean)
      type 2: u32 type, f64 min, f64 max, f32 k, u32 unused,
              u16 n_centroids, then per centroid (f32 weight, f32 mean)
    """
    import struct as _struct

    (ty,) = _struct.unpack_from(">I", data, 0)
    if ty == 1:
        mn, mx, kf = _struct.unpack_from(">ddd", data, 4)
        (n_cent,) = _struct.unpack_from(">I", data, 28)
        body = np.frombuffer(data, ">f8", count=2 * n_cent, offset=32).reshape(-1, 2)
        weights = body[:, 0].astype(np.float64)
        means = body[:, 1].astype(np.float64)
    elif ty == 2:
        mn, mx = _struct.unpack_from(">dd", data, 4)
        (kf,) = _struct.unpack_from(">f", data, 20)
        (n_cent,) = _struct.unpack_from(">H", data, 28)
        body = np.frombuffer(data, ">f4", count=2 * n_cent, offset=30).reshape(-1, 2)
        weights = body[:, 0].astype(np.float64)
        means = body[:, 1].astype(np.float64)
    else:
        raise ValueError(f"unknown compat t-digest type {ty}")
    k = int(kf)
    if k < 10:
        raise ValueError("k must be >= 10 in compat format")
    td = TDigest(k)
    td.means = means.copy()
    td.weights = weights
    td.centroids_weight = float(weights.sum())
    td.min = float(mn)
    td.max = float(mx)
    return td
