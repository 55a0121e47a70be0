"""Frequent-items (Misra-Gries) sketch — reverse-purge hash map port.

Round 4: the core is a faithful port of the reference's
`reverse_purge_item_hash_map.rs` open-addressing table (previously a
plain dict with a documented purge-sampling divergence — now closed;
`tests/test_foreign_fixtures.py` gates byte parity against blobs the
reference crate itself serialized):

* state: linear-probe table (keys/values/drift-states) growing ×2
  from 2^3 up to max_map_size at 75% load, + ``offset`` (total weight
  subtracted by purges, `sketch.rs:372-385`);
* purge: upper median (select_nth at n/2) of the first ≤1024 active
  slots in table order, saturating-subtracted from every count;
  zero-count entries removed by backward-shift deletion
  (`reverse_purge_item_hash_map.rs:98-146`);
* hashing: murmur3 x64-128 h1, default update seed, over Rust `Hash`
  feeds (i64 → 8 LE bytes, str → utf8 + 0xff terminator);
* exact regime: with fewer than ``0.75 * M`` distinct items no purge
  ever happens, offset stays 0, and estimates/bounds are exact counts
  (`frequencies/mod.rs:43-63`) — the DuckDB-oracle-checked regime;
* estimate/bounds: est = count + offset, LB = count, UB = count
  + offset (`sketch.rs:161-189`);
* merge: replay other's pairs in golden-stride iteration order
  (`sketch.rs:282-295`, `ReversePurgeItemIter`);
* serialization: table-scan order, the reference's
  active_values()/active_keys() contract;
* frequent_items: threshold query with NO_FALSE_POSITIVES (LB > t) /
  NO_FALSE_NEGATIVES (UB > t), sorted desc by estimate
  (`sketch.rs:317-370`).

The Spark aggregation paths call ``update_batch`` (pre-aggregated,
vectorized hashing) — one table insert per distinct item per batch;
``update`` is the reference-exact per-item sequential path.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from enum import Enum

import numpy as np
import pandas as pd


class ErrorType(Enum):
    NO_FALSE_POSITIVES = "no_false_positives"
    NO_FALSE_NEGATIVES = "no_false_negatives"


def _item_hash_bytes(item) -> bytes:
    """The reference's `Hash` feed for `hash_item`
    (`reverse_purge_item_hash_map.rs:314-319`): i64/u64 write 8 LE
    bytes; strings write utf-8 + the 0xff terminator Rust's
    `str::hash` appends."""
    if isinstance(item, (int, np.integer)):
        v = int(item)
        if not -(1 << 63) <= v < (1 << 64):
            raise ValueError(
                f"frequent-items int key {v} outside the reference's i64/u64 range"
            )
        return struct.pack("<q", v) if v < (1 << 63) else struct.pack("<Q", v)
    return str(item).encode("utf-8") + b"\xff"


def _hash_items(items: list) -> np.ndarray:
    """murmur3 x64-128 h1 with the default update seed — exactly
    `hash_item` (`MurmurHash3X64128::default()` = seed 9001).

    Integer batches take the vectorized u64 kernel: the reference's
    i64/u64 `Hash` feed is the value's 8 LE bytes, which is exactly
    the int64/uint64 bit image, so `murmur3_x64_128_u64s` is
    bit-identical to packing through `_item_hash_bytes` (equivalence
    gated in tests)."""
    from ..hashes import (
        DEFAULT_UPDATE_SEED,
        murmur3_x64_128_arr,
        murmur3_x64_128_u64s,
        pack_bytes,
    )

    arr = np.asarray(items)
    if arr.dtype.kind in "iu" and arr.dtype.itemsize <= 8:
        if arr.dtype.kind == "i":
            u = arr.astype(np.int64, copy=False).view(np.uint64)
        else:
            u = arr.astype(np.uint64, copy=False)
        h1, _h2 = murmur3_x64_128_u64s(u, DEFAULT_UPDATE_SEED)
        return h1
    buf, starts, lengths = pack_bytes([_item_hash_bytes(i) for i in items])
    h1, _h2 = murmur3_x64_128_arr(buf, starts, lengths, DEFAULT_UPDATE_SEED)
    return h1


@dataclass
class FrequentItemsSketch:
    """Misra-Gries heavy hitters — a port of the reference's
    reverse-purge open-addressing map (round 4; previously a plain
    dict with a documented purge-sampling divergence, now closed):
    linear probing with drift states, ×2 growth at 75% load up to
    max_map_size, purge = upper-median of the first ≤1024 active
    slots in table order, golden-ratio-stride serialization order —
    all byte/offset-identical to a reference run on the same update
    sequence (`reverse_purge_item_hash_map.rs`, foreign-fixture
    gated)."""

    max_map_size: int
    offset: int = 0
    # total stream weight ever seen (`sketch.rs:53`, serialized at
    # `sketch.rs:444`); not consulted by estimates, needed for wire parity
    stream_weight: int = 0
    # probe-table state (`reverse_purge_item_hash_map.rs:33-60`)
    _keys: list = field(default=None, repr=False)
    _vals: list = field(default=None, repr=False)
    _states: list = field(default=None, repr=False)  # drift, 0 = empty
    _num_active: int = 0

    _LG_MIN_MAP_SIZE = 3  # `frequencies/sketch.rs:40`
    _SAMPLE_SIZE = 1024  # `frequencies/sketch.rs:41`

    def __post_init__(self) -> None:
        if self.max_map_size & (self.max_map_size - 1):
            raise ValueError("max_map_size must be a power of 2")
        if self.max_map_size > (1 << 24):
            # mirrors the deserialize guard so every constructible
            # sketch round-trips through the family-10 wire
            raise ValueError("max_map_size capped at 2^24")
        if self._keys is None:
            self._alloc(1 << self._LG_MIN_MAP_SIZE)
        else:
            self._cap = int(len(self._keys) * 0.75)
            self._mask = len(self._keys) - 1

    def _alloc(self, size: int) -> None:
        self._keys = [None] * size
        self._vals = [0] * size
        self._states = [0] * size
        self._num_active = 0
        self._cap = int(size * 0.75)
        self._mask = size - 1

    @property
    def counters(self) -> dict:
        """Read-only {item: count} view in table-scan order."""
        return {
            k: v
            for k, v, s in zip(self._keys, self._vals, self._states)
            if s > 0
        }

    @property
    def purge_threshold(self) -> int:
        """maximum_map_capacity (`sketch.rs:396`)."""
        return (self.max_map_size * 3) // 4

    @property
    def _cur_map_cap(self) -> int:
        return self._cap

    # -- probe-table primitives (`reverse_purge_item_hash_map.rs`) ----------

    def _adjust_or_put(self, key, amount: int, h: int) -> None:
        """`adjust_or_put_value` (:71-95): linear probe, drift state."""
        mask = self._mask
        probe = h & mask
        drift = 1
        states = self._states
        keys = self._keys
        while states[probe] != 0:
            if keys[probe] == key:
                self._vals[probe] += amount
                return
            probe = (probe + 1) & mask
            drift += 1
        keys[probe] = key
        self._vals[probe] = amount
        states[probe] = drift
        self._num_active += 1

    def _hash_delete(self, delete_probe: int) -> None:
        """`hash_delete` (:247-266): backward-shift compaction."""
        keys, vals, states = self._keys, self._vals, self._states
        states[delete_probe] = 0
        keys[delete_probe] = None
        drift = 1
        mask = self._mask
        probe = (delete_probe + drift) & mask
        while states[probe] != 0:
            if states[probe] > drift:
                keys[delete_probe] = keys[probe]
                vals[delete_probe] = vals[probe]
                states[delete_probe] = states[probe] - drift
                states[probe] = 0
                keys[probe] = None
                drift = 0
                delete_probe = probe
            probe = (probe + 1) & mask
            drift += 1

    def _keep_only_positive(self) -> None:
        """`keep_only_positive_counts` (:98-116): two reverse sweeps
        split at the first empty slot scanning down from the top."""
        states, vals = self._states, self._vals
        n = len(states)
        first_probe = n - 1
        while states[first_probe] > 0:
            first_probe -= 1
        for probe in range(first_probe - 1, -1, -1):
            if states[probe] > 0 and vals[probe] == 0:
                self._hash_delete(probe)
                self._num_active -= 1
        for probe in range(n - 1, first_probe - 1, -1):
            if states[probe] > 0 and vals[probe] == 0:
                self._hash_delete(probe)
                self._num_active -= 1

    def _purge_map(self, sample_size: int) -> int:
        """`purge` (:126-146): upper median of the first `limit`
        active slots in table order; saturating subtract; drop zeros."""
        limit = min(sample_size, self._num_active, self._SAMPLE_SIZE)
        # first `limit` active slots in table order, vectorized (counts
        # are i64 by the wire contract, so the round-trip is lossless)
        va = np.array(self._vals, dtype=np.int64)
        act_all = np.flatnonzero(np.asarray(self._states) > 0)
        active = act_all[:limit]
        samples = va[active]
        mid = len(samples) // 2
        median = int(np.partition(samples, mid)[mid])
        # saturating subtract, vectorized
        va -= median
        np.maximum(va, 0, out=va)
        # survivor census (vectorized) picks the exact-equivalent fast
        # path: deleting EVERY active entry leaves the empty layout, so
        # a fresh same-size table is state-identical and skips ~m
        # backward-shift deletes (the whole cost on uniform streams,
        # where the median wipes the table); zero deletions skips the
        # sweep outright. Mixed case takes the faithful per-slot path.
        n_dead = int(np.count_nonzero(va[act_all] == 0))
        if n_dead == self._num_active:
            self._alloc(len(self._keys))
            return median
        self._vals = va.tolist()
        if n_dead:
            self._keep_only_positive()
        return median

    def _resize(self, new_size: int) -> None:
        """`resize` (:149-167): rehash in table-scan order."""
        old = [
            (k, v)
            for k, v, s in zip(self._keys, self._vals, self._states)
            if s > 0
        ]
        self._alloc(new_size)
        if old:
            hs = _hash_items([k for k, _ in old])
            for (k, v), h in zip(old, hs.tolist()):
                self._adjust_or_put(k, v, h)

    def _maybe_resize_or_purge(self) -> None:
        """`sketch.rs:372-385`."""
        if self._num_active > self._cur_map_cap:
            if len(self._keys) < self.max_map_size:
                self._resize(len(self._keys) * 2)
            else:
                sample_size = min(self._SAMPLE_SIZE, self.purge_threshold)
                self.offset += self._purge_map(sample_size)

    def _iter_table(self):
        """Golden-ratio-stride iteration (`ReversePurgeItemIter`,
        :269-313) — the reference's serialization and merge order."""
        size = len(self._keys)
        stride = int(size * 0.6180339887498949) | 1
        mask = size - 1
        index = (-stride) & ((1 << 64) - 1)
        seen = 0
        while seen < self._num_active:
            index = (index + stride) & mask
            if self._states[index] > 0:
                seen += 1
                yield self._keys[index], self._vals[index]

    # -- update / merge ------------------------------------------------------

    def update(self, item, count: int = 1) -> None:
        if count == 0:
            return
        if count < 0:
            raise ValueError("count may not be negative")
        self.stream_weight += count
        self._adjust_or_put(item, count, int(_hash_items([item])[0]))
        self._maybe_resize_or_purge()

    def update_batch(self, items: pd.Series, weights: pd.Series | None = None) -> None:
        """Batch path for the Spark aggregates: pre-aggregates the
        batch (one insert per distinct item — the engine's documented
        batch semantics; per-item `update` is the reference-exact
        sequential path) with vectorized hashing."""
        if weights is None:
            vc = items.value_counts()
        else:
            vc = pd.Series(weights.to_numpy(), index=items.to_numpy()).groupby(level=0).sum()
        if not len(vc):
            return
        batch_keys = list(vc.index)
        counts_np = vc.to_numpy()
        hs = _hash_items(batch_keys)
        grow_or_purge = self._maybe_resize_or_purge
        n = len(batch_keys)
        # weight hoisted out of the loop (zero-count entries add zero;
        # integer counts keep stream_weight an int, as before)
        if counts_np.dtype.kind in "iu":
            self.stream_weight += int(counts_np.sum())
        else:
            # float weights: truncate per distinct item, matching the
            # loop's `c = int(c)` below — stream_weight stays an int so
            # serialize()'s '<Q' pack never sees a float (a float here
            # previously raised struct.error on serialize)
            self.stream_weight += int(np.trunc(counts_np).sum())
        # suffix from which every count == 1 exactly: enables the
        # wiped-epoch fast-forward below
        not_one = np.flatnonzero(counts_np != 1)
        all_ones_from = int(not_one[-1]) + 1 if len(not_one) else 0
        # _adjust_or_put inlined with the table state in locals: the
        # per-item attribute loads + call frame were ~half the batch
        # path's time (REFBENCH). State-identical — locals are rebound
        # whenever a resize/purge replaces the underlying lists.
        keys, vals, states, mask = self._keys, self._vals, self._states, self._mask
        num_active, cap = self._num_active, self._cap
        counts = counts_np.tolist()
        hs_list = hs.tolist()
        idx = 0
        while idx < n:
            item, c, h = batch_keys[idx], counts[idx], hs_list[idx]
            idx += 1
            if c == 0:
                continue
            c = int(c)
            probe = h & mask
            drift = 1
            while states[probe] != 0:
                if keys[probe] == item:
                    vals[probe] += c
                    break
                probe = (probe + 1) & mask
                drift += 1
            else:
                keys[probe] = item
                vals[probe] = c
                states[probe] = drift
                num_active += 1
                if num_active > cap:
                    self._num_active = num_active
                    grow_or_purge()
                    keys, vals, states, mask = (
                        self._keys, self._vals, self._states, self._mask
                    )
                    num_active, cap = self._num_active, self._cap
                    # Wiped-epoch fast-forward (exact equivalence): the
                    # purge just emptied a max-size table, and every
                    # remaining count is exactly 1 — so each span of
                    # cap+1 distinct unit-count inserts fills the empty
                    # table to cap+1 all-ones entries, whose purge
                    # median is 1 and wipes it again (offset += 1).
                    # Skip those spans wholesale and insert only the
                    # final partial span; final state is bit-identical
                    # to the per-item schedule. This is the purge-bound
                    # regime (uniform key streams — the MG worst case),
                    # where it removes ~all insert work.
                    if (
                        num_active == 0
                        and idx >= all_ones_from
                        and len(keys) == self.max_map_size
                    ):
                        remaining = n - idx
                        epoch = cap + 1
                        spans = remaining // epoch
                        if spans:
                            self.offset += spans
                            idx += spans * epoch
        self._num_active = num_active

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        if other.max_map_size != self.max_map_size:
            raise ValueError("max_map_size mismatch in merge")
        if other._num_active == 0:
            self.offset += other.offset
            self.stream_weight += other.stream_weight
            return self
        merged_total = self.stream_weight + other.stream_weight
        pairs = list(other._iter_table())
        hs = _hash_items([k for k, _ in pairs])
        for (item, c), h in zip(pairs, hs.tolist()):
            self.stream_weight += c
            self._adjust_or_put(item, c, h)
            self._maybe_resize_or_purge()
        self.offset += other.offset
        self.stream_weight = merged_total
        return self

    def _get(self, item) -> int | None:
        """`get` (:62-68): probe lookup; None when absent."""
        mask = len(self._keys) - 1
        probe = int(_hash_items([item])[0]) & mask
        while self._states[probe] != 0:
            if self._keys[probe] == item:
                return self._vals[probe]
            probe = (probe + 1) & mask
        return None

    def estimate(self, item) -> int:
        c = self._get(item)
        return 0 if c is None else c + self.offset

    def lower_bound(self, item) -> int:
        c = self._get(item)
        return 0 if c is None else c

    def upper_bound(self, item) -> int:
        c = self._get(item)
        return 0 if c is None else c + self.offset

    @property
    def maximum_error(self) -> int:
        return self.offset

    def is_exact(self) -> bool:
        return self.offset == 0

    def frequent_items(
        self, error_type: ErrorType = ErrorType.NO_FALSE_POSITIVES, threshold: int | None = None
    ) -> list[tuple]:
        t = self.offset if threshold is None else threshold
        out = []
        for item, c in self.counters.items():
            bound = c if error_type is ErrorType.NO_FALSE_POSITIVES else c + self.offset
            if bound > t:
                out.append((item, c + self.offset, c, c + self.offset))
        out.sort(key=lambda r: (-r[1], str(r[0])))
        return out

    # -- serde: reference family-10 wire format ------------------------------
    # (`frequencies/sketch.rs:408-524`, `frequencies/serialization.rs`):
    # [pre_longs, serVer=1, family=10, lg_max, lg_cur, flags, unused u16]
    # + non-empty: [active u32][unused u32][stream_weight u64][offset u64]
    # then all counts (u64 LE) then all items. Items are typed exactly
    # like the reference's specializations: 'str' = u32 len + utf8 bytes,
    # 'i64'/'u64' = 8 LE bytes (`serialization.rs:45-110`). Empty blobs
    # are emitted 8 bytes (Java form) — the reference's own 6-byte empty
    # encode cannot be read back by its 8-byte-reading decode
    # (`sketch.rs:417-424` vs `:461-474`), so we side with the decoder.

    _EMPTY_FLAG = 5  # `frequencies/serialization.rs:33`

    @property
    def _lg_max(self) -> int:
        return self.max_map_size.bit_length() - 1

    def _lg_cur(self) -> int:
        """lg of the live probe table (`hash_map.lg_length()`)."""
        return len(self._keys).bit_length() - 1

    @staticmethod
    def _infer_item_type(items) -> str:
        return "i64" if items and all(isinstance(k, (int, np.integer)) for k in items) else "str"

    def serialize(self, item_type: str | None = None) -> bytes:
        if item_type is None:
            item_type = self._infer_item_type(list(self.counters))
        if self._num_active == 0:
            return struct.pack(
                "<BBBBBBH", 1, 1, 10, self._lg_max, self._LG_MIN_MAP_SIZE, self._EMPTY_FLAG, 0
            )
        # table-scan order — the reference's active_values()/
        # active_keys() serialization order (`reverse_purge_item_hash_
        # map.rs:190-220`; the golden stride is only the merge iterator)
        items = [
            (k, v)
            for k, v, s in zip(self._keys, self._vals, self._states)
            if s > 0
        ]
        out = bytearray()
        out += struct.pack("<BBBBBBH", 4, 1, 10, self._lg_max, self._lg_cur(), 0, 0)
        out += struct.pack("<IIQQ", len(items), 0, self.stream_weight, self.offset)
        for _item, c in items:
            out += struct.pack("<Q", c)
        for item, _c in items:
            if item_type == "str":
                key = str(item).encode("utf-8")
                out += struct.pack("<I", len(key)) + key
            elif item_type == "i64":
                out += struct.pack("<q", int(item))
            elif item_type == "u64":
                out += struct.pack("<Q", int(item))
            else:
                raise ValueError(f"unsupported item type {item_type}")
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes, item_type: str = "str") -> "FrequentItemsSketch":
        if len(data) < 8:
            raise ValueError("frequent-items bytes too short")
        pre_longs, ver, family, lg_max, lg_cur, flags, _u = struct.unpack_from(
            "<BBBBBBH", data, 0
        )
        pre_longs &= 0x3F
        if family != 10:
            raise ValueError(f"not a frequent-items sketch (family {family})")
        if ver != 1:
            raise ValueError(f"unsupported frequencies serial version {ver}")
        if lg_cur > lg_max:
            raise ValueError("lg_cur_map_size exceeds lg_max_map_size")
        if lg_max > 24:
            # decode guard: the probe-table rebuild below allocates
            # 2^lg_cur slots from these untrusted header bytes; an MG
            # map beyond 2^24 counters (epsilon 3.5/M ≈ 2e-7) is not a
            # plausible sketch, it is a crafted-blob OOM
            raise ValueError(f"frequencies lg_max_map_size {lg_max} too large")
        if flags & FrequentItemsSketch._EMPTY_FLAG:
            if pre_longs != 1:
                raise ValueError(f"invalid empty preamble longs {pre_longs}")
            return FrequentItemsSketch(1 << lg_max)
        if pre_longs != 4:
            raise ValueError(f"invalid preamble longs {pre_longs}")
        if len(data) < 32:
            raise ValueError("truncated frequencies preamble")
        n, _u2, stream_weight, offset = struct.unpack_from("<IIQQ", data, 8)
        off = 32
        if len(data) < off + n * 8:
            raise ValueError("truncated frequencies counts")
        counts = struct.unpack_from(f"<{n}Q", data, off)
        off += n * 8
        items = []
        for _ in range(n):
            if item_type == "str":
                (klen,) = struct.unpack_from("<I", data, off)
                off += 4
                items.append(data[off : off + klen].decode("utf-8"))
                off += klen
            elif item_type == "i64":
                items.append(struct.unpack_from("<q", data, off)[0])
                off += 8
            elif item_type == "u64":
                items.append(struct.unpack_from("<Q", data, off)[0])
                off += 8
            else:
                raise ValueError(f"unsupported item type {item_type}")
        # rebuild into an lg_cur-sized probe table by inserting in wire
        # order (`deserialize_inner` pre-sizes, then adjust_or_put each)
        lg_tbl = max(lg_cur, FrequentItemsSketch._LG_MIN_MAP_SIZE)
        if n >= (1 << lg_tbl):
            # a full probe table loops forever on the next missing-key
            # probe; valid blobs are ≤75% loaded
            raise ValueError(
                f"frequencies item count {n} overflows 2^{lg_tbl} table"
            )
        sk = FrequentItemsSketch(1 << lg_max)
        sk._alloc(1 << lg_tbl)
        if items:
            hs = _hash_items(items)
            for item, c, h in zip(items, counts, hs.tolist()):
                sk._adjust_or_put(item, int(c), int(h))
        sk.stream_weight = stream_weight
        sk.offset = offset
        return sk
