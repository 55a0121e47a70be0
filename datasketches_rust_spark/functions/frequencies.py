"""Frequent-items (Misra-Gries) sketch — reverse-purge semantics.

Reimplements the query semantics of
`datasketches/src/frequencies/sketch.rs` as a batch kernel:

* state: ``{item: count}`` map (≤ max_map_size entries) + ``offset``
  (the total weight subtracted by purges, `sketch.rs:372-385`);
* update: add weights; when the map exceeds ``0.75 * M`` distinct
  items, purge = subtract the median of the counts from all, drop
  ``<= 0`` (`reverse_purge_item_hash_map.rs:98-146` — the reference
  samples 1024 counts for the median; we take the exact median, a
  documented simplification that only affects estimation-regime
  accuracy, never the exact regime);
* exact regime: with fewer than ``0.75 * M`` distinct items no purge
  ever happens, offset stays 0, and estimates/bounds are exact counts
  (`frequencies/mod.rs:43-63`) — the DuckDB-oracle-checked regime;
* estimate/bounds: est = count + offset upper, LB = count, UB = count
  + offset (`sketch.rs:161-189`);
* merge: replay other's (item, count) pairs, offsets add
  (`sketch.rs:282-295`);
* frequent_items: threshold query with NO_FALSE_POSITIVES (LB > t) /
  NO_FALSE_NEGATIVES (UB > t), sorted desc by estimate
  (`sketch.rs:317-370`).
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


@dataclass
class FrequentItemsSketch:
    """Misra-Gries heavy hitters over hashable items."""

    max_map_size: int
    counters: dict = field(default_factory=dict)
    offset: int = 0
    # total stream weight ever seen (`sketch.rs:53`, serialized at
    # `sketch.rs:444`); not consulted by estimates, needed for wire parity
    stream_weight: int = 0

    def __post_init__(self) -> None:
        if self.max_map_size & (self.max_map_size - 1):
            raise ValueError("max_map_size must be a power of 2")

    @property
    def purge_threshold(self) -> int:
        return int(self.max_map_size * 0.75)

    def update(self, item, count: int = 1) -> None:
        self.counters[item] = self.counters.get(item, 0) + count
        self.stream_weight += count
        if len(self.counters) > self.purge_threshold:
            self._purge()

    def update_batch(self, items: pd.Series, weights: pd.Series | None = None) -> None:
        if weights is None:
            vc = items.value_counts()
        else:
            vc = pd.Series(weights.to_numpy(), index=items.to_numpy()).groupby(level=0).sum()
        for item, c in vc.items():
            self.counters[item] = self.counters.get(item, 0) + int(c)
            self.stream_weight += int(c)
        while len(self.counters) > self.purge_threshold:
            self._purge()

    # reference sample budget: SAMPLE_SIZE=1024 (`sketch.rs:41`),
    # capped by map capacity (`sketch.rs:397`) and num_active
    # (`reverse_purge_item_hash_map.rs:130-146`)
    _SAMPLE_SIZE = 1024

    def _purge(self) -> None:
        """Subtract the (sampled) median count and drop non-positive
        entries (`reverse_purge_item_hash_map.rs:126-146`).

        Median selection matches the reference: the UPPER median
        (select_nth at n/2), of at most min(1024, capacity) sampled
        counts. Divergence, documented: the reference samples the
        first `limit` ACTIVE SLOTS of its open-addressing table —
        membership depends on each item's table position and the
        insertion/probe history — while this engine (a dict, no slot
        layout) samples the `limit` items with the smallest engine
        hash of their string form: equally uniform-pseudo-random over
        items, deterministic and insertion-order-independent (better
        for Spark's order-insensitive merge contract), but purge
        offsets on >1024-entry maps can differ from a reference run on
        identical input by the sampling noise both sides share. When
        num_active <= limit both sides take the median of every count
        and agree exactly."""
        vals = np.fromiter(self.counters.values(), dtype=np.int64, count=len(self.counters))
        limit = min(self._SAMPLE_SIZE, self.purge_threshold, len(vals))
        if len(vals) > limit:
            from ..hashes import pack_bytes, xxhash64_arr

            buf, starts, lengths = pack_bytes(
                [str(k).encode("utf-8") for k in self.counters]
            )
            h = xxhash64_arr(buf, starts, lengths, 0)
            take = np.argpartition(h, limit - 1)[:limit]
            vals = vals[take]
        mid = len(vals) // 2
        med = int(np.partition(vals, mid)[mid])
        med = max(med, 1)
        self.counters = {k: v - med for k, v in self.counters.items() if v - med > 0}
        self.offset += med

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        if other.max_map_size != self.max_map_size:
            raise ValueError("max_map_size mismatch in merge")
        for item, c in other.counters.items():
            self.counters[item] = self.counters.get(item, 0) + c
        self.offset += other.offset
        self.stream_weight += other.stream_weight
        while len(self.counters) > self.purge_threshold:
            self._purge()
        return self

    def estimate(self, item) -> int:
        c = self.counters.get(item)
        return 0 if c is None else c + self.offset

    def lower_bound(self, item) -> int:
        return self.counters.get(item, 0)

    def upper_bound(self, item) -> int:
        c = self.counters.get(item)
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

    _LG_MIN_MAP_SIZE = 3  # `frequencies/sketch.rs:40`
    _EMPTY_FLAG = 5  # `frequencies/serialization.rs:33`

    @property
    def _lg_max(self) -> int:
        return self.max_map_size.bit_length() - 1

    def _lg_cur(self) -> int:
        """Smallest backing-array lg that holds the active items at
        load factor 0.75, clamped to [LG_MIN, lg_max] — mirrors the
        hash map's growth schedule."""
        lg = self._LG_MIN_MAP_SIZE
        while (1 << lg) * 0.75 < len(self.counters) and lg < self._lg_max:
            lg += 1
        return lg

    @staticmethod
    def _infer_item_type(items) -> str:
        return "i64" if items and all(isinstance(k, (int, np.integer)) for k in items) else "str"

    def serialize(self, item_type: str | None = None) -> bytes:
        if item_type is None:
            item_type = self._infer_item_type(list(self.counters))
        if not self.counters:
            return struct.pack(
                "<BBBBBBH", 1, 1, 10, self._lg_max, self._LG_MIN_MAP_SIZE, self._EMPTY_FLAG, 0
            )
        items = sorted(self.counters.items(), key=lambda kv: str(kv[0]))
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
        sk = FrequentItemsSketch(1 << lg_max, dict(zip(items, counts)))
        sk.stream_weight = stream_weight
        sk.offset = offset
        return sk
