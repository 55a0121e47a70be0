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

    def __post_init__(self) -> None:
        if self.max_map_size & (self.max_map_size - 1):
            raise ValueError("max_map_size must be a power of 2")

    @property
    def purge_threshold(self) -> int:
        return int(self.max_map_size * 0.75)

    def update(self, item, count: int = 1) -> None:
        self.counters[item] = self.counters.get(item, 0) + count
        if len(self.counters) > self.purge_threshold:
            self._purge()

    def update_batch(self, items: pd.Series, weights: pd.Series | None = None) -> None:
        if weights is None:
            vc = items.value_counts()
        else:
            vc = pd.Series(weights.to_numpy(), index=items.to_numpy()).groupby(level=0).sum()
        for item, c in vc.items():
            self.counters[item] = self.counters.get(item, 0) + int(c)
        while len(self.counters) > self.purge_threshold:
            self._purge()

    def _purge(self) -> None:
        med = int(np.median(list(self.counters.values())))
        med = max(med, 1)
        self.counters = {k: v - med for k, v in self.counters.items() if v - med > 0}
        self.offset += med

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        if other.max_map_size != self.max_map_size:
            raise ValueError("max_map_size mismatch in merge")
        for item, c in other.counters.items():
            self.counters[item] = self.counters.get(item, 0) + c
        self.offset += other.offset
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

    # -- serde (engine-internal layout; family 10 tag kept for parity
    #    with `codec/family.rs:36-91`) --------------------------------

    def serialize(self) -> bytes:
        out = bytearray()
        items = sorted(self.counters.items(), key=lambda kv: str(kv[0]))
        out += struct.pack("<BBIq", 10, 1, self.max_map_size, self.offset)
        out += struct.pack("<I", len(items))
        for item, c in items:
            key = str(item).encode("utf-8")
            out += struct.pack("<Iq", len(key), c)
            out += key
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes) -> "FrequentItemsSketch":
        family, _ver, m, offset = struct.unpack_from("<BBIq", data, 0)
        if family != 10:
            raise ValueError(f"not a frequent-items sketch (family {family})")
        (n,) = struct.unpack_from("<I", data, 14)
        off = 18
        counters = {}
        for _ in range(n):
            klen, c = struct.unpack_from("<Iq", data, off)
            off += 12
            counters[data[off : off + klen].decode("utf-8")] = c
            off += klen
        return FrequentItemsSketch(m, counters, offset)
