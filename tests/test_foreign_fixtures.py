"""Cross-language golden wire fixtures (round 4).

The blobs under ``tests/fixtures/foreign/`` were serialized by the
REFERENCE Rust crate itself (``tools/gen_fixtures.rs``, built against
/root/reference's library with deterministic u64/f64/string update
sequences — see ``tests/fixtures/foreign/manifest.json`` for the exact
parameters and the reference's own estimates). These tests close the
round-3 evidence gap ("wire compatibility verified only by in-engine
round-trips"): every family must

1. DECODE the foreign blob and reproduce the reference's estimate, and
2. RE-ENCODE it byte-identically (encode-side parity), and
3. where the update path is item-hash-compatible (u64 / f64 items),
   BUILD the same sketch from the same updates and serialize to the
   exact bytes the reference produced.

Note on strings: Rust's ``std::hash`` for ``str`` appends a 0xff
terminator before hashing, so the reference's *string-updated* theta/
hll/cpc/countmin sketches hash differently from the Java/C++ (and this
engine's) plain-UTF-8 convention — fixtures therefore use u64/f64
updates for hash-bearing families; the frequencies family stores
items verbatim on the wire, so its string fixture checks item
round-trip, not hashing.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

FIXDIR = Path(__file__).parent / "fixtures" / "foreign"


def _manifest():
    return json.loads((FIXDIR / "manifest.json").read_text())


def _load(name: str) -> bytes:
    return (FIXDIR / name).read_bytes()


def _entries(family_prefix: str):
    return [e for e in _manifest() if e["family"].startswith(family_prefix)]


# ---------------------------------------------------------------------------
# theta
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("entry", _entries("theta_v"), ids=lambda e: e["file"])
def test_theta_foreign_decode_reencode_rebuild(entry):
    from datasketches_rust_spark.config import ThetaConfig
    from datasketches_rust_spark.functions.theta import ThetaSketch

    cfg = ThetaConfig(lg_k=12)
    blob = _load(entry["file"])
    sk = ThetaSketch.deserialize(blob, cfg)
    assert math.isclose(sk.estimate(), entry["estimate"], rel_tol=1e-12, abs_tol=1e-9)

    # encode-side parity: the engine's writer must reproduce the
    # reference's bytes for the same layout
    if entry["family"] == "theta_v4":
        assert sk.serialize_compressed() == blob
    else:
        assert sk.serialize() == blob

    # build-side parity: same updates -> same bytes
    if "u64" in entry["params"]:
        built = ThetaSketch.from_u64s(np.arange(entry["n"], dtype=np.uint64), cfg)
    else:
        built = ThetaSketch.from_f64s(
            np.arange(entry["n"], dtype=np.float64) * 0.5, cfg
        )
    if entry["family"] == "theta_v4":
        assert built.serialize_compressed() == blob
    else:
        assert built.serialize() == blob


# ---------------------------------------------------------------------------
# hll
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("entry", _entries("hll_"), ids=lambda e: e["file"])
def test_hll_foreign_decode_reencode_rebuild(entry):
    from datasketches_rust_spark.functions.hll import HllSketch

    blob = _load(entry["file"])
    sk = HllSketch.deserialize_wire(blob)
    assert math.isclose(sk.estimate(), entry["estimate"], rel_tol=1e-9)

    target = entry["family"].split("_")[1]  # hll4 / hll6 / hll8
    assert sk.serialize_wire(target) == blob

    built = HllSketch(lg_k=11)
    built.update_u64s(np.arange(entry["n"], dtype=np.uint64))
    assert built.serialize_wire(target) == blob


# ---------------------------------------------------------------------------
# cpc
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("entry", _entries("cpc"), ids=lambda e: e["file"])
def test_cpc_foreign_decode_reencode_rebuild(entry):
    from datasketches_rust_spark.functions.cpc import CpcSketch
    from datasketches_rust_spark.functions.cpc_wire import (
        deserialize_wire,
        serialize_wire,
    )

    blob = _load(entry["file"])
    sk = deserialize_wire(blob)
    assert math.isclose(sk.estimate(), entry["estimate"], rel_tol=1e-9)
    assert serialize_wire(sk) == blob

    built = CpcSketch(lg_k=11)
    built.update_u64s(np.arange(entry["n"], dtype=np.uint64))
    assert serialize_wire(built) == blob


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------


def test_bloom_foreign_decode_reencode_rebuild():
    from datasketches_rust_spark.functions.bloom import BloomFilter

    entry = _entries("bloom")[0]
    blob = _load(entry["file"])
    bf = BloomFilter.deserialize(blob)
    assert bf.serialize() == blob
    # no false negatives on the reference's inserted u64 items
    items = list(np.arange(1000, dtype=np.uint64))
    assert bf.contains_batch(items).all()

    # same builder params + DEFAULT_UPDATE_SEED (9001) -> same bytes
    built = BloomFilter.with_accuracy(10_000, 0.01, seed=9001)
    built.insert_batch(items)
    assert built.serialize() == blob

    # the DEFAULT seed is the reference's DEFAULT_UPDATE_SEED: a
    # default-config build is bit-identical to a reference build
    # (hash/mod.rs:37; regression for the round-4 seed-0 default)
    default_built = BloomFilter.with_accuracy(10_000, 0.01)
    default_built.insert_batch(items)
    assert default_built.serialize() == blob


# ---------------------------------------------------------------------------
# countmin
# ---------------------------------------------------------------------------


def test_countmin_foreign_decode_reencode_rebuild():
    from datasketches_rust_spark.functions.countmin import CountMinSketch

    entry = _entries("countmin")[0]
    blob = _load(entry["file"])
    cm = CountMinSketch.deserialize(blob)
    assert cm.serialize() == blob
    assert cm.estimate(np.uint64(7)) == entry["estimate"]

    built = CountMinSketch(num_hashes=3, num_buckets=1024)
    built.update_batch(
        np.arange(200, dtype=np.uint64), np.arange(1, 201, dtype=np.int64)
    )
    assert built.serialize() == blob


# ---------------------------------------------------------------------------
# frequencies
# ---------------------------------------------------------------------------


def test_frequencies_foreign_i64():
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    entry = [e for e in _manifest() if e["family"] == "frequencies_i64"][0]
    blob = _load(entry["file"])
    sk = FrequentItemsSketch.deserialize(blob, item_type="i64")
    assert sk.estimate(7) == entry["estimate"]
    assert sk.serialize("i64") == blob

    built = FrequentItemsSketch(64)
    for i in range(40):
        built.update(i, i + 1)
    assert built.serialize("i64") == blob


def test_frequencies_foreign_str():
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    entry = [e for e in _manifest() if e["family"] == "frequencies_str"][0]
    blob = _load(entry["file"])
    sk = FrequentItemsSketch.deserialize(blob, item_type="str")
    assert sk.estimate("item_7") == entry["estimate"]
    assert sk.serialize("str") == blob

    built = FrequentItemsSketch(64)
    for i in range(40):
        built.update(f"item_{i}", i + 1)
    assert built.serialize("str") == blob


# ---------------------------------------------------------------------------
# tdigest
# ---------------------------------------------------------------------------


def test_tdigest_foreign_decode_quantile_reencode():
    from datasketches_rust_spark.functions.tdigest import TDigest

    entry = _entries("tdigest")[0]
    blob = _load(entry["file"])
    td = TDigest.deserialize(blob)
    # the blob stores the merged centroids; quantile(0.5) over the same
    # centroids must reproduce the reference's interpolation
    assert math.isclose(td.quantile(0.5), entry["estimate"], rel_tol=1e-12)
    assert td.serialize() == blob


# ---------------------------------------------------------------------------
# decode-robustness guards (round-4 review): corrupt blobs must raise,
# not hang a probe loop or poison later updates
# ---------------------------------------------------------------------------


def test_corrupt_set_blob_count_overflow_raises():
    import struct

    from datasketches_rust_spark.functions.hll import HllSketch

    # SET preamble claiming 40 coupons in a 2^5 table
    hdr = (
        struct.pack("<BBBBBBBB", 3, 1, 7, 11, 5, 8, 0, 1)
        + struct.pack("<I", 40)
        + np.arange(1, 41, dtype="<u4").tobytes()
    )
    with pytest.raises(ValueError, match="overflows"):
        HllSketch.deserialize_wire(bytes(hdr))


def test_corrupt_frequencies_lg_cur_overflow_raises():
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    fi = FrequentItemsSketch(64)
    for i in range(20):
        fi.update(i, 1)
    blob = bytearray(fi.serialize("i64"))
    blob[4] = 3  # lie: lg_cur=3 (8 slots) for 20 items
    with pytest.raises(ValueError, match="overflows"):
        FrequentItemsSketch.deserialize(bytes(blob), "i64")


def test_empty_unmerged_cpc_decode_then_update():
    from datasketches_rust_spark.functions.cpc import CpcSketch
    from datasketches_rust_spark.functions.cpc_wire import (
        deserialize_wire,
        serialize_wire,
    )

    sk = deserialize_wire(serialize_wire(CpcSketch(11)))
    assert not sk.merge_flag
    sk.update_u64s(np.arange(10, dtype=np.uint64))  # must not divide by zero
    assert 9.0 < sk.estimate() < 11.0


def test_frequencies_int_key_out_of_range_raises():
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    with pytest.raises(ValueError, match="i64/u64 range"):
        FrequentItemsSketch(64).update(1 << 64, 1)
