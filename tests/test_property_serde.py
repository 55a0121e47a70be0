"""Property-based round-trip tests (hypothesis) for the wire formats —
serialization must be a bijection on canonical sketch states for ANY
input multiset, not just the fixture cases.
"""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_rust_spark.config import ThetaConfig
from datasketches_rust_spark.functions.bloom import BloomFilter
from datasketches_rust_spark.functions.countmin import CountMinSketch
from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch
from datasketches_rust_spark.functions.hll import HllSketch
from datasketches_rust_spark.functions.substring import (
    _lcs_suffix_array,
    longest_common_substring_len,
)
from datasketches_rust_spark.functions.tdigest import TDigest
from datasketches_rust_spark.functions.theta import ThetaSketch


u64s = st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)


@settings(max_examples=30, deadline=None)
@given(vals=u64s, lg_k=st.integers(min_value=5, max_value=10))
def test_theta_v3_v4_roundtrip_any_input(vals, lg_k):
    cfg = ThetaConfig(lg_k=lg_k)
    sk = ThetaSketch.from_u64s(np.array(vals, np.uint64), cfg)
    for blob in (sk.serialize(), sk.serialize_compressed()):
        rt = ThetaSketch.deserialize(blob, cfg)
        assert rt.theta == sk.theta
        assert np.array_equal(rt.entries, sk.entries)
        assert rt.estimate() == sk.estimate()


@settings(max_examples=20, deadline=None)
@given(vals=u64s, lg_k=st.integers(min_value=4, max_value=10))
def test_hll_wire_roundtrip_any_input(vals, lg_k):
    sk = HllSketch(lg_k)
    sk.update_u64s(np.array(vals, np.uint64))
    rt = HllSketch.deserialize_wire(sk.serialize_wire())
    assert (rt.registers == sk.registers).all()
    assert rt.estimate() == sk.estimate()  # HIP carried when in-order


@settings(max_examples=20, deadline=None)
@given(
    items=st.lists(st.text(max_size=8), max_size=100),
    weights=st.lists(st.integers(min_value=1, max_value=50), max_size=100),
)
def test_frequencies_wire_roundtrip_any_input(items, weights):
    sk = FrequentItemsSketch(64)
    for i, w in zip(items, weights):
        sk.update(i, w)
    rt = FrequentItemsSketch.deserialize(sk.serialize("str"), "str")
    assert rt.counters == sk.counters
    assert rt.offset == sk.offset and rt.stream_weight == sk.stream_weight
    # byte-stability is NOT part of the reference contract: deserialize
    # rebuilds by re-inserting in wire (table-scan) order
    # (`frequencies/sketch.rs:519-523`), and a probe run that wraps the
    # table end can legally re-arrange under that order (the foreign
    # fixtures pin byte parity against actual reference blobs, where it
    # does hold). The contract here is the semantic fixpoint:
    rt2 = FrequentItemsSketch.deserialize(rt.serialize("str"), "str")
    assert rt2.counters == sk.counters
    assert rt2.offset == sk.offset and rt2.stream_weight == sk.stream_weight


@settings(max_examples=20, deadline=None)
@given(keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=200))
def test_bloom_countmin_wire_roundtrip_any_input(keys):
    bf = BloomFilter.with_accuracy(512, 0.01)
    bf.insert_batch(keys)
    rt = BloomFilter.deserialize(bf.serialize())
    assert (rt.words == bf.words).all()
    if keys:
        assert rt.contains_batch(keys).all()

    cm = CountMinSketch(3, 64)
    if keys:
        cm.update_batch(keys)
    rt2 = CountMinSketch.deserialize(cm.serialize())
    assert (rt2.counts == cm.counts).all() and rt2.total_weight == cm.total_weight


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=400
    )
)
def test_tdigest_wire_roundtrip_any_input(vals):
    td = TDigest(50)
    if vals:
        td.update_batch(np.array(vals, np.float64))
    rt = TDigest.deserialize(td.serialize())
    assert rt.total_weight() == td.total_weight()
    if not td.is_empty():
        assert rt.min == td.min and rt.max == td.max
        assert rt.quantile(0.5) == td.quantile(0.5)


@settings(max_examples=30, deadline=None)
@given(
    a=st.text(alphabet="abc ", max_size=60),
    b=st.text(alphabet="abc ", max_size=60),
)
def test_lcs_fast_equals_oracle_any_input(a, b):
    """Small alphabet maximizes repeated-substring structure — the
    adversarial case for the rolling-hash binary search."""
    assert longest_common_substring_len(a, b) == _lcs_suffix_array(a, b)


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_deserializers_reject_garbage_cleanly(data):
    """Checkpoint blobs come from storage; corrupt bytes must raise
    ValueError — never hang, crash the interpreter, or silently
    produce a sketch (unless the bytes happen to be a VALID layout,
    which random bytes essentially never are given the family/version
    checks)."""
    import pytest

    from datasketches_rust_spark.functions.cpc import CpcSketch
    from datasketches_rust_spark.functions.tdigest import TDigest

    for decode in (
        lambda b: ThetaSketch.deserialize(b, ThetaConfig(lg_k=7)),
        BloomFilter.deserialize,
        lambda b: FrequentItemsSketch.deserialize(b, "str"),
        CountMinSketch.deserialize,
        HllSketch.deserialize,
        HllSketch.deserialize_wire,
        CpcSketch.deserialize,
        TDigest.deserialize,
    ):
        try:
            decode(data)
        except (ValueError, UnicodeDecodeError):
            pass  # the contract: a clean, typed rejection


_FAMILY_HEADERS = [
    bytes([3, 3, 3, 0, 0]), bytes([2, 4, 3]), bytes([2, 2, 3, 0]),
    bytes([3, 2, 3, 0]), bytes([3, 1, 3]), bytes([4, 1, 21, 0]),
    bytes([4, 1, 10, 6, 3, 0]), bytes([2, 1, 18, 0]),
    bytes([10, 1, 7, 12, 0, 0, 0, 10]), bytes([1, 1, 20, 100, 0, 2, 0, 0]),
    bytes([2, 1, 20, 100, 0]), bytes([16, 1, 11]), bytes([7, 1, 12]),
]


@settings(max_examples=60, deadline=None)
@given(payload=st.binary(max_size=200))
def test_valid_headers_with_garbage_payloads_rejected(payload):
    """Valid family headers followed by arbitrary payloads — the shape
    a torn checkpoint write produces; must reject cleanly, never
    struct.error/OverflowError (this strategy found four real holes:
    unbounded lg_k allocations and three truncation reads)."""
    import pytest

    from datasketches_rust_spark.functions.cpc import CpcSketch
    from datasketches_rust_spark.functions.tdigest import TDigest

    decoders = (
        lambda b: ThetaSketch.deserialize(b, ThetaConfig(lg_k=7)),
        BloomFilter.deserialize,
        lambda b: FrequentItemsSketch.deserialize(b, "str"),
        CountMinSketch.deserialize,
        HllSketch.deserialize,
        HllSketch.deserialize_wire,
        CpcSketch.deserialize,
        TDigest.deserialize,
        lambda b: TDigest.deserialize(b, is_f32=True),
    )
    for h in _FAMILY_HEADERS:
        for decode in decoders:
            try:
                decode(h + payload)
            except (ValueError, UnicodeDecodeError):
                pass


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(min_value=0, max_value=200), lg_k=st.integers(min_value=5, max_value=8))
def test_truncated_valid_blobs_rejected(cut, lg_k):
    """Every PREFIX of a valid blob must be rejected (or, for formats
    whose payload length is header-driven, never misread)."""
    import pytest

    cfg = ThetaConfig(lg_k=lg_k)
    sk = ThetaSketch.from_u64s(np.arange(1000, dtype=np.uint64), cfg)
    for blob in (sk.serialize(), sk.serialize_compressed()):
        if cut < len(blob):
            try:
                rt = ThetaSketch.deserialize(blob[:cut], cfg)
                # if it decoded, it must NOT silently equal the original
                assert not np.array_equal(rt.entries, sk.entries) or cut >= len(blob)
            except (ValueError, struct.error):
                pass


@settings(max_examples=25, deadline=None)
@given(vals=u64s, lg_k=st.integers(min_value=4, max_value=12))
def test_cpc_fm85_wire_roundtrip_any_input(vals, lg_k):
    """FM85 compressed wire is a bijection on matrix states for any
    input multiset and lg_k (flavor band chosen by the data)."""
    from datasketches_rust_spark.functions.cpc import CpcSketch
    from datasketches_rust_spark.functions.cpc_wire import (
        deserialize_wire,
        serialize_wire,
    )

    sk = CpcSketch(lg_k)
    if vals:
        sk.update_u64s(np.array(vals, np.uint64))
    blob = serialize_wire(sk)
    rt = deserialize_wire(blob)
    assert np.array_equal(rt.matrix, sk.matrix)
    assert serialize_wire(rt) == blob


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=60))
def test_cpc_fm85_wire_rejects_garbage(data):
    """Arbitrary bytes must raise ValueError, never crash or return a
    bogus sketch (the torn-blob contract every family follows)."""
    import pytest

    from datasketches_rust_spark.functions.cpc_wire import deserialize_wire

    try:
        deserialize_wire(data)
    except ValueError:
        pass
