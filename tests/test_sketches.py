"""F4 sketch-semantics fixtures (FIXTURES.md) — reference-derived test
gates for countmin / bloom / tdigest / HLL / frequencies."""

import numpy as np
import pytest

from datasketches_rust_spark.functions.bloom import BloomFilter
from datasketches_rust_spark.functions.countmin import (
    CountMinSketch,
    suggest_num_buckets,
    suggest_num_hashes,
)
from datasketches_rust_spark.functions.frequencies import ErrorType, FrequentItemsSketch
from datasketches_rust_spark.functions.hll import HllSketch
from datasketches_rust_spark.functions.tdigest import TDigest


# -- countmin (`countmin_test.rs:48-59`, `sketch.rs:117-151`) -----------------


def test_countmin_sizing():
    assert suggest_num_buckets(0.2) == 14  # ceil(e/0.2)
    assert suggest_num_hashes(0.95) == 3  # ceil(ln(1/0.05))


def test_countmin_exact_smallweight():
    cm = CountMinSketch(3, 1024)
    cm.update("x")
    cm.update("x", 9)
    assert cm.estimate("x") >= 10
    assert cm.lower_bound("x") == cm.estimate("x")
    assert cm.upper_bound("x") == cm.estimate("x") + int(cm.relative_error * cm.total_weight)
    assert cm.estimate("never-seen") == 0


def test_countmin_merge_and_serde():
    a = CountMinSketch(3, 256)
    b = CountMinSketch(3, 256)
    a.update_batch(["x", "y"], np.array([5, 2]))
    b.update_batch(["x", "z"], np.array([1, 7]))
    a.merge(b)
    assert a.estimate("x") >= 6
    assert a.total_weight == 15
    rt = CountMinSketch.deserialize(a.serialize())
    assert (rt.counts == a.counts).all() and rt.total_weight == a.total_weight
    with pytest.raises(ValueError):
        a.merge(a)
    with pytest.raises(ValueError):
        a.merge(CountMinSketch(4, 256))


# -- bloom (`bloom/sketch.rs:571-600`, builder sizing) ------------------------


def test_bloom_sizing_reference_doc():
    bf = BloomFilter.with_accuracy(1000, 0.01)
    assert bf.num_bits >= 9000
    assert bf.num_hashes == 7


def test_bloom_no_false_negatives_and_ops():
    bf = BloomFilter.with_accuracy(2000, 0.01)
    keys = [f"key_{i}" for i in range(1000)]
    bf.insert_batch(keys)
    assert bf.contains_batch(keys).all()
    fp = bf.contains_batch([f"other_{i}" for i in range(5000)]).mean()
    assert fp < 0.02
    assert 0 < bf.load_factor() < 1
    assert bf.estimated_fpp() == pytest.approx(bf.load_factor() ** bf.num_hashes)

    other = BloomFilter(bf.num_bits, bf.num_hashes, bf.seed)
    other.insert_batch(["zzz"])
    bf.union(other)
    assert bf.contains("zzz")
    with pytest.raises(ValueError):
        bf.union(BloomFilter(128, 3))
    rt = BloomFilter.deserialize(bf.serialize())
    assert (rt.words == bf.words).all()


# -- tdigest (`tdigest_test.rs:69-114`) ---------------------------------------


def test_tdigest_many_values_gates():
    n = 10000
    td = TDigest(200)
    td.update_batch(np.arange(n, dtype=np.float64))
    assert td.total_weight() == n
    assert td.min == 0.0 and td.max == n - 1
    assert td.rank(0.0) == pytest.approx(0.0, abs=1e-4)
    assert td.rank(n / 4) == pytest.approx(0.25, abs=1e-4)
    assert td.rank(n / 2) == pytest.approx(0.5, abs=1e-4)
    assert td.rank(n * 3 / 4) == pytest.approx(0.75, abs=1e-4)
    assert td.rank(float(n)) == 1.0
    assert td.quantile(0.0) == 0.0
    assert td.quantile(0.5) == pytest.approx(n / 2, rel=0.03)
    assert td.quantile(0.9) == pytest.approx(n * 0.9, rel=0.01)
    assert td.quantile(0.95) == pytest.approx(n * 0.95, rel=0.01)
    assert td.quantile(1.0) == n - 1
    pmf = td.pmf([n / 2.0])
    assert pmf[0] == pytest.approx(0.5, abs=1e-4)
    assert pmf[1] == pytest.approx(0.5, abs=1e-4)


def _tdigest_update_batch_old_schedule(td, vals):
    """The pre-fast-path update_batch loop, verbatim: fill the Python
    list buffer chunk by chunk and compress at capacity. The fast path
    must reproduce this schedule's serialized state byte-for-byte."""
    vals = np.asarray(vals, np.float64)
    vals = vals[np.isfinite(vals)]
    if len(vals) == 0:
        return
    td.min = min(td.min, float(vals.min()))
    td.max = max(td.max, float(vals.max()))
    pos = 0
    while pos < len(vals):
        room = td.buffer_capacity - len(td.buffer)
        take = vals[pos : pos + room]
        td.buffer.extend(take.tolist())
        pos += len(take)
        if len(td.buffer) >= td.buffer_capacity:
            td.compress()


def test_tdigest_batch_fastpath_equivalence():
    """update_batch's empty-buffer full-chunk fast path (numpy slice
    straight into _do_merge) must be bit-identical to the old
    list-buffer round trip — serialized bytes compared across stream
    shapes, k values, batch splits, and a scalar-seeded buffer."""
    rng = np.random.default_rng(42)
    streams = {
        "uniform": rng.uniform(0, 1e6, 30000),
        "zipf": rng.zipf(1.3, 30000).astype(np.float64),
        "sorted": np.sort(rng.normal(0, 1, 25000)),
        "with_nonfinite": np.concatenate(
            [rng.normal(0, 1, 9000), [np.nan, np.inf, -np.inf] * 100]
        ),
        "tiny": rng.uniform(0, 1, 37),
    }
    for k in (100, 200):
        for name, vals in streams.items():
            for split in (None, 7, 1234):
                a = TDigest(k)
                b = TDigest(k)
                if name == "uniform":
                    # seed a partially filled buffer via scalar updates
                    for v in vals[:13]:
                        a.update(float(v))
                        b.update(float(v))
                    vals = vals[13:]
                chunks = (
                    [vals]
                    if split is None
                    else np.array_split(vals, max(1, len(vals) // split))
                )
                for c in chunks:
                    a.update_batch(c)
                    _tdigest_update_batch_old_schedule(b, c)
                assert a.serialize() == b.serialize(), (k, name, split)


def test_tdigest_nan_inf_ignored_and_merge():
    td = TDigest(100)
    td.update(float("nan"))
    td.update(float("inf"))
    assert td.is_empty()
    a = TDigest(100)
    b = TDigest(100)
    a.update_batch(np.arange(0, 5000, dtype=np.float64))
    b.update_batch(np.arange(5000, 10000, dtype=np.float64))
    a.merge(b)
    assert a.total_weight() == 10000
    assert a.min == 0.0 and a.max == 9999.0
    assert a.quantile(0.5) == pytest.approx(5000, rel=0.05)
    rt = TDigest.deserialize(a.serialize())
    assert rt.total_weight() == 10000
    assert rt.quantile(0.5) == a.quantile(0.5)


# -- HLL (`hll_update_test.rs:22-77`, union laws `hll_union_test.rs`) ---------


@pytest.mark.parametrize("lg_k,n,gate", [(12, 100, 20), (12, 600, 100), (10, 1000, 150)])
def test_hll_accuracy_gates(lg_k, n, gate):
    s = HllSketch(lg_k)
    s.update_u64s(np.arange(n, dtype=np.uint64))
    assert abs(s.estimate() - n) <= gate
    assert s.lower_bound(2) <= s.estimate() <= s.upper_bound(2)


def test_hll_union_laws():
    def mk(lo, hi):
        s = HllSketch(11)
        s.update_u64s(np.arange(lo, hi, dtype=np.uint64))
        return s

    ab = mk(0, 500).union(mk(300, 900))
    ba = mk(300, 900).union(mk(0, 500))
    assert (ab.registers == ba.registers).all()
    aa = mk(0, 500).union(mk(0, 500))
    assert (aa.registers == mk(0, 500).registers).all()
    # union equals single-stream sketch (register-exact, same hash)
    both = mk(0, 900)
    assert (ab.registers == both.registers).all()
    with pytest.raises(ValueError):
        HllSketch(11, seed=1).union(HllSketch(11, seed=2))


def test_hll_mixed_lgk_downsample():
    big = HllSketch(12)
    big.update_u64s(np.arange(2000, dtype=np.uint64))
    small = HllSketch(10)
    small.update_u64s(np.arange(1000, 3000, dtype=np.uint64))
    u = big.union(small)
    assert u.lg_k == 10
    assert abs(u.estimate() - 3000) / 3000 < 0.15


def test_hll_serde_roundtrip():
    s = HllSketch(12)
    s.update_strings([f"value_{i}" for i in range(5000)])
    rt = HllSketch.deserialize(s.serialize())
    assert rt.lg_k == s.lg_k and (rt.registers == s.registers).all()
    with pytest.raises(ValueError):
        HllSketch.deserialize(b"\x03" + s.serialize()[1:])


# -- frequencies exact regime (`frequencies_update_test.rs:93-104`) -----------


def test_frequencies_exact_regime():
    sk = FrequentItemsSketch(64)
    sk.update(1, 5)
    sk.update(2, 1)
    assert sk.is_exact()
    assert sk.estimate(1) == 5 and sk.lower_bound(1) == 5 and sk.upper_bound(1) == 5
    items = sk.frequent_items(ErrorType.NO_FALSE_POSITIVES, threshold=3)
    assert [i[0] for i in items] == [1]


def test_frequencies_float_weights_serialize():
    """ADVICE round 4: float weights must keep stream_weight an int
    (per-distinct-item truncation, matching the insert loop's
    `c = int(c)`) so serialize()'s '<Q' pack never raises."""
    import pandas as pd

    sk = FrequentItemsSketch(64)
    sk.update_batch(
        pd.Series(["a", "b", "a"]), pd.Series([1.9, 2.5, 1.0], dtype="float64")
    )
    # per-distinct truncation: a -> int(2.9) = 2, b -> int(2.5) = 2
    assert sk.stream_weight == 4 and isinstance(sk.stream_weight, int)
    assert sk.estimate("a") == 2 and sk.estimate("b") == 2
    rt = FrequentItemsSketch.deserialize(sk.serialize(), "str")
    assert rt.stream_weight == 4 and rt.counters == sk.counters


def test_frequencies_purge_and_merge():
    sk = FrequentItemsSketch(16)
    for i in range(100):
        sk.update(f"item_{i}")
    assert len(sk.counters) <= sk.purge_threshold
    assert sk.maximum_error > 0
    heavy = FrequentItemsSketch(16)
    heavy.update("big", 1000)
    sk.merge(heavy)
    assert heavy.estimate("big") == 1000
    assert sk.upper_bound("big") >= 1000
    rt = FrequentItemsSketch.deserialize(sk.serialize())
    assert rt.offset == sk.offset and rt.counters == sk.counters


# -- CPC-style PCSA bitmatrix (`cpc/sketch.rs:176-192`, `cpc/union.rs:18-62`) --


def test_cpc_estimate_gates():
    from datasketches_rust_spark.functions.cpc import CpcSketch

    # the reference's OWN gate, met by the ICON port: rel err <= 2% at
    # lg_k=11, n=10k (`cpc_update_test.rs:25,49-62`) — and across the
    # sweep; bounds must bracket the true count
    for n in (100, 1000, 5000, 10_000, 100_000):
        s = CpcSketch(lg_k=11)
        s.update_u64s(np.arange(n, dtype=np.uint64))
        assert abs(s.estimate() - n) / n <= 0.02, n
        assert s.lower_bound(2) <= n <= s.upper_bound(2), n


def test_cpc_icon_estimator_properties():
    """ICON port sanity (`cpc/estimator.rs:391-429`): exact edge cases,
    monotone in num_coupons across the polynomial/exponential seam."""
    from datasketches_rust_spark.functions.cpc import icon_estimate

    assert icon_estimate(11, 0) == 0.0 and icon_estimate(11, 1) == 1.0
    k = 1 << 11
    prev = 0.0
    for c in range(2, 8 * k, 64):
        cur = icon_estimate(11, c)
        assert cur >= prev, c
        assert cur >= c  # N_hat >= coupons collected
        prev = cur
    import pytest as _pt
    with _pt.raises(ValueError):
        icon_estimate(3, 10)


def test_cpc_exact_small_linear_counting():
    from datasketches_rust_spark.functions.cpc import CpcSketch

    s = CpcSketch(lg_k=11)
    assert s.estimate() == 0.0
    s.update_strings([f"value_{i}" for i in range(100)])
    assert abs(s.estimate() - 100) / 100 <= 0.02


def test_cpc_union_laws_and_serde():
    from datasketches_rust_spark.functions.cpc import CpcSketch

    def build(lo, hi, lg_k=11):
        s = CpcSketch(lg_k)
        s.update_u64s(np.arange(lo, hi, dtype=np.uint64))
        return s

    a, b = build(0, 60_000), build(40_000, 100_000)
    ab = build(0, 60_000).union(b)
    ba = build(40_000, 100_000).union(a)
    assert (ab.matrix == ba.matrix).all()  # commutative
    aa = build(0, 60_000).union(a)
    assert (aa.matrix == a.matrix).all()  # idempotent
    assert abs(ab.estimate() - 100_000) / 100_000 <= 0.04
    rt = CpcSketch.deserialize(ab.serialize())
    assert (rt.matrix == ab.matrix).all() and rt.lg_k == ab.lg_k
    # mixed lg_k downsample: row folding keeps a valid estimate
    small = build(0, 50_000, lg_k=9).union(build(25_000, 75_000, lg_k=11))
    assert small.lg_k == 9
    assert abs(small.estimate() - 75_000) / 75_000 <= 0.12  # sigma ~3.4% at k=512

    with pytest.raises(ValueError):
        CpcSketch(lg_k=11, seed=777).union(a)


# -- tdunning-format cross-implementation golden fixtures --------------------


def test_tdigest_reference_fixture_parity():
    """Decode the reference repo's vendored tdunning-format fixtures
    (k=100, n=10000, values 0..9999) and reproduce the reference's own
    rank gates (`tdigest_serialization_test.rs:90-124`)."""
    import os

    from datasketches_rust_spark.functions.tdigest import deserialize_compat

    base = "/root/reference/datasketches/tests/test_data"
    if not os.path.isdir(base):
        pytest.skip("reference fixtures not available")
    n = 10000
    for name in (
        "tdigest_ref_k100_n10000_double.sk",
        "tdigest_ref_k100_n10000_float.sk",
    ):
        with open(f"{base}/{name}", "rb") as f:
            td = deserialize_compat(f.read())
        assert td.k == 100, name
        assert td.total_weight() == n, name
        assert td.min == 0.0 and td.max == float(n - 1), name
        assert abs(td.rank(0.0) - 0.0) <= 1e-4, name
        assert abs(td.rank(n / 4) - 0.25) <= 1e-4, name
        assert abs(td.rank(n / 2) - 0.5) <= 1e-4, name
        assert abs(td.rank(n * 3 / 4) - 0.75) <= 1e-4, name
        assert td.rank(float(n)) == 1.0, name


# ---------------------------------------------------------------------------
# bloom family-21 / frequencies family-10 wire formats — mirror the
# reference round-trip structure (`bloom_serialization_test.rs`,
# `frequencies_serialization_test.rs`): serialize → deserialize →
# byte-stable + query-equal
# ---------------------------------------------------------------------------

import struct as _struct


def test_bloom_wire_layout_and_roundtrip():
    from datasketches_rust_spark.functions.bloom import BloomFilter

    bf = BloomFilter.with_accuracy(1000, 0.01, seed=9001)
    bf.insert_batch(list(range(500)))
    blob = bf.serialize()
    # header per `bloom/sketch.rs:335-376`
    assert blob[0] == 4 and blob[1] == 1 and blob[2] == 21 and blob[3] == 0
    nh, _u = _struct.unpack_from("<HH", blob, 4)
    assert nh == bf.num_hashes
    (seed,) = _struct.unpack_from("<Q", blob, 8)
    assert seed == 9001
    num_longs, _pad = _struct.unpack_from("<iI", blob, 16)
    assert num_longs == len(bf.words)
    (nbs,) = _struct.unpack_from("<Q", blob, 24)
    assert nbs == bf.bits_used()
    assert len(blob) == 32 + num_longs * 8

    rt = BloomFilter.deserialize(blob)
    assert rt.serialize() == blob
    assert rt.contains_batch(list(range(500))).all()

    # empty form: 3 preamble longs, EMPTY flag, no payload
    empty = BloomFilter.with_accuracy(100, 0.01, seed=1).serialize()
    assert empty[0] == 3 and empty[3] == (1 << 2) and len(empty) == 24
    rte = BloomFilter.deserialize(empty)
    assert rte.bits_used() == 0 and rte.serialize() == empty

    # dirty num_bits_set sentinel → recount (`bloom/sketch.rs:474-487`)
    dirty = bytearray(blob)
    _struct.pack_into("<Q", dirty, 24, 0xFFFFFFFFFFFFFFFF)
    rtd = BloomFilter.deserialize(bytes(dirty))
    assert rtd.bits_used() == bf.bits_used()

    import pytest as _pt
    bad = bytearray(blob); bad[2] = 3
    with _pt.raises(ValueError):
        BloomFilter.deserialize(bytes(bad))
    with _pt.raises(ValueError):
        BloomFilter.deserialize(blob[:20])


def test_frequencies_wire_layout_and_roundtrip():
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    sk = FrequentItemsSketch(64)
    for i, w in [("apple", 5), ("pear", 2), ("plum", 9)]:
        sk.update(i, w)
    blob = sk.serialize()
    # header per `frequencies/sketch.rs:426-453`
    assert blob[0] == 4 and blob[1] == 1 and blob[2] == 10
    assert blob[3] == 6  # lg_max = log2(64)
    assert blob[5] == 0  # flags
    n, _u, sw, off = _struct.unpack_from("<IIQQ", blob, 8)
    assert n == 3 and sw == 16 and off == 0
    # counts block then items block (values before keys, `sketch.rs:446-452`)
    counts = _struct.unpack_from("<3Q", blob, 32)
    assert sorted(counts) == [2, 5, 9]

    rt = FrequentItemsSketch.deserialize(blob, "str")
    assert rt.serialize() == blob
    assert rt.estimate("plum") == 9 and rt.stream_weight == 16

    # i64-typed items: 8 LE bytes each (`serialization.rs:96-110`)
    ski = FrequentItemsSketch(32)
    ski.update(-7, 3)
    ski.update(12345, 1)
    blobi = ski.serialize()
    rti = FrequentItemsSketch.deserialize(blobi, "i64")
    assert rti.estimate(-7) == 3 and rti.serialize("i64") == blobi

    # empty: 8 bytes, pre_longs 1, EMPTY flag bits
    e = FrequentItemsSketch(64).serialize()
    assert len(e) == 8 and e[0] == 1 and e[5] == 5
    assert FrequentItemsSketch.deserialize(e).is_exact()

    import pytest as _pt
    bad = bytearray(blob); bad[2] = 21
    with _pt.raises(ValueError):
        FrequentItemsSketch.deserialize(bytes(bad))


# -- HLL composite + HIP estimator port (`hll/estimator.rs`) ------------------


def test_hll_hip_matches_sequential_and_is_tighter():
    """HIP accumulator: batch-vectorized == strict sequential updates;
    reference gates (`hll_update_test.rs:36-43,91-95`: |est−100| < 20,
    |est−1000| < 150) hold for BOTH estimators."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10**12, size=5000, dtype=np.uint64)
    batch = HllSketch(11)
    batch.update_u64s(vals)
    seq = HllSketch(11)
    for chunk in np.array_split(vals, 97):
        seq.update_u64s(chunk)
    assert batch.hip_accum == pytest.approx(seq.hip_accum, rel=1e-12)
    for n, gate in [(100, 20), (1000, 150)]:
        s = HllSketch(11)
        s.update_u64s(np.arange(n, dtype=np.uint64))
        assert abs(s.estimate() - n) < gate  # HIP path
        o = HllSketch(11)
        o.out_of_order = True
        o.update_u64s(np.arange(n, dtype=np.uint64))
        assert abs(o.composite_estimate() - n) < gate  # composite path


def test_hll_composite_linear_counting_exact_regime():
    """k >> n: the harmonic-number bitmap estimate rounds to the exact
    count (the regime the hll_distinct_by_nation oracle runs in)."""
    for n in (10, 60, 300):
        s = HllSketch(16)
        s.out_of_order = True
        s.update_u64s(np.arange(n, dtype=np.uint64) * np.uint64(2654435761))
        assert round(s.composite_estimate()) == n


def test_hll_merge_goes_out_of_order():
    a = HllSketch(11)
    a.update_u64s(np.arange(1000, dtype=np.uint64))
    assert not a.out_of_order and a.hip_accum > 0
    b = HllSketch(11)
    b.update_u64s(np.arange(500, 1500, dtype=np.uint64))
    a.union(b)
    assert a.out_of_order and a.hip_accum == 0.0
    # estimate() now routes to composite
    assert a.estimate() == a.composite_estimate()
    # deserialize is out-of-order too (`estimator.rs:286-297`)
    rt = HllSketch.deserialize(b.serialize())
    assert rt.out_of_order


def test_hll_rel_err_tables():
    """Bounds use the measured quantile tables for lg_k <= 12 and the
    analytic RSE above (`estimator.rs:328-372`)."""
    s = HllSketch(10)
    s.update_u64s(np.arange(10000, dtype=np.uint64))
    for nsd in (1, 2, 3):
        lb, ub = s.lower_bound(nsd), s.upper_bound(nsd)
        assert lb < s.estimate() < ub
        # wider bands for more std devs
    assert s.lower_bound(3) < s.lower_bound(1)
    assert s.upper_bound(3) > s.upper_bound(1)
    big = HllSketch(14)
    big.update_u64s(np.arange(100000, dtype=np.uint64))
    assert big.lower_bound(2) <= 100000 <= big.upper_bound(2)


def test_hll_family7_wire_format():
    """serialize_wire emits the DS HLL-mode/HLL8 layout
    (`hll/array8.rs:307-347`); deserialize_wire round-trips it and
    decodes LIST/SET coupon blobs (`hll/list.rs:78-103`,
    `hll/hash_set.rs:96-121`)."""
    import struct as _st

    s = HllSketch(10)
    s.update_u64s(np.arange(5000, dtype=np.uint64))
    s.out_of_order = True
    blob = s.serialize_wire()
    assert blob[0] == 10 and blob[1] == 1 and blob[2] == 7 and blob[3] == 10
    assert blob[7] == (2 | (2 << 2))  # HLL mode, HLL8 target
    assert len(blob) == 40 + (1 << 10)
    rt = HllSketch.deserialize_wire(blob)
    assert (rt.registers == s.registers).all()
    assert rt.composite_estimate() == s.composite_estimate()

    # in-order sketch keeps its HIP accumulator across the wire
    h = HllSketch(10)
    h.update_u64s(np.arange(1000, dtype=np.uint64))
    rt2 = HllSketch.deserialize_wire(h.serialize_wire())
    assert not rt2.out_of_order and rt2.estimate() == h.estimate()

    # LIST-mode blob: header + 3 compact coupons
    from datasketches_rust_spark.functions.hll import _coupons_from_h
    from datasketches_rust_spark.hashes import murmur3_x64_128_u64s

    h1, h2 = murmur3_x64_128_u64s(np.arange(3, dtype=np.uint64), 9001)
    slot26, value = _coupons_from_h(h1, h2)
    coupons = (value.astype(np.uint32) << 26) | slot26.astype(np.uint32)
    lst = _st.pack("<BBBBBBBB", 2, 1, 7, 10, 3, 8, 3, 0)  # compact flag, count=3, LIST/HLL4
    lst += coupons.astype("<u4").tobytes()
    sk = HllSketch.deserialize_wire(lst)
    ref = HllSketch(10)
    ref.update_u64s(np.arange(3, dtype=np.uint64))
    assert (sk.registers == ref.registers).all()

    # SET-mode blob: 12-byte preamble + coupons
    st = _st.pack("<BBBBBBBB", 3, 1, 7, 10, 5, 8, 0, 1) + _st.pack("<I", 3)
    st += coupons.astype("<u4").tobytes()
    sk2 = HllSketch.deserialize_wire(st)
    assert (sk2.registers == ref.registers).all()

    import pytest as _pt
    bad = bytearray(blob); bad[7] = 2 | (3 << 2)  # invalid target type
    with _pt.raises(ValueError):
        HllSketch.deserialize_wire(bytes(bad))


def test_countmin_family18_wire_format():
    """Layout per `countmin/sketch.rs:273-304`: 16-byte preamble with
    seed hash, total_weight then row-major 8-byte counters."""
    import struct as _st

    from datasketches_rust_spark.hashes import compute_seed_hash

    cm = CountMinSketch(3, 32)
    cm.update_batch(["a", "b", "a"], np.array([5, 2, 1]))
    blob = cm.serialize()
    assert blob[0] == 2 and blob[1] == 1 and blob[2] == 18 and blob[3] == 0
    nb, nh, sh = _st.unpack_from("<IBH", blob, 8)
    assert (nb, nh) == (32, 3) and sh == compute_seed_hash(cm.seed)
    (tw,) = _st.unpack_from("<q", blob, 16)
    assert tw == 8
    assert len(blob) == 24 + 3 * 32 * 8
    rt = CountMinSketch.deserialize(blob)
    assert rt.estimate("a") == cm.estimate("a") and rt.total_weight == 8
    assert rt.serialize() == blob

    # empty form: preamble only, EMPTY flag
    e = CountMinSketch(3, 32).serialize()
    assert len(e) == 16 and e[3] == 1
    assert CountMinSketch.deserialize(e).total_weight == 0

    with pytest.raises(ValueError):
        CountMinSketch.deserialize(blob, seed=777)  # wrong seed hash
    bad = bytearray(blob); bad[2] = 3
    with pytest.raises(ValueError):
        CountMinSketch.deserialize(bytes(bad))


def test_tdigest_family20_wire_format():
    """Layout per `tdigest/sketch.rs:404-474`: preamble, flags
    (empty/single/reverse), centroid (mean f64, weight u64) pairs;
    f32 read variant and tdunning auto-dispatch kept."""
    import struct as _st

    td = TDigest(100)
    td.update_batch(np.arange(10_000, dtype=np.float64))
    blob = td.serialize()
    assert blob[0] == 2 and blob[1] == 1 and blob[2] == 20
    (k,) = _st.unpack_from("<H", blob, 3)
    assert k == 100
    n, _u = _st.unpack_from("<II", blob, 8)
    mn, mx = _st.unpack_from("<dd", blob, 16)
    assert mn == 0.0 and mx == 9999.0
    assert len(blob) == 32 + 16 * n
    rt = TDigest.deserialize(blob)
    assert rt.total_weight() == 10_000
    assert rt.quantile(0.5) == td.quantile(0.5)
    assert rt.serialize() == blob

    # empty and single-value forms
    e = TDigest(50).serialize()
    assert len(e) == 8 and e[0] == 1 and (e[5] & 1)
    assert TDigest.deserialize(e).is_empty()
    s = TDigest(50)
    s.update(42.5)
    sb = s.serialize()
    assert len(sb) == 16 and (sb[5] & 2)
    rs = TDigest.deserialize(sb)
    assert rs.total_weight() == 1 and rs.min == 42.5 == rs.max

    # f32 centroid variant (C++ tdigest<float> layout)
    n32 = 3
    f32blob = _st.pack("<BBBHBH", 2, 1, 20, 100, 0, 0)
    f32blob += _st.pack("<II", n32, 0) + _st.pack("<ff", 1.0, 3.0)
    for m, w in [(1.0, 2), (2.0, 5), (3.0, 1)]:
        f32blob += _st.pack("<fI", m, w)
    rf = TDigest.deserialize(f32blob, is_f32=True)
    assert rf.total_weight() == 8 and rf.min == 1.0 and rf.max == 3.0

    import pytest as _pt
    bad = bytearray(blob); bad[2] = 3
    with _pt.raises(ValueError):
        TDigest.deserialize(bytes(bad))


def test_hll_wire_hll6_and_hll4_decode():
    """Decode 6-bit packed (array6.rs:72-97) and 4-bit nibble + aux-map
    (array4.rs:78-106) register payloads built to the reference layout."""
    import struct as _st

    rng = np.random.default_rng(5)
    lg_k = 8
    k = 1 << lg_k
    regs = rng.integers(0, 40, size=k).astype(np.uint8)

    # --- HLL6: little-endian 6-bit fields
    num_bytes6 = ((k * 3) >> 2) + 1
    bitstream = np.zeros(num_bytes6 * 8, np.uint8)
    for s in range(k):
        for b in range(6):
            bitstream[s * 6 + b] = (regs[s] >> b) & 1
    payload6 = np.packbits(bitstream, bitorder="little").tobytes()
    head6 = _st.pack("<BBBBBBBB", 10, 1, 7, lg_k, 0, 16, 0, 2 | (1 << 2))  # OOO, HLL/HLL6
    head6 += _st.pack("<dddII", 0.0, 0.0, 0.0, int((regs == 0).sum()), 0)
    sk6 = HllSketch.deserialize_wire(head6 + payload6)
    assert (sk6.registers == regs).all() and sk6.out_of_order

    # --- HLL4: cur_min offset nibbles, overflows in the aux map
    cur_min = 2
    regs4 = np.clip(regs, cur_min, None).astype(np.uint8)
    over = np.flatnonzero(regs4 - cur_min >= 15)
    nibbles = np.minimum(regs4 - cur_min, 15).astype(np.uint8)
    packed = (nibbles[0::2] | (nibbles[1::2] << 4)).astype(np.uint8)
    aux = np.array(
        [(int(regs4[s]) << 26) | int(s) for s in over], dtype="<u4"
    )
    head4 = _st.pack("<BBBBBBBB", 10, 1, 7, lg_k, 0, 16, cur_min, 2 | (0 << 2))
    head4 += _st.pack("<dddII", 0.0, 0.0, 0.0, 0, len(aux))
    blob4 = head4 + packed.tobytes() + aux.tobytes()
    sk4 = HllSketch.deserialize_wire(blob4)
    assert (sk4.registers == regs4).all()


def test_hll_wire_encode_all_targets_roundtrip():
    """serialize_wire supports all three DS target types; each decodes
    back to identical registers (HLL4 via cur_min offset + aux list)."""
    rng = np.random.default_rng(11)
    s = HllSketch(9)
    s.update_u64s(rng.integers(0, 10**9, size=20000, dtype=np.uint64))
    s.out_of_order = True
    for target in ("hll8", "hll6", "hll4"):
        blob = s.serialize_wire(target)
        rt = HllSketch.deserialize_wire(blob)
        assert (rt.registers == s.registers).all(), target
        assert rt.composite_estimate() == s.composite_estimate(), target
    # hll4 is the smallest form, hll8 the largest
    assert len(s.serialize_wire("hll4")) < len(s.serialize_wire("hll6")) < len(
        s.serialize_wire("hll8")
    )


def test_hll_sparse_coupon_write_side_bit_equal():
    """Sparse (coupon-list) write side must decode to registers
    bit-equal to the dense update path, with bounded blob size for
    low-cardinality inputs (VERDICT r2 #4)."""
    import numpy as np

    from datasketches_rust_spark.functions.hll import HllSketch, serialize_coupons

    for lg_k, n in [(16, 5), (16, 1000), (12, 200), (10, 3)]:
        vals = (np.arange(n) * 7919 + 13).astype(np.uint64)
        dense = HllSketch(lg_k)
        dense.out_of_order = True
        dense.update_u64s(vals)
        blob = serialize_coupons(HllSketch.coupons_from_u64s(vals), lg_k)
        sparse = HllSketch.deserialize(blob)
        assert np.array_equal(sparse.registers, dense.registers)
        assert sparse.estimate() == dense.estimate()
        # a 5-item key must not cost 2^lg_k bytes on the wire
        assert len(blob) <= 15 + 4 * n
        # auto-choice round trip: whichever form serialize() picks,
        # registers survive exactly
        rt = HllSketch.deserialize(dense.serialize())
        assert np.array_equal(rt.registers, dense.registers)
    tiny = HllSketch(16)
    tiny.out_of_order = True
    tiny.update_u64s(np.arange(5).astype(np.uint64))
    assert len(tiny.serialize()) < 64  # not 64 KB
    assert tiny.serialize()[1] == 2  # sparse ver byte
    # mixed-lg_k union still works through sparse blobs (slot re-mask)
    a = HllSketch.deserialize(
        serialize_coupons(HllSketch.coupons_from_u64s(np.arange(50, dtype=np.uint64)), 14)
    )
    b = HllSketch(10)
    b.out_of_order = True
    b.update_u64s(np.arange(25, 80).astype(np.uint64))
    assert abs(a.union(b).estimate() - 80) / 80 < 0.1


def test_cpc_sparse_coupon_write_side_bit_equal():
    import numpy as np

    from datasketches_rust_spark.functions.cpc import CpcSketch, serialize_cpc_coupons

    for lg_k, n in [(11, 5), (11, 2000), (8, 100)]:
        vals = (np.arange(n) * 104729 + 7).astype(np.uint64)
        dense = CpcSketch(lg_k)
        dense.update_u64s(vals)
        blob = serialize_cpc_coupons(CpcSketch.coupons_from_u64s(vals), lg_k)
        sparse = CpcSketch.deserialize(blob)
        assert np.array_equal(sparse.matrix, dense.matrix)
        assert len(blob) <= 15 + 4 * n
        rt = CpcSketch.deserialize(dense.serialize())
        assert np.array_equal(rt.matrix, dense.matrix)
    tiny = CpcSketch(11)
    tiny.update_u64s(np.arange(10).astype(np.uint64))
    assert len(tiny.serialize()) < 64  # not 16 KB
    assert tiny.serialize()[1] == 2


def test_frequencies_sampled_median_purge():
    """Purge median selection parity (VERDICT r2 missing #5):
    upper-median (select_nth at n/2) like the reference, full-map
    median when active <= limit, deterministic hash-ordered subsample
    above the 1024 budget (membership divergence from the reference's
    table-order sampling is documented in the docstring)."""
    import numpy as np

    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    # small map: purge uses min(1024, threshold=6) of 7 values —
    # deterministic; error bounds still hold
    sk = FrequentItemsSketch(8)
    for i, w in enumerate([10, 20, 30, 40, 50, 60, 70]):
        sk.update(f"i{i}", w)
    assert sk.offset > 0  # purged
    for i, w in enumerate([10, 20, 30, 40, 50, 60, 70]):
        lb = sk.estimate(f"i{i}") - sk.offset if f"i{i}" in sk.counters else 0
        assert lb <= w <= (sk.estimate(f"i{i}") + sk.offset if f"i{i}" in sk.counters else sk.offset)

    # big map: > 1024 active entries at purge time → hash subsample;
    # must be deterministic across runs and insertion orders
    big_a = FrequentItemsSketch(4096)
    big_b = FrequentItemsSketch(4096)
    items = [(f"x{i}", 1 + (i % 97)) for i in range(3073)]
    for it, w in items:
        big_a.update(it, w)
    for it, w in reversed(items):
        big_b.update(it, w)
    # both purged exactly once at the same fill with the same sample
    assert big_a.offset == big_b.offset > 0

    # upper-median semantics: for an even count the reference takes
    # element n/2 (upper), not the average of the two middles
    sk2 = FrequentItemsSketch(8)
    for i, w in enumerate([1, 1, 1, 1, 1, 100, 100]):
        sk2.update(f"j{i}", w)
    # sorted sample of min(6,7) values: median index 3 → value 1
    assert sk2.offset == 1


def test_hll_wire_decode_rejects_crafted_headers():
    """Decode-robustness regression (round-4 review): header bytes are
    untrusted — a crafted lg_arr must not size allocations or admit
    coupon counts that overflow the estimator tables."""
    import struct as _st

    # SET blob with lg_arr=26 at lg_k=12: valid max is lg_k-3=9; the
    # old code allocated a 2^26-entry probe table from the header
    crafted = _st.pack("<BBBBBBBB", 3, 1, 7, 12, 26, 8, 0, 1) + _st.pack("<I", 1)
    crafted += _st.pack("<I", 123)
    with pytest.raises(ValueError, match="lg_arr"):
        HllSketch.deserialize_wire(crafted)

    # SET mode is impossible below lg_k=8 (list promotes straight to
    # dense there)
    crafted = _st.pack("<BBBBBBBB", 3, 1, 7, 6, 5, 8, 0, 1) + _st.pack("<I", 0)
    with pytest.raises(ValueError, match="lg_arr"):
        HllSketch.deserialize_wire(crafted)

    # LIST blob claiming 9 coupons: a valid list promotes at 8
    from datasketches_rust_spark.functions.hll import _coupons_from_h
    from datasketches_rust_spark.hashes import murmur3_x64_128_u64s

    h1, h2 = murmur3_x64_128_u64s(np.arange(9, dtype=np.uint64), 9001)
    slot26, value = _coupons_from_h(h1, h2)
    coupons = ((value.astype(np.uint32) << 26) | slot26.astype(np.uint32)).astype("<u4")
    lst = _st.pack("<BBBBBBBB", 2, 1, 7, 12, 3, 8, 9, 0) + coupons.tobytes()
    with pytest.raises(ValueError, match="coupons"):
        HllSketch.deserialize_wire(lst)

    # non-compact LIST with an absurd lg_arr
    lst = _st.pack("<BBBBBBBB", 2, 1, 7, 12, 30, 0, 0, 0)
    with pytest.raises(ValueError, match="lg_arr"):
        HllSketch.deserialize_wire(lst)


def test_hll_wire_decoded_full_list_still_promotes():
    """A decoded 8-coupon LIST (legal boundary) must promote on the
    next novel update instead of growing the list unboundedly."""
    import struct as _st

    from datasketches_rust_spark.functions.hll import _coupons_from_h
    from datasketches_rust_spark.hashes import murmur3_x64_128_u64s

    h1, h2 = murmur3_x64_128_u64s(np.arange(8, dtype=np.uint64), 9001)
    slot26, value = _coupons_from_h(h1, h2)
    coupons = ((value.astype(np.uint32) << 26) | slot26.astype(np.uint32)).astype("<u4")
    blob = _st.pack("<BBBBBBBB", 2, 1, 7, 12, 3, 8, 8, 0) + coupons.tobytes()
    sk = HllSketch.deserialize_wire(blob)
    assert sk.mode == "list" and len(sk.coupon_list) == 8
    sk.update_u64s(np.arange(8, 400, dtype=np.uint64))
    assert sk.mode in ("set", "hll")  # promoted, not a 400-entry list
    ref = HllSketch(12)
    ref.update_u64s(np.arange(400, dtype=np.uint64))
    assert sk.serialize_wire() == ref.serialize_wire()


def test_hll_serialize_does_not_mutate_live_sketch():
    """serialize() (engine shuffle layout) must densify a copy: a
    checkpointed-then-continued coupon sketch keeps its coupon-mode
    estimator class and bounds."""
    sk = HllSketch(12)
    sk.update_u64s(np.arange(20, dtype=np.uint64))
    assert sk.mode in ("list", "set")
    est0, lo0, hi0 = sk.estimate(), sk.lower_bound(2), sk.upper_bound(2)
    blob = sk.serialize()
    assert sk.mode in ("list", "set")  # unchanged by serialization
    assert (sk.estimate(), sk.lower_bound(2), sk.upper_bound(2)) == (est0, lo0, hi0)
    # and the blob still decodes to the same registers as a dense build
    dec = HllSketch.deserialize(blob)
    ref = HllSketch.from_coupons(
        np.array(sk._coupons_in_container_order(), dtype=np.uint32), 12
    )
    assert (dec.registers == ref.registers).all()


def test_frequencies_decode_rejects_oversized_map_header():
    """Family-10 decode guard: lg_max/lg_cur come from untrusted bytes
    and size the probe-table rebuild — cap them before allocating."""
    import struct as _st

    crafted = _st.pack("<BBBBBBH", 4, 1, 10, 60, 26, 0, 0)
    crafted += _st.pack("<IIQQ", 1, 0, 1, 0)
    crafted += _st.pack("<Q", 1) + _st.pack("<I", 1) + b"a"
    with pytest.raises(ValueError, match="lg_max"):
        FrequentItemsSketch.deserialize(crafted)
    with pytest.raises(ValueError, match="2\\^24"):
        FrequentItemsSketch(1 << 25)


def test_empty_flag_decode_paths_cap_allocation():
    """Bloom/countmin EMPTY blobs are fixed-size headers whose claimed
    dimensions are not backed by payload — the decoder must reject
    absurd sizes instead of allocating them."""
    import struct as _st

    from datasketches_rust_spark.hashes import compute_seed_hash

    # bloom: EMPTY flag + num_longs = 2^30
    blob = _st.pack(
        "<BBBBHHQiI", 3, 1, 21, BloomFilter._EMPTY_FLAG, 3, 0, 9001, 1 << 30, 0
    )
    with pytest.raises(ValueError, match="too large"):
        BloomFilter.deserialize(blob)

    # countmin: EMPTY flag + 255 x 2^31 counters from a 16-byte header
    blob = _st.pack(
        "<BBBBIIBHB", 1, 1, 18, CountMinSketch._EMPTY_FLAG, 0, 1 << 31, 255,
        compute_seed_hash(9001), 0,
    )
    with pytest.raises(ValueError, match="too large"):
        CountMinSketch.deserialize(blob)

    # tdigest f32: truncated centroid payload gets the clean error, not
    # a raw numpy buffer error (the f64 branch already had this check)
    blob = _st.pack("<BBBHBH", 2, 1, 20, 100, 0, 0)
    blob += _st.pack("<II", 1000, 0) + _st.pack("<ff", 0.0, 1.0)
    blob += b"\x00" * 16  # claims 1000 centroids, carries 2
    with pytest.raises(ValueError, match="truncated tdigest centroids"):
        TDigest.deserialize(blob, is_f32=True)


def test_countmin_vectorized_int_path_matches_tobytes_path():
    """Integer arrays skip the per-item _to_bytes loop via the u64
    murmur kernel — must land every item in the same buckets as the
    byte-packing path (same counts, same estimates), including
    negative and small-dtype keys."""
    vals = np.array([0, 1, 7, -1, -12345, 2**62, -(2**62)], dtype=np.int64)
    w = np.arange(1, len(vals) + 1, dtype=np.int64)

    fast = CountMinSketch(3, 256)
    fast.update_batch(vals, w)  # ndarray → vectorized path
    slow = CountMinSketch(3, 256)
    slow.update_batch(list(vals), w)  # list → _to_bytes path
    assert (fast.counts == slow.counts).all()
    assert fast.total_weight == slow.total_weight
    assert (fast.estimate_batch(vals) == slow.estimate_batch(list(vals))).all()

    # unsigned values >= 2^63 keep raw bits
    u = np.array([2**63, 2**64 - 1, 5], dtype=np.uint64)
    fa = CountMinSketch(3, 256)
    fa.update_batch(u)
    sl = CountMinSketch(3, 256)
    sl.update_batch([int(x) for x in u])
    assert (fa.counts == sl.counts).all()

    # int32 sign-extends like _to_bytes' 8-byte signed packing
    i32 = np.array([-5, 42], dtype=np.int32)
    fa = CountMinSketch(3, 256)
    fa.update_batch(i32)
    sl = CountMinSketch(3, 256)
    sl.update_batch([int(x) for x in i32])
    assert (fa.counts == sl.counts).all()


def test_bloom_vectorized_int_path_matches_tobytes_path():
    """Integer arrays skip the per-item _to_bytes packing — identical
    bit positions, membership, and serialized words as the list path."""
    vals = np.array([0, 1, 7, -1, -999999, 2**62, -(2**62)], dtype=np.int64)
    fast = BloomFilter.with_accuracy(1000, 0.01)
    fast.insert_batch(vals)
    slow = BloomFilter.with_accuracy(1000, 0.01)
    slow.insert_batch([int(v) for v in vals])
    assert (fast.words == slow.words).all()
    assert fast.contains_batch(vals).all()
    assert (fast.contains_batch(vals) == slow.contains_batch(list(vals))).all()

    u = np.array([2**63, 2**64 - 1, 5], dtype=np.uint64)
    fa = BloomFilter.with_accuracy(100, 0.01)
    fa.insert_batch(u)
    sl = BloomFilter.with_accuracy(100, 0.01)
    sl.insert_batch([int(x) for x in u])
    assert (fa.words == sl.words).all()


def test_frequencies_vectorized_int_hash_matches_bytes_path():
    """Integer key batches hash through the u64 murmur kernel — h1 must
    be bit-identical to packing each key via _item_hash_bytes (the
    reference's i64/u64 LE `Hash` feed), across signed, >=2**63, and
    small-dtype inputs; strings keep the packed path."""
    import struct

    from datasketches_rust_spark.functions.frequencies import _hash_items
    from datasketches_rust_spark.hashes import DEFAULT_UPDATE_SEED, murmur3_x64_128

    def ref_i64(v):
        fmt = "<q" if v < (1 << 63) else "<Q"
        return murmur3_x64_128(struct.pack(fmt, v), DEFAULT_UPDATE_SEED)[0]

    ints = [-(2**62), -5, 0, 1, 12345, 2**62]
    assert _hash_items(np.array(ints, dtype=np.int64)).tolist() == [
        ref_i64(v) for v in ints
    ]
    # uint64 above the i64 range packs "<Q"
    bigs = [2**63, 2**64 - 1]
    assert _hash_items(np.array(bigs, dtype=np.uint64)).tolist() == [
        ref_i64(v) for v in bigs
    ]
    # small dtypes sign/zero-extend to the 64-bit image
    assert _hash_items(np.array([-5, 42], dtype=np.int32)).tolist() == [
        ref_i64(-5),
        ref_i64(42),
    ]
    # strings keep the utf8+0xff packed path
    assert _hash_items(["abc"]).tolist() == [
        murmur3_x64_128(b"abc\xff", DEFAULT_UPDATE_SEED)[0]
    ]
    # mixed/object lists fall back to the packed path, same answers
    assert _hash_items([3, "x"]).tolist() == [
        ref_i64(3),
        murmur3_x64_128(b"x\xff", DEFAULT_UPDATE_SEED)[0],
    ]


def test_frequencies_batch_path_state_matches_pre_optimization():
    """The inlined batch insert loop + vectorized purge keep the probe
    table byte-identical to the per-call form: pinned end-state on a
    purge-heavy stream (offset, weight, active set, layout order)."""
    import pandas as pd

    from datasketches_rust_spark.functions.frequencies import (
        _hash_items as _freq_hash_items,
    )

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5_000, 200_000)
    sk = FrequentItemsSketch(256)
    for i in range(0, len(keys), 16384):
        sk.update_batch(pd.Series(keys[i : i + 16384]))
    # reference run: the identical stream through scalar per-key updates
    # of the same pre-aggregated (key, count) sequence
    slow = FrequentItemsSketch(256)
    for i in range(0, len(keys), 16384):
        vc = pd.Series(keys[i : i + 16384]).value_counts()
        for item, c in zip(list(vc.index), vc.to_numpy().tolist()):
            slow.stream_weight += int(c)
            slow._adjust_or_put(
                item, int(c), int(_freq_hash_items([item])[0])
            )
            slow._maybe_resize_or_purge()
    assert sk.offset == slow.offset
    assert sk.stream_weight == slow.stream_weight
    assert sk._keys == slow._keys
    assert sk._vals == slow._vals
    assert sk._states == slow._states


def test_frequencies_wiped_epoch_fast_forward_equivalence():
    """The batch path's wiped-epoch fast-forward (unit-count suffix on
    an emptied max-size table skips whole purge cycles, bumping offset
    once per cycle) and the empty-reset purge must leave state
    bit-identical to the pre-aggregated per-item schedule — across the
    uniform regime it targets, a mixed-count prefix that disables it,
    strings, and partial tails."""
    import pandas as pd

    from datasketches_rust_spark.functions.frequencies import _hash_items

    def per_item(sk, series):
        vc = series.value_counts()
        for item, c in zip(list(vc.index), vc.to_numpy().tolist()):
            if c == 0:
                continue
            sk.stream_weight += int(c)
            sk._adjust_or_put(item, int(c), int(_hash_items([item])[0]))
            sk._maybe_resize_or_purge()

    rng = np.random.default_rng(13)
    streams = {
        # all-unit counts, >> capacity: pure fast-forward regime,
        # including a non-epoch-aligned tail
        "uniform": pd.Series((np.arange(120_001) % 60_000).astype(np.int64)),
        # heavy head then unit tail: fast-forward engages mid-batch
        "mixed": pd.Series(
            np.concatenate(
                [np.repeat(np.arange(50), 40), np.arange(70_000) % 50_000]
            ).astype(np.int64)
        ),
        # strings exercise the packed-hash path
        "strings": pd.Series(["s%05d" % v for v in rng.integers(0, 30_000, 90_000)]),
    }
    for name, data in streams.items():
        fast, slow = FrequentItemsSketch(1024), FrequentItemsSketch(1024)
        for lo in range(0, len(data), 16384):
            fast.update_batch(data[lo : lo + 16384])
            per_item(slow, data[lo : lo + 16384])
        item_type = "str" if data.dtype == object else "i64"
        assert fast.serialize(item_type=item_type) == slow.serialize(
            item_type=item_type
        ), name
        assert (fast.offset, fast.stream_weight, fast._num_active) == (
            slow.offset,
            slow.stream_weight,
            slow._num_active,
        ), name
        assert fast._keys == slow._keys and fast._states == slow._states, name


def test_cpc_novelty_prefilter_state_equivalence():
    """_absorb's vectorized already-set pre-filter must leave the full
    sequential-schedule state (matrix, kxp, HIP, window offset, first
    interesting column) identical to feeding every coupon through
    _update_sequential unfiltered — on a duplicate-heavy stream that
    crosses the sparse→windowed promotion and several window moves."""
    from datasketches_rust_spark.functions.cpc import CpcSketch
    from datasketches_rust_spark.hashes import murmur3_x64_128_u64s

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 60_000, 400_000, dtype=np.uint64)  # ~7x dup rate
    a = CpcSketch(10)
    for lo in range(0, len(vals), 8192):
        a.update_u64s(vals[lo : lo + 8192])
    b = CpcSketch(10)
    h1, h2 = murmur3_x64_128_u64s(vals, b.seed)
    rows = (h1 & np.uint64(b.k - 1)).astype(np.int64)
    from datasketches_rust_spark.functions.cpc import _clz64

    cols = np.minimum(_clz64(h2), 63).astype(np.int64)
    b._update_sequential(rows, cols)
    assert (a.matrix == b.matrix).all()
    assert a.kxp == b.kxp
    assert a.hip_est_accum == b.hip_est_accum
    assert a.window_offset == b.window_offset
    assert a.first_interesting_column == b.first_interesting_column
    assert a.estimate() == b.estimate()
