"""Theta sketch semantics tests, mirroring the reference test gates
(`datasketches/tests/theta_sketch_test.rs`, `theta_intersection_test.rs`,
`hash_table.rs:683-729`)."""

import numpy as np
import pytest

from datasketches_rust_spark.config import MAX_THETA, ThetaConfig
from datasketches_rust_spark.functions.theta import (
    ThetaSketch,
    jaccard_estimate,
    theta_intersect,
    theta_union,
)


def test_exact_mode_matches_count_distinct():
    # `theta_sketch_test.rs:146-157`: below k the sketch is exact
    cfg = ThetaConfig(lg_k=12)
    vals = np.arange(2000, dtype=np.uint64)
    s = ThetaSketch.from_u64s(vals, cfg)
    assert not s.is_estimation_mode()
    assert s.estimate() == 2000.0
    assert s.lower_bound(2) == 2000.0
    assert s.upper_bound(2) == 2000.0


def test_estimation_mode_within_2_percent():
    # `theta_sketch_test.rs:178-184`: n=10k, lg_k=12 → rel err < 2%
    cfg = ThetaConfig(lg_k=12)
    vals = np.arange(10_000, dtype=np.uint64)
    s = ThetaSketch.from_u64s(vals, cfg)
    assert s.is_estimation_mode()
    est = s.estimate()
    assert abs(est - 10_000) / 10_000 < 0.02
    assert s.lower_bound(2) <= est <= s.upper_bound(2)
    assert s.lower_bound(1) >= s.lower_bound(2) >= s.lower_bound(3)
    assert s.upper_bound(1) <= s.upper_bound(2) <= s.upper_bound(3)


def test_theta_is_kth_smallest_and_entries_screened():
    # canonical bottom-k trim (`hash_table.rs:683-729`) — the
    # order-independent distributed-agg layer
    from datasketches_rust_spark.hashes import theta_hash_u64s

    cfg = ThetaConfig(lg_k=5)
    vals = np.arange(1000, dtype=np.uint64)
    s = ThetaSketch.from_hashes(theta_hash_u64s(vals, cfg.seed), cfg)
    assert len(s.entries) == cfg.k
    assert (s.entries < np.uint64(s.theta)).all()
    assert (np.diff(s.entries.astype(np.int64)) > 0).all()  # sorted distinct

    # the sequential reference-schedule layer retains between k and
    # 15/16·2k entries (`theta/mod.rs:65`), all screened by its theta
    seq = ThetaSketch.from_u64s(vals, cfg)
    assert cfg.k <= len(seq.entries) <= (15 * (1 << (cfg.lg_k + 1))) // 16
    assert (seq.entries < np.uint64(seq.theta)).all()
    # both layers are unbiased views of the same stream: the canonical
    # sketch's entry set is a subset relation under the smaller theta
    assert seq.theta >= s.theta


def test_union_laws():
    # commutative/associative/idempotent (`hll_union_test.rs:406-515` analog)
    from datasketches_rust_spark.hashes import theta_hash_u64s

    cfg = ThetaConfig(lg_k=6)

    def _build(lo: int, hi: int) -> ThetaSketch:
        return ThetaSketch.from_hashes(
            theta_hash_u64s(np.arange(lo, hi, dtype=np.uint64), cfg.seed), cfg
        )

    a = _build(0, 500)
    b = _build(300, 900)
    c = _build(800, 1500)

    ab = theta_union([a, b])
    ba = theta_union([b, a])
    assert ab.theta == ba.theta and (ab.entries == ba.entries).all()

    abc1 = theta_union([theta_union([a, b]), c])
    abc2 = theta_union([a, theta_union([b, c])])
    assert abc1.theta == abc2.theta and (abc1.entries == abc2.entries).all()

    aa = theta_union([a, a])
    assert aa.theta == a.theta and (aa.entries == a.entries).all()

    # union equals single-shot sketch of the combined stream
    both = _build(0, 900)
    assert ab.theta == both.theta and (ab.entries == both.entries).all()


def test_intersection_exact_semantics():
    # `theta_intersection_test.rs:52-79`
    cfg = ThetaConfig(lg_k=12)
    xy = ThetaSketch.from_strings(["x", "y"], cfg)
    yz = ThetaSketch.from_strings(["y", "z"], cfg)
    i = theta_intersect(xy, yz)
    assert i.estimate() == 1.0
    abc = ThetaSketch.from_strings(["a", "b", "c"], cfg)
    i2 = theta_intersect(i, abc)
    assert i2.estimate() == 0.0


def test_seed_mismatch_rejected():
    a = ThetaSketch.from_u64s(np.arange(10, dtype=np.uint64), ThetaConfig(seed=9001))
    b = ThetaSketch.from_u64s(np.arange(10, dtype=np.uint64), ThetaConfig(seed=12345))
    with pytest.raises(ValueError):
        theta_union([a, b])
    with pytest.raises(ValueError):
        theta_intersect(a, b)


def test_jaccard_estimate_exact_regime():
    cfg = ThetaConfig(lg_k=12)
    a = ThetaSketch.from_u64s(np.arange(0, 100, dtype=np.uint64), cfg)
    b = ThetaSketch.from_u64s(np.arange(50, 150, dtype=np.uint64), cfg)
    assert jaccard_estimate(a, b) == pytest.approx(50 / 150)


def test_serde_roundtrip_and_validation():
    cfg = ThetaConfig(lg_k=5)
    for sk in (
        ThetaSketch.empty(cfg),
        ThetaSketch.from_u64s(np.arange(1, dtype=np.uint64), cfg),
        ThetaSketch.from_u64s(np.arange(10, dtype=np.uint64), cfg),
        ThetaSketch.from_u64s(np.arange(10_000, dtype=np.uint64), cfg),
    ):
        data = sk.serialize()
        rt = ThetaSketch.deserialize(data, cfg)
        assert rt.theta == sk.theta
        assert (rt.entries == sk.entries).all()
        assert rt.estimate() == sk.estimate()

    good = ThetaSketch.from_u64s(np.arange(10_000, dtype=np.uint64), cfg).serialize()
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(good[:12], cfg)  # truncated
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(good, ThetaConfig(lg_k=5, seed=777))  # wrong seed
    bad = bytearray(good)
    bad[2] = 7  # family HLL
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(bytes(bad), cfg)


def test_estimation_theta_fraction():
    cfg = ThetaConfig(lg_k=5)
    s = ThetaSketch.from_u64s(np.arange(10_000, dtype=np.uint64), cfg)
    assert 0.0 < s.theta / MAX_THETA < 1.0
    assert s.estimate() == pytest.approx(len(s.entries) / (s.theta / MAX_THETA))


def test_theta_sampling_probability():
    """p < 1 pre-samples uniformly: theta starts at p*MAX_THETA and the
    estimate still recovers n (`theta/hash_table.rs:400-406`)."""
    import pytest as _pytest

    n = 50_000
    cfg = ThetaConfig(lg_k=14, sampling_p=0.25)
    sk = ThetaSketch.from_u64s(np.arange(n, dtype=np.uint64), cfg)
    assert sk.is_estimation_mode()
    assert sk.theta <= int(0.25 * MAX_THETA)
    assert abs(sk.estimate() - n) / n < 0.05
    assert sk.lower_bound(2) <= n <= sk.upper_bound(2)
    # exact-regime contrast: p=1, small n
    exact = ThetaSketch.from_u64s(np.arange(100, dtype=np.uint64), ThetaConfig(lg_k=14))
    assert exact.estimate() == 100.0
    with _pytest.raises(ValueError):
        ThetaConfig(lg_k=12, sampling_p=0.0)


# ---------------------------------------------------------------------------
# wire-format serde v1-v4 — mirrors the reference's round-trip test
# structure (`theta_serialization_test.rs:28-114`: deserialize → estimate
# → re-serialize → byte-stable → estimate-equal)
# ---------------------------------------------------------------------------

import struct

from datasketches_rust_spark.functions.theta import (
    _pack_bits,
    _unpack_bits,
)


def _cases():
    cfg = ThetaConfig(lg_k=7)
    for n in [0, 1, 10, 100, 1000, 10_000, 100_000]:
        yield n, ThetaSketch.from_u64s(np.arange(n, dtype=np.uint64), cfg), cfg


def test_v4_roundtrip_stable_and_estimate_preserved():
    for n, sk, cfg in _cases():
        blob = sk.serialize_compressed()
        rt = ThetaSketch.deserialize(blob, cfg)
        assert rt.theta == sk.theta
        assert np.array_equal(rt.entries, sk.entries)
        assert rt.estimate() == sk.estimate()
        # byte-stable after round-trip (reference asserts this too)
        assert rt.serialize_compressed() == blob
        # v4 chosen exactly when compressible (`theta/sketch.rs:494-499`)
        if len(sk.entries) == 0 or (len(sk.entries) == 1 and not sk.is_estimation_mode()):
            assert blob[1] == 3
        else:
            assert blob[1] == 4
            # compressed form is smaller than uncompressed for real sizes
            if len(sk.entries) >= 10:
                assert len(blob) < len(sk.serialize())


def test_v4_layout_golden():
    """Hand-computed v4 bytes for a 2-entry exact-mode sketch."""
    cfg = ThetaConfig(lg_k=7)
    sk = ThetaSketch(np.array([5, 9], dtype=np.uint64), MAX_THETA, cfg.seed_hash, cfg.k)
    blob = sk._serialize_v4()
    # deltas [5, 4] → ored 5|4=5 → 3 bits; n=2 → 1 byte count
    assert blob[0] == 1  # pre_longs (exact mode)
    assert blob[1] == 4 and blob[2] == 3
    assert blob[3] == 3  # entry_bits
    assert blob[4] == 1  # num_entries_bytes
    assert struct.unpack_from("<H", blob, 6)[0] == cfg.seed_hash
    assert blob[8] == 2  # num_entries
    # bitstream: 101 100 padded → 0b10110000
    assert blob[9] == 0b10110000
    assert len(blob) == 10
    rt = ThetaSketch.deserialize(blob, cfg)
    assert np.array_equal(rt.entries, sk.entries)


def test_bitpack_kernel_all_widths():
    rng = np.random.default_rng(1)
    for bits in range(1, 64):
        vals = rng.integers(0, 1 << bits, size=37, dtype=np.uint64)
        packed = _pack_bits(vals, bits)
        assert len(packed) == (37 * bits + 7) // 8
        out = _unpack_bits(packed, 37, bits)
        assert np.array_equal(out, vals)


def test_v1_v2_decode_from_hand_built_buffers():
    """Legacy layouts per `theta/sketch.rs:672-775`."""
    cfg = ThetaConfig(lg_k=7)
    entries = np.array([11, 22, 33], dtype=np.uint64)

    # v1: [pre, 1, fam, unused u8, unused u32] [n u32][unused u32][theta u64] entries
    v1 = struct.pack("<BBBBI", 3, 1, 3, 0, 0)
    v1 += struct.pack("<IIQ", 3, 0, MAX_THETA)
    v1 += entries.astype("<u8").tobytes()
    sk1 = ThetaSketch.deserialize(v1, cfg)
    assert np.array_equal(sk1.entries, entries) and sk1.theta == MAX_THETA

    # v1 empty
    v1e = struct.pack("<BBBBI", 3, 1, 3, 0, 0) + struct.pack("<IIQ", 0, 0, MAX_THETA)
    assert ThetaSketch.deserialize(v1e, cfg).is_empty()

    # v2 precise: pre_longs=2, seed hash at 6-7, [n u32][unused u32] entries
    v2 = struct.pack("<BBBBHH", 2, 2, 3, 0, 0, cfg.seed_hash)
    v2 += struct.pack("<II", 3, 0)
    v2 += entries.astype("<u8").tobytes()
    sk2 = ThetaSketch.deserialize(v2, cfg)
    assert np.array_equal(sk2.entries, entries) and sk2.theta == MAX_THETA

    # v2 estimate: pre_longs=3 with explicit theta
    theta = int(0.5 * MAX_THETA)
    keep = entries[entries < theta]
    v2e = struct.pack("<BBBBHH", 3, 2, 3, 0, 0, cfg.seed_hash)
    v2e += struct.pack("<IIQ", len(keep), 0, theta)
    v2e += keep.astype("<u8").tobytes()
    sk2e = ThetaSketch.deserialize(v2e, cfg)
    assert sk2e.theta == theta and np.array_equal(sk2e.entries, keep)

    # v2 empty sentinel
    v2empty = struct.pack("<BBBBHH", 1, 2, 3, 0, 0, cfg.seed_hash)
    assert ThetaSketch.deserialize(v2empty, cfg).is_empty()

    # v2 wrong seed rejected
    bad = bytearray(v2)
    bad[6] ^= 0xFF
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(bytes(bad), cfg)


def test_v4_corruption_rejected():
    cfg = ThetaConfig(lg_k=7)
    sk = ThetaSketch.from_u64s(np.arange(1000, dtype=np.uint64), cfg)
    blob = bytearray(sk.serialize_compressed())
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(bytes(blob[:12]), cfg)  # truncated stream
    blob2 = bytearray(blob)
    blob2[1] = 9
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(bytes(blob2), cfg)  # bad serial version


def test_binomial_bounds_reference_checksums():
    """Replicates `binomial_bounds.rs` run_test_aux(20, ci, 1e-3) and
    compares against the reference's OWN expected checksums
    (`binomial_bounds.rs:602-624`) — covers every regime including the
    2<=n<=120 equivalent-sigma tables and the exact Bayesian searches."""
    from math import log as _ln

    from datasketches_rust_spark.functions.theta import (
        _binomial_lower_bound,
        _binomial_upper_bound,
    )

    expected = {
        1: (7.083330682531043e04, 8.530373642825481e04, 3.273647725073409e04, 3.734024243699785e04, 57750.0),
        2: (6.539415269641498e04, 8.945522372568645e04, 3.222302546497840e04, 3.904738469737429e04, 57750.0),
        3: (6.006043493107306e04, 9.318105731423477e04, 3.186269956585285e04, 4.096466221922520e04, 57750.0),
    }
    for ci, exp in expected.items():
        num_samples, count = 0, 0
        s1 = s2 = s3 = s4 = 0.0
        while num_samples <= 20:
            p = 1.0
            while p >= 1e-3:
                lb = _binomial_lower_bound(num_samples, p, ci)
                ub = _binomial_upper_bound(num_samples, p, ci, False)
                s1 += _ln(lb + 1.0)
                s2 += _ln(ub + 1.0)
                count += 2
                if p < 1.0:
                    lb = _binomial_lower_bound(num_samples, 1.0 - p, ci)
                    ub = _binomial_upper_bound(num_samples, 1.0 - p, ci, False)
                    s3 += _ln(lb + 1.0)
                    s4 += _ln(ub + 1.0)
                    count += 2
                p *= 0.99
            num_samples = max(num_samples + 1, (1001 * num_samples) // 1000)
        got = (s1, s2, s3, s4, float(count))
        for g, e in zip(got, exp):
            assert g == pytest.approx(e, rel=1e-12), (ci, got, exp)


def test_v3_layout_golden_bytes():
    """Hand-assembled v3 wire bytes for a tiny sketch, byte-for-byte
    (`theta/sketch.rs:501-534`): exact-mode 2-entry → pre_longs 2,
    [2,3,3,0,0, flags=RO|COMPACT|ORDERED, seed_hash LE] [n=2 u32]
    [0 u32] [entries LE u64...]; estimation-mode adds theta."""
    import struct

    from datasketches_rust_spark.hashes import compute_seed_hash

    cfg = ThetaConfig(lg_k=7)
    sh = compute_seed_hash(cfg.seed)
    sk = ThetaSketch(np.array([5, 9], dtype=np.uint64), MAX_THETA, sh, cfg.k)
    expected = struct.pack("<BBBHBH", 2, 3, 3, 0, (1 << 1) | (1 << 3) | (1 << 4), sh)
    expected += struct.pack("<I", 2) + b"\x00\x00\x00\x00"
    expected += struct.pack("<QQ", 5, 9)
    assert sk.serialize() == expected

    # estimation mode: pre_longs 3 + explicit theta after the counts
    theta = MAX_THETA // 2
    sk_est = ThetaSketch(np.array([5, 9], dtype=np.uint64), theta, sh, cfg.k)
    exp2 = struct.pack("<BBBHBH", 3, 3, 3, 0, (1 << 1) | (1 << 3) | (1 << 4), sh)
    exp2 += struct.pack("<I", 2) + b"\x00\x00\x00\x00" + struct.pack("<Q", theta)
    exp2 += struct.pack("<QQ", 5, 9)
    assert sk_est.serialize() == exp2

    # empty: single preamble long with the EMPTY flag
    empty = ThetaSketch.empty(cfg).serialize()
    assert empty == struct.pack(
        "<BBBHBH", 1, 3, 3, 0, (1 << 1) | (1 << 2) | (1 << 3) | (1 << 4), sh
    )


def test_v4_rejects_duplicate_entries():
    """A corrupt v4 blob with a zero delta decodes to duplicate
    entries — must be rejected like the v3 strictly-increasing check,
    not silently accepted into union/intersect."""
    import numpy as np
    import pytest

    from datasketches_rust_spark.config import MAX_THETA, ThetaConfig
    from datasketches_rust_spark.functions.theta import ThetaSketch

    cfg = ThetaConfig(lg_k=12)
    bad = ThetaSketch(
        np.array([5, 5], np.uint64), MAX_THETA, cfg.seed_hash, cfg.k
    )._serialize_v4()
    with pytest.raises(ValueError, match="strictly increasing"):
        ThetaSketch.deserialize(bad, cfg)


def test_canonicalize_selection_fast_path_equivalence():
    """The np.partition fast path in _canonicalize must produce the
    identical sketch (entries, theta) as the full unique-sort path —
    including under heavy duplication (falls back), heavy theta
    screening, and exactly-k streams."""
    from datasketches_rust_spark.functions.theta import ThetaSketch, _canonicalize

    def full_path(arr, theta, k):
        h = np.unique(arr.astype(np.uint64, copy=False))
        h = h[(h != 0) & (h < np.uint64(theta))]
        if len(h) > k:
            return h[:k], int(h[k])
        return h, theta

    rng = np.random.default_rng(3)
    k = 4096
    cases = {
        "big_distinct": rng.integers(1, 2**63, 300_000, dtype=np.uint64),
        "heavy_dups": rng.integers(1, 3000, 150_000).astype(np.uint64),
        "screened": rng.integers(0, 2**63, 150_000, dtype=np.uint64),
        "small": rng.integers(1, 2**63, 5_000, dtype=np.uint64),
        "exact_k": np.arange(1, k + 1, dtype=np.uint64),
        "with_zeros": np.concatenate(
            [np.zeros(50_000, np.uint64), rng.integers(1, 2**63, 100_000, dtype=np.uint64)]
        ),
    }
    for name, arr in cases.items():
        theta = 2**61 if name == "screened" else (1 << 63)
        got = _canonicalize(arr, theta, k, 123)
        want_entries, want_theta = full_path(arr, theta, k)
        assert (got.entries == want_entries).all(), name
        assert got.theta == want_theta, name
