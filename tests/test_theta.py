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
    # rebuild/trim property (`hash_table.rs:683-729`)
    cfg = ThetaConfig(lg_k=5)
    vals = np.arange(1000, dtype=np.uint64)
    s = ThetaSketch.from_u64s(vals, cfg)
    assert len(s.entries) == cfg.k
    assert (s.entries < np.uint64(s.theta)).all()
    assert (np.diff(s.entries.astype(np.int64)) > 0).all()  # sorted distinct


def test_union_laws():
    # commutative/associative/idempotent (`hll_union_test.rs:406-515` analog)
    cfg = ThetaConfig(lg_k=6)
    a = ThetaSketch.from_u64s(np.arange(0, 500, dtype=np.uint64), cfg)
    b = ThetaSketch.from_u64s(np.arange(300, 900, dtype=np.uint64), cfg)
    c = ThetaSketch.from_u64s(np.arange(800, 1500, dtype=np.uint64), cfg)

    ab = theta_union([a, b])
    ba = theta_union([b, a])
    assert ab.theta == ba.theta and (ab.entries == ba.entries).all()

    abc1 = theta_union([theta_union([a, b]), c])
    abc2 = theta_union([a, theta_union([b, c])])
    assert abc1.theta == abc2.theta and (abc1.entries == abc2.entries).all()

    aa = theta_union([a, a])
    assert aa.theta == a.theta and (aa.entries == a.entries).all()

    # union equals single-shot sketch of the combined stream
    both = ThetaSketch.from_u64s(np.arange(0, 900, dtype=np.uint64), cfg)
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
