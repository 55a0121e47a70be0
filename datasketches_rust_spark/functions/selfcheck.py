"""Deterministic driver-side self-check gates for sketch API surface
that has no natural per-row SQL oracle.

Each function exercises one family's pytest-only operations (set
algebra, counter maintenance, frozen-state transitions, header-only
wire reads) on fixed deterministic inputs and returns a dict of named
booleans. The driver queries fold these booleans into their output as
literal columns whose oracle pins TRUE — the same engine-computed-gate
pattern as the estimation-accuracy queries (a broken operation flips a
boolean and hash-mismatches the sweep). pytest additionally asserts
every gate is True so a regression is caught twice.

All inputs are fixed arrays (no clocks, no RNG): the booleans are
bit-stable across runs, hosts, and parallelism levels.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bloom_algebra_gates",
    "countmin_maintenance_gates",
    "tdigest_query_gates",
    "cpc_wrapper_gates",
    "theta_serde_gates",
    "hll_estimator_gates",
    "minhash_kernel_gates",
    "hash_golden_gates",
]


def bloom_algebra_gates() -> dict[str, bool]:
    """intersect / invert / stats / contains_and_insert gates
    (`bloom/sketch.rs:174-232` set ops, `:252-284` stats, `:118-140`
    contains_and_insert).

    Deterministic facts used:
    - every item inserted into BOTH operands of an intersect is
      contained in the result (bitwise-AND keeps all its bits);
    - an inserted item is NEVER contained in the inverted filter
      (all its positions were 1, so all are 0 after inversion);
    - invert is an involution on the bit words (serialize-equal);
    - bits_used after inserts is in (0, num_hashes * n_items];
    - contains_and_insert returns False on first sight of an item
      not sharing all bit positions with prior items, True after.
    """
    from .bloom import BloomFilter

    probes = [f"gate-item-{i}" for i in range(384)]
    a_items, b_items = probes[:256], probes[128:]  # overlap = 128..256

    proto = BloomFilter.with_accuracy(max_items=4096, fpp=1e-9)
    nb, nh = proto.num_bits, proto.num_hashes

    bf_a = BloomFilter(nb, nh)
    bf_a.insert_batch(a_items)
    bf_b = BloomFilter(nb, nh)
    bf_b.insert_batch(b_items)

    inter = BloomFilter.deserialize(bf_a.serialize()).intersect(bf_b)
    overlap = probes[128:256]
    only_a, only_b = probes[:128], probes[256:]
    intersect_ok = bool(
        inter.contains_batch(overlap).all()
        # fpp 1e-9 config → the one-sided items are (deterministically,
        # at this load) not all-bits-covered by the other side
        and not inter.contains_batch(only_a).any()
        and not inter.contains_batch(only_b).any()
    )

    inv = BloomFilter.deserialize(bf_a.serialize()).invert()
    invert_ok = bool(
        not inv.contains_batch(a_items).any()
        and inv.invert().serialize() == bf_a.serialize()
    )

    used = bf_a.bits_used()
    stats_ok = bool(
        0 < used <= nh * len(a_items)
        and abs(bf_a.load_factor() - used / nb) < 1e-12
        and 0.0 < bf_a.estimated_fpp() < 1.0
    )

    fresh = BloomFilter(nb, nh)
    first = fresh.contains_and_insert("cai-probe")
    second = fresh.contains_and_insert("cai-probe")
    cai_ok = bool(first is False and second is True)

    return {
        "intersect_ok": intersect_ok,
        "invert_ok": invert_ok,
        "stats_ok": stats_ok,
        "cai_ok": cai_ok,
    }


def countmin_maintenance_gates() -> dict[str, bool]:
    """halve / decay gates (`countmin/sketch.rs:427-458`).

    estimate = min over rows of the item's counters; floor(x/2) and
    floor(x*d) are monotone non-decreasing, so min commutes with them:
    the post-halve estimate is exactly pre // 2 and the post-decay
    estimate exactly floor(pre * d), item by item.
    """
    from .countmin import CountMinSketch

    items = [f"cm-gate-{i}" for i in range(64)]
    weights = np.arange(64, dtype=np.int64) * 7 + 3

    cm = CountMinSketch(3, 1024)
    cm.update_batch(items, weights=weights)
    before = cm.estimate_batch(items).astype(np.int64)
    w_before = cm.total_weight

    cm.halve()
    after_halve = cm.estimate_batch(items).astype(np.int64)
    halve_ok = bool(
        (after_halve == before // 2).all() and cm.total_weight == w_before // 2
    )

    cm2 = CountMinSketch(3, 1024)
    cm2.update_batch(items, weights=weights)
    cm2.decay(0.25)
    after_decay = cm2.estimate_batch(items).astype(np.int64)
    decay_ok = bool(
        (after_decay == (before * 0.25).astype(np.int64)).all()
        and cm2.total_weight == int(w_before * 0.25)
    )

    return {"halve_ok": halve_ok, "decay_ok": decay_ok}


def tdigest_query_gates() -> dict[str, bool]:
    """cdf / pmf / freeze-unfreeze gates (`tdigest/sketch.rs` rank
    path; TDigestMut → TDigest transition).

    On a fixed 10k-value input: cdf over a split grid is monotone
    non-decreasing in [0, 1] with the sentinel 1.0 appended; pmf is
    the non-negative discrete derivative summing to 1; freeze()
    preserves every query answer bit-for-bit, rejects update, and
    unfreeze() restores the update path.
    """
    from .tdigest import TDigest

    # fixed interleaved order (not sorted, not random): exercises the
    # buffered-merge path deterministically
    vals = np.arange(10_000, dtype=np.float64)
    vals = np.concatenate([vals[::2], vals[1::2][::-1]])

    td = TDigest(200)
    td.update_batch(vals)

    splits = [0.0, 500.0, 2_500.0, 5_000.0, 7_500.0, 9_999.0]
    c = td.cdf(splits)
    cdf_ok = bool(
        len(c) == len(splits) + 1
        and all(0.0 <= x <= 1.0 for x in c)
        and all(c[i] <= c[i + 1] + 1e-15 for i in range(len(c) - 1))
        and c[-1] == 1.0
        and c[0] <= 0.001  # rank of the minimum
    )

    p = td.pmf(splits)
    pmf_ok = bool(
        len(p) == len(c)
        and all(x >= -1e-15 for x in p)
        and abs(sum(p) - 1.0) < 1e-12
    )

    q_before = (td.quantile(0.5), td.rank(5_000.0), tuple(td.cdf(splits)))
    td.freeze()
    q_frozen = (td.quantile(0.5), td.rank(5_000.0), tuple(td.cdf(splits)))
    try:
        td.update(1.0)
        frozen_rejects = False
    except ValueError:
        frozen_rejects = True
    td.unfreeze()
    td.update(1.0)  # must not raise
    freeze_ok = bool(
        q_before == q_frozen
        and frozen_rejects
        and td.total_weight() == len(vals) + 1
    )

    return {"cdf_ok": cdf_ok, "pmf_ok": pmf_ok, "freeze_ok": freeze_ok}


def theta_serde_gates() -> dict[str, bool]:
    """Legacy-wire decode + torn-blob rejection gates.

    - v1v2_ok: hand-built v1 and v2 buffers (exact / estimation /
      empty layouts per `theta/sketch.rs:672-775`) decode to the
      expected entries and theta; a wrong v2 seed hash is rejected.
    - torn_reject_ok: for every family wire (theta v4, HLL family-7,
      CPC FM85, bloom family-21, countmin family-18, frequencies
      family-10, tdigest family-20), a mid-body truncation of a real
      blob raises instead of decoding garbage.
    """
    import struct

    from .theta import MAX_THETA, ThetaConfig, ThetaSketch

    cfg = ThetaConfig(lg_k=7)
    entries = np.array([11, 22, 33], dtype=np.uint64)

    v1 = struct.pack("<BBBBI", 3, 1, 3, 0, 0)
    v1 += struct.pack("<IIQ", 3, 0, MAX_THETA)
    v1 += entries.astype("<u8").tobytes()
    sk1 = ThetaSketch.deserialize(v1, cfg)

    theta = int(0.5 * MAX_THETA)
    keep = entries[entries < theta]
    v2e = struct.pack("<BBBBHH", 3, 2, 3, 0, 0, cfg.seed_hash)
    v2e += struct.pack("<IIQ", len(keep), 0, theta)
    v2e += keep.astype("<u8").tobytes()
    sk2 = ThetaSketch.deserialize(v2e, cfg)

    bad = bytearray(v2e)
    bad[6] ^= 0xFF
    try:
        ThetaSketch.deserialize(bytes(bad), cfg)
        seed_rejected = False
    except ValueError:
        seed_rejected = True

    v1v2_ok = bool(
        np.array_equal(sk1.entries, entries)
        and sk1.theta == MAX_THETA
        and np.array_equal(sk2.entries, keep)
        and sk2.theta == theta
        and seed_rejected
    )

    torn_reject_ok = _torn_blobs_rejected()
    return {"v1v2_ok": v1v2_ok, "torn_reject_ok": torn_reject_ok}


def _torn_blobs_rejected() -> bool:
    """One real blob per family, truncated mid-body → must raise."""
    from .bloom import BloomFilter
    from .countmin import CountMinSketch
    from .cpc import CpcSketch
    from . import cpc_wire
    from .frequencies import FrequentItemsSketch
    from .hll import HllSketch
    from .tdigest import TDigest
    from .theta import ThetaConfig, ThetaSketch

    vals = np.arange(500, dtype=np.uint64)
    blobs: list[tuple[bytes, object]] = []

    tcfg = ThetaConfig(lg_k=7)
    th = ThetaSketch.from_hashes(
        (np.arange(1, 1000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        >> np.uint64(1),
        tcfg,
    )
    blobs.append((th.serialize(), lambda b: ThetaSketch.deserialize(b, tcfg)))

    h = HllSketch(10)
    h.update_u64s(vals)
    blobs.append((h.serialize_wire("hll8"), HllSketch.deserialize_wire))

    c = CpcSketch(10)
    c.update_u64s(vals)
    blobs.append((cpc_wire.serialize_wire(c), cpc_wire.deserialize_wire))

    bf = BloomFilter.with_accuracy(1024, 1e-6)
    bf.insert_batch([f"t{i}" for i in range(100)])
    blobs.append((bf.serialize(), BloomFilter.deserialize))

    cm = CountMinSketch(3, 256)
    cm.update_batch([f"t{i}" for i in range(100)])
    blobs.append((cm.serialize(), CountMinSketch.deserialize))

    import pandas as pd

    fi = FrequentItemsSketch(64)
    fi.update_batch(pd.Series([f"t{i % 7}" for i in range(100)]))
    blobs.append((fi.serialize("str"), FrequentItemsSketch.deserialize))

    td = TDigest(100)
    td.update_batch(np.arange(1000, dtype=np.float64))
    blobs.append((td.serialize(), TDigest.deserialize))

    for blob, decode in blobs:
        torn = blob[: max(9, len(blob) * 2 // 3)]
        try:
            decode(torn)
            return False  # decoded a torn blob — guard broken
        except Exception:
            pass
    return True


def hll_estimator_gates() -> dict[str, bool]:
    """HIP estimator + serde-mode gates.

    - hip_ok: the reference's own accuracy contract
      (`hll_update_test.rs:36-43,91-95`: |est−100| < 20,
      |est−1000| < 150) holds on the HIP path, and the HIP accumulator
      is chunking-invariant (one batch equals 97 sequential chunks).
    - serde_modes_ok: one sketch encoded as HLL8, HLL6, and HLL4+aux
      all decode back to identical register arrays and estimates.
    """
    from .hll import HllSketch

    vals = (np.arange(5000, dtype=np.uint64) * 2_654_435_761) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    batch = HllSketch(11)
    batch.update_u64s(vals)
    seq = HllSketch(11)
    for chunk in np.array_split(vals, 97):
        seq.update_u64s(chunk)
    hip_ok = bool(abs(batch.hip_accum - seq.hip_accum) <= 1e-9 * abs(seq.hip_accum))
    for n, gate in ((100, 20), (1000, 150)):
        s = HllSketch(11)
        s.update_u64s(np.arange(n, dtype=np.uint64))
        hip_ok = hip_ok and abs(s.estimate() - n) < gate

    serde_modes_ok = True
    base = HllSketch(11)
    base.update_u64s(vals[:2000])
    ref_est = base.estimate()
    for target in ("hll8", "hll6", "hll4"):
        enc = base.serialize_wire(target)
        dec = HllSketch.deserialize_wire(enc)
        serde_modes_ok = serde_modes_ok and (
            np.array_equal(dec.registers, base.registers)
            and abs(dec.estimate() - ref_est) <= 1e-9 * max(1.0, ref_est)
        )
    return {"hip_ok": bool(hip_ok), "serde_modes_ok": bool(serde_modes_ok)}


def minhash_kernel_gates() -> dict[str, bool]:
    """Vectorized MinHash kernel vs the single-threaded oracle + the
    partial/final merge law (signature(A ∪ B) slots = elementwise min;
    `SURVEY §A.2`, theta-union analog) on fixed texts."""
    from ..config import MinHashConfig
    from ..hashes import MASK64, murmur3_x64_128
    from .minhash import EMPTY_SLOT, merge_signatures, minhash_signatures

    cfg = MinHashConfig()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b",
        "",
        "one two three four five six seven eight nine ten",
    ]

    def oracle_signature(text: str) -> list[int]:
        toks = text.lower().split()
        if not toks:
            return [int(EMPTY_SLOT)] * cfg.num_perm
        th = [(murmur3_x64_128(t.encode(), cfg.seed)[0] >> 1) for t in toks]
        if len(toks) < cfg.shingle_k:
            groups = [th]
        else:
            groups = [
                th[i : i + cfg.shingle_k]
                for i in range(len(toks) - cfg.shingle_k + 1)
            ]
        sh = [
            murmur3_x64_128(
                b"".join(int(x).to_bytes(8, "little") for x in g), cfg.seed
            )[0]
            >> 1
            for g in groups
        ]
        a, b = cfg.permutations()
        return [
            min((int(a[i]) * x + int(b[i])) & MASK64 for x in sh)
            for i in range(cfg.num_perm)
        ]

    sigs = minhash_signatures(texts, cfg)
    kernel_ok = all(
        [int(x) for x in sigs[i]] == oracle_signature(t)
        for i, t in enumerate(texts)
    )
    merged = merge_signatures(sigs[0], sigs[3])
    merge_ok = bool(
        (merge_signatures(sigs[3], sigs[0]) == merged).all()
        and (merge_signatures(merged, merged) == merged).all()
        and (merged == np.minimum(sigs[0], sigs[3])).all()
    )
    return {"minhash_kernel_ok": bool(kernel_ok), "minhash_merge_ok": merge_ok}


def hash_golden_gates() -> dict[str, bool]:
    """Hash-kernel golden vectors as driver-visible booleans (the last
    pytest-only Part-A rows): murmur3 x64-128 scalar + vectorized vs
    the reference's verbatim test vectors (`hash/murmurhash.rs:189-231`),
    xxhash64 scalar + vectorized vs the reference's length-sweep vectors
    (`hash/xxhash.rs:200-236`), and seed→seed_hash
    (`hash/mod.rs:47-56`). The u64 fast paths (the kernels every theta/
    HLL/CPC build actually runs) are pinned to literals derived from
    the golden-pinned scalar byte path (equivalence proven in
    tests/test_hashes.py; the literals here freeze that state against
    regression)."""
    from ..hashes import (
        compute_seed_hash,
        murmur3_x64_128,
        murmur3_x64_128_arr,
        murmur3_x64_128_u64s,
        pack_bytes,
        theta_hash_u64s,
        xxhash64,
        xxhash64_arr,
        xxhash64_u64s,
    )

    murmur_vectors = [
        # (key, seed, h1, h2) — reference murmurhash.rs:189-231 verbatim
        (b"The quick brown fox jumps over the lazy dog", 0,
         0xE34BBC7BBC071B6C, 0x7A433CA9C49A9347),
        (b"The quick brown fox jumps over the lazy eog", 0,
         0x362108102C62D1C9, 0x3285CD100292B305),
        (b"The quick brown fox jumps over the lazy dogdogdog", 0,
         0x9C8205300E612FC4, 0xCBC0AF6136AA3DF9),
        (b"The quick brown fox jumps over the lazy1", 0,
         0xE3301A827E5CDFE3, 0xBDBF05F8DA0F0392),
        (b"The quick brown fox jumps over t", 0,
         0xDF6AF91BB29BDACF, 0x91A341C58DF1F3A6),
    ]
    scalar_ok = all(
        murmur3_x64_128(k, s) == (e1, e2) for k, s, e1, e2 in murmur_vectors
    )
    buf, starts, lengths = pack_bytes([k for k, _, _, _ in murmur_vectors])
    v1, v2 = murmur3_x64_128_arr(buf, starts, lengths, seed=0)
    vec_ok = all(
        (int(v1[i]), int(v2[i])) == (e1, e2)
        for i, (_, _, e1, e2) in enumerate(murmur_vectors)
    )
    u64_vals = np.array([0, 1, 12345, (1 << 63) - 1], dtype=np.uint64)
    u1, u2 = murmur3_x64_128_u64s(u64_vals, seed=9001)
    th = theta_hash_u64s(u64_vals, seed=9001)
    u64_ok = (
        [int(x) for x in u1]
        == [0x40890191DCC2D7CB, 0x0B430D7B96FBF22B, 0x67B7283CF739CDF6, 0x378C281569B4BAFF]
        and [int(x) for x in u2]
        == [0x9A7ACDBE1B80EFB2, 0xE8EA0960D4246765, 0x5176E0D4908867C9, 0x3D30CC98FFFA7545]
        and [int(x) for x in th]
        == [0x204480C8EE616BE5, 0x05A186BDCB7DF915, 0x33DB941E7B9CE6FB, 0x1BC6140AB4DA5D7F]
    )

    # xxhash64 vectors: reference xxhash.rs:200-236 — hashes of the
    # first `n` bytes of the reference's deterministic prime-walk buffer
    gen, xx_buf = 0x9E3779B1, bytearray(101)
    for i in range(101):
        xx_buf[i] = (gen >> 56) & 0xFF
        gen = (gen * 0x9E3779B185EBCA8D) & ((1 << 64) - 1)
    xx_buf = bytes(xx_buf)
    xx_vectors = [
        (0, 0, 0xEF46DB3751D8E999),
        (1, 0, 0xE934A84ADB052768),
        (32, 0, 0x18B216492BB44B70),
        (33, 0, 0x55C8DC3E578F5B59),
        (100, 0, 0x4BFE019CD91D9EA4),
        (0, 0x9E3779B1, 0xAC75FDA2929B17EF),
        (1, 0x9E3779B1, 0x5014607643A9B4C3),
        (32, 0x9E3779B1, 0xB3F33BDF93ADE409),
        (100, 0x9E3779B1, 0x4853706DC9625CAE),
    ]
    xx_scalar_ok = all(xxhash64(xx_buf[:n], s) == e for n, s, e in xx_vectors)
    keys0 = [xx_buf[:n] for n, s, _ in xx_vectors if s == 0]
    b0, s0, l0 = pack_bytes(keys0)
    xv = xxhash64_arr(b0, s0, l0, seed=0)
    xx_vec_ok = [int(x) for x in xv] == [e for _, s, e in xx_vectors if s == 0]
    xseeds = np.array([0, 9001, 9001, 42], dtype=np.uint64)
    xu = xxhash64_u64s(u64_vals, xseeds)
    xx_u64_ok = [int(x) for x in xu] == [
        0x34C96ACDCADB1BBB, 0xEFE8454A6499F311, 0x136835E11309B824, 0xD2F1C616AE7EB306
    ]

    seed_ok = compute_seed_hash(9001) == 37836 and compute_seed_hash(0) == 50123
    seed_consistent = all(
        compute_seed_hash(s) == (murmur3_x64_128(int(s).to_bytes(8, "little"), 0)[0] & 0xFFFF)
        for s in (1, 9001, 0xDEADBEEF)
    )
    return {
        "murmur_golden_ok": bool(scalar_ok and vec_ok and u64_ok),
        "xxhash_golden_ok": bool(xx_scalar_ok and xx_vec_ok and xx_u64_ok),
        "seed_hash_golden_ok": bool(seed_ok and seed_consistent),
    }


def cpc_wrapper_gates() -> dict[str, bool]:
    """CpcWrapper header-only read gate (`cpc/wrapper.rs`): across
    sparse/hybrid/pinned/sliding flavors, the wrapper's O(header)
    estimate equals the full deserialize's estimate exactly, and the
    coupon count / merge flag round-trip."""
    from .cpc import CpcSketch
    from . import cpc_wire as W

    ok = True
    for n in (0, 50, 3_000, 50_000):
        sk = CpcSketch(11)
        if n:
            sk.update_u64s(np.arange(n, dtype=np.uint64))
        blob = W.serialize_wire(sk)
        wr = W.CpcWrapper(blob)
        full = W.deserialize_wire(blob)
        ok = ok and (
            wr.lg_k == 11
            and wr.num_coupons == sk.num_coupons()
            and wr.estimate() == full.estimate()
            and wr.merge_flag is False
        )
    return {"wrapper_ok": bool(ok)}
