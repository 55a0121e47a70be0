"""CPC FM85 compressed wire format tests.

No foreign .sk fixtures exist for CPC in this checkout (only tdigest
ships binary fixtures — see BASELINE.md fixture table), so the gates
are the ones available in-container, mirroring the reference's own
round-trip suite (`tests/cpc_serialization_test.rs:28-62`): byte-
stable round-trip per flavor, plus derivation checks that our startup-
built decode tables are element-equal to the reference's vendored
DECODING_* tables (the strongest cross-checkable invariant here: the
vendored decode tables were generated upstream from the same encoding
tables we extracted).
"""

import numpy as np
import pytest

from datasketches_rust_spark.functions import cpc_wire as W
from datasketches_rust_spark.functions.cpc import CpcSketch

LG_K = 11
# n chosen per flavor band: C<3K/32 | <K/2 | <27K/8 | >=27K/8
FLAVOR_CASES = [
    (0, W.FLAVOR_EMPTY),
    (50, W.FLAVOR_SPARSE),
    (400, W.FLAVOR_HYBRID),
    (3000, W.FLAVOR_PINNED),
    (50000, W.FLAVOR_SLIDING),
    (500000, W.FLAVOR_SLIDING),  # deep sliding: offset > 1, early zone
]


@pytest.mark.parametrize("n,flavor", FLAVOR_CASES)
def test_roundtrip_per_flavor(n, flavor):
    sk = CpcSketch(LG_K)
    if n:
        sk.update_u64s(np.arange(n).astype(np.uint64))
    assert W.determine_flavor(LG_K, sk.num_coupons()) == flavor
    blob = W.serialize_wire(sk)
    rt = W.deserialize_wire(blob)
    assert np.array_equal(rt.matrix, sk.matrix)
    assert rt.estimate() == sk.estimate()
    # byte-stable re-serialization, like cpc_serialization_test.rs:46-52
    assert W.serialize_wire(rt) == blob
    # compressed wire must beat the dense engine layout for real data
    if n:
        assert len(blob) < 8 * (1 << LG_K)


@pytest.mark.parametrize("lg_k", [4, 8, 12, 16])
def test_roundtrip_across_lg_k(lg_k):
    rng = np.random.default_rng(lg_k)
    for n in (1, 7, (1 << lg_k) // 3, 6 << lg_k):
        sk = CpcSketch(lg_k)
        sk.update_u64s(rng.integers(0, 1 << 62, size=n).astype(np.uint64))
        rt = W.deserialize_wire(W.serialize_wire(sk))
        assert np.array_equal(rt.matrix, sk.matrix), (lg_k, n)


def test_header_layout_golden():
    """Structural asserts against the preamble contract
    (`cpc/sketch.rs:461-473`, `cpc/serialization.rs:24-48`)."""
    empty = W.serialize_wire(CpcSketch(LG_K))
    assert len(empty) == 8
    pre, ver, fam, lg_k, fic, flags = empty[:6]
    assert (pre, ver, fam, lg_k, fic) == (2, 1, 16, LG_K, 0)
    # a fresh update-path sketch is un-merged: HIP flag set even when
    # empty (`cpc/sketch.rs:458`), but no HIP block until C > 0
    assert flags == (1 << W._FLAG_COMPRESSED) | (1 << W._FLAG_HAS_HIP)

    sk = CpcSketch(LG_K)
    sk.update_u64s(np.arange(50).astype(np.uint64))  # sparse, un-merged
    b = W.serialize_wire(sk)
    assert b[0] == 8  # 2 + coupons + HIP(4) + table_data_words
    assert b[5] == (
        (1 << W._FLAG_COMPRESSED)
        | (1 << W._FLAG_HAS_HIP)
        | (1 << W._FLAG_HAS_TABLE)
    )
    assert int.from_bytes(b[8:12], "little") == sk.num_coupons()

    # the merged form of the same matrix drops the HIP block
    msk = CpcSketch(LG_K, sk.seed, sk.matrix.copy())
    mb = W.serialize_wire(msk)
    assert mb[0] == 4  # 2 + coupons + table_data_words
    assert mb[5] == (1 << W._FLAG_COMPRESSED) | (1 << W._FLAG_HAS_TABLE)

    sk2 = CpcSketch(LG_K)
    sk2.merge_flag = True
    sk2.update_u64s(np.arange(50000).astype(np.uint64))  # sliding
    b2 = W.serialize_wire(sk2)
    assert b2[0] == 6  # 2 + coupons + entries + table_words + window_words
    assert b2[5] == (
        (1 << W._FLAG_COMPRESSED)
        | (1 << W._FLAG_HAS_TABLE)
        | (1 << W._FLAG_HAS_WINDOW)
    )


def test_decode_tables_match_reference_vendored():
    """Our startup-derived decode tables and inverse permutations must
    equal the reference's vendored DECODING_* constants bit for bit —
    this pins the Huffman codeword semantics without binary fixtures."""
    import re
    from pathlib import Path

    src_path = Path("/root/reference/datasketches/src/cpc/compression_data.rs")
    if not src_path.exists():
        pytest.skip("reference checkout not available")
    src = src_path.read_text()

    def block(marker):
        s = src.index(marker)
        e = src.index("\n];", s + len(marker))
        body = src[s:e].split("= [", 1)[1]
        toks = re.findall(
            r"0x[0-9a-fA-F]+|\b\d+\b",
            "\n".join(
                ln for ln in body.splitlines() if not ln.strip().startswith("//")
            ),
        )
        return [int(t, 16) if t.startswith("0x") else int(t) for t in toks]

    ref65 = np.array(
        block("LENGTH_LIMITED_UNARY_DECODING_TABLE65: [u16; 4096] = ["),
        dtype=np.uint16,
    )
    assert np.array_equal(W.LENGTH_LIMITED_UNARY_DECODING_TABLE65, ref65)
    ref_dec = np.array(
        block("DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE: [[u16; 4096]; 22] = ["),
        dtype=np.uint16,
    ).reshape(22, 4096)
    assert np.array_equal(W.DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE, ref_dec)
    ref_perm = np.array(
        block("COLUMN_PERMUTATIONS_FOR_DECODING: [[u8; 56]; 16] = ["), dtype=np.uint8
    ).reshape(16, 56)
    assert np.array_equal(W.COLUMN_PERMUTATIONS_FOR_DECODING, ref_perm)


def test_truncated_and_corrupt_blobs_raise():
    sk = CpcSketch(LG_K)
    sk.update_u64s(np.arange(3000).astype(np.uint64))
    blob = W.serialize_wire(sk)
    for cut in (1, 4, 7, 9, 15, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            W.deserialize_wire(blob[:cut])
    bad_family = bytearray(blob)
    bad_family[2] = 3
    with pytest.raises(ValueError, match="family"):
        W.deserialize_wire(bytes(bad_family))
    bad_seed = bytearray(blob)
    bad_seed[6] ^= 0xFF
    with pytest.raises(ValueError, match="seed hash"):
        W.deserialize_wire(bytes(bad_seed))


def test_union_through_wire_blobs():
    """Merge semantics survive the wire: union of decoded blobs equals
    union of originals (the mergeable-sketch checkpoint contract)."""
    a = CpcSketch(LG_K)
    a.update_u64s(np.arange(0, 40000).astype(np.uint64))
    b = CpcSketch(LG_K)
    b.update_u64s(np.arange(20000, 60000).astype(np.uint64))
    direct = CpcSketch(LG_K)
    direct.update_u64s(np.arange(0, 60000).astype(np.uint64))
    ra = W.deserialize_wire(W.serialize_wire(a))
    rb = W.deserialize_wire(W.serialize_wire(b))
    merged = ra.union(rb)
    assert np.array_equal(merged.matrix, direct.matrix)
    assert abs(merged.estimate() / 60000 - 1) < 0.05


def test_cpc_wrapper_header_only_estimate():
    """CpcWrapper reads only the preamble — estimate equals the full
    decode's ICON estimate, at O(header) cost (`cpc/wrapper.rs`)."""
    for n in (0, 50, 400, 3000, 50000):
        sk = CpcSketch(LG_K)
        if n:
            sk.update_u64s(np.arange(n).astype(np.uint64))
        blob = W.serialize_wire(sk)
        wr = W.CpcWrapper(blob)
        assert wr.lg_k == LG_K
        assert wr.num_coupons == sk.num_coupons()
        assert wr.estimate() == sk.estimate()
        # an update-path sketch is un-merged: HIP travels on the wire
        assert wr.merge_flag is False
        # and a merged copy of the same matrix writes the ICON form
        merged = CpcSketch(LG_K, sk.seed, sk.matrix.copy())
        mwr = W.CpcWrapper(W.serialize_wire(merged))
        assert mwr.merge_flag is True
        assert mwr.num_coupons == sk.num_coupons()


def test_cpc_hip_bearing_blob_accepted():
    """Blobs from an un-merged reference sketch carry a HIP block;
    decode must skip it into the same matrix, and the wrapper must
    report the stored HIP value (`cpc/wrapper.rs:151-160`)."""
    import struct

    sk = CpcSketch(LG_K)
    sk.merge_flag = True  # start from a merged (no-HIP) blob
    sk.update_u64s(np.arange(50).astype(np.uint64))  # sparse: table only
    blob = W.serialize_wire(sk)
    pre, ver, fam, lg_k, fic, flags = blob[:6]
    assert flags == (1 << W._FLAG_COMPRESSED) | (1 << W._FLAG_HAS_TABLE)
    # insert (kxp, hip_est_accum) after the two u32 count fields
    # (second HIP decision point: not (table && window)) and bump
    # preamble_ints by 4
    hip_val = 49.75
    hip_block = struct.pack("<dd", 123.5, hip_val)
    patched = (
        bytes([pre + 4, ver, fam, lg_k, fic, flags | (1 << W._FLAG_HAS_HIP)])
        + blob[6:16]  # seed_hash + num_coupons + table_data_words
        + hip_block
        + blob[16:]
    )
    rt = W.deserialize_wire(patched)
    assert np.array_equal(rt.matrix, sk.matrix)
    wr = W.CpcWrapper(patched)
    assert wr.merge_flag is False
    assert wr.estimate() == hip_val


def test_tdigest_freeze_unfreeze():
    from datasketches_rust_spark.functions.tdigest import TDigest

    td = TDigest(100)
    td.update_batch(np.arange(1000, dtype=np.float64))
    q_before = td.quantile(0.5)
    td.freeze()
    assert td.quantile(0.5) == q_before  # queries still work
    assert TDigest.deserialize(td.serialize()).quantile(0.5) == q_before
    with pytest.raises(ValueError, match="frozen"):
        td.update(1.0)
    with pytest.raises(ValueError, match="frozen"):
        td.update_batch(np.ones(3))
    with pytest.raises(ValueError, match="frozen"):
        td.merge(TDigest(100))
    td.unfreeze()
    td.update(5.0)  # mutable again
