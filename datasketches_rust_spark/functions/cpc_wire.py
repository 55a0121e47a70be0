"""CPC FM85 compressed wire format — the cross-language Apache
DataSketches CPC serialization.

Byte-compatible encode/decode of the reference layout
(`datasketches/src/cpc/sketch.rs:452-658` header,
`cpc/compression.rs:43-818` entropy coding,
`cpc/serialization.rs:18-48` preamble): length-limited Huffman codes
for the 8-bit sliding-window bytes (22 pseudo-phase-selected tables),
12-bit-peek length-limited unary for surprising-pair column deltas,
and Golomb (unary hi + base-bits lo) for row deltas, all packed
LSB-first into little-endian u32 words.

The engine's CpcSketch state is the full bit matrix (see cpc.py), so
this module derives the reference's (sliding_window, surprising-value
pairs, first_interesting_column) representation from the matrix the
same way the reference's union does when materializing a sketch from
its accumulated bit matrix (`cpc/union.rs:141-209` to_sketch):

  window[i]    = (matrix[i] >> offset) & 0xFF
  surprising   = set bits outside the window, with the "early zone"
                 (cols < offset) FLIPPED — a zero below the window is
                 the surprise there (`union.rs:171-190`)
  flavor       = f(lg_k, num_coupons)   (`cpc/mod.rs:76-92`)
  offset       = (8C − 19K) / 8K, clamped ≥ 0  (`cpc/mod.rs:94-102`)

Sketches we write always carry merge_flag=true (no HIP — every sketch
in the Spark topology is merged), exactly like a sketch produced by
the reference's union. Decode accepts HIP-bearing blobs from other
implementations (the HIP fields are read and discarded; the engine
estimator is ICON, which the reference itself switches to post-merge).

Encoding tables are the published Apache-2.0 constants extracted by
tools/extract_cpc_compression_tables.py; decoding tables and column
permutations' inverses are derived at import, as the reference library
derives them at startup (verified element-equal to the reference's
vendored decode tables in tests/test_cpc_wire.py).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashes import DEFAULT_UPDATE_SEED, compute_seed_hash
from ._cpc_compression_tables import (
    COLUMN_PERMUTATIONS_FOR_ENCODING,
    ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE,
    LENGTH_LIMITED_UNARY_ENCODING_TABLE65,
)
from .cpc import CpcSketch

_FAMILY_CPC = 16
_SERIAL_VERSION = 1
# flag BIT POSITIONS (`cpc/serialization.rs:19-22`)
_FLAG_COMPRESSED = 1
_FLAG_HAS_HIP = 2
_FLAG_HAS_TABLE = 3
_FLAG_HAS_WINDOW = 4

_U64 = np.uint64


def _build_decode_table(enc: np.ndarray, num_symbols: int) -> np.ndarray:
    """12-bit-peek decode table from an encoding table — the exact
    inverse construction the reference runs at startup (its vendored
    decode tables note they are 'created at library startup time')."""
    dec = np.zeros(4096, dtype=np.uint16)
    for sym in range(num_symbols):
        info = int(enc[sym])
        length, code = info >> 12, info & 0xFFF
        for p in range(code, 4096, 1 << length):
            dec[p] = (length << 8) | sym
    return dec


LENGTH_LIMITED_UNARY_DECODING_TABLE65 = _build_decode_table(
    LENGTH_LIMITED_UNARY_ENCODING_TABLE65, 65
)
DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE = np.stack(
    [
        _build_decode_table(ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[i], 256)
        for i in range(22)
    ]
)
COLUMN_PERMUTATIONS_FOR_DECODING = np.zeros_like(COLUMN_PERMUTATIONS_FOR_ENCODING)
for _i in range(16):
    COLUMN_PERMUTATIONS_FOR_DECODING[_i, COLUMN_PERMUTATIONS_FOR_ENCODING[_i]] = (
        np.arange(56, dtype=np.uint8)
    )


# ---------------------------------------------------------------------------
# flavor / offset / phase / golomb parameters (`cpc/mod.rs`, compression.rs)
# ---------------------------------------------------------------------------

FLAVOR_EMPTY, FLAVOR_SPARSE, FLAVOR_HYBRID, FLAVOR_PINNED, FLAVOR_SLIDING = range(5)


def determine_flavor(lg_k: int, num_coupons: int) -> int:
    """`cpc/mod.rs:76-92`."""
    k = 1 << lg_k
    if num_coupons == 0:
        return FLAVOR_EMPTY
    if 32 * num_coupons < 3 * k:
        return FLAVOR_SPARSE
    if 2 * num_coupons < k:
        return FLAVOR_HYBRID
    if 8 * num_coupons < 27 * k:
        return FLAVOR_PINNED
    return FLAVOR_SLIDING


def determine_correct_offset(lg_k: int, num_coupons: int) -> int:
    """`cpc/mod.rs:94-102`: (8C − 19K) / 8K, clamped at 0."""
    k = 1 << lg_k
    tmp = (num_coupons << 3) - 19 * k
    return 0 if tmp < 0 else tmp >> (lg_k + 3)


def determine_pseudo_phase(lg_k: int, num_coupons: int) -> int:
    """`cpc/compression.rs:641-675` — hand-tuned mid-range thresholds,
    true phase (C >> (lg_k−4)) & 15 in steady state."""
    k = 1 << lg_k
    c = num_coupons
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 16 + 1
        if 100 * c < 132 * k:
            return 16 + 2
        if 3 * c < 5 * k:
            return 16 + 3
        if 1000 * c < 1965 * k:
            return 16 + 4
        if 1000 * c < 2275 * k:
            return 16 + 5
        return 6
    return (c >> (lg_k - 4)) & 15


def _golomb_base_bits(k_plus_count: int, count: int) -> int:
    """`golomb_choose_number_of_base_bits` (compression.rs:793-802)."""
    quotient = (k_plus_count - count) // count
    return 0 if quotient == 0 else quotient.bit_length() - 1


# ---------------------------------------------------------------------------
# bit-level codecs — LSB-first into LE u32 words, mirroring the
# reference's bitbuf/bufbits machinery (compression.rs:214-349,537-752)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("words", "bitbuf", "bufbits")

    def __init__(self) -> None:
        self.words: list[int] = []
        self.bitbuf = 0
        self.bufbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.bitbuf |= value << self.bufbits
        self.bufbits += nbits
        while self.bufbits >= 32:
            self.words.append(self.bitbuf & 0xFFFFFFFF)
            self.bitbuf >>= 32
            self.bufbits -= 32

    def write_unary(self, value: int) -> None:
        """value zeros then a 1 (compression.rs:677-699)."""
        remaining = value
        while remaining >= 16:
            remaining -= 16
            self.write(0, 16)
        self.write(1 << remaining, remaining + 1)

    def flush(self, padding_bits: int) -> np.ndarray:
        """Zero-pad (for the decoder's 12-bit peek) and flush."""
        self.write(0, padding_bits)
        if self.bufbits > 0:
            self.words.append(self.bitbuf & 0xFFFFFFFF)
            self.bitbuf = 0
            self.bufbits = 0
        return np.array(self.words, dtype="<u4")


class _BitReader:
    __slots__ = ("words", "idx", "bitbuf", "bufbits")

    def __init__(self, words: np.ndarray) -> None:
        self.words = words
        self.idx = 0
        self.bitbuf = 0
        self.bufbits = 0

    def _fill(self, minbits: int) -> None:
        if self.bufbits < minbits:
            if self.idx >= len(self.words):
                raise ValueError("CPC bitstream exhausted")
            self.bitbuf |= int(self.words[self.idx]) << self.bufbits
            self.idx += 1
            self.bufbits += 32

    def peek12(self) -> int:
        self._fill(12)
        return self.bitbuf & 0xFFF

    def skip(self, nbits: int) -> None:
        self.bitbuf >>= nbits
        self.bufbits -= nbits

    def read(self, nbits: int) -> int:
        self._fill(nbits)
        v = self.bitbuf & ((1 << nbits) - 1)
        self.skip(nbits)
        return v

    def read_unary(self) -> int:
        subtotal = 0
        while True:
            self._fill(8)
            peek8 = self.bitbuf & 0xFF
            if peek8:
                tz = (peek8 & -peek8).bit_length() - 1
                self.skip(tz + 1)
                return subtotal + tz
            subtotal += 8
            self.skip(8)


def compress_bytes(byte_array: np.ndarray, enc_table: np.ndarray) -> np.ndarray:
    """Huffman-encode window bytes (compression.rs:214-262).
    Vectorized: codes are expanded to a flat bit array and packed
    LSB-first, byte-identical to the sequential bitbuf stream."""
    infos = enc_table[byte_array.astype(np.int64)].astype(np.uint32)
    lens = (infos >> 12).astype(np.int64)
    vals = (infos & 0xFFF).astype(np.int64)
    total = int(lens.sum())
    starts = np.cumsum(lens) - lens
    flat_j = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    bits = np.zeros(((total + 11) + 31) // 32 * 32, dtype=np.uint8)
    bits[np.arange(total)] = (np.repeat(vals, lens) >> flat_j) & 1
    words = np.packbits(bits, bitorder="little").view("<u4")
    # 11 padding zero-bits, then trim to the words actually used
    n_words = (total + 11 + 31) // 32
    return words[:n_words].copy()


def uncompress_bytes(
    words: np.ndarray, num_bytes: int, dec_table: np.ndarray
) -> np.ndarray:
    """compression.rs:604-639 — sequential 12-bit-peek decode."""
    r = _BitReader(words)
    out = np.empty(num_bytes, dtype=np.uint8)
    dec = dec_table
    for i in range(num_bytes):
        lookup = int(dec[r.peek12()])
        r.skip(lookup >> 8)
        out[i] = lookup & 0xFF
    return out


def compress_pairs(pairs: np.ndarray, base_bits: int) -> np.ndarray:
    """compression.rs:268-349 — x_delta (limited unary) + y_delta
    Golomb(unary hi, base-bits lo) per sorted (row<<6|col) pair."""
    w = _BitWriter()
    lo_mask = (1 << base_bits) - 1
    pred_row = 0
    pred_col = 0
    llu = LENGTH_LIMITED_UNARY_ENCODING_TABLE65
    for row_col in pairs.tolist():
        row = row_col >> 6
        col = row_col & 63
        if row != pred_row:
            pred_col = 0
        y_delta = row - pred_row
        x_delta = col - pred_col
        pred_row = row
        pred_col = col + 1
        info = int(llu[x_delta])
        w.write(info & 0xFFF, info >> 12)
        w.write_unary(y_delta >> base_bits)
        if base_bits:
            w.write(y_delta & lo_mask, base_bits)
    return w.flush(max(0, 10 - base_bits))


def uncompress_pairs(words: np.ndarray, num_pairs: int, base_bits: int) -> np.ndarray:
    """compression.rs:537-602."""
    r = _BitReader(words)
    out = np.empty(num_pairs, dtype=np.uint32)
    pred_row = 0
    pred_col = 0
    dec = LENGTH_LIMITED_UNARY_DECODING_TABLE65
    for i in range(num_pairs):
        lookup = int(dec[r.peek12()])
        r.skip(lookup >> 8)
        x_delta = lookup & 0xFF
        hi = r.read_unary()
        lo = r.read(base_bits) if base_bits else 0
        y_delta = (hi << base_bits) | lo
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        if col > 63:
            # (row << 6) | col would bleed column bits into the row on a
            # corrupt blob and could alias to a valid matrix
            raise ValueError(f"CPC pair column {col} out of range (corrupt blob)")
        out[i] = (row << 6) | col
        pred_row = row
        pred_col = col + 1
    return out


# ---------------------------------------------------------------------------
# matrix <-> (window, surprising pairs)
# ---------------------------------------------------------------------------


def _matrix_to_window_pairs(
    matrix: np.ndarray, offset: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """(window bytes, surprising row_col pairs sorted row-major, fic) —
    the union's matrix→sketch conversion (`cpc/union.rs:160-199`)."""
    window = ((matrix >> _U64(offset)) & _U64(0xFF)).astype(np.uint8)
    clear_mask = _U64(0xFFFFFFFFFFFFFFFF) ^ (_U64(0xFF) << _U64(offset))
    flip_mask = _U64((1 << offset) - 1)
    pattern = (matrix & clear_mask) ^ flip_mask
    all_ored = int(np.bitwise_or.reduce(pattern)) if len(pattern) else 0
    rows_nz = np.flatnonzero(pattern)
    if len(rows_nz):
        bits = (
            (pattern[rows_nz, None] >> np.arange(64, dtype=np.uint64)) & _U64(1)
        ).astype(bool)
        r_idx, c_idx = np.nonzero(bits)  # row-major, ascending col
        pairs = (rows_nz[r_idx].astype(np.uint32) << np.uint32(6)) | c_idx.astype(
            np.uint32
        )
    else:
        pairs = np.zeros(0, dtype=np.uint32)
    if all_ored == 0:
        fic = offset
    else:
        fic = min((all_ored & -all_ored).bit_length() - 1, offset)
    return window, pairs, fic


def _all_coupon_pairs(matrix: np.ndarray) -> np.ndarray:
    """Every set bit as (row<<6|col), sorted row-major/col-ascending —
    the Sparse/Hybrid pair list (hybrid merges window-zone bits into
    the pair list before compressing, compression.rs:76-125, which for
    offset 0 equals the full coupon set)."""
    rows_nz = np.flatnonzero(matrix)
    if not len(rows_nz):
        return np.zeros(0, dtype=np.uint32)
    bits = (
        (matrix[rows_nz, None] >> np.arange(64, dtype=np.uint64)) & _U64(1)
    ).astype(bool)
    r_idx, c_idx = np.nonzero(bits)
    return (rows_nz[r_idx].astype(np.uint32) << np.uint32(6)) | c_idx.astype(np.uint32)


# ---------------------------------------------------------------------------
# public wire API
# ---------------------------------------------------------------------------


def serialize_wire(sk: CpcSketch) -> bytes:
    """Reference-layout compressed bytes for this sketch
    (`cpc/sketch.rs:452-509`). Merged sketches carry no HIP block;
    an un-merged update-path sketch writes its kxp/hip_est_accum and
    stored first_interesting_column, byte-identical to the reference
    (foreign-fixture gated)."""
    lg_k = sk.lg_k
    k = 1 << lg_k
    c = sk.num_coupons()
    flavor = determine_flavor(lg_k, c)
    seed_hash = compute_seed_hash(sk.seed)
    has_hip = not getattr(sk, "merge_flag", True)

    window_words = None
    table_words = None
    table_num_entries = 0
    fic = 0

    if flavor in (FLAVOR_SPARSE, FLAVOR_HYBRID):
        pairs = _all_coupon_pairs(sk.matrix)
        base_bits = _golomb_base_bits(k + c, c)
        table_words = compress_pairs(pairs, base_bits)
        table_num_entries = c
        fic = 0
    elif flavor in (FLAVOR_PINNED, FLAVOR_SLIDING):
        offset = determine_correct_offset(lg_k, c)
        window, pairs, fic = _matrix_to_window_pairs(sk.matrix, offset)
        phase = determine_pseudo_phase(lg_k, c)
        window_words = compress_bytes(
            window, ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[phase]
        )
        if len(pairs):
            if flavor == FLAVOR_PINNED:
                # columns are all >= 8; shift before sorting
                # (compression.rs:127-144)
                pairs = pairs - np.uint32(8)
            else:
                # rotate then permute columns (compression.rs:147-174)
                perm = COLUMN_PERMUTATIONS_FOR_ENCODING[phase]
                row = pairs >> np.uint32(6)
                col = (pairs & np.uint32(63)).astype(np.int64)
                col = (col + 56 - offset) & 63
                col = perm[col].astype(np.uint32)
                pairs = (row << np.uint32(6)) | col
            pairs = np.sort(pairs)
            table_num_entries = len(pairs)
            base_bits = _golomb_base_bits(k + table_num_entries, table_num_entries)
            table_words = compress_pairs(pairs, base_bits)

    has_table = table_words is not None
    has_window = window_words is not None
    preamble_ints = _make_preamble_ints(c, has_hip, has_table, has_window)
    if has_hip:
        # the update-path sketch's stored column is authoritative
        # (`cpc/sketch.rs:465` writes self.first_interesting_column)
        fic = getattr(sk, "first_interesting_column", fic)
    hip_block = (
        struct.pack("<dd", sk.kxp, sk.hip_est_accum) if has_hip else b""
    )

    flags = (
        (1 << _FLAG_COMPRESSED)
        | ((1 if has_hip else 0) << _FLAG_HAS_HIP)
        | ((1 if has_table else 0) << _FLAG_HAS_TABLE)
        | ((1 if has_window else 0) << _FLAG_HAS_WINDOW)
    )
    out = bytearray()
    out += struct.pack(
        "<BBBBBBH", preamble_ints, _SERIAL_VERSION, _FAMILY_CPC, lg_k, fic, flags,
        seed_hash,
    )
    if c > 0:
        out += struct.pack("<I", c)
        if has_table and has_window:
            out += struct.pack("<I", table_num_entries)
            out += hip_block  # first HIP decision point
        if has_table:
            out += struct.pack("<I", len(table_words))
        if has_window:
            out += struct.pack("<I", len(window_words))
        if has_hip and not (has_table and has_window):
            out += hip_block  # second HIP decision point
        if has_window:
            out += window_words.tobytes()
        if has_table:
            out += table_words.tobytes()
    return bytes(out)


class CpcWrapper:
    """Header-only view over FM85 wire bytes (`cpc/wrapper.rs:40-182`):
    reads lg_k / num_coupons / optional HIP accumulator from the
    preamble WITHOUT decompressing the window or pair table, so an
    estimate over a checkpointed blob costs O(header) instead of
    O(k). HIP-bearing blobs (written by an un-merged reference sketch)
    estimate via the stored HIP accumulator, exactly like the
    reference wrapper; merged blobs use ICON."""

    __slots__ = ("lg_k", "merge_flag", "num_coupons", "hip_est_accum")

    def __init__(self, data: bytes) -> None:
        if len(data) < 8:
            raise ValueError("CPC wire bytes too short")
        preamble_ints, ser_ver, family, lg_k, fic, flags, _seed_hash = (
            struct.unpack_from("<BBBBBBH", data, 0)
        )
        if family != _FAMILY_CPC:
            raise ValueError(f"not a CPC sketch (family {family})")
        if ser_ver != _SERIAL_VERSION:
            raise ValueError(f"unsupported CPC serial version {ser_ver}")
        if not 4 <= lg_k <= 26:
            raise ValueError(f"lg_k out of range; got {lg_k}")
        if fic > 63:
            raise ValueError(f"first_interesting_column out of range; got {fic}")
        if not flags & (1 << _FLAG_COMPRESSED):
            raise ValueError("only compressed CPC sketches are supported")
        has_hip = bool(flags & (1 << _FLAG_HAS_HIP))
        has_table = bool(flags & (1 << _FLAG_HAS_TABLE))
        has_window = bool(flags & (1 << _FLAG_HAS_WINDOW))
        self.lg_k = lg_k
        self.merge_flag = not has_hip
        self.num_coupons = 0
        self.hip_est_accum = 0.0
        off = 8
        if has_table or has_window:
            if len(data) < off + 4:
                raise ValueError("truncated CPC wire blob")
            (self.num_coupons,) = struct.unpack_from("<I", data, off)
            off += 4
            if has_table and has_window:
                off += 4  # table_num_entries
                if has_hip:
                    if len(data) < off + 16:
                        raise ValueError("truncated CPC wire blob")
                    _kxp, self.hip_est_accum = struct.unpack_from("<dd", data, off)
                    off += 16
            if has_table:
                off += 4
            if has_window:
                off += 4
            if has_hip and not (has_table and has_window):
                if len(data) < off + 16:
                    raise ValueError("truncated CPC wire blob")
                _kxp, self.hip_est_accum = struct.unpack_from("<dd", data, off)
        expected = _make_preamble_ints(
            self.num_coupons, has_hip, has_table, has_window
        )
        if preamble_ints != expected:
            raise ValueError(
                f"CPC preamble ints {preamble_ints} != expected {expected}"
            )

    def estimate(self) -> float:
        """HIP when present, ICON otherwise (`cpc/wrapper.rs:151-160`,
        matching `cpc/estimator.rs::estimate`)."""
        from .cpc import icon_estimate

        if not self.merge_flag:
            return self.hip_est_accum
        return icon_estimate(self.lg_k, self.num_coupons)


def _make_preamble_ints(
    num_coupons: int, has_hip: bool, has_table: bool, has_window: bool
) -> int:
    """`cpc/serialization.rs:24-48`."""
    preamble_ints = 2
    if num_coupons > 0:
        preamble_ints += 1
        if has_hip:
            preamble_ints += 4
        if has_table:
            preamble_ints += 1
            if has_window:
                preamble_ints += 1
        if has_window:
            preamble_ints += 1
    return preamble_ints


def deserialize_wire(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> CpcSketch:
    """Decode reference-layout compressed bytes into the engine's
    dense-matrix CpcSketch (`cpc/sketch.rs:512-658`). HIP fields are
    preserved (merge_flag = !has_hip, like the reference), so a decoded
    un-merged blob re-serializes byte-identically and estimates via
    its HIP accumulator."""
    if len(data) < 8:
        raise ValueError("CPC wire bytes too short")
    preamble_ints, ser_ver, family, lg_k, fic, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", data, 0
    )
    if family != _FAMILY_CPC:
        raise ValueError(f"not a CPC sketch (family {family})")
    if ser_ver != _SERIAL_VERSION:
        raise ValueError(f"unsupported CPC serial version {ser_ver}")
    if not 4 <= lg_k <= 26:
        raise ValueError(f"lg_k out of range; got {lg_k}")
    if fic > 63:
        raise ValueError(f"first_interesting_column out of range; got {fic}")
    if not flags & (1 << _FLAG_COMPRESSED):
        raise ValueError("only compressed CPC sketches are supported")
    if seed_hash != compute_seed_hash(seed):
        raise ValueError(
            f"seed hash mismatch: {seed_hash} != {compute_seed_hash(seed)}"
        )
    has_hip = bool(flags & (1 << _FLAG_HAS_HIP))
    has_table = bool(flags & (1 << _FLAG_HAS_TABLE))
    has_window = bool(flags & (1 << _FLAG_HAS_WINDOW))

    k = 1 << lg_k
    off = 8
    num_coupons = 0
    kxp = 0.0
    hip_est_accum = 0.0
    table_num_entries = 0
    table_data_words = 0
    window_data_words = 0
    window_words = np.zeros(0, dtype="<u4")
    table_words = np.zeros(0, dtype="<u4")

    def _need(n: int) -> None:
        if len(data) < off + n:
            raise ValueError("truncated CPC wire blob")

    if has_table or has_window:
        _need(4)
        (num_coupons,) = struct.unpack_from("<I", data, off)
        off += 4
        if has_table and has_window:
            _need(4)
            (table_num_entries,) = struct.unpack_from("<I", data, off)
            off += 4
            if has_hip:
                _need(16)
                kxp, hip_est_accum = struct.unpack_from("<dd", data, off)
                off += 16
        if has_table:
            _need(4)
            (table_data_words,) = struct.unpack_from("<I", data, off)
            off += 4
        if has_window:
            _need(4)
            (window_data_words,) = struct.unpack_from("<I", data, off)
            off += 4
        if has_hip and not (has_table and has_window):
            _need(16)
            kxp, hip_est_accum = struct.unpack_from("<dd", data, off)
            off += 16
        if has_window:
            _need(4 * window_data_words)
            window_words = np.frombuffer(data, "<u4", count=window_data_words, offset=off)
            off += 4 * window_data_words
        if has_table:
            _need(4 * table_data_words)
            table_words = np.frombuffer(data, "<u4", count=table_data_words, offset=off)
            off += 4 * table_data_words
        if not has_window:
            table_num_entries = num_coupons

    flavor = determine_flavor(lg_k, num_coupons)
    matrix = np.zeros(k, dtype=np.uint64)

    if flavor == FLAVOR_EMPTY:
        pass
    elif flavor in (FLAVOR_SPARSE, FLAVOR_HYBRID):
        if not has_table:
            raise ValueError("CPC sparse/hybrid blob missing pair table")
        base_bits = _golomb_base_bits(k + table_num_entries, table_num_entries)
        pairs = uncompress_pairs(table_words, table_num_entries, base_bits)
        rows = (pairs >> np.uint32(6)).astype(np.int64)
        if (rows >= k).any():
            raise ValueError("CPC pair row out of range")
        cols = (pairs & np.uint32(63)).astype(np.uint64)
        np.bitwise_or.at(matrix, rows, _U64(1) << cols)
    else:
        if not has_window:
            raise ValueError("CPC pinned/sliding blob missing window")
        offset = determine_correct_offset(lg_k, num_coupons)
        phase = determine_pseudo_phase(lg_k, num_coupons)
        window = uncompress_bytes(
            window_words, k, DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE[phase]
        )
        # default rows: early zone all ones (`build_bit_matrix`,
        # cpc/sketch.rs:413-447)
        matrix[:] = _U64((1 << offset) - 1)
        matrix |= window.astype(np.uint64) << _U64(offset)
        if table_num_entries:
            base_bits = _golomb_base_bits(k + table_num_entries, table_num_entries)
            pairs = uncompress_pairs(table_words, table_num_entries, base_bits)
            row = (pairs >> np.uint32(6)).astype(np.int64)
            col = (pairs & np.uint32(63)).astype(np.int64)
            if flavor == FLAVOR_PINNED:
                if (col >= 56).any():
                    raise ValueError("CPC pinned pair column out of range")
                col = col + 8
            else:
                perm_dec = COLUMN_PERMUTATIONS_FOR_DECODING[phase]
                if (col >= 56).any():
                    raise ValueError("CPC sliding pair column out of range")
                col = perm_dec[col].astype(np.int64)
                col = (col + offset + 8) & 63
            if (row >= k).any():
                raise ValueError("CPC pair row out of range")
            # XOR flips early-zone ones to zero (surprising zeros) and
            # sets late-zone surprising ones
            np.bitwise_xor.at(matrix, row, _U64(1) << col.astype(np.uint64))

    if has_hip and num_coupons == 0:
        # an empty blob carries no HIP block; a fresh sketch's kxp is k
        # (`cpc/sketch.rs:126`) — leaving 0.0 (as the reference's own
        # deserialize struct-literal does) makes the next update divide
        # by zero, so restore the new() invariant instead
        kxp = float(k)
    sk = CpcSketch(
        lg_k,
        seed,
        matrix,
        merge_flag=not has_hip,
        kxp=kxp if has_hip else 0.0,
        hip_est_accum=hip_est_accum if has_hip else 0.0,
        window_offset=determine_correct_offset(lg_k, num_coupons),
        first_interesting_column=fic,
    )
    if sk.num_coupons() != num_coupons:
        raise ValueError(
            f"CPC decode coupon mismatch: {sk.num_coupons()} != {num_coupons}"
        )
    return sk
