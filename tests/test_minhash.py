"""MinHash kernel tests: vectorized kernel vs single-threaded oracle,
merge laws, banding determinism."""

import numpy as np
import pytest

from datasketches_rust_spark.config import MinHashConfig
from datasketches_rust_spark.functions.minhash import (
    EMPTY_SLOT,
    band_hashes,
    estimate_jaccard,
    merge_signatures,
    minhash_signatures,
    shingle_hashes,
)
from datasketches_rust_spark.hashes import MASK64, murmur3_x64_128

CFG = MinHashConfig()


def oracle_shingles(text: str, cfg: MinHashConfig) -> list[int]:
    toks = text.lower().split()
    if not toks:
        return []
    th = [(murmur3_x64_128(t.encode(), cfg.seed)[0] >> 1) for t in toks]
    if len(toks) < cfg.shingle_k:
        groups = [th]
    else:
        groups = [th[i : i + cfg.shingle_k] for i in range(len(toks) - cfg.shingle_k + 1)]
    out = []
    for g in groups:
        b = b"".join(int(x).to_bytes(8, "little") for x in g)
        out.append(murmur3_x64_128(b, cfg.seed)[0] >> 1)
    return out


def oracle_signature(text: str, cfg: MinHashConfig) -> list[int]:
    sh = oracle_shingles(text, cfg)
    if not sh:
        return [int(EMPTY_SLOT)] * cfg.num_perm
    a, b = cfg.permutations()
    return [
        min((int(a[i]) * x + int(b[i])) & MASK64 for x in sh) for i in range(cfg.num_perm)
    ]


TEXTS = [
    "The quick brown Fox jumps over the lazy dog",
    "the quick brown fox jumped over a lazy dog",
    "a b",
    "",
    "completely different sentence about spark aggregation physics",
    "solo",
    "one two three four five six seven eight nine ten",
]


def test_shingles_match_oracle():
    flat, splits = shingle_hashes(TEXTS, CFG)
    for i, t in enumerate(TEXTS):
        got = [int(x) for x in flat[splits[i] : splits[i + 1]]]
        assert got == oracle_shingles(t, CFG), i


def test_signatures_match_oracle():
    sigs = minhash_signatures(TEXTS, CFG)
    for i, t in enumerate(TEXTS):
        assert [int(x) for x in sigs[i]] == oracle_signature(t, CFG), i


def test_signature_order_insensitive_merge():
    # signature(A ∪ B) == min(signature(A), signature(B)) — the
    # partial/final aggregation law (theta-union analog, SURVEY §A.2)
    a = "spark shuffles data between stages during wide transformations"
    b = "catalyst optimizes logical plans into efficient physical plans"
    sig_a = minhash_signatures([a], CFG)[0]
    sig_b = minhash_signatures([b], CFG)[0]
    sig_ab = minhash_signatures([a + " " + b], CFG)[0]
    # not exactly equal (shingles cross the boundary) but merge law holds:
    merged = merge_signatures(sig_a, sig_b)
    assert (merge_signatures(sig_b, sig_a) == merged).all()
    assert (merge_signatures(merged, merged) == merged).all()
    del sig_ab


def test_jaccard_estimate_tracks_true_jaccard():
    cfg = MinHashConfig(num_perm=256, bands=32, rows_per_band=8)
    a = "the cat sat on the mat and looked at the dog in the yard all day"
    b = "the cat sat on the mat and looked at the dog in the garden all day"
    sa = set(oracle_shingles(a, cfg))
    sb = set(oracle_shingles(b, cfg))
    true_j = len(sa & sb) / len(sa | sb)
    sigs = minhash_signatures([a, b], cfg)
    est = float(estimate_jaccard(sigs[:1], sigs[1:2])[0])
    assert abs(est - true_j) < 0.2


def test_band_hashes_deterministic_and_identical_for_identical_sigs():
    sigs = minhash_signatures(TEXTS, CFG)
    bh1 = band_hashes(sigs, CFG)
    bh2 = band_hashes(sigs.copy(), CFG)
    assert (bh1 == bh2).all()
    assert bh1.shape == (len(TEXTS), CFG.bands)
    # identical texts → identical signatures → all bands collide
    dup = minhash_signatures(["same text here please", "same text here please"], CFG)
    bd = band_hashes(dup, CFG)
    assert (bd[0] == bd[1]).all()
    # empty text → sentinel band keys
    empty_row = TEXTS.index("")
    assert (bh1[empty_row] == EMPTY_SLOT).all()


def test_config_validation():
    with pytest.raises(ValueError):
        MinHashConfig(num_perm=128, bands=10, rows_per_band=10)


def test_batch_equals_per_row():
    # batch kernel == one-row-at-a-time kernel (no cross-row leakage)
    whole = minhash_signatures(TEXTS, CFG)
    for i, t in enumerate(TEXTS):
        single = minhash_signatures([t], CFG)[0]
        assert (whole[i] == single).all(), i


def test_near_dup_pair_recall_high_jaccard():
    rng = np.random.default_rng(123)
    vocab = [f"tok{i}" for i in range(50)]
    base = " ".join(rng.choice(vocab, 40))
    toks = base.split()
    toks[5] = "altered"
    variant = " ".join(toks)
    sigs = minhash_signatures([base, variant], CFG)
    bh = band_hashes(sigs, CFG)
    # high-jaccard pair must share at least one band (b=32, r=4)
    assert (bh[0] == bh[1]).any()


def _components(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_candidate_pairs_hot_bucket_stratification(spark):
    """Over-cap buckets emit SALTED chains (round 4): O(m) pairs,
    window partitions bounded at ~cap rows, one connected component
    per bucket; normal buckets emit cliques; pairs seen in both keep
    the non-chained flag (min wins)."""
    from datasketches_rust_spark.config import DedupConfig
    from datasketches_rust_spark.operators.lsh import candidate_pairs

    cfg = DedupConfig()
    rows = []
    # hot bucket: 10x the cap → salted chain stratum
    hot_n = 10 * cfg.max_bucket_size + 7
    rows += [(i, 0, 111) for i in range(hot_n)]
    # normal bucket: 4 ids → clique (ids overlap the hot bucket)
    rows += [(i, 1, 222) for i in (10, 11, 12, 13)]
    banded = spark.createDataFrame(rows, "_id long, band_id int, band_key long")
    got = candidate_pairs(banded, cfg).toPandas()
    pairs = {(a, b): c for a, b, c in got.itertuples(index=False)}
    # full clique from the normal bucket, non-chained flag wins
    assert pairs[(10, 12)] == 0 and pairs[(11, 13)] == 0
    assert pairs[(10, 11)] == 0 and pairs[(11, 12)] == 0 and pairs[(12, 13)] == 0
    # the hot bucket contributes O(m) chained pairs, not the O(m^2)
    # clique: within-salt chains + salt-boundary links
    chained = [(a, b) for (a, b), c in pairs.items() if c == 1]
    assert len(pairs) < 2 * hot_n  # far below the ~1.7M clique pairs
    assert all(c in (0, 1) for c in pairs.values())
    # connectivity: every hot-bucket member lands in ONE component
    # (the property CC downstream relies on — identical to the
    # unsalted chain's components)
    comp = _components(list(range(hot_n)), chained)
    assert len(set(comp.values())) == 1
    # plan property: the chain window partitions by (bucket, _salt) —
    # a mega-bucket spreads across ~n/cap window partitions instead of
    # landing on one task
    plan = candidate_pairs(banded, cfg)._jdf.queryExecution().toString()
    assert "_salt" in plan


def test_candidate_pairs_adaptive_fast_path(spark):
    """No bucket over cap → the size probe routes to the clique-only
    plan: no salted chain strata, no sizes join back (round 4)."""
    from datasketches_rust_spark.config import DedupConfig
    from datasketches_rust_spark.operators.lsh import candidate_pairs

    cfg = DedupConfig()
    rows = [(i, 1, 222) for i in (10, 11, 12, 13)]
    rows += [(i, 0, 111) for i in (20, 21)]
    banded = spark.createDataFrame(rows, "_id long, band_id int, band_key long")
    out = candidate_pairs(banded, cfg)
    pairs = {(a, b): c for a, b, c in out.toPandas().itertuples(index=False)}
    assert pairs == {
        (10, 11): 0, (10, 12): 0, (10, 13): 0,
        (11, 12): 0, (11, 13): 0, (12, 13): 0,
        (20, 21): 0,
    }
    plan = out._jdf.queryExecution().toString()
    assert "_salt" not in plan  # chain strata absent
    assert "_nsalts" not in plan


def test_scratch_buffer_reuse_no_cross_batch_contamination():
    """The permuted-value scratch buffer (functions/minhash._pv_buffer)
    is reused across calls within one worker process. Interleaving
    batches of different sizes must leave every signature identical to
    a fresh-process computation — a stale-region read would surface
    here as a changed min."""
    import numpy as np

    big = [f"word{i} alpha beta gamma delta {i * 7}" for i in range(40)]
    small = ["tiny one", "tiny two"]
    ref_big = minhash_signatures(big, CFG).copy()
    ref_small = minhash_signatures(small, CFG).copy()
    # big → small → big: the small batch writes only a prefix of the
    # buffer the big batch faulted in; the second big batch must not
    # see any of small's leftovers (and vice versa)
    for _ in range(3):
        assert np.array_equal(minhash_signatures(small, CFG), ref_small)
        assert np.array_equal(minhash_signatures(big, CFG), ref_big)
