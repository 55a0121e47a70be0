"""Embedding similarity tests: brute-force top-k determinism and
LSH near-dup recall on planted near-identical vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted_embeddings(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal((40, 64))
    rows = []
    vid = 0
    truth_pairs = set()
    for i in range(40):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((vid, v.tolist()))
        first = vid
        vid += 1
        if i % 4 == 0:  # plant a near-duplicate (cosine ~0.999)
            nd = v + 0.02 * rng.standard_normal(64)
            nd = nd / np.linalg.norm(nd)
            rows.append((vid, nd.tolist()))
            truth_pairs.add((first, vid))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, truth_pairs


def test_embedding_neardup_recall(planted_embeddings):
    from datasketches_rust_spark.operators.ann import embedding_neardup_pairs

    df, truth = planted_embeddings
    got = {
        (r.a, r.b)
        for r in embedding_neardup_pairs(df, cosine_threshold=0.98).collect()
    }
    assert truth <= got, f"missed planted near-dups: {truth - got}"
    # verification bound: every reported pair really is above threshold
    for r in embedding_neardup_pairs(df, cosine_threshold=0.98).collect():
        assert r.cosine >= 0.98


def test_topk_deterministic_and_self_excluded(planted_embeddings):
    from datasketches_rust_spark.operators.ann import cosine_topk_bruteforce

    df, _ = planted_embeddings
    probes = df.filter(F.col("vec_id") < 3)
    a = sorted((r.probe_id, r.rank, r.neighbor_id) for r in cosine_topk_bruteforce(df, probes, k=4).collect())
    b = sorted((r.probe_id, r.rank, r.neighbor_id) for r in cosine_topk_bruteforce(df.repartition(7), probes, k=4).collect())
    assert a == b
    assert all(p != n for p, _, n in a)
    assert len(a) == 3 * 4


def test_ivf_full_probe_equals_bruteforce(spark):
    """IVF with n_probe == n_cells scores every cell → must equal the
    exact brute-force top-k (the standard IVF correctness invariant)."""
    from datasketches_rust_spark.operators.ann import cosine_topk_bruteforce, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 8)
    want = (
        cosine_topk_bruteforce(emb, probes, k=5)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        ivf_topk(emb, probes, k=5, n_cells=8, n_probe=8)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    assert (got["probe_id"] == want["probe_id"]).all()
    assert (got["neighbor_id"] == want["neighbor_id"]).all()


def test_ivf_partial_probe_recall(spark):
    """n_probe = half the cells still recovers most true neighbors."""
    from datasketches_rust_spark.operators.ann import cosine_topk_bruteforce, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 16)
    want = cosine_topk_bruteforce(emb, probes, k=5).toPandas()
    got = ivf_topk(emb, probes, k=5, n_cells=8, n_probe=4).toPandas()
    w = set(zip(want["probe_id"], want["neighbor_id"]))
    g = set(zip(got["probe_id"], got["neighbor_id"]))
    recall = len(w & g) / len(w)
    assert recall >= 0.6, recall  # random embeddings = worst case for IVF


def test_embedding_lsh_path_equals_exact_and_plan_choice(planted_embeddings):
    """(a) force_lsh exercises the banding machinery and must equal the
    exact all-pairs result at recall ~1 config; (b) the default dense
    config auto-selects the exact plan; (c) a selective high-threshold
    config stays on LSH."""
    from datasketches_rust_spark.operators.ann import (
        cosine_pairs_exact,
        embedding_neardup_pairs,
    )

    df, _ = planted_embeddings
    exact = {
        (r.a, r.b, r.cosine)
        for r in cosine_pairs_exact(df, threshold=0.45).collect()
    }
    lsh = {
        (r.a, r.b, r.cosine)
        for r in embedding_neardup_pairs(
            df, cosine_threshold=0.45, force_lsh=True
        ).collect()
    }
    assert lsh == exact and len(exact) > 0
    # selective config (w=16, B=8): expected fraction ~1e-4 → LSH path;
    # planted pairs at cosine ~0.999 have p=0.9899 → per-band hit
    # p^16=0.85, miss (1-0.85)^8 ~ 2.6e-7
    sel = {
        (r.a, r.b)
        for r in embedding_neardup_pairs(
            df, cosine_threshold=0.98, n_reps=2, band_width=16
        ).collect()
    }
    high_exact = {(r.a, r.b) for r in cosine_pairs_exact(df, threshold=0.98).collect()}
    assert sel == high_exact
