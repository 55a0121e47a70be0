"""Similarity search over embedding columns (training-pipeline ops).

* ``cosine_topk_bruteforce`` — exact top-k neighbors for a (small)
  probe set: broadcast the probes, cross-join against the corpus, and
  compute cosine entirely with built-in higher-order functions
  (``zip_with`` + ``aggregate`` — JVM-side, whole-stage codegen, no
  Python in the scoring loop). The window top-k breaks score ties on
  neighbor id, so output is deterministic. This is the correctness
  baseline: O(|probes| × |corpus|) scales only while probes stay
  broadcastable.
* ``embedding_neardup_pairs`` — the scale path: random-hyperplane
  SimHash of each embedding (functions/simhash.py, seeded planes) →
  Hamming chunk banding → candidate pairs (the same bucket machinery
  as MinHash/phash LSH) → exact cosine verification JVM-side. At
  10^12 rows only the LSH variant survives; the brute-force operator
  exists to measure its recall.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig
from .lsh import candidate_pairs


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(probe_id, neighbor_id, rank) — exact cosine top-k, self excluded."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pvec"),
    )
    scored = (
        c.join(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn(
            "cosine",
            _dot(F.col("pvec"), F.col("cvec")) / (_norm(F.col("pvec")) * _norm(F.col("cvec"))),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank")
    )


def embedding_multi_simhash_col(vec_col: str, seed: int, n_reps: int, dim: int) -> F.Column:
    """array<long> of ``n_reps`` independent SimHashes per embedding.

    NOT mean-centered: verification compares raw-vector cosine, and the
    hyperplane-agreement ↔ angle identity (p = 1 − θ/π) only holds when
    the hashed vector is the verified vector. (Pixel SimHash centers
    because its similarity target is the centered feature — different
    contract, see functions/simhash.py.)
    """
    from ..functions.simhash import simhash_vectors_multi

    @F.pandas_udf("array<long>")
    def _sim(vecs: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in vecs:
            mat = np.stack(
                [np.asarray(v, np.float64) if v is not None else np.zeros(dim) for v in batch]
            )
            sigs = simhash_vectors_multi(mat, seed, n_reps, center=False).view(np.int64)
            yield pd.Series(list(sigs))

    return _sim(F.col(vec_col))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.45,
    cfg: DedupConfig | None = None,
    dim: int = 64,
    n_reps: int = 6,
    band_width: int = 4,
    broadcast_limit: int = 1_000_000,
    dense_fraction_cutoff: float = 0.25,
    force_lsh: bool = False,
) -> DataFrame:
    """(a, b, cosine) pairs with round(cosine, 6) >= threshold, found
    via multi-repetition random-hyperplane SimHash banding and verified
    exactly (BLAS batch, not per-element ``zip_with`` — measured ~50×
    on the same corpus, see ``cosine_pairs_exact``).

    Recall math: a pair at the threshold has per-bit agreement
    p = 1 − arccos(t)/π; with ``n_reps·64/band_width`` bands of
    ``band_width`` bits the miss probability is (1 − p^w)^B — at the
    default (t=0.45 ⇒ p≈0.649, w=4, B=96) that is ~7e-9, so the LSH
    output equals the exact all-pairs result (shared DuckDB oracle;
    recall gate in tests/test_ann.py). Raising the threshold lets
    fewer/wider bands carry the same recall with far better
    selectivity — the intended production dial. Scale shape: banding
    is one explode + the stratified bucket agg of operators/lsh.py;
    verification shuffles only candidate pairs.
    """
    cfg = cfg or DedupConfig()
    seed = cfg.simhash.seed
    chunks_per_hash = 64 // band_width

    # Selectivity-based plan choice: a RANDOM pair collides in one
    # w-bit band with prob 2^-w, so across B bands the expected
    # candidate fraction is 1-(1-2^-w)^B. When the recall target
    # forces a config whose fraction is high (low thresholds — e.g.
    # the default 0.45/w=4/B=96 gives 0.998), LSH emits nearly ALL
    # pairs and only adds banding overhead on top of the verification
    # it can't avoid; the exact blocked-BLAS all-pairs scorer is then
    # the cheaper plan for the identical output. High thresholds get a
    # selective config and take the LSH path — the regime LSH exists
    # for. The decision is logged, never silent.
    n_bands = n_reps * chunks_per_hash
    expected_fraction = 1.0 - (1.0 - 2.0**-band_width) ** n_bands
    if not force_lsh and expected_fraction > dense_fraction_cutoff:
        import logging

        logging.getLogger(__name__).warning(
            "embedding_neardup_pairs: band config (w=%d, B=%d) has expected "
            "candidate fraction %.3f > %.2f — using the exact all-pairs plan",
            band_width,
            n_bands,
            expected_fraction,
            dense_fraction_cutoff,
        )
        return cosine_pairs_exact(df, id_col, vec_col, threshold=cosine_threshold)

    mask = (1 << band_width) - 1
    sigs = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
        embedding_multi_simhash_col(vec_col, seed, n_reps, dim).alias("_sims"),
    ).localCheckpoint(eager=True)
    bands = F.array(
        *[
            F.struct(
                F.lit(r * chunks_per_hash + j).alias("band_id"),
                F.shiftrightunsigned(F.col("_sims")[r], j * band_width)
                .bitwiseAND(F.lit(mask))
                .alias("band_key"),
            )
            for r in range(n_reps)
            for j in range(chunks_per_hash)
        ]
    )
    banded = sigs.select("_id", F.explode(bands).alias("c")).select(
        "_id", "c.band_id", "c.band_key"
    )
    pairs = candidate_pairs(banded, cfg).select("a", "b")
    id_type = dict(df.dtypes)[id_col]

    # Verification: ship only (a, b) id pairs and score them against a
    # BROADCAST id→vector matrix (one einsum per batch). At moderate
    # thresholds LSH candidates approach all-pairs, so the alternative
    # — two shuffle joins attaching 64-double arrays to every pair —
    # moves ~100× more bytes for identical output (measured 19.8 s →
    # ~4 s at sf0.1). Falls back to the shuffle-join path when the
    # corpus exceeds the broadcast budget; at that scale the operator
    # should run with higher thresholds / wider bands anyway (module
    # docstring), keeping candidates sparse.
    n_vecs = sigs.count()  # sigs is checkpointed — metadata-cheap
    if n_vecs <= broadcast_limit:
        rows = sigs.select("_id", "_vec").collect()
        ids = np.array([r[0] for r in rows])
        mat = np.stack([np.asarray(r[1], np.float64) for r in rows])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(ids)
        b_ids = df.sparkSession.sparkContext.broadcast(ids[order])
        b_mat = df.sparkSession.sparkContext.broadcast(mat[order])

        def verify_bcast(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            ids_s, mat_s = b_ids.value, b_mat.value
            for pdf in batches:
                if not len(pdf):
                    continue
                ia = np.searchsorted(ids_s, pdf["a"].to_numpy())
                ib = np.searchsorted(ids_s, pdf["b"].to_numpy())
                cos = np.round(np.einsum("ij,ij->i", mat_s[ia], mat_s[ib]), 6)
                keep = cos >= cosine_threshold
                yield pd.DataFrame(
                    {"a": pdf["a"][keep], "b": pdf["b"][keep], "cosine": cos[keep]}
                )

        return pairs.mapInPandas(verify_bcast, f"a {id_type}, b {id_type}, cosine double")

    vecs = sigs.select("_id", "_vec")
    joined = pairs.join(
        vecs.withColumnRenamed("_id", "a").withColumnRenamed("_vec", "va"), on="a"
    ).join(vecs.withColumnRenamed("_id", "b").withColumnRenamed("_vec", "vb"), on="b")

    def verify(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack([np.asarray(x, np.float64) for x in pdf["va"]])
            b = np.stack([np.asarray(x, np.float64) for x in pdf["vb"]])
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            b /= np.linalg.norm(b, axis=1, keepdims=True)
            cos = np.round(np.einsum("ij,ij->i", a, b), 6)
            keep = cos >= cosine_threshold
            yield pd.DataFrame(
                {"a": pdf["a"][keep], "b": pdf["b"][keep], "cosine": cos[keep]}
            )

    return joined.mapInPandas(verify, f"a {id_type}, b {id_type}, cosine double")


def cosine_pairs_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """(a, b, cosine) for ALL pairs with cosine >= threshold — the
    exact O(n²) baseline the LSH path's recall is measured against.

    Dense linear algebra is the one case where "UDFs are the slow
    path" inverts: a zip_with/aggregate codegen dot product allocates
    an intermediate array per pair (measured 127 s for 2k vectors at
    sf0.1); broadcasting the corpus matrix to the workers and letting
    BLAS do block × corpusᵀ is ~50× faster and shuffles nothing.
    Cosine is rounded to 6 decimals so the DuckDB oracle matches
    exactly. One side must fit in a broadcast; the ``max_rows`` guard
    makes that explicit — exceeding it raises instead of silently
    OOMing the driver (use ``embedding_neardup_pairs`` with a
    selective band config beyond it).
    """
    import pandas as pd

    spark = df.sparkSession
    # one job, not count()+collect(): limit(max_rows+1) bounds driver
    # memory exactly like the count guard while halving the fixed
    # job-scheduling overhead of this small-corpus path
    rows = df.select(id_col, vec_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"cosine_pairs_exact collects the corpus at the driver; >{max_rows} "
            f"rows exceeds max_rows={max_rows} — use embedding_neardup_pairs "
            "(LSH) with a selective band config at this scale"
        )
    ids = np.array([r[0] for r in rows])
    mat = np.stack([np.asarray(r[1], np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))

    def score(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if not len(pdf):
                continue
            block = np.stack([np.asarray(x, np.float64) for x in pdf["_v"]])
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            cos = np.round(block @ all_mat.T, 6)  # (m, n)
            rid = pdf["_id"].to_numpy()
            mi, ni = np.nonzero(cos >= threshold)
            keep = rid[mi] < all_ids[ni]  # unordered pairs, self excluded
            yield pd.DataFrame(
                {"a": rid[mi][keep], "b": all_ids[ni][keep], "cosine": cos[mi, ni][keep]}
            )

    id_type = dict(df.dtypes)[id_col]
    return v.mapInPandas(score, f"a {id_type}, b {id_type}, cosine double")


def _kmeans(mat: np.ndarray, n_cells: int, iters: int = 8, seed: int = 9001) -> np.ndarray:
    """Tiny deterministic spherical k-means (driver-side, on a sample).
    Returns L2-normalized centroids (n_cells, d)."""
    rng = np.random.default_rng(seed)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample: int = 10_000,
    seed: int = 9001,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_cells`` spherical-k-means cells, score each probe only against
    its ``n_probe`` nearest cells.

    The scale shape: centroids are trained driver-side on a bounded
    sample and BROADCAST; cell assignment and scoring are BLAS batches
    in ``mapInPandas``; the probe×corpus pairing is an equi shuffle
    join on ``cell`` touching ~``n_probe/n_cells`` of the corpus per
    probe (vs the full corpus for brute force). With
    ``n_probe == n_cells`` results equal ``cosine_topk_bruteforce``
    exactly (tested) — the standard IVF recall/throughput dial.

    Returns (probe_id, neighbor_id, rank, cosine).
    """
    import pandas as pd

    spark = corpus.sparkSession
    sample = corpus.select(id_col, vec_col).sort(id_col).limit(train_sample).collect()
    mat = np.stack([np.asarray(r[1], np.float64) for r in sample])
    cents = _kmeans(mat, n_cells, seed=seed)
    # _kmeans returns min(n_cells, |sample|) centroids; a probe can't
    # visit more cells than exist
    n_probe = min(n_probe, len(cents))
    b_cents = spark.sparkContext.broadcast(cents)

    v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )

    def assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            block = np.stack([np.asarray(x, np.float64) for x in pdf["cvec"]])
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            cell = (block @ b_cents.value.T).argmax(axis=1)
            out = pdf.copy()
            out["cell"] = cell.astype(np.int32)
            yield out

    corpus_cells = v.mapInPandas(
        assign, "neighbor_id long, cvec array<double>, cell int"
    )

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("pvec")
    )

    def probe_cells(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            block = np.stack([np.asarray(x, np.float64) for x in pdf["pvec"]])
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            order = np.argsort(-(block @ b_cents.value.T), axis=1)[:, :n_probe]
            rows = pdf.loc[pdf.index.repeat(n_probe)].reset_index(drop=True)
            rows["cell"] = order.reshape(-1).astype(np.int32)
            yield rows

    probe_assign = p.mapInPandas(
        probe_cells, "probe_id long, pvec array<double>, cell int"
    )

    joined = probe_assign.join(corpus_cells, on="cell").filter(
        F.col("probe_id") != F.col("neighbor_id")
    )

    def score(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack([np.asarray(x, np.float64) for x in pdf["pvec"]])
            b = np.stack([np.asarray(x, np.float64) for x in pdf["cvec"]])
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            b /= np.linalg.norm(b, axis=1, keepdims=True)
            # rank on the UNROUNDED cosine (matches bruteforce and the
            # DuckDB oracle's ordering); round only the display column
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cosine": np.einsum("ij,ij->i", a, b),
                }
            )

    scored = joined.mapInPandas(score, "probe_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
