"""Substring-match dedup operator (north-rule signature family #3).

Pipeline: winnowed fingerprints (pandas UDF, ArrayType(LongType)) →
explode → fingerprint buckets → candidate pairs (reusing the LSH
bucket machinery, operators/lsh.py — identical shuffle topology) →
exact verification: suffix-array longest-common-substring per pair
(functions/substring.py), filter >= min_len.

Guarantee chain: winnowing (k, w) finds every pair sharing a run of
length >= k + w − 1 = min_len; the suffix-array verifier then removes
hash-coincidence false positives and reports the exact shared length.

Scale note: the verification join ships the two full texts of every
*candidate* pair (not every pair) — at 10^12 docs keep min_len high
enough that candidates are rare, and cap per-bucket fan-out via the
same max_bucket_size chain logic as MinHash banding.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.substring import (
    document_fingerprints_batch,
    lcs_at_least_batch,
)
from .lsh import candidate_pairs


def fingerprint_col(text_col: str, k: int, w: int) -> F.Column:
    @F.pandas_udf("array<long>")
    def _fp(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            fps = document_fingerprints_batch(batch.tolist(), k, w)
            yield pd.Series([f.view(np.int64) for f in fps])

    return _fp(F.col(text_col))


def substring_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 23,
    k: int | None = None,
    cfg: DedupConfig | None = None,
) -> DataFrame:
    """(a, b, common_len) for pairs sharing a substring >= min_len chars.

    min_len must be >= k; window w = min_len − k + 1.

    **Exhaustiveness boundary (skew guard):** pair enumeration is
    exhaustive for every fingerprint bucket up to
    ``cfg.max_bucket_size`` members. A bucket beyond the cap — m
    documents all sharing one boilerplate k-gram — would emit O(m²)
    pairs (at web scale that output IS the problem, not the skew), so
    over-cap buckets emit O(m) salted-chain candidates instead: the
    bucket's membership stays discoverable, but the full pair list for
    that k-gram is intentionally not enumerated, and chain pairs that
    don't also share a >= min_len run are dropped by verification.
    Corpora where exhaustive pairs over hot boilerplate matter should
    raise ``cfg.max_bucket_size`` (exact, quadratic cost) or
    deduplicate boilerplate upstream (exact_dedup) first.

    k defaults to min_len − 4: a candidate then requires a shared run
    of >= k chars, so near-min_len runs only. A small k (e.g. 16) with
    a large window keeps the same guarantee but candidates explode on
    boilerplate k-grams — measured 343k candidate pairs vs 4.4k at
    k=26/w=5 on sf0.1 documents (79× verification fan-out for
    identical output). The stop-gram effect grows with corpus size, so
    at 10^12 docs small k is fatal, not just slow.
    """
    cfg = cfg or DedupConfig()
    if k is None:
        k = max(12, min_len - 4)
    if min_len < k:
        raise ValueError(f"min_len must be >= k ({k})")
    w = min_len - k + 1

    from ..session import ensure_min_partitions

    # one fingerprint pass on all cores (a one-row-group parquet scan
    # is unsplittable → repartition first), checkpointed because
    # candidate_pairs consumes the banded frame at least twice (size
    # probe + clique; + chain strata when a bucket is hot) — without
    # the checkpoint the UDF re-ran for each, measured 2/3 of the
    # query's wall time at sf0.1
    fps = (
        ensure_min_partitions(df.select(F.col(id_col).alias("_id"), F.col(text_col)))
        .select("_id", fingerprint_col(text_col, k, w).alias("fps"))
        .localCheckpoint(eager=True)
    )
    banded = fps.select(
        "_id", F.lit(0).alias("band_id"), F.explode("fps").alias("band_key")
    )
    pairs = candidate_pairs(banded, cfg)

    texts = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    joined = (
        pairs.join(
            texts.withColumnRenamed("_id", "a").withColumnRenamed("_text", "text_a"), on="a"
        )
        .join(
            texts.withColumnRenamed("_id", "b").withColumnRenamed("_text", "text_b"), on="b"
        )
    )

    @F.pandas_udf("long")
    def lcs(ta: pd.Series, tb: pd.Series) -> pd.Series:
        # batch-level verification: prefix hashes built once per unique
        # document and (doc, probe-length) hash tables shared across
        # every pair in the Arrow batch (functions/substring.py,
        # round 3) — replaces the per-pair rebuild that made this the
        # slowest stage of the bench
        return pd.Series(
            lcs_at_least_batch(ta.tolist(), tb.tolist(), min_len), dtype="int64"
        )

    return (
        joined.withColumn("common_len", lcs(F.col("text_a"), F.col("text_b")))
        .filter(F.col("common_len") >= F.lit(min_len))
        .select("a", "b", "common_len")
    )
