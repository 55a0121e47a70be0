"""Spark signature operators: MinHash signatures + LSH band keys as
vectorized pandas UDFs (Arrow-batched; no per-row Python — BASELINE
input_hint requirement).

The UDF computes the signature AND its band keys in one pass so the
shingle hashing (the expensive part) runs once; the result is a struct
column, a pure projection with no shuffle (SURVEY.md §2 Part B,
"shingle hashing → bottom-k signature").
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import MinHashConfig, SimHashConfig
from ..functions.minhash import band_hashes, minhash_signatures
from ..functions.simhash import simhash_tokens

# int64 view of the all-ones empty-signature sentinel (uint64 max)
EMPTY_SLOT_I64 = -1


def minhash_signature_col(text_col: str, cfg: MinHashConfig) -> Column:
    """Column expression: struct(signature array<long>, bands array<long>)."""

    @pandas_udf("struct<signature: array<long>, bands: array<long>>")
    def _sig(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in texts:
            sigs = minhash_signatures(batch.tolist(), cfg)
            bands = band_hashes(sigs, cfg)
            sig_i64 = sigs.view(np.int64)
            band_i64 = bands.view(np.int64)
            yield pd.DataFrame(
                {
                    "signature": list(sig_i64),
                    "bands": list(band_i64),
                }
            )

    return _sig(F.col(text_col))


def simhash_col(text_col: str, cfg: SimHashConfig) -> Column:
    """64-bit token SimHash of a text column as LongType."""

    @pandas_udf("long")
    def _sim(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            h = simhash_tokens(batch.tolist(), cfg)
            yield pd.Series(h.view(np.int64))

    return _sim(F.col(text_col))


def jaccard_from_signatures(sig_a: str, sig_b: str) -> Column:
    """Rowwise MinHash Jaccard estimate between two signature columns.

    Expressed with built-in higher-order functions (zip_with +
    aggregate) so it stays JVM-side inside whole-stage codegen — the
    verification filter never leaves the JVM.
    """
    matches = F.aggregate(
        F.zip_with(F.col(sig_a), F.col(sig_b), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches / F.size(F.col(sig_a))
