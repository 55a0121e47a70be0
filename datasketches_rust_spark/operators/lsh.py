"""LSH banding → candidate-pair generation (SURVEY.md §2 Part B).

Dataflow: signature struct column → ``posexplode`` of the band-key
array → ``(band_id, band_key, id)`` → repartition/groupBy on the band
bucket → within-bucket pair emission via ``applyInPandas``.

The groupBy-based pair emitter is an equi hash join in disguise, but
with explicit control the self-join lacks:

* **bucket cap**: buckets larger than ``max_bucket_size`` would emit
  O(m²) pairs (the classic LSH skew failure at 10^12 scale — millions
  of identical boilerplate captions land in one bucket). For those we
  emit a *sorted chain* (consecutive-id pairs, O(m)) instead of the
  clique: the connected components downstream are identical as long as
  chain edges survive verification — over-cap buckets hold rows whose
  ``rows_per_band`` signature slots all collide, i.e. near-certain
  duplicates, so they do. The cap event is counted in the emitted
  ``chained`` column — never silent truncation (SURVEY.md §7).
* **dedup across bands**: the same pair found in multiple bands is
  emitted once per band and de-duplicated with a single
  ``dropDuplicates`` shuffle before the (expensive) verification join.

At cluster scale AQE (adaptive skew-join splitting + partition
coalescing) handles residual skew; the cap bounds the worst case
before AQE ever sees it.
"""

from __future__ import annotations



import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def explode_bands(df: DataFrame, id_col: str, bands_col: str = "bands") -> DataFrame:
    """(id, band_id, band_key) rows; empty-signature sentinel filtered."""
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.col(bands_col)).alias("band_id", "band_key"),
        )
        # empty texts carry the all-ones sentinel (−1 as int64): never pair
        .filter(F.col("band_key") != F.lit(-1))
    )


def candidate_pairs(banded: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct candidate id pairs (a < b) from band buckets.

    Works for any orderable id type — the output pair columns keep the
    input id type.
    """
    cap = cfg.max_bucket_size
    id_type = dict(banded.dtypes)["_id"]
    schema = f"a {id_type}, b {id_type}, chained int"

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(pdf["_id"].unique())
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": ids[:0], "b": ids[:0], "chained": np.zeros(0, np.int32)})
        if m <= cap:
            iu, ju = np.triu_indices(m, k=1)
            return pd.DataFrame({"a": ids[iu], "b": ids[ju], "chained": 0})
        return pd.DataFrame({"a": ids[:-1], "b": ids[1:], "chained": 1})

    pairs = banded.groupBy("band_id", "band_key").applyInPandas(emit, schema)
    # one row per unordered pair; a pair seen non-chained in any band
    # verifies normally (min wins over the chained flag)
    return pairs.groupBy("a", "b").agg(F.min("chained").alias("chained"))
