"""SQL-callable sketch functions — the engine's `spark.sql` surface.

``register_sql_functions(spark)`` registers:

* ``theta_sketch_agg(item)``   — GROUPED_AGG pandas UDF building one
  v4-compressed compact theta sketch per group (`functions/theta.py`,
  wire-compatible with every Apache DataSketches implementation);
* ``theta_union_agg(blob)``    — GROUPED_AGG union of sketch blobs
  (re-aggregation of pre-sketched rollups — the mergeability contract
  of `theta/sketch.rs` expressed as a SQL aggregate);
* ``theta_estimate(blob)``     — scalar estimate; exact mode equals
  COUNT(DISTINCT ...) so SQL results are oracle-checkable;
* ``theta_lb(blob)`` / ``theta_ub(blob)`` — 2-σ confidence bounds
  (full binomial-bounds port);
* ``hll_estimate(blob)``       — scalar composite estimate over the
  engine HLL blob; ``cpc_estimate(blob)`` — ICON estimate.

With these, a user can write pure SQL:

    SELECT k, theta_estimate(theta_sketch_agg(v)) AS distinct_v
    FROM events GROUP BY k

and Spark executes it as the same partial/final aggregation topology
the DataFrame operators use (grouped-agg pandas UDFs get map-side
partials via the Arrow aggregation path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..config import ThetaConfig
from .cpc import CpcSketch
from .hll import HllSketch
from .theta import ThetaSketch, theta_union


def register_sql_functions(spark: SparkSession, cfg: ThetaConfig | None = None) -> None:
    """Register the sketch functions on this session's UDF registry."""
    cfg = cfg or ThetaConfig()

    @pandas_udf("binary")
    def theta_sketch_agg(vals: pd.Series) -> bytes:
        arr = vals.dropna().to_numpy()
        if len(arr) and arr.dtype.kind not in ("i", "u"):
            sk = ThetaSketch.from_strings([str(v) for v in arr], cfg)
        elif len(arr):
            sk = ThetaSketch.from_u64s(arr.astype(np.int64).view(np.uint64), cfg)
        else:
            sk = ThetaSketch.empty(cfg)
        return sk.serialize_compressed()

    @pandas_udf("binary")
    def theta_union_agg(blobs: pd.Series) -> bytes:
        sketches = [ThetaSketch.deserialize(bytes(b), cfg) for b in blobs.dropna()]
        if not sketches:
            return ThetaSketch.empty(cfg).serialize_compressed()
        return theta_union(sketches).serialize_compressed()

    @pandas_udf("double")
    def theta_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [ThetaSketch.deserialize(bytes(b), cfg).estimate() for b in blobs]
        )

    @pandas_udf("double")
    def theta_lb(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [ThetaSketch.deserialize(bytes(b), cfg).lower_bound(2) for b in blobs]
        )

    @pandas_udf("double")
    def theta_ub(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [ThetaSketch.deserialize(bytes(b), cfg).upper_bound(2) for b in blobs]
        )

    @pandas_udf("double")
    def hll_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [HllSketch.deserialize(bytes(b)).estimate() for b in blobs]
        )

    @pandas_udf("double")
    def cpc_estimate(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [CpcSketch.deserialize(bytes(b)).estimate() for b in blobs]
        )

    spark.udf.register("theta_sketch_agg", theta_sketch_agg)
    spark.udf.register("theta_union_agg", theta_union_agg)
    spark.udf.register("theta_estimate", theta_estimate)
    spark.udf.register("theta_lb", theta_lb)
    spark.udf.register("theta_ub", theta_ub)
    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("cpc_estimate", cpc_estimate)
