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

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from ..config import ThetaConfig
from .cpc import CpcSketch
from .hll import HllSketch
from .theta import ThetaSketch, hash_series, theta_union


def register_sql_functions(spark: SparkSession, cfg: ThetaConfig | None = None) -> None:
    """Register the sketch functions on this session's UDF registry."""
    cfg = cfg or ThetaConfig()

    @pandas_udf("binary")
    def theta_sketch_agg(vals: pd.Series) -> bytes:
        # hash_series is the same typed dispatch the DataFrame
        # operators use — float columns go through canonical_double →
        # u64 (`theta/sketch.rs:134-152`), NOT str(v), so sketches from
        # the SQL and DataFrame surfaces union correctly
        hashes = hash_series(vals, cfg)
        sk = (
            ThetaSketch.from_hashes(hashes, cfg)
            if len(hashes)
            else ThetaSketch.empty(cfg)
        )
        return sk.serialize_compressed()

    @pandas_udf("binary")
    def theta_union_agg(blobs: pd.Series) -> bytes:
        sketches = [ThetaSketch.deserialize(bytes(b), cfg) for b in blobs.dropna()]
        if not sketches:
            return ThetaSketch.empty(cfg).serialize_compressed()
        return theta_union(sketches).serialize_compressed()

    def _scalar(fn):
        """NULL-safe per-blob scalar: a NULL sketch column (e.g. from
        an outer join) yields SQL NULL instead of a task-killing
        TypeError — matching built-in aggregate-function semantics."""

        def apply(blobs: pd.Series) -> pd.Series:
            return pd.Series(
                [None if b is None else fn(bytes(b)) for b in blobs],
                dtype="float64",
                index=blobs.index,
            )

        return apply

    theta_estimate = pandas_udf("double")(
        _scalar(lambda b: ThetaSketch.deserialize(b, cfg).estimate())
    )
    theta_lb = pandas_udf("double")(
        _scalar(lambda b: ThetaSketch.deserialize(b, cfg).lower_bound(2))
    )
    theta_ub = pandas_udf("double")(
        _scalar(lambda b: ThetaSketch.deserialize(b, cfg).upper_bound(2))
    )
    hll_estimate = pandas_udf("double")(
        _scalar(lambda b: HllSketch.deserialize(b).estimate())
    )
    cpc_estimate = pandas_udf("double")(
        _scalar(lambda b: CpcSketch.deserialize(b).estimate())
    )

    spark.udf.register("theta_sketch_agg", theta_sketch_agg)
    spark.udf.register("theta_union_agg", theta_union_agg)
    spark.udf.register("theta_estimate", theta_estimate)
    spark.udf.register("theta_lb", theta_lb)
    spark.udf.register("theta_ub", theta_ub)
    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("cpc_estimate", cpc_estimate)
