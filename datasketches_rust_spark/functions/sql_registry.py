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
  engine HLL blob; ``cpc_estimate(blob)`` — ICON estimate;
* ``hll_sketch_agg(item)`` / ``cpc_sketch_agg(item)`` — GROUPED_AGG
  builders (engine blobs, sparse-coupon when smaller; lg_k fixed at
  registration — 12 for HLL, 11 for CPC — use the DataFrame operators
  for per-call k); ``hll_union_agg(blob)`` / ``cpc_union_agg(blob)``
  — re-aggregation of pre-sketched rollups;
* ``tdigest_agg(value)``       — GROUPED_AGG t-digest builder
  (family-20 wire blob); ``tdigest_quantile(blob, q)`` /
  ``tdigest_rank(blob, x)`` — scalar queries over the blob;
* ``bloom_agg(item)`` / ``bloom_union_agg(blob)`` /
  ``bloom_contains(blob, item)`` — family-21 membership surface;
* ``countmin_agg(item, weight)`` / ``countmin_union_agg(blob)`` /
  ``countmin_estimate(blob, item)`` — family-18 weighted counts;
* ``frequent_items_agg(item)`` / ``frequent_items_union_agg(blob)`` /
  ``frequencies_estimate(blob, item)`` — family-10 heavy hitters.
  (Configs fixed at registration for the SQL surface; every knob is
  available on the DataFrame operators.)

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

    import numpy as np

    from ..hashes import canonical_double

    def _typed_update(sk, vals: pd.Series) -> None:
        """Typed item dispatch shared by the HLL/CPC SQL aggregates —
        same contract as the theta surface: ints via the u64 path,
        floats via canonical_double → u64 bit pattern (the reference's
        ``update_f64``, `hll/sketch.rs` / `cpc/sketch.rs` f64 paths),
        NOT str(v), so SQL- and DataFrame-built sketches over the same
        float column carry identical coupons and union correctly.

        KNOWN LIMIT (SQL surface only): registered UDFs never see the
        DECLARED column type, and Arrow delivers an integer group that
        contains a NULL as float64 — such a group's values hash via the
        canonical-double path while null-free groups of the same column
        hash via the u64 path, so their sketches union as if the values
        differed. The DataFrame operators are immune (they pass the
        declared type down — operators/sketch_aggs._is_integral); on
        the SQL surface, wrap nullable integer columns explicitly:
        ``theta_sketch_agg(CAST(x AS DOUBLE))`` for consistent float
        hashing, or filter the NULLs and keep integer hashing."""
        arr = vals.dropna().to_numpy()
        if len(arr) == 0:
            return
        if arr.dtype.kind in ("i", "u"):
            sk.update_u64s(arr.astype(np.int64).view(np.uint64))
        elif arr.dtype.kind == "f":
            sk.update_u64s(canonical_double(arr.astype(np.float64)))
        else:
            sk.update_strings([str(v) for v in arr])

    @pandas_udf("binary")
    def hll_sketch_agg(vals: pd.Series) -> bytes:
        # grouped-agg partials are merged → composite estimator anyway;
        # constructing out-of-order also keeps the vectorized dense
        # absorb (the in-order path is the sequential reference ladder)
        sk = HllSketch(12, out_of_order=True)
        _typed_update(sk, vals)
        return sk.serialize()

    @pandas_udf("binary")
    def hll_union_agg(blobs: pd.Series) -> bytes:
        s = None
        for b in blobs.dropna():
            part = HllSketch.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        if s is None:
            s = HllSketch(12, out_of_order=True)
        return s.serialize()

    @pandas_udf("binary")
    def cpc_sketch_agg(vals: pd.Series) -> bytes:
        sk = CpcSketch(11)
        # distributed partial: merge semantics (vectorized absorb +
        # ICON), not the sequential single-stream HIP path
        sk.merge_flag = True
        _typed_update(sk, vals)
        return sk.serialize()

    @pandas_udf("binary")
    def cpc_union_agg(blobs: pd.Series) -> bytes:
        s = None
        for b in blobs.dropna():
            part = CpcSketch.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        if s is None:
            s = CpcSketch(11)
        return s.serialize()

    from .tdigest import TDigest

    @pandas_udf("binary")
    def tdigest_agg(vals: pd.Series) -> bytes:
        td = TDigest(200)
        td.update_batch(vals.dropna().to_numpy(np.float64))
        return td.serialize()

    @pandas_udf("binary")
    def tdigest_merge_agg(blobs: pd.Series) -> bytes:
        td = TDigest(200)
        for b in blobs.dropna():
            td.merge(TDigest.deserialize(bytes(b)))
        return td.serialize()

    @pandas_udf("double")
    def tdigest_quantile(blobs: pd.Series, qs: pd.Series) -> pd.Series:
        out = []
        for b, q in zip(blobs, qs):
            out.append(
                None
                if b is None or q is None or pd.isna(q)
                else TDigest.deserialize(bytes(b)).quantile(float(q))
            )
        return pd.Series(out, dtype="float64", index=blobs.index)

    @pandas_udf("double")
    def tdigest_rank(blobs: pd.Series, xs: pd.Series) -> pd.Series:
        out = []
        for b, x in zip(blobs, xs):
            out.append(
                None
                if b is None or x is None or pd.isna(x)
                else TDigest.deserialize(bytes(b)).rank(float(x))
            )
        return pd.Series(out, dtype="float64", index=blobs.index)

    from .bloom import BloomFilter
    from .countmin import CountMinSketch
    from .frequencies import FrequentItemsSketch

    # fixed configs at registration, like the HLL/CPC lg_k above — the
    # DataFrame operators expose every knob; the SQL surface trades
    # per-call config for composability in pure SQL
    bloom_max_items, bloom_fpp = 100_000, 1e-6
    cm_hashes, cm_buckets = 5, 2048
    fi_map_size = 256

    @pandas_udf("binary")
    def bloom_agg(vals: pd.Series) -> bytes:
        bf = BloomFilter.with_accuracy(bloom_max_items, bloom_fpp)
        items = vals.dropna().tolist()
        if items:
            bf.insert_batch(items)
        return bf.serialize()

    @pandas_udf("binary")
    def bloom_union_agg(blobs: pd.Series) -> bytes:
        s = None
        for b in blobs.dropna():
            part = BloomFilter.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        if s is None:
            s = BloomFilter.with_accuracy(bloom_max_items, bloom_fpp)
        return s.serialize()

    @pandas_udf("boolean")
    def bloom_contains(blobs: pd.Series, items: pd.Series) -> pd.Series:
        out = []
        for b, it in zip(blobs, items):
            out.append(
                None
                if b is None or it is None
                else bool(BloomFilter.deserialize(bytes(b)).contains(it))
            )
        return pd.Series(out, dtype="object", index=blobs.index)

    @pandas_udf("binary")
    def countmin_agg(items: pd.Series, weights: pd.Series) -> bytes:
        cm = CountMinSketch(cm_hashes, cm_buckets)
        # drop rows where EITHER side is null: a NaN weight surviving
        # to .to_numpy(np.int64) silently becomes INT64_MIN and
        # corrupts every bucket the item hashes to
        mask = items.notna() & weights.notna()
        vals = items[mask]
        if len(vals):
            w = weights[mask].to_numpy()
            if w.dtype.kind == "f":
                if not np.isfinite(w).all():
                    raise ValueError("countmin_agg: non-finite weight")
                # round, don't C-truncate: 1.9 silently becoming 1
                # undercounts, and an out-of-range double casts to an
                # undefined int64
                w = np.rint(w)
                if (np.abs(w) >= 2**63).any():
                    raise ValueError("countmin_agg: weight out of int64 range")
            cm.update_batch(vals.tolist(), w.astype(np.int64))
        return cm.serialize()

    @pandas_udf("binary")
    def countmin_union_agg(blobs: pd.Series) -> bytes:
        s = None
        for b in blobs.dropna():
            part = CountMinSketch.deserialize(bytes(b))
            s = part if s is None else s.merge(part)
        if s is None:
            s = CountMinSketch(cm_hashes, cm_buckets)
        return s.serialize()

    @pandas_udf("long")
    def countmin_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
        out = []
        for b, it in zip(blobs, items):
            out.append(
                None
                if b is None or it is None
                else int(CountMinSketch.deserialize(bytes(b)).estimate(it))
            )
        return pd.Series(out, dtype="object", index=blobs.index)

    @pandas_udf("binary")
    def frequent_items_agg(vals: pd.Series) -> bytes:
        sk = FrequentItemsSketch(fi_map_size)
        clean = vals.dropna()
        if len(clean):
            # stringify to match the str-pinned wire type below: an
            # int-keyed partial merged with a str-keyed one would
            # double-count under distinct dict keys
            sk.update_batch(clean.astype(str))
        # the SQL surface is stringly-typed end-to-end: union and
        # estimate deserialize as 'str', so the agg must serialize as
        # 'str' too (leaving serialize() to infer 'i64' from an int
        # column made the blob unreadable by the other two functions)
        return sk.serialize("str")

    @pandas_udf("binary")
    def frequent_items_union_agg(blobs: pd.Series) -> bytes:
        s = None
        for b in blobs.dropna():
            part = FrequentItemsSketch.deserialize(bytes(b))
            s = part if s is None else s.merge(part)
        if s is None:
            s = FrequentItemsSketch(fi_map_size)
        return s.serialize("str")

    @pandas_udf("long")
    def frequencies_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
        out = []
        for b, it in zip(blobs, items):
            out.append(
                None
                if b is None or it is None
                else int(
                    FrequentItemsSketch.deserialize(bytes(b)).estimate(str(it))
                )
            )
        return pd.Series(out, dtype="object", index=blobs.index)

    spark.udf.register("bloom_agg", bloom_agg)
    spark.udf.register("bloom_union_agg", bloom_union_agg)
    spark.udf.register("bloom_contains", bloom_contains)
    spark.udf.register("countmin_agg", countmin_agg)
    spark.udf.register("countmin_union_agg", countmin_union_agg)
    spark.udf.register("countmin_estimate", countmin_estimate)
    spark.udf.register("frequent_items_agg", frequent_items_agg)
    spark.udf.register("frequent_items_union_agg", frequent_items_union_agg)
    spark.udf.register("frequencies_estimate", frequencies_estimate)
    spark.udf.register("theta_sketch_agg", theta_sketch_agg)
    spark.udf.register("theta_union_agg", theta_union_agg)
    spark.udf.register("theta_estimate", theta_estimate)
    spark.udf.register("theta_lb", theta_lb)
    spark.udf.register("theta_ub", theta_ub)
    spark.udf.register("hll_estimate", hll_estimate)
    spark.udf.register("cpc_estimate", cpc_estimate)
    spark.udf.register("hll_sketch_agg", hll_sketch_agg)
    spark.udf.register("hll_union_agg", hll_union_agg)
    spark.udf.register("cpc_sketch_agg", cpc_sketch_agg)
    spark.udf.register("cpc_union_agg", cpc_union_agg)
    spark.udf.register("tdigest_agg", tdigest_agg)
    spark.udf.register("tdigest_merge_agg", tdigest_merge_agg)
    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("tdigest_rank", tdigest_rank)
