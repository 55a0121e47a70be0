"""Mergeable-sketch aggregations as two-phase Spark operators.

Mirrors the reference's merge contract (commutative + associative +
order-insensitive, SURVEY.md §3.2) as Spark's partial/final
aggregation:

  phase 1 — ``mapInPandas`` over raw partitions → per-partition
            serialized sketch state (BinaryType), NO shuffle;
  phase 2 — ``groupBy(key).applyInPandas`` merge of partials →
            estimates, ONE shuffle of tiny sketch blobs instead of raw
            rows.

At 100 TB this is the difference between shuffling 10^12 raw keys and
shuffling |keys| × |partitions| sketch blobs of ≤ 8·k bytes — the
exact reason the reference makes every sketch mergeable
(`datasketches/src/hll/union.rs:79-151` etc.).

Wire-format interop of the binary ``sketch`` columns: theta partials
are the reference's compact v3/v4 layouts (legacy v1/v2 decode too,
functions/theta.py), bloom is the family-21 layout and frequent-items
the family-10 layout; HLL speaks the family-7 wire bidirectionally
(functions/hll.py serialize_wire/deserialize_wire) and CPC the FM85
compressed wire (functions/cpc_wire.py, round 3) — i.e. checkpointed
sketch columns are exchangeable with any Apache DataSketches
implementation (java/cpp/rust) in both directions for every family
except CountMin/t-digest engine internals (t-digest additionally
speaks the family-20 wire + tdunning compat, functions/tdigest.py).
The SHUFFLE path intentionally uses the engine layouts where they are
smaller/faster (HLL/CPC sparse-coupon or dense, chosen by size).

NULL-key semantics: grouped operators here (``*_by_key``,
``frequent_items_by_key``) EXCLUDE rows whose key is NULL from the
output — the pandas partial stage groups with ``dropna=True`` —
whereas Spark SQL ``GROUP BY`` would keep a NULL group. Filter or
coalesce NULL keys upstream if that group matters.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ThetaConfig
from ..functions.frequencies import FrequentItemsSketch
from ..functions.theta import ThetaSketch, theta_intersect, theta_union


def _is_integral(df: DataFrame, col: str) -> bool:
    """Declared-type probe for the typed hash dispatch: Arrow delivers
    an integer batch containing a NULL as float64, so dtype-sniffing
    alone would hash the same BIGINT value differently across groups
    (u64 path vs canonical-double path) and the sketches would union
    as if the values differed. Operators pass this down instead."""
    from pyspark.sql.types import IntegralType

    return isinstance(df.schema[col].dataType, IntegralType)


def _quantile_col_name(q: float) -> str:
    """Column label for a quantile: the full decimal with '.' -> '_'
    (0.5 -> q_0_5, 0.999 -> q_0_999) — collision-free and truncation-
    free, shared with streaming_tdigest_quantiles."""
    return f"q_{str(float(q)).replace('.', '_')}"


def _hash_values(
    vals: pd.Series, cfg: ThetaConfig, integral: bool | None = None
) -> np.ndarray:
    """Theta-convention hashes for a value batch — shared typed
    dispatch (ints / canonical_double floats / utf-8 strings) lives in
    functions/theta.py::hash_series so the SQL surface and this
    DataFrame surface produce identical hashes."""
    from ..functions.theta import hash_series

    return hash_series(vals, cfg, integral=integral)


def _sketch_values(
    vals: pd.Series, cfg: ThetaConfig, integral: bool | None = None
) -> ThetaSketch:
    return ThetaSketch.from_hashes(_hash_values(vals, cfg, integral), cfg)


def _theta_partials_counted(
    df: DataFrame, key_col: str, item_col: str, cfg: ThetaConfig
) -> tuple:
    """Phase 1: (key, partial sketch binary) — ONE row per key per
    partition — plus the partial frame's partition count (known from
    the input statically; reading it off the output frame would make
    AQE materialize the upstream exchange as an extra job)."""
    key_type = dict(df.dtypes)[key_col]
    schema = f"{key_col} {key_type}, sketch binary"
    integral = _is_integral(df, item_col)

    # compact a key's accumulated hash buffers once they exceed this
    # many entries (bounds partial-stage memory at ~keys × k × 8B while
    # keeping per-Arrow-batch work to hashing only)
    compact_above = 4 * cfg.k

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE sketch per key per PARTITION, not per Arrow batch: the
        # canonicalize/serialize tail runs once instead of once per
        # 2048-row batch (a 600k-row partition previously paid ~300
        # small-kernel invocations — measured 9.2 s → 1.4 s at sf0.1)
        bufs: dict = {}
        counts: dict = {}
        compacted: dict = {}
        for pdf in batches:
            for k, vals in pdf.groupby(key_col, sort=False)[item_col]:
                bufs.setdefault(k, []).append(_hash_values(vals, cfg, integral))
                counts[k] = counts.get(k, 0) + len(bufs[k][-1])
                if counts[k] > compact_above:
                    # fold the buffers into a sketch via union so the
                    # trimmed theta propagates (dropping entries while
                    # resetting theta would undercount)
                    sk = ThetaSketch.from_hashes(np.concatenate(bufs[k]), cfg)
                    compacted[k] = (
                        theta_union([compacted[k], sk]) if k in compacted else sk
                    )
                    bufs[k] = []
                    counts[k] = 0
        keys, blobs = [], []
        for k in bufs:
            keys.append(k)
            parts = []
            if bufs[k]:
                parts.append(ThetaSketch.from_hashes(np.concatenate(bufs[k]), cfg))
            if k in compacted:
                parts.append(compacted[k])
            sk = parts[0] if len(parts) == 1 else theta_union(parts)
            # v4-compressed wire format: ~2x smaller shuffle blobs;
            # deserialize dispatches on the serial-version byte so v3
            # checkpoints still read
            blobs.append(sk.serialize_compressed())
        yield pd.DataFrame({key_col: keys, "sketch": blobs})

    from ..session import ensure_min_partitions_counted

    # CPU-bound hashing stage: spread a small (one-row-group) scan
    # over the cluster; big inputs pass through shuffle-free
    narrow, nparts = ensure_min_partitions_counted(df.select(key_col, item_col))
    return narrow.mapInPandas(partial, schema), nparts


def theta_partial_sketches(
    df: DataFrame, key_col: str, item_col: str, cfg: ThetaConfig
) -> DataFrame:
    """Phase 1 public surface: (key, partial sketch binary), one row
    per key per partition (see :func:`_theta_partials_counted`)."""
    partials, _ = _theta_partials_counted(df, key_col, item_col, cfg)
    return partials


def theta_distinct_by_key(
    df: DataFrame, key_col: str, item_col: str, cfg: ThetaConfig | None = None
) -> DataFrame:
    """approx/exact COUNT(DISTINCT item) BY key via theta sketches.

    Exact (== COUNT DISTINCT, oracle-checkable) while per-key distinct
    count ≤ k (`theta/sketch.rs:164-171` exact mode).
    Returns (key, distinct_estimate double).
    """
    cfg = cfg or ThetaConfig()
    partials = theta_partial_sketches(df, key_col, item_col, cfg)
    key_type = dict(df.dtypes)[key_col]
    schema = f"{key_col} {key_type}, distinct_estimate double"

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sk = theta_union([ThetaSketch.deserialize(b, cfg) for b in pdf["sketch"]])
        return pd.DataFrame({key_col: [key[0]], "distinct_estimate": [sk.estimate()]})

    return partials.groupBy(key_col).applyInPandas(merge, schema)


def theta_distinct_global(
    df: DataFrame, item_col: str, cfg: ThetaConfig | None = None
) -> DataFrame:
    """Global distinct count: per-partition partials → executor-side
    TREE merge → the driver unions only ``fanout`` pre-merged blobs
    (the same de-funneling as countmin/bloom: a single final task
    receiving partitions × up-to-8·k-byte blobs is the funnel the
    by-key path avoids naturally via its key distribution)."""
    cfg = cfg or ThetaConfig()
    spark = df.sparkSession
    with_key = df.select(F.lit(0).alias("_g"), F.col(item_col))
    partials, nparts = _theta_partials_counted(with_key, "_g", item_col, cfg)
    partials = partials.select("sketch")

    def merge_blobs(blobs: list[bytes]) -> bytes:
        if not blobs:
            # empty/all-null input: zero partial rows reach the merge —
            # return the empty sketch (estimate 0.0) instead of letting
            # theta_union raise at the driver
            return ThetaSketch.empty(cfg).serialize_compressed()
        return theta_union(
            [ThetaSketch.deserialize(bytes(b), cfg) for b in blobs]
        ).serialize_compressed()

    blob = _tree_merge_blobs(partials, merge_blobs, nparts=nparts)
    est = ThetaSketch.deserialize(blob, cfg).estimate()
    return spark.createDataFrame([(est,)], "distinct_estimate double")


def theta_estimate_bounds_global(
    df: DataFrame, item_col: str, cfg: ThetaConfig | None = None, num_std_dev: int = 3
) -> DataFrame:
    """Global distinct estimate WITH confidence bounds — the
    estimation-mode surface (`theta/sketch.rs:394-435` estimate +
    binomial lower/upper bound). Same partial → size-gated tree-merge
    topology as ``theta_distinct_global``.
    Returns one row (estimate, lower_bound, upper_bound)."""
    cfg = cfg or ThetaConfig()
    spark = df.sparkSession
    with_key = df.select(F.lit(0).alias("_g"), F.col(item_col))
    partials, nparts = _theta_partials_counted(with_key, "_g", item_col, cfg)
    partials = partials.select("sketch")

    def merge_blobs(blobs: list[bytes]) -> bytes:
        if not blobs:
            return ThetaSketch.empty(cfg).serialize_compressed()
        return theta_union(
            [ThetaSketch.deserialize(bytes(b), cfg) for b in blobs]
        ).serialize_compressed()

    sk = ThetaSketch.deserialize(
        _tree_merge_blobs(partials, merge_blobs, nparts=nparts), cfg
    )
    return spark.createDataFrame(
        [(float(sk.estimate()), float(sk.lower_bound(num_std_dev)), float(sk.upper_bound(num_std_dev)))],
        "estimate double, lower_bound double, upper_bound double",
    )


def hll_estimate_bounds_global(
    df: DataFrame, item_col: str, lg_k: int = 12, num_std_dev: int = 3
) -> DataFrame:
    """Global HLL estimate with the measured-quantile/RSE bounds
    (`hll/estimator.rs:328-372`). Partials (sparse-coupon write side)
    → size-gated tree merge → one row
    (estimate, lower_bound, upper_bound)."""
    from ..functions.hll import HllSketch

    keyed = df.select(F.lit(0).alias("_g"), F.col(item_col))
    partials, nparts = _hll_partials_counted(keyed, "_g", item_col, lg_k)
    partials = partials.select("sketch")

    def merge_blobs(blobs: list[bytes]) -> bytes:
        s = None
        for b in blobs:
            part = HllSketch.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        if s is None:
            s = HllSketch(lg_k, out_of_order=True)
        return s.serialize()

    sk = HllSketch.deserialize(_tree_merge_blobs(partials, merge_blobs, nparts=nparts))
    return df.sparkSession.createDataFrame(
        [(float(sk.estimate()), float(sk.lower_bound(num_std_dev)), float(sk.upper_bound(num_std_dev)))],
        "estimate double, lower_bound double, upper_bound double",
    )


def cpc_estimate_bounds_global(
    df: DataFrame, item_col: str, lg_k: int = 11, num_std_dev: int = 3
) -> DataFrame:
    """Global CPC ICON estimate with kappa confidence bounds
    (`cpc/estimator.rs:93-212`). Returns one row
    (estimate, lower_bound, upper_bound)."""
    from ..functions.cpc import CpcSketch

    keyed = df.select(F.lit(0).alias("_g"), F.col(item_col))
    partials, nparts = _cpc_partials_counted(keyed, "_g", item_col, lg_k)
    partials = partials.select("sketch")

    def merge_blobs(blobs: list[bytes]) -> bytes:
        s = None
        for b in blobs:
            part = CpcSketch.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        if s is None:
            s = CpcSketch(lg_k)
        return s.serialize()

    sk = CpcSketch.deserialize(_tree_merge_blobs(partials, merge_blobs, nparts=nparts))
    return df.sparkSession.createDataFrame(
        [(float(sk.estimate()), float(sk.lower_bound(num_std_dev)), float(sk.upper_bound(num_std_dev)))],
        "estimate double, lower_bound double, upper_bound double",
    )


def theta_intersect_groups(
    df: DataFrame,
    item_col: str,
    split_col: str,
    cfg: ThetaConfig | None = None,
) -> DataFrame:
    """Distinct items present in BOTH halves of a boolean split.

    Builds one sketch per side (two-phase) and intersects
    (`theta/intersection.rs:64-196` semantics). Exact while each
    side's distinct count ≤ k. Returns (intersection_estimate double).
    """
    cfg = cfg or ThetaConfig()
    sides = _merged_side_sketches(df, item_col, split_col, cfg)
    est = (
        theta_intersect(sides[0], sides[1]).estimate() if len(sides) == 2 else 0.0
    )
    return df.sparkSession.createDataFrame([(est,)], "intersection_estimate double")


def _merged_side_sketches(
    df: DataFrame, item_col: str, split_col: str, cfg: ThetaConfig, fanout: int = 8
) -> dict:
    """{side: merged ThetaSketch} for a boolean split — per-partition
    partials tree-merged executor-side per (side, shard), so the driver
    ingests ≤ 2 × fanout blobs instead of 2 × partitions (the same
    de-funneling as the countmin/bloom/global-theta merges). Like
    ``_tree_merge_blobs``, the shard level is size-gated: with few
    partials it is a pure extra shuffle, so the driver collects the
    per-partition blobs directly."""
    keyed = df.select(F.col(split_col).cast("int").alias("_side"), F.col(item_col))
    partials, nparts = _theta_partials_counted(keyed, "_side", item_col, cfg)

    if nparts <= 4 * fanout:
        shards = partials.collect()
    else:

        def shard_merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            sk = theta_union(
                [ThetaSketch.deserialize(bytes(b), cfg) for b in pdf["sketch"]]
            )
            return pd.DataFrame(
                {"_side": [key[0]], "sketch": [sk.serialize_compressed()]}
            )

        shards = (
            partials.withColumn("_shard", F.spark_partition_id() % fanout)
            .groupBy("_side", "_shard")
            .applyInPandas(shard_merge, "_side int, sketch binary")
            .collect()
        )
    out: dict = {}
    for r in shards:
        sk = ThetaSketch.deserialize(bytes(r.sketch), cfg)
        out[r._side] = sk if r._side not in out else theta_union([out[r._side], sk])
    return out


def theta_jaccard_groups(
    df: DataFrame,
    item_col: str,
    split_col: str,
    cfg: ThetaConfig | None = None,
) -> DataFrame:
    """Jaccard similarity of the two halves of a boolean split,
    estimated from theta sketches: |A∩B| / |A∪B| via sketch
    intersection and union (`functions/theta.py::jaccard_estimate`,
    `theta/intersection.rs` + union semantics). Exact while each
    side's distinct count ≤ k (θ = 1 ⇒ both counts exact) →
    oracle-checkable. Same two-phase topology as
    ``theta_intersect_groups``. Returns (jaccard double)."""
    from ..functions.theta import jaccard_estimate

    cfg = cfg or ThetaConfig()
    sides = _merged_side_sketches(df, item_col, split_col, cfg)
    j = jaccard_estimate(sides[0], sides[1]) if len(sides) == 2 else 0.0
    return df.sparkSession.createDataFrame([(j,)], "jaccard double")


def theta_set_ops_groups(
    df: DataFrame,
    item_col: str,
    split_col: str,
    cfg: ThetaConfig | None = None,
) -> DataFrame:
    """Intersection estimate AND Jaccard of a boolean split from ONE
    two-phase sketch pass (``theta_intersect_groups`` and
    ``theta_jaccard_groups`` each rebuild the side sketches; callers
    needing both — the driver surface — should pay for one build).
    Exact while each side's distinct count ≤ k.
    Returns (intersection_estimate double, jaccard double)."""
    from ..functions.theta import jaccard_estimate

    cfg = cfg or ThetaConfig()
    sides = _merged_side_sketches(df, item_col, split_col, cfg)
    if len(sides) == 2:
        est = theta_intersect(sides[0], sides[1]).estimate()
        j = jaccard_estimate(sides[0], sides[1])
    else:
        est, j = 0.0, 0.0
    return df.sparkSession.createDataFrame(
        [(est, j)], "intersection_estimate double, jaccard double"
    )


def frequent_items_by_count(
    df: DataFrame, item_col: str, max_map_size: int = 256
) -> DataFrame:
    """Heavy hitters via two-phase Misra-Gries.

    Exact (== GROUP BY count, oracle-checkable) while distinct items
    < 0.75 * max_map_size (`frequencies/mod.rs:43-63`).

    Scale topology: per-partition MG partials → size-gated executor
    TREE merge (``_tree_merge_blobs``) → ONE merged blob at the driver
    (bounded by max_map_size) → tiny result DataFrame. The previous
    version funneled ALL partition partials into a single final task
    (`groupBy(lit(0))`) — at 10k partitions that one task deserialized
    10k blobs serially.
    Returns (item, est_count, lower_bound, upper_bound).
    """
    item_type = dict(df.dtypes)[item_col]

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = FrequentItemsSketch(max_map_size)
        for pdf in batches:
            # canonicalize items to str: the output schema is string,
            # and it pins the wire item-type so the merge side decodes
            # with the same specialization (family-10 blobs carry no
            # type tag, exactly like the reference's generic T)
            clean = pdf[item_col].dropna()
            if len(clean):
                sk.update_batch(clean.astype(str))
        yield pd.DataFrame({"sketch": [sk.serialize(item_type="str")]})

    partials = df.select(item_col).mapInPandas(partial, "sketch binary")

    def merge_blobs(blobs: list[bytes]) -> bytes:
        sk = FrequentItemsSketch(max_map_size)
        for b in blobs:
            sk.merge(FrequentItemsSketch.deserialize(bytes(b)))
        return sk.serialize(item_type="str")

    sk = FrequentItemsSketch.deserialize(_tree_merge_blobs(partials, merge_blobs))
    rows = sk.frequent_items(threshold=-1 if sk.is_exact() else None)
    out = df.sparkSession.createDataFrame(
        [(r[0], int(r[1]), int(r[2]), int(r[3])) for r in rows],
        f"{item_col} string, est_count long, lower_bound long, upper_bound long",
    )
    if item_type != "string":
        out = out.withColumn(item_col, F.col(item_col).cast(item_type))
    return out


def frequent_items_by_key(
    df: DataFrame, key_col: str, item_col: str, max_map_size: int = 64
) -> DataFrame:
    """Grouped heavy hitters: the top items WITHIN each key group via
    two-phase Misra-Gries — one MG sketch per (key × partition) in the
    partial stage (blobs bounded by max_map_size), merged per key.
    The shuffle carries |keys| × |partitions| bounded blobs instead of
    the raw rows; the final stage is distributed across keys (no
    single-task funnel by construction). Exact while per-key distinct
    items < 0.75 * max_map_size (`frequencies/mod.rs:43-63`).
    Returns (key, item, est_count, lower_bound, upper_bound)."""
    key_type = dict(df.dtypes)[key_col]
    item_type = dict(df.dtypes)[item_col]

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            for k, vals in pdf.groupby(key_col, sort=False)[item_col]:
                sk = acc.get(k)
                if sk is None:
                    sk = acc[k] = FrequentItemsSketch(max_map_size)
                # dropna BEFORE astype(str): a NULL item would otherwise
                # be counted as the literal string 'None'/'nan' —
                # GROUP BY semantics never count NULL
                clean = vals.dropna()
                if len(clean):
                    sk.update_batch(clean.astype(str))
        yield pd.DataFrame(
            {
                key_col: list(acc.keys()),
                "sketch": [s.serialize(item_type="str") for s in acc.values()],
            }
        )

    from ..session import ensure_min_partitions

    narrow = ensure_min_partitions(df.select(key_col, item_col))
    partials = narrow.mapInPandas(partial, f"{key_col} {key_type}, sketch binary")

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        sk = FrequentItemsSketch(max_map_size)
        for b in pdf["sketch"]:
            sk.merge(FrequentItemsSketch.deserialize(bytes(b)))
        rows = sk.frequent_items(threshold=-1 if sk.is_exact() else None)
        return pd.DataFrame(
            {
                key_col: [key[0]] * len(rows),
                item_col: [r[0] for r in rows],
                "est_count": [r[1] for r in rows],
                "lower_bound": [r[2] for r in rows],
                "upper_bound": [r[3] for r in rows],
            }
        )

    out = partials.groupBy(key_col).applyInPandas(
        merge,
        f"{key_col} {key_type}, {item_col} string, est_count long, "
        "lower_bound long, upper_bound long",
    )
    if item_type != "string":
        out = out.withColumn(item_col, F.col(item_col).cast(item_type))
    return out


# ---------------------------------------------------------------------------
# tdigest / countmin / bloom / hll two-phase aggregations
# ---------------------------------------------------------------------------


def tdigest_stats(
    df: DataFrame, value_col: str, quantiles: tuple = (0.5, 0.9, 0.99), k: int = 200
) -> DataFrame:
    """Two-phase t-digest over a numeric column.

    Returns one row: exactly-maintained (min_value, max_value,
    total_weight — `tdigest/sketch.rs:171-183, 214-216`, oracle-
    checkable) + tolerance-gated quantile estimates (q_0_5 etc.).
    """
    from ..functions.tdigest import TDigest

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        td = TDigest(k)
        for pdf in batches:
            td.update_batch(pdf[value_col].to_numpy(np.float64))
        yield pd.DataFrame({"sketch": [td.serialize()]})

    partials = df.select(value_col).mapInPandas(partial, "sketch binary")
    # label by the full decimal, not int(q*100): truncation mislabels
    # (0.29 -> q_28 via 28.999...) and collides (0.99 / 0.999)
    qnames = [_quantile_col_name(q) for q in quantiles]
    if len(set(qnames)) != len(qnames):
        raise ValueError(f"duplicate quantiles: {quantiles}")
    qcols = ", ".join(f"{c} double" for c in qnames)
    schema = f"min_value double, max_value double, total_weight long, {qcols}"

    def merge(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        td = TDigest(k)
        for b in pdf["sketch"]:
            td.merge(TDigest.deserialize(bytes(b)))
        row = {
            "min_value": [td.min if not td.is_empty() else None],
            "max_value": [td.max if not td.is_empty() else None],
            "total_weight": [td.total_weight()],
        }
        for q, c in zip(quantiles, qnames):
            row[c] = [td.quantile(q)]
        return pd.DataFrame(row)

    return (
        partials.withColumn("_g", F.lit(0)).groupBy("_g").applyInPandas(merge, schema)
    )


def countmin_weights_by_key(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    num_hashes: int = 3,
    num_buckets: int = 16384,
) -> DataFrame:
    """Count-Min estimated total weight per distinct key.

    Scale topology (no single-task funnel): per-partition sketches →
    tree merge (`countmin/sketch.rs:246-259` merge = element-wise add)
    into ONE broadcastable blob → the DISTINCT-KEY FRAME (computed as
    a distributed hash agg, never materialized in one task) probes the
    broadcast sketch with a vectorized UDF. The previous version
    funneled every partial's full key set plus the merged sketch into
    one final task — a bottleneck that defeats the point of a sketch
    at high key cardinality. Collision-free configs (num_buckets >>
    distinct keys) give exact sums → oracle-checkable.
    Returns (key, est_weight, upper_bound).
    """
    from ..functions.countmin import CountMinSketch

    key_type = dict(df.dtypes)[key_col]

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = CountMinSketch(num_hashes, num_buckets)
        for pdf in batches:
            # drop rows where either side is null: a NaN weight would
            # silently cast to INT64_MIN and corrupt every bucket the
            # key hashes to; NULL keys are never counted (GROUP BY
            # semantics)
            mask = pdf[key_col].notna() & pdf[weight_col].notna()
            if not mask.any():
                continue
            vals = pdf.loc[mask, key_col].to_numpy()
            w = pdf.loc[mask, weight_col].to_numpy(np.int64)
            # integer key arrays take the vectorized u64-murmur bucket
            # path inside update_batch; a list() here would force the
            # per-item _to_bytes loop
            cm.update_batch(vals, w)
        yield pd.DataFrame({"sketch": [cm.serialize()]})

    partials = df.select(key_col, weight_col).mapInPandas(partial, "sketch binary")
    # zero partials (an empty zero-partition scan) merge to the empty
    # sketch instead of crashing — the other families' merge_fns
    # already handle the [] case
    blob = _tree_merge_blobs(
        partials,
        lambda blobs: (
            _merge_countmin(blobs) or CountMinSketch(num_hashes, num_buckets)
        ).serialize(),
    )
    merged = CountMinSketch.deserialize(blob)
    ub_add = int(merged.relative_error * merged.total_weight)
    spark = df.sparkSession
    b_blob = spark.sparkContext.broadcast(blob)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cm = CountMinSketch.deserialize(b_blob.value)
        for pdf in batches:
            keys = pdf[key_col].tolist()
            est = cm.estimate_batch(keys)
            yield pd.DataFrame(
                {key_col: keys, "est_weight": est, "upper_bound": est + ub_add}
            )

    return (
        df.select(key_col)
        .distinct()
        .mapInPandas(probe, f"{key_col} {key_type}, est_weight long, upper_bound long")
    )


def _merge_countmin(blobs: list[bytes]):
    from ..functions.countmin import CountMinSketch

    out = None
    for b in blobs:
        part = CountMinSketch.deserialize(bytes(b))
        out = part if out is None else out.merge(part)
    return out


def _tree_merge_blobs(
    partials: DataFrame, merge_fn, fanout: int = 8, nparts: int | None = None
) -> bytes:
    """Sketch-blob merge, size-gated on the partial count:

    * few partials (≤ 4 × fanout partitions) — collect the blobs
      directly and merge at the driver: the shard stage would be a pure
      extra shuffle + job at this scale (measured: theta_union_orders
      1.23 s → 2.08 s in round 2 before this gate);
    * many partials — two-level tree: group blobs into ``fanout``
      shards merged executor-side, then merge the ``fanout`` shard
      blobs at the driver. Caps driver ingress at fanout × blob size
      instead of num_partitions × blob size — the difference between
      ~3 MB and ~400 MB at 1000 executors for a 393 KB Count-Min.

    The gate reads the plan's partition count (no job); the partial
    stage emits ≤ 1 blob per partition, so it bounds driver ingress."""
    if nparts is None:
        # no hint: safe to read off the frame only when there is no
        # exchange upstream (plain scan → mapInPandas); callers whose
        # partials repartition MUST pass the count
        nparts = partials.rdd.getNumPartitions()
    if nparts <= 4 * fanout:
        return merge_fn([bytes(r.sketch) for r in partials.collect()])

    def shard_merge(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sketch": [merge_fn(list(pdf["sketch"]))]})

    shards = (
        partials.withColumn("_g", F.spark_partition_id() % fanout)
        .groupBy("_g")
        .applyInPandas(shard_merge, "sketch binary")
        .collect()
    )
    return merge_fn([bytes(r.sketch) for r in shards])


def bloom_build(df: DataFrame, col: str, max_items: int, fpp: float) -> bytes:
    """Distributed bloom build: per-partition filters → executor-side
    tree OR-merge (`bloom/sketch.rs:174-185` union) → driver gets only
    ``fanout`` pre-merged blobs, not one per partition. Returns the
    serialized filter (intended for broadcast as a join pre-filter)."""
    from ..functions.bloom import BloomFilter

    proto = BloomFilter.with_accuracy(max_items, fpp)
    nb, nh = proto.num_bits, proto.num_hashes

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(nb, nh)
        for pdf in batches:
            arr = pdf[col].to_numpy()
            # int dtype (no-null by construction in pandas) rides the
            # vectorized byte-image path; other dtypes keep the exact
            # per-item packing semantics (incl. null stringification)
            bf.insert_batch(arr if arr.dtype.kind in ("i", "u") else pdf[col].tolist())
        yield pd.DataFrame({"sketch": [bf.serialize()]})

    def merge_blobs(blobs: list[bytes]) -> bytes:
        out = BloomFilter(nb, nh)
        for b in blobs:
            out.union(BloomFilter.deserialize(bytes(b)))
        return out.serialize()

    partials = df.select(col).mapInPandas(partial, "sketch binary")
    return _tree_merge_blobs(partials, merge_blobs)


def bloom_semi_filter(
    probe_df: DataFrame, probe_col: str, bloom_bytes: bytes
) -> DataFrame:
    """Filter probe_df to rows whose key is (probably) in the filter.

    No false negatives (`bloom/sketch.rs` membership contract); FPP
    per the build config. The blob rides to executors via closure
    broadcast — the DataFrame-level equivalent of Spark's runtime
    bloom-filter join pruning (`spark.sql.optimizer.runtime.bloomFilter`).
    """
    from ..functions.bloom import BloomFilter

    @F.pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        bf = BloomFilter.deserialize(bloom_bytes)
        arr = keys.to_numpy()
        if arr.dtype.kind in ("i", "u"):
            return pd.Series(bf.contains_batch(arr))
        return pd.Series(bf.contains_batch(keys.tolist()))

    return probe_df.filter(probe(F.col(probe_col)))


class _CouponAccumulator:
    """ONE sketch state per key per PARTITION for coupon sketches
    (HLL / CPC), replacing the per-(key × Arrow batch) partials that
    put |keys| × |batches| dense blobs into the shuffle (at lg_k=16
    that was 64 KB × keys × batches — ~117 MB for a 25-row answer at
    sf0.01, growing linearly with partition size).

    Write side is SPARSE-first, the engine analog of the reference's
    List→Set→Dense promotion ladder (`hll/sketch.rs:181-210`) /
    Sparse flavor (`cpc/mod.rs:59-102`): coupon buffers (~4 B/item)
    until ``promote_above`` coupons, then fold into one dense sketch.
    Low-cardinality keys therefore cost O(items) memory and bytes, not
    O(2^lg_k) — what makes per-key sketching viable at 10^9 keys."""

    def __init__(self, promote_above: int, promote_fn, absorb_fn):
        self.promote_above = promote_above
        self.promote_fn = promote_fn  # np.uint32 coupons -> dense sketch
        self.absorb_fn = absorb_fn  # (dense sketch, coupons) -> None
        self.bufs: dict = {}
        self.counts: dict = {}
        self.dense: dict = {}

    def add(self, key, coupons: np.ndarray) -> None:
        d = self.dense.get(key)
        if d is not None:
            self.absorb_fn(d, coupons)
            return
        self.bufs.setdefault(key, []).append(coupons)
        c = self.counts[key] = self.counts.get(key, 0) + len(coupons)
        if c > self.promote_above:
            self.dense[key] = self.promote_fn(np.concatenate(self.bufs.pop(key)))
            del self.counts[key]

    def emit(self, sparse_blob_fn, dense_blob_fn) -> tuple[list, list]:
        keys, blobs = [], []
        for k, parts in self.bufs.items():
            keys.append(k)
            blobs.append(sparse_blob_fn(np.concatenate(parts)))
        for k, d in self.dense.items():
            keys.append(k)
            blobs.append(dense_blob_fn(d))
        return keys, blobs


def _typed_coupons(
    vals: pd.Series, coupons_u64s, coupons_bytes, integral: bool | None = None
) -> np.ndarray:
    """Typed item dispatch for the HLL/CPC coupon kernels — the same
    contract as the theta surface and the SQL registry's _typed_update:
    ints via the u64 path, floats via canonical_double → u64 bit
    pattern (the reference's ``update_f64``), NOT str(v), so sketches
    built over the same float column on any surface carry identical
    coupons and union correctly. ``integral`` = declared-type override
    (see :func:`_is_integral`): a null-carrying integer batch arrives
    as float64 and must still take the u64 path."""
    from ..hashes import canonical_double

    arr = vals.dropna().to_numpy()
    if arr.dtype.kind in ("i", "u") or (integral and arr.dtype.kind == "f"):
        return coupons_u64s(arr.astype(np.int64).view(np.uint64))
    if arr.dtype.kind == "f":
        return coupons_u64s(canonical_double(arr.astype(np.float64)))
    return coupons_bytes([str(v).encode("utf-8") for v in arr])


def _hll_partials_counted(
    df: DataFrame, key_col: str, item_col: str, lg_k: int = 12
) -> tuple:
    """Phase 1: (key, partial HLL blob) — exactly one row per key per
    partition, sparse (coupon-list) blobs for low-cardinality keys —
    plus the statically-known partition count (see
    :func:`_theta_partials_counted` for why)."""
    from ..functions.hll import HllSketch, serialize_coupons

    key_type = dict(df.dtypes)[key_col]
    integral = _is_integral(df, item_col)
    k = 1 << lg_k

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = _CouponAccumulator(
            promote_above=k // 4,
            promote_fn=lambda c: HllSketch.from_coupons(c, lg_k),
            absorb_fn=lambda d, c: d.absorb_coupons(c),
        )
        for pdf in batches:
            for key, vals in pdf.groupby(key_col, sort=False)[item_col]:
                acc.add(
                    key,
                    _typed_coupons(
                        vals,
                        HllSketch.coupons_from_u64s,
                        HllSketch.coupons_from_bytes,
                        integral,
                    ),
                )
        keys, blobs = acc.emit(
            lambda c: serialize_coupons(c, lg_k), lambda d: d.serialize()
        )
        yield pd.DataFrame({key_col: keys, "sketch": blobs})

    from ..session import ensure_min_partitions_counted

    narrow, nparts = ensure_min_partitions_counted(df.select(key_col, item_col))
    return narrow.mapInPandas(partial, f"{key_col} {key_type}, sketch binary"), nparts


def hll_partial_sketches(
    df: DataFrame, key_col: str, item_col: str, lg_k: int = 12
) -> DataFrame:
    partials, _ = _hll_partials_counted(df, key_col, item_col, lg_k)
    return partials


def hll_distinct_by_key(
    df: DataFrame, key_col: str, item_col: str, lg_k: int = 12
) -> DataFrame:
    """approx COUNT(DISTINCT item) BY key via HLL register-max merge
    (`hll/union.rs:407-513`). Tolerance-gated (rows-only for the
    driver oracle; pytest asserts the HLL error gates).
    Returns (key, hll_estimate double)."""
    from ..functions.hll import HllSketch

    key_type = dict(df.dtypes)[key_col]
    partials = hll_partial_sketches(df, key_col, item_col, lg_k)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        s = None
        for b in pdf["sketch"]:
            part = HllSketch.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        return pd.DataFrame({key_col: [key[0]], "hll_estimate": [s.estimate()]})

    return partials.groupBy(key_col).applyInPandas(
        merge, f"{key_col} {key_type}, hll_estimate double"
    )


def _cpc_partials_counted(
    df: DataFrame, key_col: str, item_col: str, lg_k: int = 11
) -> tuple:
    """Phase 1: (key, partial CPC blob) — one row per key per
    partition, sparse coupon blobs below 2·k coupons — plus the
    statically-known partition count."""
    from ..functions.cpc import CpcSketch, serialize_cpc_coupons

    key_type = dict(df.dtypes)[key_col]
    integral = _is_integral(df, item_col)
    k = 1 << lg_k

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = _CouponAccumulator(
            # buffer memory 4 B × 2k == dense matrix size (8 B × k)
            promote_above=2 * k,
            promote_fn=lambda c: CpcSketch.from_coupons(c, lg_k),
            absorb_fn=lambda d, c: d.absorb_coupons(c),
        )
        for pdf in batches:
            for key, vals in pdf.groupby(key_col, sort=False)[item_col]:
                acc.add(
                    key,
                    _typed_coupons(
                        vals,
                        CpcSketch.coupons_from_u64s,
                        CpcSketch.coupons_from_bytes,
                        integral,
                    ),
                )
        keys, blobs = acc.emit(
            lambda c: serialize_cpc_coupons(c, lg_k), lambda d: d.serialize()
        )
        yield pd.DataFrame({key_col: keys, "sketch": blobs})

    from ..session import ensure_min_partitions_counted

    narrow, nparts = ensure_min_partitions_counted(df.select(key_col, item_col))
    return narrow.mapInPandas(partial, f"{key_col} {key_type}, sketch binary"), nparts


def cpc_partial_sketches(
    df: DataFrame, key_col: str, item_col: str, lg_k: int = 11
) -> DataFrame:
    partials, _ = _cpc_partials_counted(df, key_col, item_col, lg_k)
    return partials


def cpc_distinct_by_key(
    df: DataFrame, key_col: str, item_col: str, lg_k: int = 11
) -> DataFrame:
    """approx COUNT(DISTINCT item) BY key via the CPC-style coupon
    bit-matrix; merge = word-wise OR (`cpc/union.rs:18-62`). Same
    partial/final topology as the HLL aggregation; tolerance-gated
    (rows-only for the driver oracle, pytest asserts the error gate).
    Returns (key, cpc_estimate double)."""
    from ..functions.cpc import CpcSketch

    key_type = dict(df.dtypes)[key_col]
    partials = cpc_partial_sketches(df, key_col, item_col, lg_k)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        s = None
        for b in pdf["sketch"]:
            part = CpcSketch.deserialize(bytes(b))
            s = part if s is None else s.union(part)
        return pd.DataFrame({key_col: [key[0]], "cpc_estimate": [s.estimate()]})

    return partials.groupBy(key_col).applyInPandas(
        merge, f"{key_col} {key_type}, cpc_estimate double"
    )
