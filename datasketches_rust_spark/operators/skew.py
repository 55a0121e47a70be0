"""Explicit skew mitigation operators (north rule: "explicit salting,
AQE-driven skew mitigation, band-keyed repartitioning").

What each layer covers — and what it does NOT:

* Spark's map-side partial aggregation already collapses skew for
  algebraic aggregates (sum/count/min/max): every task pre-aggregates
  its keys, so a hot key ships one partial row per task, not its raw
  rows. No salting needed.
* AQE skew handling splits oversized SHUFFLE-JOIN partitions only —
  it does nothing for skewed aggregation keys of non-algebraic
  aggregates.
* That leaves two gaps this module fills explicitly:

  1. ``exact_distinct_by_key`` — COUNT(DISTINCT item) BY key. Spark
     plans distinct-aggregates with an Expand + two shuffles keyed by
     the GROUP key, so one hot key concentrates its whole item set in
     one task. The fix is the classic two-step: shuffle on the
     COMPOSITE (key, item) — perfectly spread regardless of key skew —
     dedup there, then count per key (tiny second shuffle). The theta
     sketch path (operators/sketch_aggs.py) is the approximate cousin;
     this is the exact one.
  2. ``salted_agg`` — generic two-stage salted aggregation for
     aggregates with NO map-side partial (collect_set/collect_list,
     UDAFs): stage 1 groups by (key, salt) so a hot key's rows spread
     over ``n_salts`` tasks, stage 2 merges the per-salt partials.
     The salt is a deterministic hash of the value column — results
     are a pure function of the data (the engine's reproducibility
     contract), never of rand()/partition ids.

Both are pure Catalyst plans (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_distinct_by_key(df: DataFrame, key_col: str, item_col: str) -> DataFrame:
    """(key, distinct_count) — skew-safe exact COUNT(DISTINCT item).

    Shuffle 1 is keyed by (key, item): a key with 10^9 rows spreads
    over the whole cluster; shuffle 2 moves one row per (key, item)
    pair pre-collapsed by map-side partial count.
    """
    return (
        df.select(key_col, item_col)
        # COUNT(DISTINCT item) ignores NULL items; distinct() would
        # keep a (key, NULL) row and count it as a value
        .filter(F.col(item_col).isNotNull())
        .distinct()
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("distinct_count"))
    )


def salted_agg(
    df: DataFrame,
    key_col: str,
    partial_agg: Column,
    merge_agg: Column,
    n_salts: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation: ``partial_agg`` per (key, salt),
    then ``merge_agg`` over the partials per key. Correct for any
    associative pair of (partial, merge) expressions — the caller
    states the decomposition explicitly (e.g. collect_set →
    flatten(collect_set), sum → sum).

    ``salt_source``: column whose hash drives the salt. REQUIRED —
    pass a value column (or any row-varying expression source): a salt
    derived from the key would be constant across a hot key's rows,
    landing them all in one (key, salt) group and defeating the
    mitigation entirely, which is exactly the silent failure this
    function exists to prevent. Deterministic: same data → same salted
    partials → same merged result.
    """
    if salt_source is None:
        raise ValueError(
            "salt_source is required: salting by the key itself gives every "
            "row of a hot key the same salt (no skew mitigation); pass the "
            "value column or another row-varying column"
        )
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    )
    partials = salted.groupBy(key_col, "_salt").agg(partial_agg.alias("_partial"))
    return partials.groupBy(key_col).agg(merge_agg.alias("agg"))


def salted_collect_set(
    df: DataFrame, key_col: str, item_col: str, n_salts: int = 32
) -> DataFrame:
    """Skew-safe collect_set: per-salt sets merged with
    array_distinct(flatten(...)) — a hot key's set is built by
    ``n_salts`` tasks instead of one. Returns (key, items array)."""
    out = salted_agg(
        df,
        key_col,
        F.collect_set(item_col),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial")))),
        n_salts=n_salts,
        salt_source=item_col,
    )
    return out.withColumnRenamed("agg", "items")
