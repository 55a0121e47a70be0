"""Physical-plan regression guards: the properties that matter at
100 TB must survive refactors — column pruning to the scan, filter
pushdown, no non-broadcast cartesian products, broadcast of small
sides. Checked on the lazily-planned driver queries at sf0.001."""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


# queries whose construction is lazy (no eager checkpoint/collect)
LAZY = [
    "theta_distinct_by_nation",
    "quality_scores",
    "bpe_token_stats",
    "contamination_flags",
    "documents_split",
    "events_hourly_window",
    "events_top_users",
    "events_stratified_sample",
    "exact_dedup_documents",
    "hll_distinct_by_nation",
    # round-4 media queries: construction generates the tiny fixture
    # (one-time parquet cache) but the query plan itself stays lazy —
    # the planted-partner self-join must never degrade to a cartesian
    "audio_features",
    "video_fingerprints",
]


def test_scan_column_pruning(spark):
    """Scans must read only the referenced columns — a scan shipping
    all 9 events columns for a 2-column query is wrong at any scale."""
    cases = {
        "theta_distinct_by_nation": ("customer", {"c_nationkey", "c_custkey"}),
        "quality_scores": ("documents", {"doc_id", "text"}),
        "events_top_users": ("events", {"event_type", "user_id", "value"}),
    }
    for name, (table, cols) in cases.items():
        plan = _plan(spark, name)
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, (name, "no ReadSchema in plan")
        read = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert read == cols, (name, read)


def test_filter_pushdown(spark):
    """Row-group-prunable predicates must reach the parquet scan (the
    engine session keeps pushdown on; guarded on a driver-shaped
    events scan since the remaining driver queries either filter after
    eager stages or carry no pushable predicate)."""
    df = (
        spark.read.parquet(SF + "/events.parquet")
        .filter("user_id < 50")
        .select("user_id", "event_id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(user_id,50)" in plan, plan[:1500]


def test_no_unbroadcast_cartesian_products(spark):
    """CartesianProduct (non-broadcast) is never acceptable; broadcast
    nested-loop joins are allowed only where the design broadcasts a
    small probe side (ann top-k)."""
    for name in LAZY:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_whole_stage_codegen_present(spark):
    """Pure-Catalyst text queries must run inside codegen stages."""
    # aggregating queries sit under an unexecuted AdaptiveSparkPlan
    # wrapper whose codegen markers only appear post-execution — check
    # the pure projections
    for name in ("quality_scores", "bpe_token_stats"):
        plan = _plan(spark, name)
        # executedPlan renders codegen stages as "*(n)" prefixes
        assert "*(" in plan, name


def test_frequent_items_no_single_task_funnel(spark):
    """VERDICT r2 #3: the global frequent-items final phase must not
    funnel every partition partial into one task. The merged sketch is
    now tree-merged to the driver (bounded by max_map_size), so the
    result plan is a LocalRelation/parallelized scan — no
    groupBy(lit(0)) single-task FlatMapGroupsInPandas remains. The
    by-key variant distributes the final merge across keys and emits
    ≤ keys × partitions partial rows."""
    from pyspark.sql import functions as F

    from datasketches_rust_spark.operators.sketch_aggs import (
        frequent_items_by_count,
        frequent_items_by_key,
    )

    df = (
        spark.range(0, 20000)
        .selectExpr("id % 5 AS k", "CAST(id % 37 AS STRING) AS item")
        .repartition(4)
    )
    out = frequent_items_by_count(df, "item", max_map_size=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan, plan[:800]
    got = {r.item: r.est_count for r in out.collect()}
    assert got == {str(i): len(range(i, 20000, 37)) for i in range(37)}
    # exact regime: bounds collapse onto the count
    assert all(r.lower_bound == r.est_count == r.upper_bound for r in out.collect())

    by_key = frequent_items_by_key(df, "k", "item", max_map_size=256)
    rows = by_key.collect()
    assert len(rows) == 5 * 37
    for r in rows:
        want = sum(1 for i in range(int(r.item), 20000, 37) if i % 5 == r.k)
        assert r.est_count == want


def test_decontamination_broadcasts_bench_no_gram_shuffle(spark):
    """benchmark_ngram_overlap: the benchmark gram set must broadcast
    (eval suites are MBs vs a TB corpus) and the corpus must never
    shuffle keyed on n-gram — per-doc dedupe happens in-row via
    array_distinct, so the only wide exchanges are the tiny bench
    distinct and the per-doc count agg (keyed by doc id)."""
    plan = _plan(spark, "benchmark_decontamination")
    assert "BroadcastExchange" in plan, plan[:1500]
    # exactly ONE exchange partitions on the gram column `g` — the
    # tiny bench-side distinct. A second would mean the CORPUS grams
    # shuffled (the in-row array_distinct exists to prevent exactly
    # that); the per-doc agg and final id join shuffle on doc_id only.
    assert len(re.findall(r"hashpartitioning\(g#", plan)) <= 1, plan[:2000]
    assert "CartesianProduct" not in plan
