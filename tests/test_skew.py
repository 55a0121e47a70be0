"""Skew-mitigation operators: result equality vs the direct plans on a
heavily skewed key distribution, and plan-shape assertions."""

from pyspark.sql import functions as F


def _skewed(spark):
    # 95% of rows on one key
    hot = spark.range(0, 20000).selectExpr("'hot' AS k", "id % 500 AS v")
    cold = spark.range(0, 1000).selectExpr("concat('c', id % 50) AS k", "id AS v")
    return hot.unionByName(cold)


def test_exact_distinct_by_key_equals_direct(spark):
    from datasketches_rust_spark.operators.skew import exact_distinct_by_key

    df = _skewed(spark)
    got = {r.k: r.distinct_count for r in exact_distinct_by_key(df, "k", "v").collect()}
    want = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want
    # plan: the dedup shuffle must be keyed by (k, v), not k alone
    import re

    phys = exact_distinct_by_key(df, "k", "v")._jdf.queryExecution().executedPlan().toString()
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", phys)
    assert any("k#" in p and "v#" in p for p in parts), parts


def test_salted_collect_set_equals_direct(spark):
    from datasketches_rust_spark.operators.skew import salted_collect_set

    df = _skewed(spark)
    got = {
        r.k: list(r.items)
        for r in salted_collect_set(df, "k", "v", n_salts=8).collect()
    }
    want = {
        r.k: sorted(r.items)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("items")).collect()
    }
    assert got == want
    # determinism across partitionings (the reproducibility contract)
    again = {
        r.k: list(r.items)
        for r in salted_collect_set(df.repartition(13), "k", "v", n_salts=8).collect()
    }
    assert again == got


def test_salted_agg_sum(spark):
    from datasketches_rust_spark.operators.skew import salted_agg

    df = _skewed(spark)
    got = {
        r.k: r.agg
        for r in salted_agg(
            df, "k", F.sum("v"), F.sum("_partial"), salt_source="v"
        ).collect()
    }
    want = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == want
