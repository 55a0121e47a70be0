"""New driver-contract queries: events windows/sessions (DuckDB oracle
parity at sf0.001) and the image+caption queries over the distributed
deterministic generator (sources/imagegen.py)."""

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
EVENT_QUERIES = [
    "events_hourly_window",
    "events_sessionize",
    "events_top_users",
    "events_distinct_users_by_type",
]


def _oracle_rows(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_query_matches_oracle(spark, name):
    got_df = entrymod.queries()[name](spark, SF_DIR)
    got = _normalize(got_df.columns, [tuple(r) for r in got_df.collect()])
    cols, rows = _oracle_rows(entrymod.oracle_sql()[name])
    assert sorted(cols) == sorted(got_df.columns)
    want = _normalize(cols, rows)
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle"


def test_imagegen_distributed_deterministic(spark):
    from datasketches_rust_spark.sources.imagegen import generate_image_caption_df

    a = generate_image_caption_df(spark, 60, seed=42, partitions=4).toPandas()
    b = generate_image_caption_df(spark, 60, seed=42, partitions=4).toPandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert list(a.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert a["image_id"].is_unique and len(a) == 60
    assert (a["image_id"] == b["image_id"]).all()
    assert (a["phash"] == b["phash"]).all()
    assert (a["caption"] == b["caption"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))


def test_multimodal_query_recall_on_generated_truth(spark):
    """The north-rule pipeline on the generated table recovers the
    planted clusters (recall vs truth; the strict reference-parity gate
    lives in test_recall_gate.py)."""
    from datasketches_rust_spark.operators.dedup import near_dup_multimodal_clusters
    from datasketches_rust_spark.sources.imagegen import (
        generate_image_caption_df,
        pair_recall,
    )

    df = generate_image_caption_df(spark, 120, seed=42, partitions=4, with_truth=True)
    pdf = df.toPandas()
    got = (
        near_dup_multimodal_clusters(df.drop("true_cluster"))
        .toPandas()
        .rename(columns={"id": "image_id"})
    )
    truth = pdf[["image_id", "true_cluster"]].rename(
        columns={"true_cluster": "true_cluster"}
    )
    r = pair_recall(got[["image_id", "cluster_id"]], truth)
    assert r >= 0.99, f"recall vs planted truth = {r}"


def test_image_feature_queries_run(spark):
    feats = entrymod.queries()["image_features"](spark, SF_DIR).toPandas()
    assert len(feats) == 400 and feats["decode_ok"].all()
    ps = entrymod.queries()["image_roundtrip_psnr"](spark, SF_DIR).toPandas()
    assert ps["psnr_ok"].all() and ps["decode_ok"].all()


def test_cpc_query_tolerance(spark):
    got = entrymod.queries()["cpc_distinct_users"](spark, SF_DIR).toPandas()
    _cols, rows = _oracle_rows(
        "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1"
    )
    exact = dict(rows)
    assert len(got) == len(exact)
    for _, r in got.iterrows():
        n = exact[r["event_type"]]
        assert abs(r["cpc_estimate"] - n) / n <= 0.04, (r["event_type"], n)


def test_from_path_pipeline_matches_dataframe_pipeline(spark, tmp_path):
    """The direct-read scale path (signatures_direct → LSH → CC) yields
    identical cluster assignments to the JVM-read DataFrame pipeline."""
    from datasketches_rust_spark.operators.dedup import (
        near_dup_multimodal_clusters,
        near_dup_multimodal_clusters_from_path,
    )
    from datasketches_rust_spark.sources.imagegen import generate_image_caption_df

    path = str(tmp_path / "imgs")
    generate_image_caption_df(spark, 150, seed=11, partitions=5).write.parquet(path)
    df = spark.read.parquet(path)
    a = (
        near_dup_multimodal_clusters(df, use_pixel_simhash=True)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    b = (
        near_dup_multimodal_clusters_from_path(spark, path)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert (a["id"] == b["id"]).all()
    assert (a["cluster_id"] == b["cluster_id"]).all()


def test_sql_registry_theta(spark):
    """Pure-SQL sketch usage: build → estimate == COUNT DISTINCT in the
    exact regime; union re-aggregation of pre-sketched rollups."""
    from pyspark.sql import functions as F

    from datasketches_rust_spark.config import ThetaConfig
    from datasketches_rust_spark.functions.sql_registry import register_sql_functions

    # lg_k=14 keeps even the global union in the exact regime (5000 < k)
    register_sql_functions(spark, ThetaConfig(lg_k=14))
    df = spark.range(0, 5000).selectExpr("id % 4 AS k", "id AS v")
    df.createOrReplaceTempView("t_sql_reg")
    got = {
        r.k: (r.est, r.lb, r.ub)
        for r in spark.sql(
            """SELECT k,
                      theta_estimate(theta_sketch_agg(v)) AS est,
                      theta_lb(theta_sketch_agg(v)) AS lb,
                      theta_ub(theta_sketch_agg(v)) AS ub
               FROM t_sql_reg GROUP BY k"""
        ).collect()
    }
    for k in range(4):
        assert got[k][0] == 1250.0 and got[k][1] <= 1250.0 <= got[k][2]

    # two-level rollup: per-k sketches unioned to a global sketch
    spark.sql(
        "SELECT k, theta_sketch_agg(v) AS sk FROM t_sql_reg GROUP BY k"
    ).createOrReplaceTempView("t_rollup")
    (total,) = spark.sql(
        "SELECT theta_estimate(theta_union_agg(sk)) AS n FROM t_rollup"
    ).first()
    assert total == 5000.0
