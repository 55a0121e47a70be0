"""Checkpoint/lineage/resume tests (north rule: killed job resumes
without recomputing completed sketch buckets)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from datasketches_rust_spark.sources.checkpoint import CheckpointManager


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_run_stage_resumes_only_missing_buckets(spark, docs, tmp_path):
    cp = CheckpointManager(str(tmp_path), num_buckets=8)
    calls = []

    def compute(slice_df):
        buckets = sorted(r._bucket for r in slice_df.select("_bucket").distinct().collect())
        calls.append(buckets)
        return slice_df.select("doc_id", "n_chars", "_bucket")

    out1 = cp.run_stage(spark, "s1", docs, "doc_id", compute)
    assert calls[0] == list(range(8))
    n = out1.count()
    assert n == docs.count()

    # simulate a killed job: forget two buckets in the manifest
    done = cp.completed_buckets("s1")
    cp._write_json_atomic(
        cp._manifest_path("s1"),
        {"completed_buckets": sorted(done - {2, 5}), "lineage": {}},
    )
    out2 = cp.run_stage(spark, "s1", docs, "doc_id", compute)
    assert calls[1] == [2, 5], "resume must recompute ONLY missing buckets"
    assert out2.count() == n

    # fully complete manifest → compute_fn not called at all
    out3 = cp.run_stage(spark, "s1", docs, "doc_id", compute)
    assert len(calls) == 2
    assert out3.count() == n


def test_dynamic_overwrite_idempotent(spark, docs, tmp_path):
    cp = CheckpointManager(str(tmp_path), num_buckets=4)

    def compute(slice_df):
        return slice_df.select("doc_id", "_bucket")

    cp.run_stage(spark, "s", docs, "doc_id", compute)
    # partial-write crash: bucket files exist but manifest forgot them
    cp.invalidate("s")
    out = cp.run_stage(spark, "s", docs, "doc_id", compute)
    # dynamic partition overwrite must not duplicate rows
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_metrics_and_lineage_written(spark, docs, tmp_path):
    cp = CheckpointManager(str(tmp_path), num_buckets=4)
    cp.run_stage(
        spark, "sig", docs, "doc_id",
        lambda s: s.select("doc_id", "_bucket"),
        lineage={"input": "source", "config": "minhash-128"},
    )
    m = cp.read_metrics("sig")
    assert m["stage"] == "sig"
    assert m["buckets_recomputed"] == [0, 1, 2, 3]
    assert m["lineage"]["config"] == "minhash-128"
    with open(cp._manifest_path("sig")) as f:
        man = json.load(f)
    assert man["completed_buckets"] == [0, 1, 2, 3]


def test_resumable_pipeline_equals_direct(spark, docs, tmp_path):
    from datasketches_rust_spark.operators.dedup import (
        near_dup_text_clusters,
        resumable_near_dup_pipeline,
    )

    direct = {
        (r.id, r.cluster_id)
        for r in near_dup_text_clusters(docs, "doc_id", "text").collect()
    }
    wd = str(tmp_path / "run1")
    ckpt = {
        (r.id, r.cluster_id)
        for r in resumable_near_dup_pipeline(spark, docs, "doc_id", "text", wd).collect()
    }
    assert ckpt == direct

    # kill-and-resume: drop part of the signature manifest, rerun.
    # A real kill preserves the manifest's lineage/num_buckets — only
    # the completed-bucket set is behind.
    cp = CheckpointManager(wd, 32)
    man = cp._read_manifest("signatures")
    done = cp.completed_buckets("signatures")
    cp._write_json_atomic(
        cp._manifest_path("signatures"),
        {**man, "completed_buckets": sorted(done - {1, 7, 13})},
    )
    cp.invalidate("edges")
    cp.invalidate("clusters")
    resumed = {
        (r.id, r.cluster_id)
        for r in resumable_near_dup_pipeline(spark, docs, "doc_id", "text", wd).collect()
    }
    assert resumed == direct


def test_resume_rejects_lineage_mismatch(spark, docs, tmp_path):
    """The reference ladder is serialize -> VALIDATE -> deserialize:
    resuming a stage under a different config or bucket count must
    refuse to splice old buckets into the new run, not silently mix
    incompatible state."""
    import pytest as _pt

    cp = CheckpointManager(str(tmp_path), num_buckets=4)
    compute = lambda s: s.select("doc_id", "_bucket")  # noqa: E731
    cp.run_stage(spark, "sig", docs, "doc_id", compute,
                 lineage={"config": "minhash-128"})

    # changed config
    with _pt.raises(ValueError, match="lineage mismatch"):
        cp.run_stage(spark, "sig", docs, "doc_id", compute,
                     lineage={"config": "minhash-256"})

    # changed bucket count
    cp8 = CheckpointManager(str(tmp_path), num_buckets=8)
    with _pt.raises(ValueError, match="lineage mismatch"):
        cp8.run_stage(spark, "sig", docs, "doc_id", compute,
                      lineage={"config": "minhash-128"})

    # same config resumes fine (no recompute: manifest complete)
    out = cp.run_stage(spark, "sig", docs, "doc_id", compute,
                       lineage={"config": "minhash-128"})
    assert out.count() == docs.count()

    # invalidate clears the way for the new config
    cp.invalidate("sig")
    out = cp.run_stage(spark, "sig", docs, "doc_id", compute,
                       lineage={"config": "minhash-256"})
    assert out.count() == docs.count()
