"""Smoke the spark-submit job entrypoint (north rule: the pipeline
"ships as spark-submit --py-files jobs").

``jobs/run_dedup.py`` is the cluster ship-vehicle; everything it wires
together (session conf, direct-read signatures, fused multimodal LSH,
resumable checkpointing) is unit-tested elsewhere, but nothing proved
the entrypoint itself parses args, builds a session, and writes the
cluster-assignment parquet. Run it as a real subprocess — the same
code path `spark-submit` takes, minus the cluster — and check its
output against the in-process pipeline on the same deterministic
input.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def image_input(spark, tmp_path_factory):
    from datasketches_rust_spark.sources.imagegen import generate_image_caption_df

    path = str(tmp_path_factory.mktemp("jobin") / "images")
    generate_image_caption_df(spark, 120, seed=42, partitions=4).write.parquet(path)
    return path


def test_run_dedup_job_subprocess(spark, image_input, tmp_path):
    out_dir = str(tmp_path / "clusters")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_dedup.py"),
            "--input", image_input,
            "--output", out_dir,
            "--local-cpus", "4",
            "--scale-probe", "1",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "cluster assignments" in proc.stdout
    # the scaling tool parses this line (steady-state pass on the warm
    # session); a format drift would silently break the N->4N record
    assert "steady-state pipeline pass:" in proc.stdout

    got = {
        (r.image_id, r.cluster_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == 120

    # same assignments as the in-process pipeline on the same input
    from datasketches_rust_spark.operators.dedup import (
        near_dup_multimodal_clusters_from_path,
    )

    want = {
        (r.id, r.cluster_id)
        for r in near_dup_multimodal_clusters_from_path(spark, image_input).collect()
    }
    assert got == want


def test_run_dedup_job_resumable_workdir(spark, image_input, tmp_path):
    """--workdir mode: the checkpointed pipeline writes its bucketed
    stage manifests and the final assignments. Subprocess, not
    in-process: main() stops its session, which would kill the shared
    fixture."""
    out_dir = str(tmp_path / "clusters_resumable")
    workdir = str(tmp_path / "ckpt")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_dedup.py"),
            "--input", image_input,
            "--output", out_dir,
            "--workdir", workdir,
            "--local-cpus", "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert spark.read.parquet(out_dir).count() == 120
    stages = set(os.listdir(workdir))
    assert "signatures" in stages and "clusters" in stages


def _find_spark_submit() -> str | None:
    import shutil as _shutil

    found = _shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_run_dedup_job_spark_submit_py_files(spark, image_input, tmp_path):
    """The LITERAL north-rule ship vehicle: `spark-submit --py-files
    <zip> jobs/run_dedup.py`. The plain-python subprocess test above
    exercises the entrypoint logic; this one exercises the packaging —
    the engine package zipped and distributed via --py-files, the
    session built from spark-submit's conf (no --local-cpus), pandas
    UDFs resolving the module on executors from the shipped zip."""
    submit = _find_spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH or in the pyspark install")

    zip_path = str(tmp_path / "dsrs.zip")
    import zipfile

    pkg_root = os.path.join(REPO, "datasketches_rust_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".pyc") or "__pycache__" in dirpath:
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))

    out_dir = str(tmp_path / "clusters_submit")
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_dedup.py"),
            "--input", image_input,
            "--output", out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = {
        (r.image_id, r.cluster_id) for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == 120
    # identical assignments to the in-process pipeline — the packaging
    # changes nothing about the computation
    from datasketches_rust_spark.operators.dedup import (
        near_dup_multimodal_clusters_from_path,
    )

    want = {
        (r.id, r.cluster_id)
        for r in near_dup_multimodal_clusters_from_path(spark, image_input).collect()
    }
    assert got == want
