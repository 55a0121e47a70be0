"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` = total wall time of the headline queries. Per-query seconds in
"queries". Extra keys (throughput, scaling) are informational.

Set SPARK_GRAFT_SCALING=1 to also run the flagship dedup pipeline at
local[8] and local[32] on the same input and report scaling efficiency
(the BASELINE.json north_rule two-cluster-size evidence; full protocol
in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


def make_spark(cpus: int, shuffle_partitions: int | None = None) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("datasketches-rust-spark-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def run_queries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        del n
    return timings


def dedup_throughput(cpus: int, sf_dir: str) -> tuple[float, int]:
    """Full flagship pipeline wall time + row count at a parallelism level."""
    from datasketches_rust_spark.operators.dedup import near_dup_text_clusters

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        t0 = time.perf_counter()
        near_dup_text_clusters(docs, "doc_id", "text").count()
        dt = time.perf_counter() - t0
    finally:
        spark.stop()
    return dt, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        timings = run_queries(spark, sf_dir)
    finally:
        spark.stop()

    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_SCALING"):
        t8, n = dedup_throughput(8, sf_dir)
        t32, _ = dedup_throughput(32, sf_dir)
        speedup = t8 / t32
        result["scaling"] = {
            "rows": n,
            "local8_sec": round(t8, 3),
            "local32_sec": round(t32, 3),
            "local8_rows_per_sec": round(n / t8, 1),
            "local32_rows_per_sec": round(n / t32, 1),
            "speedup_8_to_32": round(speedup, 3),
            "efficiency_8_to_32": round(speedup / 4.0, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
