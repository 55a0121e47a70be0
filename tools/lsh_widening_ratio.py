"""Weather-fair cost ratio of the LSH band widening (4 -> 8 reps).

The round-4 clean-window headline (BASELINE.md "post-kernel-speedup
record") predates the `embedding_neardup_lsh` band widening
(4 reps -> 8 reps / 72 bands, commit "Widen the LSH embedding query's
band config"). The host has been in a sustained degraded phase since,
so an absolute clean re-measure may not land this round. This probe
produces the next-best evidence: the POST/PRE cost ratio of the one
changed query, with both configs interleaved round-robin inside the
same weather window and min-of-rounds taken per config — the same
ratio-is-weather-fair protocol as bench.py's scaling pairs and
tools/refbench (see BASELINE.md "Round 4 addendum 2").

estimated clean post-widening time = recorded clean 4-rep time x ratio.

Usage: python tools/lsh_widening_ratio.py [sf_dir] [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import SparkSession, functions as F

    from datasketches_rust_spark.operators.ann import embedding_neardup_pairs

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("lsh-widening-ratio")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.cache().count()  # same scan for both configs; isolate the LSH cost

    def run(n_reps: int, force_lsh: bool) -> float:
        df = embedding_neardup_pairs(
            emb,
            "vec_id",
            "embedding",
            cosine_threshold=0.5,
            band_width=7,
            n_reps=n_reps,
            force_lsh=force_lsh,
        ).select(F.col("a"), F.col("b"), F.col("cosine"))
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # warm both configs once (JIT, codegen, page faults out of band)
    run(4, True)
    run(8, True)

    pre, post = [], []
    for r in range(rounds):
        pre.append(run(4, True))
        post.append(run(8, True))
        print(
            f"[round {r}] pre(4 reps) {pre[-1]:.2f}s post(8 reps) {post[-1]:.2f}s",
            file=sys.stderr,
            flush=True,
        )

    ratio = min(post) / min(pre)
    out = {
        "probe": "lsh_widening_ratio",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "pre_4rep_sec": [round(x, 3) for x in pre],
        "post_8rep_sec": [round(x, 3) for x in post],
        "min_pre_sec": round(min(pre), 3),
        "min_post_sec": round(min(post), 3),
        "post_over_pre_ratio": round(ratio, 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
