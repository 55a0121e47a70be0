"""Distributed connected components over an edge DataFrame.

Min-label propagation with pointer doubling, expressed as pure
DataFrame joins + hash aggregations (SURVEY.md §2 Part B "iterative
equi-join + hash agg"). Each round does two passes:

1. **edge pass** — every vertex adopts the minimum label in its
   neighborhood (join edges→labels on dst, min-agg per src);
2. **pointer-jump pass** — ``label(x) ← min(label(x),
   label(label(x)))`` (self-join of the label table). This halves the
   depth of every label chain per round, so convergence is
   O(log(max component diameter)) rounds, not O(diameter): a 10^6-row
   chained LSH bucket (operators/lsh.py over-cap chains) converges in
   ~20 rounds instead of 10^6.

Scale notes (the parts that matter at 10^12 edges):

* each round = 2 shuffles (one per pass) + hash aggs; AQE
  coalesces/splits shuffle partitions at runtime;
* ``localCheckpoint(eager=True)`` per round truncates the lineage DAG
  — without it the plan doubles per iteration and Catalyst re-analysis
  dominates (SURVEY.md §4 item 3). On a real cluster swap for
  reliable checkpoint / Iceberg stage writes (sources/checkpoint.py);
* fixpoint when no label changes; iteration cap 60 covers components
  of diameter ~2^60 — unreachable — and still fails loudly rather
  than silently truncating.

Deterministic output: labels are min(ids); the assignment is a pure
function of the edge *set*, independent of partitioning or executor
count (the two-cluster-size reproducibility requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 60,
) -> DataFrame:
    """Return (id, cluster_id) for every vertex appearing in `edges`.

    cluster_id = min vertex id in the component.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # pass 1: neighborhood minimum
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "d"), on="d")
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("s", "id")
        )
        l1 = (
            labels.join(nbr_min, on="id", how="left")
            .select("id", F.least("label", "nbr_label").alias("label"))
        )
        # pass 2: pointer jump — label(x) := min(label(x), label(label(x)))
        lmap = l1.select(F.col("id").alias("label"), F.col("label").alias("label2"))
        l2 = (
            l1.join(lmap, on="label", how="left")
            .select("id", F.least("label", "label2").alias("new_label"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(l2, on="id")
            .localCheckpoint(eager=True)  # materialize once; count + next round reuse
        )
        changed = new_labels.filter(F.col("new_label") < F.col("old_label")).limit(1).count()
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))
