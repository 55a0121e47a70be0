"""Distributed connected components over an edge DataFrame.

Min-label propagation expressed as pure DataFrame joins + hash
aggregations (SURVEY.md §2 Part B "iterative equi-join + hash agg"):
each vertex repeatedly adopts the smallest label among itself and its
neighbors; fixpoint = cluster assignment where every component is
labeled by its minimum member id.

Scale notes (the parts that matter at 10^12 edges):

* every iteration is one shuffle (join on dst) + one hash agg
  (min per src); AQE coalesces/splits the shuffle partitions at
  runtime;
* ``localCheckpoint(eager=True)`` per iteration truncates the lineage
  DAG — without it the plan doubles per iteration and Catalyst
  re-analysis dominates (SURVEY.md §4 item 3). On a real cluster this
  becomes a reliable-checkpoint/Iceberg write (see
  ``sources/checkpoint.py``);
* convergence in O(max component diameter) iterations. LSH clique
  edges keep diameters tiny; chained over-cap buckets bound diameter
  by the chain length — if that ever dominates, swap in the
  large-star/small-star contraction (same join/agg primitives,
  O(log n) rounds). The iteration count is capped and asserted.

Deterministic output: labels are min(ids), ties impossible — so the
assignment is a pure function of the edge *set*, independent of
partitioning or executor count (the two-cluster-size reproducibility
requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """Return (id, cluster_id) for every vertex appearing in `edges`.

    cluster_id = min vertex id in the component.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "d"), on="d")
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("s", "id")
        )
        new_labels = (
            labels.join(nbr_min, on="id", how="left")
            .select(
                "id",
                F.least(F.col("label"), F.col("nbr_label")).alias("new_label"),
                F.col("label"),
            )
            .localCheckpoint(eager=True)  # materialize once; count + next iter reuse it
        )
        changed = new_labels.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    del spark
    return labels.select("id", F.col("label").alias("cluster_id"))
