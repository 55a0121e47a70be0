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

Plan choice (mirrors operators/ann.py's selectivity-gated LSH-vs-exact
pattern): an iterative join loop pays ~2 driver barriers + 3 shuffles
PER ROUND regardless of data size — on a deduplicated edge set that
fits one executor, that fixed cost dominates wall-clock. Below
``driver_max_edges`` the (already materialized, exactly counted) edge
list is collected and solved with the same min-label + pointer-jump
algorithm vectorized in NumPy, then parallelized back out; above it,
the distributed loop runs. The choice is logged, never silent, and
the collect is bounded by the threshold the caller sees.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def _driver_components(und: DataFrame) -> DataFrame:
    """Min-label CC of a small undirected edge frame (canonical s<=d;
    duplicates allowed — ``np.minimum.at`` is idempotent, so repeated
    edges cost transfer bytes but never change the fixpoint),
    NumPy-vectorized on the driver. Same fixpoint as the distributed
    loop; the min-propagation runs over hash-order dense codes
    (``pd.factorize`` is O(n); ``np.unique``'s comparison sort of the
    full edge list was >90% of this path's time on string ids — 1.4 s
    vs 0.06 s at 400k edges), then one argsort of the UNIQUE ids
    restores the min-id-per-component labeling exactly."""
    import pandas as pd

    pdf = und.toPandas()
    m = len(pdf)
    codes, uniq = pd.factorize(
        np.concatenate([pdf["s"].to_numpy(), pdf["d"].to_numpy()])
    )
    uniq = np.asarray(uniq)
    s_i, d_i = codes[:m], codes[m:]
    lab = np.arange(len(uniq))
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, s_i, lab[d_i])
        np.minimum.at(nxt, d_i, lab[s_i])
        while True:  # pointer-jump to per-round fixpoint
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    # appearance-order codes make `lab` an arbitrary (but consistent)
    # per-component representative; map each component to its true min
    # id via ranks over the sorted unique ids — sorting n_vertices,
    # not 2×n_edges
    order = np.argsort(uniq, kind="stable")
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    min_rank = np.full(len(uniq), len(uniq), dtype=np.int64)
    np.minimum.at(min_rank, lab, rank)
    cluster = uniq[order[min_rank[lab]]]

    out = pd.DataFrame({"id": uniq, "cluster_id": cluster})
    id_type = und.schema["s"].dataType
    return und.sparkSession.createDataFrame(
        out, schema=f"id {id_type.simpleString()}, cluster_id {id_type.simpleString()}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 60,
    driver_max_edges: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Return (id, cluster_id) for every vertex appearing in `edges`.

    cluster_id = min vertex id in the component. Edge sets at or below
    ``driver_max_edges`` (counted exactly on the materialized frame)
    solve driver-side (module docstring "Plan choice"); pass 0 to force
    the distributed loop.

    The gate counts the CANONICAL frame (least, greatest) BEFORE any
    dedup: a narrow no-shuffle checkpoint + count. The raw count is an
    upper bound of the distinct count, so every edge set the old
    distinct-first gate sent to the driver still goes to the driver
    (callers that feed pre-deduplicated pairs — every dedup pipeline in
    this repo, whose pair frames come out of a ``groupBy(a, b)`` — gate
    identically), and the common gated path no longer pays a full
    distinct shuffle just to decide; ``_driver_components`` absorbs
    duplicates for free (round 5: this shuffle + its checkpoint were
    ~1 s of fixed serial cost at BOTH levels of the two-cluster-size
    bench, a pure efficiency-ratio tax). A mirrored-heavy RAW edge set
    (raw ≫ distinct) can flip the gate to the distributed loop one size
    early — a plan heuristic, not a correctness edge; the loop dedups
    first and converges identically.
    """
    cand = edges.select(
        F.least(F.col(src), F.col(dst)).alias("s"),
        F.greatest(F.col(src), F.col(dst)).alias("d"),
    ).localCheckpoint(eager=True)

    if driver_max_edges:
        n_raw = cand.count()
        if stats is not None:
            # raw canonical (min,max) count, BEFORE the distinct the
            # distributed loop applies — named to say so, since for
            # duplicate- or mirror-heavy inputs it exceeds the true
            # undirected edge count
            stats["canonical_edges_raw"] = n_raw
        if n_raw <= driver_max_edges:
            _log.info(
                "connected_components: %d canonical edges <= %d — driver NumPy path",
                n_raw,
                driver_max_edges,
            )
            if stats is not None:
                stats["path"] = "driver"
            return _driver_components(cand)
        _log.info(
            "connected_components: %d canonical edges — distributed loop", n_raw
        )
    if stats is not None:
        stats["path"] = "distributed"

    # the distributed loop keeps the dedup: every round's joins rescan
    # the symmetric frame, so duplicate rows would tax EVERY round
    und = cand.distinct().localCheckpoint(eager=True)
    sym = und.union(und.select(F.col("d").alias("s"), F.col("s").alias("d")))

    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    rounds_run = 0
    for _ in range(max_iterations):
        rounds_run += 1
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
    if stats is not None:
        stats["rounds"] = rounds_run
    return labels.select("id", F.col("label").alias("cluster_id"))


def distributed_loop_selfcheck(spark) -> bool:
    """Deterministic boolean gate for the DISTRIBUTED pointer-jump
    loop, designed to ride a green sweep row (the round-4/5 folding
    pattern): sandbox-scale queries all take the driver path via the
    edge gate, so without this the distributed loop is only
    pytest/tool-visible. The graph is chosen so the loop must do real
    multi-round work:

    - a 9-vertex path (diameter 8): min-label + one pointer jump per
      round needs several rounds (converges in 4) — a broken jump or a
      premature convergence check under-merges it;
    - an 8-clique (dense buckets, the LSH hot-bucket shape);
    - a mirrored duplicate pair ((x,y) AND (y,x)) — the canonical-
      undirected dedup must collapse it;
    - two disjoint 2-components with interleaved ids (label-collision
      bait for the min propagation).

    Passes iff the forced-distributed labeling (driver_max_edges=0)
    equals the closed-form expected components and the loop actually
    ran >= 3 rounds. The driver NumPy path needs no run of its own
    here — every sandbox-scale CC sweep row already exercises it
    against DuckDB cluster oracles; cross-path equality on PRODUCTION
    edges is tools/cc_distributed_bench.py (BASELINE.md round 5).
    Cost budget: 4 rounds x ~2 tiny jobs ≈ 3 s warm — kept lean
    because this rides a benched sweep row (path of 9, not 17).
    """
    path_edges = [(100 + i, 101 + i) for i in range(8)]
    clique_edges = [(200 + i, 200 + j) for i in range(8) for j in range(i + 1, 8)]
    mirrored = [(300, 301), (301, 300)]
    twos = [(401, 403), (402, 404)]
    edges = spark.createDataFrame(
        path_edges + clique_edges + mirrored + twos, "a long, b long"
    )
    expected = (
        [(100 + i, 100) for i in range(9)]
        + [(200 + i, 200) for i in range(8)]
        + [(300, 300), (301, 300)]
        + [(401, 401), (403, 401), (402, 402), (404, 402)]
    )
    dstats: dict = {}
    dist = connected_components(edges, "a", "b", driver_max_edges=0, stats=dstats)
    dist_rows = sorted((r["id"], r["cluster_id"]) for r in dist.collect())
    return dist_rows == sorted(expected) and dstats.get("rounds", 0) >= 3
