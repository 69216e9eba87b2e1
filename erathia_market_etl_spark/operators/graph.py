"""Iterative graph operators: connected components over an edge list.

The dedup endgame: near-dup PAIRS (MinHash/SimHash/embedding buckets)
are edges; the clusters are connected components; the kept document per
cluster is the component's canonical (minimum) id. The reference has no
iterative operators at all (SURVEY.md §2 — batch SQL only); this is the
extension surface's one genuinely iterative algorithm, expressed as a
driver-controlled loop of DataFrame joins — the sanctioned use of
driver control flow (convergence test), with all data movement staying
distributed.

Algorithm: min-label propagation. label(v) starts as v; each round
label(v) := min(label(v), min over neighbors' labels); converges to the
component minimum in O(component diameter) rounds. Each round is one
shuffle (join edges⋈labels) + one aggregation; ``localCheckpoint``
truncates the lineage so the plan does not grow exponentially with
iterations.

At 100 TB: diameter-bound rounds are fine for dedup graphs (clusters
are small and dense); for adversarial long-chain graphs the
alternating large-star/small-star formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) drops rounds
to O(log² n) — same join/aggregate building blocks, noted as the
upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Component id (= minimum vertex id) for every vertex that appears
    in ``edges``. Returns (v, component_id). Deterministic: min-labels
    are order-independent."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()  # eager: compute the (possibly expensive) edge pipeline once
    )
    labels = (
        sym.select(F.col("a").alias("v")).distinct()
        .select("v", F.col("v").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .select(F.col("a").alias("v"), "lbl")
        )
        new_labels = (
            labels.unionByName(nbr_min)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") < F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("v", F.col("lbl").alias("component_id"))
