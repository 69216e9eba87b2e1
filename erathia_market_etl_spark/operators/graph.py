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
component minimum in O(component diameter) rounds. The edge table is
cached pre-partitioned on the join key, so each round exchanges ONLY
the labels side (join + one label/convergence aggregation — a single
labels-sized shuffle per round at scale); ``localCheckpoint`` on the
labels truncates the lineage so the plan does not grow with
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
    # The edge table is PERSISTED pre-partitioned on the join key, not
    # localCheckpoint'ed: LogicalRDD (checkpoint) drops outputPartitioning,
    # which would re-shuffle the (large) edge table on EVERY iteration of
    # the loop once labels outgrow broadcast; a cached repartition("b")
    # keeps the partitioning visible to the planner, so each round's
    # sort-merge join exchanges only the labels side (verified: the
    # iteration plan carries no ENSURE_REQUIREMENTS exchange on b).
    # Symmetrize with ONE pass over the edge pipeline: explode each edge
    # into both directions instead of union-ing two copies of the (often
    # expensive — LSH) edge plan, which only dedupes if ReuseExchange
    # happens to fire. repartition("b") BEFORE dropDuplicates lets the
    # dedup's final aggregate reuse that exchange (hash(b) satisfies the
    # (a, b) clustering requirement), so symmetrize+dedup+partition is a
    # single shuffle of the edge table, not two.
    both = F.array(
        F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
        F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
    )
    sym = (
        edges.select(F.explode(both).alias("e"))
        .select("e.a", "e.b")
        .repartition("b")
        .dropDuplicates()
        .persist()
    )
    sym.count()  # eager: compute the (possibly expensive) edge pipeline once
    # Round 1 is FREE: with identity initial labels, one propagation step
    # is label(v) = min(v, min over neighbors b) — a single aggregation
    # over sym, no labels table to join yet. This replaces the
    # labels-init distinct AND the first join round (each a full shuffle
    # + checkpoint at any scale). Symmetric edges guarantee round 1
    # changes some label (every edge's larger endpoint improves), so the
    # convergence probe starts at round 2.
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("lbl"))
        .select(F.col("a").alias("v"), "lbl")
        .localCheckpoint()
    )
    for _ in range(max_iter - 1):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .select(F.col("a").alias("v"), "lbl")
        )
        # The convergence flag rides the SAME aggregation that computes
        # the new labels (own=true tags each vertex's previous label, so
        # min(lbl) < min(lbl where own) == "this vertex improved") —
        # one shuffle and one checkpointed action per round, instead of
        # a separate join-against-old-labels action that re-shuffled
        # both sides just to count changes.
        merged = (
            labels.select("v", "lbl", F.lit(True).alias("own"))
            .unionByName(nbr_min.select("v", "lbl", F.lit(False).alias("own")))
            .groupBy("v")
            .agg(
                F.min("lbl").alias("lbl"),
                (F.min("lbl") < F.min(F.when(F.col("own"), F.col("lbl"))))
                .alias("chg"),
            )
            .localCheckpoint()
        )
        changed = merged.agg(F.max("chg")).first()[0]
        labels = merged.select("v", "lbl")
        if not changed:
            break
    sym.unpersist()  # labels is checkpointed — safe to drop the edge cache
    return labels.select("v", F.col("lbl").alias("component_id"))
