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

Two kernels, same (v, component_id) contract:

  * ``connected_components`` — min-label propagation. O(component
    diameter) rounds, ONE labels-sized shuffle per round; the cheapest
    kernel when clusters are small and dense (the common dedup shape).
  * ``connected_components_star`` — alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). O(log² n) rounds REGARDLESS of diameter: each round
    rewires every vertex toward its neighborhood minimum, so
    chain-shaped clusters (paraphrase chains A≈B≈C≈…) collapse
    exponentially instead of one hop per round. More shuffles per
    round (two group-join-dedup passes + a convergence anti-join), so
    it wins exactly when diameter is the binding constraint — which at
    100 TB it is, because one adversarial chain makes the whole job
    round-bound (r5 VERDICT item 1). The registered dedup pipelines
    use this kernel; tests/test_graph.py pins the round-count gap on a
    planted path graph and label-equality between kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50,
    stats: dict | None = None,
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
    rounds = 1  # the fused init round above is a propagation step
    for _ in range(max_iter - 1):
        rounds += 1
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
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("v", F.col("lbl").alias("component_id"))


def connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al. SoCC'14, Algorithms 3-4). Same contract as
    ``connected_components``: (v, component_id = component minimum) for
    every vertex appearing in ``edges``; deterministic.

    Round = one large-star then one small-star, each a grouped
    aggregation + co-partitioned join + dedup over the edge set:

      large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u),
                     v > u — larger neighbors rewire to the minimum;
      small-star(u): over edges oriented (hi > lo), grouped by hi:
                     m = min(N≤(u) ∪ {u}); emit (v, m) for every
                     v ∈ N≤(u) ∪ {u} \\ {m} — smaller neighbors and u
                     itself collapse onto the minimum.

    Both preserve connectivity; the fixed point is a star forest whose
    centers are the component minima, reached in O(log² n) rounds on
    any graph (≈log n in practice) — the chain graphs that make
    min-label propagation O(n)-round collapse exponentially here.

    Scale shape: a small-star PREPASS rides the canonicalize+dedup
    exchange (hash(hi) feeds dedup, group-by, and join alike), doing
    the bulk of the collapse on dense dup-cluster graphs before the
    first full round. Per round: edges symmetrize with one union (no
    double-execution of the upstream — often LSH — edge plan past the
    initial persist), the group-by and its join share one exchange
    (repartition on the group key feeds both), dedups are edge-key
    hash aggregations, and convergence is a count + keys-only
    anti-join on checkpointed edge sets (the only extra action; edge
    tables shrink toward |V| as stars form). Lineage is truncated by
    ``localCheckpoint`` every round, as in the min-label kernel."""
    # one pass over the (possibly expensive) upstream edge plan. The
    # canonicalized set is PERSISTED pre-partitioned on hi (repartition
    # BEFORE dropDuplicates: hash(hi) satisfies the dedup aggregate's
    # (hi, lo) clustering requirement, so canonicalize+dedup+partition
    # is ONE shuffle — the min-label kernel's fusion trick), which lets
    # the small-star PREPASS below group and join with no exchange.
    canon = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .repartition("hi")
        .dropDuplicates()
        .persist()
    )
    # PREPASS small-star on the canonical orientation (its exact input
    # shape, riding canon's hash(hi) layout for free): collapses every
    # hi-group onto its minimum before the first full round — on dense
    # dup-cluster graphs this does most of the work and typically
    # saves one full alternation round. The prepass checkpoint is the
    # first action and materializes canon's cache as a side effect;
    # canon stays persisted for the final self-loop probe.
    e0 = canon.filter(F.col("hi") != F.col("lo"))
    mins0 = e0.groupBy("hi").agg(F.min("lo").alias("m"))
    e = (
        e0.join(mins0, "hi")
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        .unionByName(mins0.select("hi", F.col("m").alias("lo")))
        .filter(F.col("hi") != F.col("lo"))
        .dropDuplicates()
        .localCheckpoint()
    )
    # counting the checkpointed prepass output is one ~cached-scan job;
    # skipping it would cost a FULL confirmation round whenever the
    # prepass alone already reached the fixed point (round 1 could not
    # conclude set-equality without |e|)
    n_old = e.count()
    rounds = 0
    stable = n_old == 0  # nothing to collapse: the empty set is final
    for _ in range(max_iter):
        if stable:
            break
        rounds += 1
        # ---- large-star ----
        sym = (
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
            .unionByName(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
            .repartition("u")
        )
        mins = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
        # NO dedup here: large-star emits exactly one row per edge
        # (each (u,v), v>u, appears in exactly one group), so this is
        # |E| rows — coincident rewires are collapsed by the round's
        # single dedup after small-star, saving one full shuffle/round.
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        )
        # ---- small-star (input invariant: hi > lo ≥ m) ----
        g = large.repartition("hi")
        mins2 = g.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            g.join(mins2, "hi")
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(mins2.select("hi", F.col("m").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .dropDuplicates()
            .localCheckpoint()
        )
        n_new = small.count()
        stable = n_new == 0 or (
            n_new == n_old
            and small.join(e, ["hi", "lo"], "left_anti").isEmpty()
        )
        e, n_old = small, n_new
        if stable:
            break
    if not stable:
        # Unlike min-label (which degrades to one consistent unconverged
        # label per vertex), a non-star-forest edge set would emit
        # MULTIPLE conflicting (v, component_id) rows — silent
        # corruption. O(log² n) rounds means max_iter=30 covers any
        # physical graph; hitting it is a bug or a wrong max_iter, so
        # fail loudly instead of returning wrong labels.
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            f"rounds ({n_old} edges remaining); raise max_iter"
        )
    if stats is not None:
        stats["rounds"] = rounds
    # fixed point = star forest: hi's are non-minimum members (exactly
    # one lo each), lo's are the component minima
    labels = e.select(F.col("hi").alias("v"), F.col("lo").alias("component_id"))
    roots = (
        e.select(F.col("lo").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("component_id"))
    )
    self_only = (
        canon.filter(F.col("hi") == F.col("lo"))
        .select(F.col("hi").alias("v"))
        .join(e.select(F.col("hi").alias("v"))
              .unionByName(e.select(F.col("lo").alias("v"))).distinct(),
              "v", "left_anti")
        .select("v", F.col("v").alias("component_id"))
        .localCheckpoint()  # tiny; lets canon's cache be released now
    )
    canon.unpersist()
    return labels.unionByName(roots).unionByName(self_only)
