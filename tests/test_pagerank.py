"""Pins for the integer fixed-point PageRank kernel.

Oracle parity (tests/test_oracle_parity.py::test_queued_queries_match)
proves Spark and DuckDB agree on the fixture graph; these tests prove
the kernel computes the arithmetic it claims: exact equality against a
pure-Python integer power iteration on generative random graphs (the
connected-components-vs-union-find precedent), plus structural sanity
on a planted star (the hub must outrank every leaf).
"""

from __future__ import annotations


def _py_pagerank(edges, iters, scale=1_000_000):
    """Reference: same integer arithmetic, driver-side."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    ranks = {v: scale for v in deg}
    teleport = (15 * scale) // 100
    for _ in range(iters):
        acc = defaultdict(int)
        for s, d in edges:
            if s in ranks:
                acc[d] += ranks[s] // deg[s]
        ranks = {v: teleport + (85 * a) // 100 for v, a in acc.items()}
    # nodes with out-edges only (kernel contract); a node with no
    # in-edges this round keeps no rank row in acc — mirror the join
    return {v: (ranks.get(v), deg[v]) for v in deg if v in ranks}


def test_pagerank_matches_python_on_random_graphs(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from erathia_market_etl_spark.operators.graph import pagerank_fixed_point

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.integers(min_value=0, max_value=12),
            ),
            min_size=1,
            max_size=40,
        ),
        st.integers(min_value=1, max_value=4),
    )
    def run(raw_edges, iters):
        edges = sorted(set(raw_edges))
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["v"]: (r["rank"], r["deg"])
            for r in pagerank_fixed_point(df, iters=iters).collect()
        }
        want = _py_pagerank(edges, iters)
        assert got == want, (edges, iters, got, want)

    run()


def test_pagerank_star_hub_dominates(spark):
    """Undirected star K_{1,n}: the hub aggregates every leaf's full
    rank (deg(leaf)=1) while each leaf gets 1/n of the hub's — after
    any round the hub strictly dominates, and all leaves tie exactly
    (integer arithmetic: EXACT ties, not approximate)."""
    from erathia_market_etl_spark.operators.graph import pagerank_fixed_point

    n = 8
    edges = [(0, i) for i in range(1, n + 1)] + [(i, 0) for i in range(1, n + 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["v"]: r for r in pagerank_fixed_point(df, iters=3).collect()}
    assert rows[0]["deg"] == n
    leaf_ranks = {rows[i]["rank"] for i in range(1, n + 1)}
    assert len(leaf_ranks) == 1  # exact tie
    assert rows[0]["rank"] > leaf_ranks.pop()


def test_pagerank_rejects_zero_iters(spark):
    import pytest

    from erathia_market_etl_spark.operators.graph import pagerank_fixed_point

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, iters=0)
