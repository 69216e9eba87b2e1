"""Connected-components operator: crafted graphs where the expected
components are known by construction (the oracle query covers the
fixture path; this pins the algorithm itself)."""

from __future__ import annotations

from erathia_market_etl_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, "src", "dst")
    return {r["v"]: r["component_id"] for r in out.collect()}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds)
    # plus a separate triangle 10-11-12
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_cycle_and_duplicate_edges(spark):
    # cycles and repeated/reversed edges must not loop or double-count
    edges = [(5, 6), (6, 7), (7, 5), (6, 5), (5, 6)]
    got = _cc(spark, edges)
    assert got == {5: 5, 6: 5, 7: 5}


def test_long_chain_converges(spark):
    # 12-vertex path: worst-case diameter for plain min-propagation
    edges = [(i, i + 1) for i in range(100, 111)]
    got = _cc(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 12
