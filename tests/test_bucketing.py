"""Bucketed co-located join: identically-bucketed tables must join with
ZERO runtime Exchange (the shuffle was paid at write time), and results
must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erathia_market_etl_spark.sources.parquet_io import load_table, write_bucketed

from .conftest import SF_T2


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF_T2, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_T2, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, str(base / "li"))
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, str(base / "ord"))
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # force the non-broadcast path: this is the big-big join scenario
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(
            spark.table(t2), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    bucketed = (
        spark.table(t1)
        .join(spark.table(t2), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey").count()
    )
    plain = (
        load_table(spark, SF_T2, "lineitem")
        .join(load_table(spark, SF_T2, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey").count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
