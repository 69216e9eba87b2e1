"""Approximate aggregates have no SQL oracle (sketch algorithms differ
across engines) — instead assert bounded error against the exact
answers on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from erathia_market_etl_spark.plans import all_queries
from erathia_market_etl_spark.sources.parquet_io import load_table

from .conftest import SF_T2


def test_approx_sketches_within_tolerance(spark):
    approx = {
        r["l_returnflag"]: r
        for r in all_queries()["agg_approx_sketches"](spark, SF_T2).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, SF_T2, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        # HLL++ with rsd=0.02: allow 3 sigma
        assert abs(a["approx_parts"] - e["parts"]) <= 0.06 * e["parts"] + 1
        # approx_percentile(accuracy=1000): rank error <= n/1000 -> value
        # tolerance generous (1% of the p99 magnitude)
        assert abs(a["approx_p50"] - e["p50"]) <= 0.05 * e["p50"]
        assert abs(a["approx_p99"] - e["p99"]) <= 0.05 * e["p99"]
