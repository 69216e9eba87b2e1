"""Approximate aggregates have no SQL oracle (sketch algorithms differ
across engines) — instead assert bounded error against the exact
answers on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from erathia_market_etl_spark.plans import all_queries
from erathia_market_etl_spark.sources.parquet_io import load_table

from .conftest import SF_T2


def test_approx_sketches_within_tolerance(spark):
    """Since r4 the query itself emits the bound flags (exact vs its
    own sketch, asserted in-query so the driver oracle hashes them —
    r3 VERDICT item 1b); here pin that the flags hold and that the
    oracled exact column really is the exact distinct count."""
    out = {
        r["l_returnflag"]: r
        for r in all_queries()["agg_approx_sketches"](spark, SF_T2).collect()
    }
    exact = {
        r["l_returnflag"]: r["parts"]
        for r in load_table(spark, SF_T2, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("parts"))
        .collect()
    }
    assert set(out) == set(exact)
    for flag, row in out.items():
        assert row["exact_parts"] == exact[flag]
        assert row["parts_ok"] and row["p50_ok"] and row["p99_ok"]
