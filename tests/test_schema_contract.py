"""FACT_SALES_SCHEMA as an APPLIED contract (the reference declared one
and never used it — schemas.py:6-19): enforced types on the silver read,
and loud failure on upstream type drift."""

from __future__ import annotations

import pandas as pd
import pytest

from erathia_market_etl_spark.pipeline import FACT_SALES_SCHEMA, run_silver


def test_silver_read_enforces_declared_types(spark, tmp_path):
    from erathia_market_etl_spark.generator.bronze import generate_bronze

    bronze = str(tmp_path / "bronze")
    generate_bronze(bronze, weeks=2)
    silver = str(tmp_path / "silver")
    run_silver(spark, bronze, silver)
    fact = spark.read.parquet(f"{silver}/fact_sales")
    got = dict(fact.dtypes)
    assert got["trade_key"] == "bigint"
    assert got["quantity"] == "double"
    assert got["year"] == "int" and got["month"] == "int"


def test_drifted_bronze_fails_at_scan(spark, tmp_path):
    # simulate an upstream regression: quantity written as string
    bad = pd.DataFrame(
        {
            "trade_key": [1], "date_key": [11680101],
            "transaction_type": ["BUY"], "customer_key": [5000],
            "product_key": [1000], "town_key": [10000],
            "quantity": ["not-a-number"], "gold_per_unit": [1.0],
            "gold_total": [1.0], "current_gold_balance": [1.0],
        }
    )
    path = str(tmp_path / "bronze" / "fact_sales" / "year=1168" / "month=1")
    import os

    os.makedirs(path)
    bad.to_parquet(f"{path}/part-0.parquet")

    df = spark.read.schema(FACT_SALES_SCHEMA).parquet(str(tmp_path / "bronze" / "fact_sales"))
    with pytest.raises(Exception, match="(?i)parquet|schema|type|cannot"):
        df.collect()


def test_canon_nat_is_null():
    """pd.NaT IS a datetime instance and isoformat()s to the literal
    'NaT' — the canonicalizer must fold it to the NULL token like
    float NaN, or a null timestamp hash-mismatches a true NULL."""
    import pandas as pd

    from erathia_market_etl_spark.testing import _canon

    assert _canon(pd.NaT) == _canon(None)
    assert _canon(pd.NaT) == "∅"
