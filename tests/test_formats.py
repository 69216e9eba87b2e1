"""Source/sink format round-trips beyond parquet: CSV (explicit schema —
inference costs an extra scan and guesses types), JSON lines, and ORC.
Each write->read must preserve rows and types exactly."""

from __future__ import annotations

import pytest

from erathia_market_etl_spark.sources.parquet_io import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def dim(spark):
    return load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey"
    )


def _roundtrip_equal(dim, back):
    assert [f.simpleString() for f in back.schema.fields] == \
           [f.simpleString() for f in dim.schema.fields]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, dim.collect()))


def test_csv_roundtrip(spark, dim, tmp_path):
    path = str(tmp_path / "csv")
    dim.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(dim.schema).option("header", True).csv(path)
    _roundtrip_equal(dim, back)


def test_json_roundtrip(spark, dim, tmp_path):
    path = str(tmp_path / "json")
    dim.write.mode("overwrite").json(path)
    back = spark.read.schema(dim.schema).json(path)
    _roundtrip_equal(dim, back)


def test_orc_roundtrip(spark, dim, tmp_path):
    path = str(tmp_path / "orc")
    dim.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _roundtrip_equal(dim, back)


def test_csv_schema_inference_vs_explicit(spark, dim, tmp_path):
    """Inference reads everything as its guess (extra scan, bigint for
    ints is fine here) — explicit schema is the production path; pin
    that inference at least agrees on column NAMES."""
    path = str(tmp_path / "csv2")
    dim.write.mode("overwrite").option("header", True).csv(path)
    inferred = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert inferred.columns == dim.columns
    assert inferred.count() == dim.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on an accreting corpus (the 100 TB reality:
    month 2 adds a quality_score column to new partitions): reading
    the whole dataset with mergeSchema=true must union the schemas,
    null-filling the old partitions' missing column, and the evolved
    column must still filter/prune normally. (Without the option Spark
    takes the schema of whichever footer it samples — unpinnable by
    design — so readers of evolving datasets must opt in explicitly.)"""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("text")
    ).write.mode("overwrite").parquet(path + "/batch=1")
    spark.range(10, 20).select(
        F.col("id").alias("doc_id"), F.lit("b").alias("text"),
        (F.col("id") * 0.1).alias("quality_score"),
    ).write.mode("overwrite").parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "quality_score", "batch"}
    assert merged.count() == 20
    # old partitions read as NULL; the evolved column is filterable
    assert merged.filter(F.col("quality_score").isNull()).count() == 10
    assert merged.filter(F.col("quality_score") > 1.0).count() == 9
    # and partition pruning still applies over the evolved read
    plan = (
        merged.filter(F.col("batch") == 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(batch" in plan
