"""Events-table source: fixture-timestamp normalization.

The ``ts`` column of ``events.parquet`` varies by fixture vintage:
TIMESTAMP(NANOS, isAdjustedToUTC=false) — which Spark 4 refuses to read
natively ([PARQUET_TYPE_ILLEGAL]) — arrives as long nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong=true`` and converts via
``ts div 1000`` -> ``timestamp_micros`` with exact integer math
(matching DuckDB's nanos->micros truncation of the same file); the
current TIMESTAMP(MICROS, isAdjustedToUTC=false) fixture arrives as
TIMESTAMP_NTZ and is cast to TIMESTAMP, a no-op on the wall clock under
the UTC session timezone. Both paths land on TIMESTAMP so downstream
date parts / epoch math / watermarks are vintage-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .parquet_io import load_table


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load_table(spark, sf_dir, "events")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # floor-divide: identical to DuckDB's truncation for positive epochs
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
        # TIMESTAMP_NTZ in Spark 4; normalize to TIMESTAMP so downstream
        # epoch math / watermarks behave identically across fixture
        # vintages (session tz is UTC, so the wall clock is unchanged).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
