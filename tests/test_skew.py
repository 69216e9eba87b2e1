"""Salted-join / salted-agg correctness: results must be identical to
the unsalted plans (salt is a physical-distribution knob, not a
semantic one), including under a deliberately skewed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erathia_market_etl_spark.operators.skew import (
    SALT_COL,
    replicate_salts,
    salted_join,
    salted_sum,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on key 0 — the shape AQE alone mishandles when the
    # build side can't broadcast
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, ["k"]).groupBy("k", "name").count()
    salted = salted_join(skewed, dim, ["k"], n_salts=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(skewed, dim):
    sparse_dim = dim.filter("k < 50")
    plain = skewed.join(sparse_dim, ["k"], "left").groupBy("k", "name").count()
    salted = (
        salted_join(skewed, sparse_dim, ["k"], n_salts=4, how="left")
        .groupBy("k", "name").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_sum_matches_plain_agg(skewed):
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["n_rows"]) for r in salted_sum(skewed, ["k"], ["v"]).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salt_column_never_leaks(skewed, dim):
    out = salted_join(skewed, dim, ["k"])
    assert SALT_COL not in out.columns


def test_salt_spreads_hot_key(skewed):
    salted = with_salt(skewed.filter("k = 0"), 8)
    n_buckets = salted.select(SALT_COL).distinct().count()
    assert n_buckets == 8  # hot key's rows now span 8 shuffle targets


def test_replicate_salts_cardinality(dim):
    assert replicate_salts(dim, 5).count() == dim.count() * 5
