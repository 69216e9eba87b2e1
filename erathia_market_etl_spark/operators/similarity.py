"""Vector-similarity operators over array<float> embedding columns.

Brute-force cosine top-k is the correctness baseline (full scan, one
TakeOrderedAndProject — embarrassingly parallel at 100 TB); the
sign-bit LSH bucket variant is the scale path (evaluates only the
query's bucket, ~1/2^n_bits of the data; with the table partitioned by
bucket this becomes partition pruning).

All arithmetic is double-cast float math inside Catalyst higher-order
functions (zip_with + aggregate) — no Python UDF, sequential left-fold
summation on both engines. Final scores round through the FLOOR trick
(functions.money.round2_det rationale) to 6dp so the DuckDB twin
hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential double left-fold.
    DuckDB twin: list_sum(list_transform(list_zip(a, b),
    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def round6(col: Column) -> Column:
    """Engine-independent 6dp rounding (see money.round2_det).
    SQL twin: FLOOR(x * 1000000 + 0.5) / 1000000."""
    return (F.floor(col * 1000000 + F.lit(0.5)) / 1000000).cast("double")


def vectorized_cosine_udf(query_vec: list[float]):
    """Arrow-vectorized cosine scorer against a fixed query vector — the
    scale path when interpreted HOF folds dominate (lambda expressions
    are excluded from whole-stage codegen). Each Arrow batch becomes one
    numpy matmul: batch_size x dim @ dim -> batch_size scores, BLAS-bound.
    The query vector rides into executors via UDF closure (it's one row;
    this is the broadcast-scalar pattern, not a join)."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy()).astype(np.float64)
        return pd.Series((m @ q) / (np.linalg.norm(m, axis=1) * qn))

    return cos


def sign_bucket(a: Column, n_bits: int = 8) -> Column:
    """Sign-bit LSH: concat of (aᵢ > 0) over the first n_bits dims ->
    2^n_bits buckets. Deterministic, engine-independent, and a natural
    physical partitioning key at scale.
    DuckDB twin: concat of CASE WHEN a[i] > 0 THEN '1' ELSE '0' END."""
    bits = [
        F.when(F.element_at(a, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)
