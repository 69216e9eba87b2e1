"""Unit pins for the narrow (mapInPandas) winnowing operator.

The vectorized block-wise rolling-min is the only hand-written
numerical kernel in the text surface, so it gets a brute-force twin
here: fingerprints must equal {min of every w-window of k-gram
polynomial hashes} computed the obvious quadratic way with Python
bignum arithmetic, on inputs chosen to stress the kernel (monotone
runs, all-equal grams, docs shorter than the window, docs shorter
than k, non-ASCII codepoints, block boundaries splitting windows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erathia_market_etl_spark.operators.text import (
    WINNOW_BASE,
    WINNOW_K,
    WINNOW_W,
    winnowing_fingerprints,
)

CASES = [
    "abcdefghijklmnopqrstuvwxyz",      # all-distinct grams
    "aaaaaaaaaaaaaaaa",                # all-equal grams (tie pressure)
    "abababababababab",                # period-2 repetition
    "short",                           # < k: no grams at all
    "exactly8",                        # == k: single gram
    "ninechars",                       # k < len < k+w-1: all-partial windows
    "zyxwvutsrqponmlkjihgfedcba",      # decreasing hash pressure
    "née Müller — naïve façade über",  # non-ASCII: codepoints > 127
    "the quick brown fox jumps over the lazy dog " * 4,
]


def gram_hash(gram: str) -> int:
    # reference definition: polynomial over codepoints mod 2^64 —
    # exact Python bignum arithmetic, no numpy
    h = 0
    for c in gram:
        h = (h * WINNOW_BASE + ord(c)) % 2 ** 64
    return h


def brute_force(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[int]:
    if len(text) < k:
        return set()
    hs = [gram_hash(text[i:i + k]) for i in range(len(text) - k + 1)]
    return {min(hs[i:i + w]) for i in range(len(hs))}


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    out = winnowing_fingerprints(df, "text", "doc_id").collect()
    got: dict[int, set[str]] = {}
    for r in out:
        got.setdefault(r.doc, set()).add(r.fingerprint)
    return got


@pytest.mark.parametrize("i", range(len(CASES)))
def test_matches_brute_force(result, i):
    assert result.get(i, set()) == {str(h) for h in brute_force(CASES[i])}


def test_winnow_doc_property():
    # the pure per-document core vs the brute-force definition, over
    # generated inputs (no SparkSession — winnow_doc is the exact code
    # the Arrow batches run); small w/k variations AND tiny block
    # sizes so window-stitching across block boundaries is exercised
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from erathia_market_etl_spark.operators.text import winnow_doc

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(min_size=0, max_size=120),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=1, max_value=16),
    )
    def check(text, k, w, block):
        got = winnow_doc(text, k, w, block=block)
        if len(text) < k:
            assert got == set()
            return
        hs = [gram_hash(text[i:i + k]) for i in range(len(text) - k + 1)]
        assert got == {min(hs[i:i + w]) for i in range(len(hs))}

    check()


def test_hash_matches_duckdb_arithmetic():
    # cross-engine pin for the gram-hash formula itself: the DuckDB
    # HUGEINT expression in plans/text_queries.py must equal the numpy
    # uint64 wraparound for k=8 grams, including codepoints > 127
    import duckdb

    from erathia_market_etl_spark.operators.text import winnow_doc
    from erathia_market_etl_spark.plans.text_queries import (
        _WINNOW_GRAM_HASH_SQL,
    )

    text = "abcdefgh née Müller ü" + "z" * 8
    sql = _WINNOW_GRAM_HASH_SQL.replace("text", "?")
    duck = {
        int(r[0])
        for r in duckdb.sql(
            f"SELECT {sql} FROM UNNEST(generate_series(1, ?)) AS u(i)",
            params=[text] * 8 + [len(text) - 7],
        ).fetchall()
    }
    # winnow at w=1 selects every gram hash — the full hash set
    assert winnow_doc(text, 8, 1) == duck


def test_plan_is_narrow_at_scale(spark):
    # with input splits >= default parallelism the operator must add NO
    # exchange: scan -> (project) -> MapInPandas only. (The small-scan
    # rebalance is exercised by every fixture-backed test above.)
    n = spark.sparkContext.defaultParallelism
    df = (
        spark.range(n * 4)
        .repartition(n * 2)
        .select(F.col("id").alias("doc_id"),
                F.lit("some document text padding").alias("text"))
    )
    plan = (
        winnowing_fingerprints(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    # the pre-existing repartition is the input, not the operator; no
    # exchange may appear between it and the Arrow boundary
    assert plan.index("MapInPandas") < plan.index("Exchange")
