"""Parity pins for the r17 Arrow in-bucket pair expansion.

The LSH bucket tails (MinHash bands, sign bands, SimHash blocks) used
to expand pairs with explode(pair_array(docs)) — an interpreted
nested-transform HOF allocating a struct per pair. r17 replaces that
stage with one vectorized numpy pass (expand_id_pairs /
expand_fp_pairs). These tests pin the kernels SET-equal to the attested
SQL formulation (pair_array + hamming48) on the fixture corpus and on
degenerate bucket shapes, and pin the registered consumers' plans:
the cap window's two-phase WindowGroupLimit and the single shared
(band) exchange must survive the rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erathia_market_etl_spark.operators.dedup import (
    SIMHASH_HAMMING_MAX,
    cap_bucket_members,
    expand_fp_pairs,
    expand_id_pairs,
    hamming48,
    minhash_band_table,
    pair_array,
    simhash_blocks,
    simhash_table,
)
from erathia_market_etl_spark.sources.parquet_io import load_table

from .conftest import SF_T2


def _old_id_pairs(bands, max_bucket=256):
    b = cap_bucket_members(bands, ["band_idx", "band_key"], "doc", max_bucket)
    return (
        b.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs") > 1)
        .select(F.explode(pair_array(F.col("docs"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _new_id_pairs(bands, max_bucket=256):
    b = cap_bucket_members(bands, ["band_idx", "band_key"], "doc", max_bucket)
    grouped = (
        b.groupBy("band_idx", "band_key")
        .agg(F.collect_list("doc").alias("docs"))
        .filter(F.size("docs") > 1)
    )
    return expand_id_pairs(grouped).distinct()


def test_id_pair_kernel_matches_pair_array_on_fixture(spark):
    docs = load_table(spark, SF_T2, "documents")
    bands = minhash_band_table(docs, "text", "doc_id")
    old = sorted(map(tuple, _old_id_pairs(bands).collect()))
    new = sorted(map(tuple, _new_id_pairs(bands).collect()))
    assert old == new
    assert old, "vacuous: fixture produced no candidate pairs"


def test_id_pair_kernel_handles_degenerate_buckets(spark):
    # one giant bucket (cap bites), one pair bucket, one singleton
    # (filtered), ids deliberately unsorted within the bucket
    rows = [("b0", d) for d in (5, 3, 9, 1, 7, 2)] + \
           [("b1", d) for d in (11, 10)] + [("b2", 42)]
    bands = spark.createDataFrame(
        [(0, k, d) for k, d in rows], "band_idx int, band_key string, doc long"
    )
    old = sorted(map(tuple, _old_id_pairs(bands, max_bucket=4).collect()))
    new = sorted(map(tuple, _new_id_pairs(bands, max_bucket=4).collect()))
    assert old == new
    # the cap keeps the 4 smallest ids of b0 -> C(4,2)=6 pairs + b1's 1
    assert len(old) == 7


def test_fp_pair_kernel_matches_struct_pair_array(spark):
    docs = load_table(spark, SF_T2, "documents")
    fp = simhash_table(docs, "text", "doc_id")
    blocks = fp.select(
        "doc", "fingerprint",
        F.posexplode(simhash_blocks(F.col("fingerprint"))).alias(
            "block_idx", "block_key"
        ),
    )
    blocks = cap_bucket_members(blocks, ["block_idx", "block_key"], "doc", 256)
    old = (
        blocks.groupBy("block_idx", "block_key")
        .agg(F.sort_array(F.collect_list(F.struct("doc", "fingerprint"))).alias("docs"))
        .filter(F.size("docs") > 1)
        .select(F.explode(pair_array(F.col("docs"))).alias("p"))
        .select(
            F.col("p.doc_a.doc").alias("doc_a"),
            F.col("p.doc_b.doc").alias("doc_b"),
            hamming48(
                F.col("p.doc_a.fingerprint"), F.col("p.doc_b.fingerprint")
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .distinct()
    )
    grouped = (
        blocks.groupBy("block_idx", "block_key")
        .agg(F.collect_list(F.struct("doc", "fingerprint")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    new = expand_fp_pairs(grouped, SIMHASH_HAMMING_MAX).distinct()
    o = sorted(map(tuple, old.collect()))
    n = sorted(map(tuple, new.collect()))
    assert o == n
    assert old.schema.simpleString() == new.schema.simpleString()


def test_fp_pair_popcount_matches_bit_count_exhaustive():
    """np.unpackbits popcount == Spark bit_count for 48-bit values,
    including the all-bits and single-bit extremes."""
    import numpy as np

    xs = np.array(
        [0, 1, (1 << 48) - 1, 0x800000000000 - 1, 0xAAAAAAAAAAAA,
         0x555555555555, 1 << 47], dtype=np.int64
    )
    got = np.unpackbits(xs.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    want = [bin(int(v)).count("1") for v in xs]
    assert got.tolist() == want


@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh_pairs", "dedup_simhash_near_pairs",
             "sim_similar_pairs"]
)
def test_pair_consumers_keep_cap_pushdown_and_exchange_inventory(spark, name):
    """The rewrite must not lose the two-phase WindowGroupLimit (the
    degenerate-corpus bound) or grow the exchange inventory; the
    interpreted pair explode must be GONE from the registered plans."""
    import re

    from erathia_market_etl_spark.plans import all_queries

    df = all_queries()[name](spark, SF_T2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"WindowGroupLimit .*, Partial", plan), name
    assert re.search(r"WindowGroupLimit .*, Final", plan), name
    assert "MapInPandas" in plan, name
    assert "flatten(transform(" not in plan.replace("\n", ""), name
