"""Statistical checks for the rows-only sampling surface (the
rand()-based ops that can't be oracle-hashed) plus determinism pins for
the hash-based ones."""

from __future__ import annotations

from erathia_market_etl_spark.plans import all_queries

from .conftest import SF_T2

QUERIES = all_queries()


def test_sample_by_respects_fractions(spark):
    # 25 docs per source at sf0.01; Bernoulli(0.9/0.5/0.1) per stratum.
    # Bounds are wide (n=25) but rule out swapped or ignored fractions.
    rows = {r["source"]: r["n_kept"]
            for r in QUERIES["sample_stratified_by"](spark, SF_T2).collect()}
    assert 15 <= rows.get("src0", 0) <= 25
    assert 5 <= rows.get("src1", 0) <= 20
    assert rows.get("src2", 0) <= 9  # absent key = 0 kept, also fine

    # seeded: rerun is identical
    again = {r["source"]: r["n_kept"]
             for r in QUERIES["sample_stratified_by"](spark, SF_T2).collect()}
    assert rows == again


def test_freq_items_superset_guarantee(spark):
    # every source has frequency 1/20 = 0.05 > support 0.04, so ALL
    # sources must appear (freqItems may over-report, never under)
    out = {r["frequent_source"]
           for r in QUERIES["agg_freq_items"](spark, SF_T2).collect()}
    assert {f"src{i}" for i in range(20)} <= out


def test_hash_split_is_machine_independent(spark):
    # the production split must not depend on partitioning: recompute
    # with a different partition count, expect identical assignment
    a = QUERIES["sample_split_assign"](spark, SF_T2).collect()
    b = (QUERIES["sample_split_assign"](spark, SF_T2)
         .repartition(13).orderBy("doc_id").collect())
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
