"""Bloom-filter membership pins (operators/dedup.py, r9).

The oracle compare (test_oracle_parity / LOCALCHECK) attests the full
query twin; these pin the filter-theoretic properties the compare
can't distinguish from coincidence: the no-false-negative guarantee,
the non-vacuity of approximation (a forced false positive), and the
bit_or mergeability the incremental-maintenance story relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from erathia_market_etl_spark.operators.dedup import (
    BLOOM_BITS_PER_KEY,
    BLOOM_K,
    BLOOM_WORD_BITS,
    bloom_build,
    bloom_m_bits,
    bloom_probe,
)


def _fps(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "fp string")


def test_bloom_m_sizing_matches_sql_twin():
    # Python helper == the oracle's integer formula, word-aligned
    for n in [1, 2, 62, 63, 64, 100, 999, 12345]:
        expected = BLOOM_WORD_BITS * (
            (BLOOM_BITS_PER_KEY * n + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
        )
        assert bloom_m_bits(n) == expected
        assert bloom_m_bits(n) % BLOOM_WORD_BITS == 0
    assert bloom_m_bits(0) == bloom_m_bits(1)  # empty-history guard


def test_bloom_no_false_negatives_and_low_fpr(spark):
    """Every inserted key probes TRUE (the Bloom guarantee — this must
    hold exactly, not probabilistically); novel keys probe almost
    entirely FALSE at the 20-bits/key sizing."""
    inserted = [f"key-{i}" for i in range(200)]
    novel = [f"other-{i}" for i in range(500)]
    hist = _fps(spark, inserted)
    m = bloom_m_bits(len(inserted))
    words = bloom_build(hist, "fp", m).localCheckpoint()

    hits = {
        r["fp"]: r["maybe_seen"]
        for r in bloom_probe(_fps(spark, inserted + novel), "fp", words, m).collect()
    }
    assert all(hits[k] for k in inserted), "false negative — contract broken"
    fp_rate = sum(hits[k] for k in novel) / len(novel)
    # 20 bits/key, k=7 -> theoretical ~2e-4; allow generous slack
    assert fp_rate <= 0.01, fp_rate


def test_bloom_false_positives_exist_when_undersized(spark):
    """Non-vacuity of 'maybe': a deliberately tiny filter (one word)
    saturates and flags novel keys as maybe-seen — proving maybe_seen
    is genuinely approximate, and why the exact verify stays in the
    pipeline behind it."""
    hist = _fps(spark, [f"key-{i}" for i in range(50)])
    m = BLOOM_WORD_BITS  # 63 bits for 50*7 insertions: saturated
    words = bloom_build(hist, "fp", m).localCheckpoint()
    novel = [f"other-{i}" for i in range(20)]
    hits = [r["maybe_seen"] for r in
            bloom_probe(_fps(spark, novel), "fp", words, m).collect()]
    assert any(hits), "expected false positives from a saturated filter"


def test_bloom_words_merge_by_bit_or(spark):
    """Incremental maintenance: build(A) merged with build(B) by
    bit_or == build(A ∪ B) — so per-ingest filters union into the
    history filter without ever rebuilding from raw fingerprints."""
    a = [f"a-{i}" for i in range(80)]
    b = [f"b-{i}" for i in range(60)]
    m = bloom_m_bits(len(a) + len(b))
    words_a = bloom_build(_fps(spark, a), "fp", m)
    words_b = bloom_build(_fps(spark, b), "fp", m)
    merged = {
        r["word_idx"]: r["word"]
        for r in words_a.unionByName(words_b)
        .groupBy("word_idx").agg(F.bit_or("word").alias("word")).collect()
    }
    whole = {
        r["word_idx"]: r["word"]
        for r in bloom_build(_fps(spark, a + b), "fp", m).collect()
    }
    assert merged == whole


def test_bloom_incremental_invariant_and_nonvacuity(spark):
    """The query's in-result contract on real fixture data: every row
    satisfies actually_seen => maybe_seen and definitely-new docs
    exist. The fixture corpus has no cross-split exact dups below
    sf0.1 (exactly 1 there — measured), so the actually_seen=TRUE path
    is NOT provable from fixture data; its evidence is the planted
    no-false-negative test above, which inserts and re-probes the same
    keys through the same operators."""
    from erathia_market_etl_spark.plans.dedup_queries import (
        dedup_bloom_incremental,
    )

    rows = dedup_bloom_incremental(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(r["maybe_seen"] or not r["actually_seen"] for r in rows), (
        "false negative against exact membership"
    )
    assert sum(1 for r in rows if not r["maybe_seen"]) > 0


def test_bloom_probe_is_shuffle_free(spark):
    """The probe chain (k broadcast joins over the checkpointed word
    table) must add NO shuffle exchange on the batch side — the scale
    contract that distinguishes this from the exact anti-join."""
    inserted = [f"key-{i}" for i in range(100)]
    hist = _fps(spark, inserted)
    m = bloom_m_bits(len(inserted))
    words = bloom_build(hist, "fp", m).localCheckpoint()
    probed = bloom_probe(_fps(spark, ["x", "y"]), "fp", words, m)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") == BLOOM_K


def test_minhash_jaccard_estimate_contract(spark, tmp_path):
    """Planted near-identical and half-overlapping docs pin the
    estimator contract: identical shingle sets agree on all 8
    signature positions (est 1e6, exact 1e6, err 0); a
    half-overlapping pair's exact Jaccard is computed from true
    shingle sets, the estimate is matches/8, and err is their
    difference — every column integer-exact."""
    from erathia_market_etl_spark.plans.dedup_queries import (
        dedup_minhash_jaccard_estimate,
    )

    base = "a b c d e f g h i j k l"
    rows = [
        (0, base, "en", "s", 0),
        (1, base, "en", "s", 0),                       # identical to 0
        (2, base + " x y z w v u t s r q p o", "en", "s", 0),  # superset
        (3, "q w e r t y u i o p a s", "en", "s", 0),  # unrelated
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["doc_a"], r["doc_b"]): r.asDict()
        for r in dedup_minhash_jaccard_estimate(spark, str(tmp_path)).collect()
    }
    identical = out[(0, 1)]
    assert identical["n_matches"] == 8
    assert identical["est_jaccard_ppm"] == 1_000_000
    assert identical["jaccard_ppm"] == 1_000_000
    assert identical["err_ppm"] == 0
    # the superset pair must surface as a candidate with exact
    # jaccard = 10/22 (10 shared 3-gram shingles of 0's 10, union 22)
    sup = out.get((0, 2)) or out.get((1, 2))
    assert sup is not None
    assert sup["jaccard_ppm"] == 10 * 1_000_000 // 22
    assert sup["err_ppm"] == abs(sup["est_jaccard_ppm"] - sup["jaccard_ppm"])


def test_jaccard_audit_cap_is_deterministic_md5_sample(spark, tmp_path):
    """The audit-pair cap (r14 VERDICT item 4): above ``audit_cap`` the
    estimator audit keeps exactly the pairs ranked lowest by
    md5(doc_a||'|'||doc_b) — an engine-portable deterministic uniform
    sample, pinned here against a pure-python md5 recomputation — and
    the surviving rows carry the SAME values as the uncapped run. The
    DuckDB oracle applies the identical ranking, attested by running
    the oracle at the same small cap through the driver's compare."""
    import hashlib

    from erathia_market_etl_spark.plans.dedup_queries import (
        AUDIT_PAIR_CAP,
        DEDUP_MINHASH_JACCARD_ESTIMATE_ORACLE,
        dedup_minhash_jaccard_estimate,
    )
    from erathia_market_etl_spark.testing import compare_query

    base = "a b c d e f g h i j k l"
    rows = [
        (0, base, "en", "s", 0),
        (1, base, "en", "s", 0),
        (2, base + " x y z w v u t s r q p o", "en", "s", 0),
        (3, base + " m n o p q r s t u v w x", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    full = dedup_minhash_jaccard_estimate(spark, str(tmp_path)).collect()
    full_pairs = [(r["doc_a"], r["doc_b"]) for r in full]
    assert len(full_pairs) >= 3, "planted corpus must exceed the test cap"

    def md5_rank(p):
        return (hashlib.md5(f"{p[0]}|{p[1]}".encode()).hexdigest(), p)

    expected = sorted(sorted(full_pairs, key=md5_rank)[:2])
    capped_df = dedup_minhash_jaccard_estimate(spark, str(tmp_path), audit_cap=2)
    capped = capped_df.collect()
    assert sorted((r["doc_a"], r["doc_b"]) for r in capped) == expected

    # capped rows are a strict subset of the uncapped audit, values intact
    full_map = {(r["doc_a"], r["doc_b"]): tuple(r) for r in full}
    for r in capped:
        assert tuple(r) == full_map[(r["doc_a"], r["doc_b"])]

    # the oracle mirrors the cap: same md5 ranking, same survivors
    capped_oracle = DEDUP_MINHASH_JACCARD_ESTIMATE_ORACLE.replace(
        f"LIMIT {AUDIT_PAIR_CAP}", "LIMIT 2"
    )
    result = compare_query(
        "jaccard_audit_cap", capped_df, capped_oracle, str(tmp_path)
    )
    assert result.ok, result
