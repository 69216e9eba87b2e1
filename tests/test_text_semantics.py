"""Semantic pins for the r6 text operators on PLANTED inputs.

Oracle parity (tests/test_oracle_parity.py) proves Spark and DuckDB
agree; these tests prove the operators mean what they claim: BM25 must
rank a term-dense document first, and each quality-gate rule must fire
on a document constructed to violate exactly that rule.
"""

from __future__ import annotations

import os

from .conftest import SF_SMOKE

GOOD = (
    "the data pipeline runs a fast query over the table and it is "
    "a good day to ship clean results of the work in the main branch "
    "because the team wants it done and the data is ready to go now"
)


def _write_docs(spark, rows, d):
    """Stage a planted documents table as parquet under ``d`` so the
    query under test exercises its REAL load path (load_table over an
    sf_dir); pytest's tmp_path owns and reaps the directory."""
    spark.createDataFrame(rows, "doc_id long, text string, lang string, "
                                "source string, n_chars long") \
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _gate(spark, rows, d):
    from erathia_market_etl_spark.plans.text_queries import text_quality_gate

    out = text_quality_gate(spark, _write_docs(spark, rows, d))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_quality_gate_rules_fire_individually(spark, tmp_path):
    rows = [
        (0, GOOD, "en", "s", len(GOOD)),                      # passes all
        (1, "too short", "en", "s", 9),                       # len_ok fails
        (2, " ".join(["supercalifragilistic" * 3] * 20),      # mean_len fails
         "en", "s", 0),
        (3, " ".join(f"tok{i}" for i in range(40)),           # no stopwords
         "en", "s", 0),
        (4, "£$ %% ^^ " * 8 + "the of to a in is it and the of to a",
         "en", "s", 0),                                       # alpha_ok fails
        (5, "the cat sat here " * 30, "en", "s", 0),          # repetitive
    ]
    got = _gate(spark, rows, str(tmp_path))
    assert got[0]["keep"] is True, got[0]
    assert got[1]["len_ok"] is False and got[1]["keep"] is False
    assert got[2]["mean_len_ok"] is False and got[2]["keep"] is False
    assert got[3]["stopword_ok"] is False and got[3]["keep"] is False
    assert got[4]["alpha_ok"] is False and got[4]["keep"] is False
    assert got[5]["rep_ok"] is False and got[5]["keep"] is False
    # and the violating docs fail ONLY where planted (no rule bleed)
    assert got[1]["rep_ok"] is True
    assert got[5]["len_ok"] is True and got[5]["stopword_ok"] is True


def test_bm25_ranks_term_dense_doc_first(spark, tmp_path):
    from erathia_market_etl_spark.plans.text_queries import text_bm25_topk

    filler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, filler, "en", "s", len(filler)) for i in range(20)]
    # doc 50: saturated with all three query terms; doc 51: one term once
    rows.append((50, "data query fast " * 6, "en", "s", 0))
    rows.append((51, filler + " data", "en", "s", 0))
    out = text_bm25_topk(spark, _write_docs(spark, rows, str(tmp_path))).collect()
    assert out, "no scored docs"
    assert out[0]["doc_id"] == 50          # term-dense doc wins
    assert out[0]["bm25"] > out[-1]["bm25"] or len(out) == 1
    ids = [r["doc_id"] for r in out]
    assert 51 in ids                       # single-hit doc still retrieved
    assert all(r["bm25"] > 0 for r in out)


def test_bm25_posting_shape_matches_narrow_shape(spark):
    """The posting-list BM25 (arbitrary term table, shuffle shape) must
    agree with the registered narrow column-pivot shape on the same
    fixed query. Since the r7 micro-integer accumulation the postings
    shape is partition-order-EXACT (pinned in
    test_bm25_postings_partition_order_independent); the remaining
    cross-SHAPE difference is deliberate semantics: each per-term part
    is rounded to 1e-6 before summing (≤ 1.5e-6 total for 3 terms) vs
    the narrow shape's one final rounding, so a boundary-straddling
    score can differ by a quantum and shift the #20 cut. The pin
    allows exactly that — ≤ 2e-6 per score, ≤ 2 boundary docs — and
    still fails loudly for any real shape bug (wrong tf/df/dl join).
    Duplicate term rows must be harmless (the query-expansion
    contract: tf must not inflate)."""
    from erathia_market_etl_spark.plans.text_queries import (
        BM25_TERMS,
        bm25_topk_postings,
        text_bm25_topk,
    )
    from erathia_market_etl_spark.sources.parquet_io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    terms = spark.createDataFrame(
        [(t,) for t in BM25_TERMS + BM25_TERMS], ["term"]  # dups on purpose
    )
    posting = {r["doc_id"]: r["bm25"]
               for r in bm25_topk_postings(docs, terms).collect()}
    narrow = {r["doc_id"]: r["bm25"]
              for r in text_bm25_topk(spark, SF_SMOKE).collect()}
    common = set(posting) & set(narrow)
    assert len(common) >= len(narrow) - 2, (sorted(posting), sorted(narrow))
    for d in common:
        assert abs(posting[d] - narrow[d]) <= 2e-6, (d, posting[d], narrow[d])


def test_training_funnel_stage_invariants(spark):
    """Queued r7 composition query: every funnel stage can only shrink
    (n_kept <= n_gated <= n_raw per source), the window count is the
    exact ceil of the kept token total, and the funnel is non-vacuous
    on the fixtures — the gate drops documents somewhere AND the
    near-dup component stage removes at least one gated cluster member
    somewhere (the fixture corpus has zero byte-equal duplicates, so an
    exact-dedup stage here would be vacuously green — measured before
    choosing the LSH stage)."""
    from erathia_market_etl_spark.plans.text_queries import (
        FUNNEL_CONTEXT_LEN,
        pipeline_training_funnel,
    )

    rows = pipeline_training_funnel(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_gated"] <= r["n_raw"], r
        want_windows = (
            r["n_tokens"] + FUNNEL_CONTEXT_LEN - 1
        ) // FUNNEL_CONTEXT_LEN
        assert r["n_windows"] == want_windows, r
        assert (r["n_tokens"] > 0) == (r["n_kept"] > 0), r
    assert any(r["n_gated"] < r["n_raw"] for r in rows), "gate dropped nothing"
    assert any(r["n_kept"] < r["n_gated"] for r in rows), "dedup removed nothing"


def test_bm25_postings_partition_order_independent(spark):
    """The micro-integer accumulation claim, tested directly: the
    posting-shape BM25 result must be EXACTLY equal (not tolerance-
    equal) under adversarially different partitionings of the corpus —
    long sums are associative, so partial-aggregation order cannot
    move a score by even one ulp."""
    from pyspark.sql import functions as F

    from erathia_market_etl_spark.plans.text_queries import (
        BM25_POSTING_TERMS,
        bm25_topk_postings,
    )
    from erathia_market_etl_spark.sources.parquet_io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    terms = spark.createDataFrame(
        [(t,) for t in BM25_POSTING_TERMS], "term string"
    )

    def run(df):
        return [
            (r["doc_id"], r["n_terms_hit"], r["bm25"])
            for r in bm25_topk_postings(df, terms).collect()
        ]

    one = run(docs.repartition(1))
    many = run(docs.repartition(13, F.col("doc_id") % 7))
    assert one == many


def test_lm_familiarity_score_semantics(spark):
    """Queued r8 LM scoring query: per-doc invariants (every in-model
    bigram scores <= 0 bits since c(w1,w2) <= c(w1), OOV scores exactly
    LM_OOV_BITS, so mean_bits lies in [LM_OOV_BITS, 0]), the mean is
    NULL exactly for bigram-less docs, and the score is non-vacuous on
    the fixtures: both in-model and OOV populations are hit (the
    LM_TOP_K=512 cap sits inside the ~916-bigram fixture vocabulary)
    and the score actually discriminates documents."""
    from erathia_market_etl_spark.plans.text_queries import (
        LM_OOV_BITS,
        text_lm_familiarity,
    )

    rows = text_lm_familiarity(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_bigrams"], r
        if r["n_bigrams"] == 0:
            assert r["mean_bits"] is None and r["sum_bits"] == 0, r
        else:
            assert LM_OOV_BITS <= r["mean_bits"] <= 0, r
            # every bigram contributes in [LM_OOV_BITS, 0] bits
            assert LM_OOV_BITS * r["n_bigrams"] <= r["sum_bits"] <= 0, r
    total_b = sum(r["n_bigrams"] for r in rows)
    total_oov = sum(r["n_oov"] for r in rows)
    assert 0 < total_oov < total_b, (total_oov, total_b)
    means = {r["mean_bits"] for r in rows if r["mean_bits"] is not None}
    assert len(means) > 1, "score does not discriminate"


def test_lm_familiarity_model_join_broadcasts(spark):
    """The scale claim in the docstring, pinned: the <= LM_TOP_K-row
    model joins the exploded bigram stream as a BROADCAST hash join —
    zipfian-hot bigrams must never ride a shuffled join."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_lm_familiarity,
    )

    plan = text_lm_familiarity(spark, SF_SMOKE)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_duplicate_spans_semantics(spark):
    """Queued r8 duplicate-span query: count containments
    (n_dup_spans <= n_spans, n_distinct_spans <= n_spans), fraction
    bounds, NULL exactly for span-less (< SPAN_K tokens) docs, and
    non-vacuity both ways on the fixtures (the corpus carries
    cross-document boilerplate, but no document is 100% duplicated)."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_duplicate_spans,
    )

    rows = text_duplicate_spans(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup_spans"] <= r["n_spans"], r
        assert 0 <= r["n_distinct_spans"] <= r["n_spans"], r
        if r["n_spans"] == 0:
            assert r["dup_fraction"] is None, r
        else:
            assert 0.0 <= r["dup_fraction"] <= 1.0, r
    assert any(r["n_dup_spans"] > 0 for r in rows), "no duplicated spans"
    assert any(
        r["n_spans"] > 0 and r["n_dup_spans"] < r["n_spans"] for r in rows
    ), "every span duplicated — vacuous fixture"


def test_duplicate_spans_cross_doc_only(spark, tmp_path):
    """A span repeated WITHIN one document only is not a duplicate
    (n_docs >= 2 is distinct-document containment): a synthetic corpus
    with an intra-doc repeat and a cross-doc repeat must flag only the
    cross-doc span occurrences."""
    import os

    from erathia_market_etl_spark.plans.text_queries import (
        SPAN_K,
        text_duplicate_spans,
    )

    base = " ".join(f"w{i}" for i in range(SPAN_K))
    other = " ".join(f"x{i}" for i in range(SPAN_K))
    rows = [
        # doc 0: the same span TWICE (intra-doc repeat, no other doc)
        (0, base + " " + base, "en", "s", 1),
        # docs 1 and 2: share `other` (cross-doc duplicate)
        (1, other, "en", "s", 1),
        (2, other, "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in text_duplicate_spans(spark, d).collect()}
    # doc 0's repeated span never leaves doc 0 -> all spans containing
    # only w-tokens are non-duplicated; the seam spans (w..w mixes) are
    # unique too
    assert out[0]["n_dup_spans"] == 0, out[0]
    assert out[1]["n_dup_spans"] == out[1]["n_spans"] == 1, out[1]
    assert out[2]["n_dup_spans"] == 1, out[2]


def test_lm_and_spans_degenerate_documents(spark, tmp_path):
    """Degenerate-shape corpus through both r8 text operators: a
    one-token doc (zero bigrams — exercises slice(t, 1, 0)), a
    two-token doc (exactly one bigram), and a doc shorter than SPAN_K.
    Bigram/span accounting must survive with exact zeros and NULL
    means, never dropped rows or sequence(1, 0) artifacts."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_duplicate_spans,
        text_lm_familiarity,
    )

    rows = [
        (0, "solo", "en", "s", 4),
        (1, "two tokens", "en", "s", 10),
        (2, "a b c d e f g", "en", "s", 13),   # 7 tokens < SPAN_K
        (3, " ".join(f"w{i}" for i in range(12)), "en", "s", 0),
    ]
    d = _write_docs(spark, rows, str(tmp_path))

    lm = {r["doc_id"]: r for r in text_lm_familiarity(spark, d).collect()}
    assert set(lm) == {0, 1, 2, 3}
    assert lm[0]["n_bigrams"] == 0 and lm[0]["mean_bits"] is None
    assert lm[0]["sum_bits"] == 0 and lm[0]["n_oov"] == 0
    assert lm[1]["n_bigrams"] == 1
    assert lm[3]["n_bigrams"] == 11

    sp = {r["doc_id"]: r for r in text_duplicate_spans(spark, d).collect()}
    assert set(sp) == {0, 1, 2, 3}
    for did in (0, 1, 2):  # all shorter than SPAN_K
        assert sp[did]["n_spans"] == 0 and sp[did]["dup_fraction"] is None
    assert sp[3]["n_spans"] == 12 - 8 + 1


def test_duplicate_spans_property_random_corpora(spark):
    """Hypothesis property: on random corpora drawn from a small token
    vocabulary (so cross-document span collisions actually happen),
    text_duplicate_spans must equal a pure-Python span counter —
    totals, distincts, cross-document duplicate counts, every doc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from erathia_market_etl_spark.plans.text_queries import (
        SPAN_K,
        text_duplicate_spans,
    )

    @settings(max_examples=4, deadline=None)
    @given(st.data())
    def run(data):
        import os
        import tempfile
        from collections import Counter

        n_docs = data.draw(st.integers(min_value=1, max_value=8))
        texts = []
        for _ in range(n_docs):
            n_tok = data.draw(st.integers(min_value=1, max_value=30))
            texts.append(
                " ".join(
                    data.draw(st.sampled_from(["a", "b", "c"]))
                    for _ in range(n_tok)
                )
            )
        rows = [
            (i, t, "en", "s", len(t)) for i, t in enumerate(texts)
        ]
        # python reference
        per_doc = {}
        span_docs = Counter()
        for i, t in enumerate(texts):
            toks = t.split(" ")
            spans = [
                " ".join(toks[j:j + SPAN_K])
                for j in range(len(toks) - SPAN_K + 1)
            ]
            per_doc[i] = Counter(spans)
            for sp in set(spans):
                span_docs[sp] += 1
        with tempfile.TemporaryDirectory() as td:
            df = spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            )
            df.coalesce(1).write.parquet(
                os.path.join(td, "documents.parquet")
            )
            got = {
                r["doc_id"]: r
                for r in text_duplicate_spans(spark, td).collect()
            }
        assert set(got) == set(per_doc)
        for i, cnt in per_doc.items():
            n_spans = sum(cnt.values())
            n_dup = sum(
                c for sp, c in cnt.items() if span_docs[sp] >= 2
            )
            assert got[i]["n_spans"] == n_spans, (i, got[i], n_spans)
            assert got[i]["n_distinct_spans"] == len(cnt), (i, got[i])
            assert got[i]["n_dup_spans"] == n_dup, (i, got[i], n_dup)

    run()


def _edit_distance(s, t):
    """Reference Wagner-Fischer, driver-side."""
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


def test_fuzzy_prefix_block_semantics(spark, tmp_path):
    """Planted corpus for the blocking + Levenshtein pass: a true fuzzy
    pair (char edits past the prefix, inside the verify window) must be
    found with its EXACT edit distance (pinned against a driver-side
    Wagner-Fischer); a same-block pair whose heads diverge past
    FUZZY_MAX_DIST must be rejected by the verify; and a pair differing
    inside the 16-char blocking prefix is the documented miss (the
    token-level MinHash/SimHash passes own it)."""
    from erathia_market_etl_spark.plans.dedup_queries import (
        dedup_fuzzy_prefix_block,
    )

    base = "shared sixteen!! " + "x" * 40        # block prefix + filler
    t0 = base + "alpha beta gamma"               # len 73 -> bucket 2
    t1 = base + "alpha bxta gamba"               # 2 edits vs t0
    t2 = "shared sixteen!! " + "q" * 60          # len 77 -> bucket 2, far head
    t3 = "DIFFERENT prefix " + t0                # prefix differs -> miss
    rows = [(i, t, "en", "s", 0) for i, t in enumerate([t0, t1, t2, t3])]
    d = _write_docs(spark, rows, str(tmp_path))
    got = {
        (r["doc_a"], r["doc_b"]): r["prefix_edit_distance"]
        for r in dedup_fuzzy_prefix_block(spark, d).collect()
    }
    assert got == {(0, 1): _edit_distance(t0[:120], t1[:120])}, got
    assert got[(0, 1)] == 2


def test_fuzzy_prefix_block_cap_is_deterministic(spark, tmp_path):
    """An over-cap block keeps exactly the first FUZZY_BLOCK_CAP docs by
    doc_id: C(cap, 2) pairs, and no doc past the cap appears."""
    from erathia_market_etl_spark.plans.dedup_queries import (
        FUZZY_BLOCK_CAP,
        dedup_fuzzy_prefix_block,
    )

    n = FUZZY_BLOCK_CAP + 5
    text = "shared sixteen!! " + "y" * 50
    rows = [(i, text, "en", "s", 0) for i in range(n)]
    d = _write_docs(spark, rows, str(tmp_path))
    pairs = dedup_fuzzy_prefix_block(spark, d).collect()
    assert len(pairs) == FUZZY_BLOCK_CAP * (FUZZY_BLOCK_CAP - 1) // 2
    seen = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert max(seen) == FUZZY_BLOCK_CAP - 1  # caps keep LOWEST doc_ids


def _py_bpe(word_counts, rounds):
    """Reference BPE: greedy left-to-right merge application over symbol
    lists, top pair by (count DESC, left ASC, right ASC)."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        counts = {}
        for w, c in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        (x, y), pc = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((x, y, pc))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_matches_python_reference_on_random_corpora(spark):
    """Hypothesis property: on random corpora over a 3-letter alphabet
    (so pair collisions and repeated-symbol words actually happen) the
    distributed BPE rounds must produce exactly the Python reference's
    merge table — the padded-string replace and the greedy list merge
    are the same operation, pinned generatively."""
    import os
    import tempfile
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from erathia_market_etl_spark.plans.text_queries import text_bpe_merges

    @settings(max_examples=4, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=25,
        ),
        st.integers(min_value=1, max_value=4),
    )
    def run(all_words, rounds):
        import erathia_market_etl_spark.plans.text_queries as tq

        rows = []
        # pack words into a few documents (space-joined), exercising the
        # corpus->vocab aggregate too
        for i in range(0, len(all_words), 5):
            chunk = " ".join(all_words[i:i + 5])
            rows.append((i, chunk, "en", "s", len(chunk)))
        with tempfile.TemporaryDirectory() as d:
            _write_docs(spark, rows, d)
            old_rounds = tq.BPE_ROUNDS
            tq.BPE_ROUNDS = rounds
            try:
                got = [
                    (r["left_sym"], r["right_sym"], r["pair_count"])
                    for r in text_bpe_merges(spark, d).collect()
                ]
            finally:
                tq.BPE_ROUNDS = old_rounds
        want = _py_bpe(dict(Counter(all_words)), rounds)
        assert got == want, (all_words, rounds, got, want)

    run()


def test_bpe_stops_when_no_pairs_remain(spark, tmp_path):
    """Single-character words only: zero adjacent pairs, the merge
    table must be EMPTY (not crash, not emit a null row) — the same
    early stop the oracle's empty top-CTE arm produces."""
    from erathia_market_etl_spark.plans.text_queries import text_bpe_merges

    rows = [(0, "a b c a b", "en", "s", 9)]
    d = _write_docs(spark, rows, str(tmp_path))
    assert text_bpe_merges(spark, d).collect() == []


def test_chunk_overlap_boundaries_exact(spark, tmp_path):
    """Chunker arithmetic on planted token counts: a short doc and an
    exactly-64-token doc yield ONE chunk; 65 tokens yield two chunks
    whose second starts at token 48 (17 tokens long, 16 shared with
    chunk 0); a 160-token doc yields three chunks at starts 0/48/96;
    token conservation: the union of chunk token positions covers the
    doc with the planted overlap, never a gap."""
    from erathia_market_etl_spark.plans.text_queries import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_overlap,
    )

    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    rows = [
        (0, doc(10), "en", "s", 0),
        (1, doc(CHUNK_TOKENS), "en", "s", 0),
        (2, doc(CHUNK_TOKENS + 1), "en", "s", 0),
        (3, doc(160), "en", "s", 0),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {}
    for r in text_chunk_overlap(spark, d).collect():
        out.setdefault(r["doc_id"], []).append(r)

    assert [c["n_tokens"] for c in out[0]] == [10]
    assert [c["n_tokens"] for c in out[1]] == [CHUNK_TOKENS]
    assert [(c["start_tok"], c["n_tokens"]) for c in out[2]] == [
        (0, CHUNK_TOKENS), (CHUNK_STRIDE, CHUNK_TOKENS + 1 - CHUNK_STRIDE),
    ]
    assert [(c["start_tok"], c["n_tokens"]) for c in out[3]] == [
        (0, 64), (48, 64), (96, 64),
    ]
    # chunk text is the exact token slice; overlap region is shared
    c0, c1 = out[2][0]["chunk_text"].split(" "), out[2][1]["chunk_text"].split(" ")
    assert c0 == [f"t{i}" for i in range(64)]
    assert c1 == [f"t{i}" for i in range(48, 65)]
    assert c0[48:] == c1[:16]


def test_bpe_compression_merges_shorten_segmentation(spark):
    """Apply-side sanity on the fixture corpus: per source, symbols
    after merging never exceed characters (a merge only shortens), and
    the learned merges genuinely compress somewhere
    (chars_per_symbol > 1 — with 5 learned merges over a natural-ish
    vocabulary some words must contain a merged pair)."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_bpe_compression,
    )

    rows = text_bpe_compression(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_symbols"] <= r["n_chars"], r
        assert r["chars_per_symbol"] >= 1.0, r
    assert any(r["chars_per_symbol"] > 1.0 for r in rows)


def test_phrase_search_ranking_and_workload(spark):
    """Planted corpus with hand-computable bigram frequencies: the
    self-derived workload must be the hottest top_q bigrams (total
    DESC, phrase tiebreak) and each phrase's doc ranking must order by
    occurrence count DESC with doc_id tiebreak."""
    from erathia_market_etl_spark.plans.text_queries import (
        phrase_search_frame,
    )

    rows = [
        # "a b" x3 in doc 1, x1 in doc 2; "c d" x2 in doc 2
        (1, "a b a b a b"),       # bigrams: a-b x3, b-a x2
        (2, "a b c d c d"),       # a-b x1, b-c x1, c-d x2, d-c x1
        (3, "c d x y"),           # c-d, d-x, x-y
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_search_frame(docs, top_q=2, top_k=5).collect()
    # totals: "a b"=4, "c d"=3, "b a"=2, rest 1 -> workload = {a b, c d}
    by_phrase: dict[str, list] = {}
    for r in out:
        by_phrase.setdefault(r["phrase"], []).append(r)
    assert set(by_phrase) == {"a b", "c d"}
    ab = by_phrase["a b"]
    assert [(r["doc_id"], r["n_occurrences"], r["rank"]) for r in ab] == [
        (1, 3, 1), (2, 1, 2),
    ]
    assert all(r["phrase_total"] == 4 and r["n_docs"] == 2 for r in ab)
    cd = by_phrase["c d"]
    assert [(r["doc_id"], r["n_occurrences"], r["rank"]) for r in cd] == [
        (2, 2, 1), (3, 1, 2),
    ]


def test_phrase_search_requires_adjacency(spark):
    """The positional property that distinguishes phrase search from
    bag-of-words retrieval: a document containing both words
    NON-adjacently must not match the phrase."""
    from erathia_market_etl_spark.plans.text_queries import (
        phrase_search_frame,
    )

    rows = [
        (1, "red car red car"),   # "red car" x2 (adjacent)
        (2, "red car"),           # x1
        (3, "red big car red slow car"),  # both words, never adjacent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_search_frame(docs, top_q=1, top_k=5).collect()
    assert all(r["phrase"] == "red car" for r in out)
    assert [r["doc_id"] for r in out] == [1, 2]  # doc 3 excluded
    assert [r["n_occurrences"] for r in out] == [2, 1]


def test_phrase_search_single_corpus_pass(spark):
    """Plan pin: after the occurrence checkpoint, fit and retrieval
    both read the materialized RDD — the corpus parquet is scanned
    exactly once (at checkpoint build), and the workload join is a
    broadcast."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_phrase_search,
    )

    df = text_phrase_search(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan          # corpus read happened at checkpoint
    assert plan.count("Scan ExistingRDD") == 2  # fit + probe, same RDD
    assert "BroadcastHashJoin" in plan


def test_tfidf_downranks_corpus_wide_terms(spark, tmp_path):
    """Keyword-extraction semantics on a planted corpus: a term in
    EVERY document ('the') must rank below a document-unique term even
    when its tf is higher, and the rational-idf score ordering is the
    hand-computed one."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_top_terms_tfidf,
    )

    docs = [
        (1, "the the the zebra", "en", "s", 0),
        (2, "the apple", "en", "s", 0),
        (3, "the banana banana", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    p = str(tmp_path / "sf")
    df.write.parquet(p + "/documents.parquet")
    got = {}
    for r in text_top_terms_tfidf(spark, p).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"])
        )
    # doc 1: zebra (tf=1, df=1) must outrank the (tf=3, df=3):
    # zebra = 1*(2*(3-1)+1)/(2*1+1) = 5/3 ; the = 3*(2*0+1)/7 = 3/7
    assert got[1][0][1] == "zebra"
    assert got[1][1][1] == "the"
    # doc 3: banana (tf=2, df=1) -> 2*5/3 = 10/3 outranks the
    assert got[3][0][1] == "banana"


def test_vocab_coverage_planted_counts_and_tiebreak(spark):
    """Hand-checkable OOV accounting: df ranks a(3) > b(2) = y(2) >
    c(1) = x(1); vocab_size=2 must take {a, b} (term-asc tiebreak at
    the df boundary), and every per-doc count / exact-ppm rate follows
    by hand."""
    from erathia_market_etl_spark.plans.text_queries import (
        vocab_coverage_frame,
    )

    docs = spark.createDataFrame(
        [(0, "a a b c y"), (1, "a b y"), (2, "a x")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["n_tokens"], r["n_in_vocab"], r["oov_ppm"], r["n_distinct_oov"]
        )
        for r in vocab_coverage_frame(docs, vocab_size=2).collect()
    }
    assert out == {
        0: (5, 3, 400000, 2),   # oov: c, y
        1: (3, 2, 333333, 1),   # oov: y  (1e6 DIV 3 floors)
        2: (2, 1, 500000, 1),   # oov: x
    }


def test_simpson_diversity_planted(spark):
    """Hand-checkable diversity: heavy repetition, all-distinct, and a
    single-token doc (n=1 guard)."""
    from erathia_market_etl_spark.plans.text_queries import (
        simpson_diversity_frame,
    )

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b c d"), (2, "a")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["n_tokens"], r["n_distinct"], r["ttr_ppm"], r["simpson_ppm"]
        )
        for r in simpson_diversity_frame(docs).collect()
    }
    assert out == {
        0: (4, 2, 500000, 500000),  # coll = 3*2 = 6; 6e6 DIV 12
        1: (4, 4, 1000000, 0),
        2: (1, 1, 1000000, 0),
    }


def test_decon_ngram_contamination_splits_and_flags(spark):
    """The contamination report must be non-vacuous on the fixture
    corpus: some train docs carry test 4-grams and some do not, the
    flag fires exactly at the DECON_CONTAMINATED_PPM threshold, and
    n_hits can never exceed n_grams."""
    from erathia_market_etl_spark.plans.text_queries import (
        DECON_CONTAMINATED_PPM,
        decon_ngram_contamination,
    )

    rows = decon_ngram_contamination(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    hit = [r for r in rows if r["n_hits"] > 0]
    assert 0 < len(hit) < len(rows)
    flagged = [r for r in rows if r["contaminated"]]
    assert 0 < len(flagged) < len(rows)
    for r in rows:
        assert 0 <= r["n_hits"] <= r["n_grams"]
        assert r["contaminated"] == (
            r["contamination_ppm"] >= DECON_CONTAMINATED_PPM
        )
        assert r["train_doc"] >= 250


def test_source_divergence_identical_and_disjoint_extremes(spark):
    """Planted extremes pin the L1 arithmetic: two sources with the
    SAME unigram distribution land at l1_ppm 0 (ppm truncation is
    identical on both sides), two with DISJOINT vocabularies land at
    the theoretical maximum = mass_a + mass_b (~2e6 less truncation
    dust), and a half-overlapping pair lands strictly between."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_source_divergence,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b a c", "x", "same1"),
            (1, "c a b a", "x", "same2"),     # same multiset as same1
            (2, "d d e e", "x", "disjoint"),
            (3, "a b d e", "x", "half"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    # reuse the full query path on a planted documents table staged to
    # a temp dir (load_table reads <dir>/documents.parquet)
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("n_chars", F.length("text")).write.parquet(
            d + "/documents.parquet"
        )
        out = {
            (r["src_a"], r["src_b"]): r["l1_ppm"]
            for r in text_source_divergence(spark, d).collect()
        }
    assert out[("same1", "same2")] == 0
    # disjoint: both full masses (4 tokens at 250000 ppm each => 1e6
    # per source, no truncation dust on these round counts)
    assert out[("disjoint", "half")] > 0
    full = out[("disjoint", "same1")]
    assert full == 2_000_000
    mid = out[("half", "same1")]
    assert 0 < mid < full


def test_url_canonicalize_collapses_planted_variants(spark):
    """Canonicalization contract on the fixture synthesis: every host
    that received BOTH a case-shuffled and a port-suffixed raw variant
    reports n_raw_variants > 1 (the messy forms genuinely differed and
    collapsed), hosts are all-lowercase, and no canonical path keeps a
    trailing slash."""
    from erathia_market_etl_spark.plans.text_queries import (
        text_url_canonicalize,
    )

    rows = text_url_canonicalize(spark, SF_SMOKE).collect()
    assert len(rows) == 20  # one per source
    assert all(r["canon_host"] == r["canon_host"].lower() for r in rows)
    # every source sees doc_ids spanning the %3 and %5 residues at
    # sf0.001 (25 docs/source), so every host collapsed >1 raw variant
    assert all(r["n_raw_variants"] > 1 for r in rows)
    assert all(r["n_docs"] > 0 and r["total_chars"] > 0 for r in rows)


def test_vocab_hapax_profile_planted(spark, tmp_path):
    """text_vocab_hapax_profile semantic pin on a planted corpus:
    srcA = 'a a b c' + 'a d' -> tokens 6, types {a,b,c,d} = 4,
    hapax {b,c,d} = 3, top count a=3, ttr = 4e6 DIV 6 = 666666,
    hapax share = 3e6 DIV 4 = 750000. srcB is all-same-token (the
    degenerate boilerplate case: 1 type, 0 hapax, ttr floors at
    1e6 DIV n). Case folding and empty-token drop are exercised
    ('A  a' double space)."""
    import os

    from erathia_market_etl_spark.plans.text_queries import (
        text_vocab_hapax_profile,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [
            (1, "srcA", "A a b c"),
            (2, "srcA", "a  d"),
            (3, "srcB", "x x x x x"),
        ],
        "doc_id long, source string, text string",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = [tuple(r) for r in text_vocab_hapax_profile(spark, sf).collect()]
    assert rows == [
        ("srcA", 6, 4, 3, 3, 666666, 750000),
        ("srcB", 5, 1, 0, 5, 200000, 0),
    ]


def test_span_removal_keep_one_semantics(spark, tmp_path):
    """r14 rewrite half of exact-substring dedup: the duplicated span
    keeps its SMALLEST-doc_id copy and is removed everywhere else;
    intra-doc-only repeats are never removed; short docs and docs with
    no duplicated spans pass through byte-identical; removal takes the
    full covered window, not just the span start."""
    from erathia_market_etl_spark.plans.text_queries import (
        SPAN_K,
        text_dedup_span_removal,
    )

    shared = " ".join(f"d{i}" for i in range(SPAN_K))
    intra = " ".join(f"r{i}" for i in range(SPAN_K))
    rows = [
        # doc 0: keeper (smallest doc_id containing `shared`), with a
        # unique prefix token so removal WOULD be visible if it fired
        (0, "u0 " + shared, "en", "s", 1),
        # doc 1: loser — `shared` plus unique tokens either side
        (1, "u1 " + shared + " u2", "en", "s", 1),
        # doc 2: intra-doc repeat only (same span twice, no other doc)
        (2, intra + " " + intra, "en", "s", 1),
        # doc 3: short (< SPAN_K tokens), untouched
        (3, "a b c", "en", "s", 1),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {r["doc_id"]: r for r in text_dedup_span_removal(spark, d).collect()}

    assert set(out) == {0, 1, 2, 3}
    # keeper keeps everything
    assert out[0]["n_removed"] == 0
    assert out[0]["text_rewritten"] == "u0 " + shared
    # loser drops exactly the SPAN_K covered tokens, keeps its unique ends
    assert out[1]["n_removed"] == SPAN_K
    assert out[1]["text_rewritten"] == "u1 u2"
    assert out[1]["removed_ppm"] == SPAN_K * 1_000_000 // (SPAN_K + 2)
    # intra-doc-only repeats never removed (cross-doc containment rule)
    assert out[2]["n_removed"] == 0
    assert out[2]["text_rewritten"] == intra + " " + intra
    # short doc passes through
    assert out[3]["n_removed"] == 0 and out[3]["text_rewritten"] == "a b c"


def test_span_removal_overlapping_spans_cover_union(spark, tmp_path):
    """Overlapping duplicated spans remove the UNION of their covered
    windows: doc 1 shares a (SPAN_K+1)-token run with doc 0, which is
    two overlapping SPAN_K spans — the loser loses all SPAN_K+1 tokens
    exactly once (no double counting, no gap at the overlap seam)."""
    from erathia_market_etl_spark.plans.text_queries import (
        SPAN_K,
        text_dedup_span_removal,
    )

    run = " ".join(f"v{i}" for i in range(SPAN_K + 1))
    rows = [
        (0, run, "en", "s", 1),
        (1, "head " + run + " tail", "en", "s", 1),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {r["doc_id"]: r for r in text_dedup_span_removal(spark, d).collect()}
    assert out[0]["n_removed"] == 0  # keeper
    assert out[1]["n_removed"] == SPAN_K + 1
    assert out[1]["text_rewritten"] == "head tail"


def test_cdc_chunks_core_properties():
    """CDC core (no SparkSession): chunks reconstruct the text exactly,
    every boundary sits right after a gram whose hash is 0 mod the
    divisor, and short/None inputs behave."""
    from erathia_market_etl_spark.operators.text import (
        CDC_DIV,
        CDC_K,
        cdc_chunks,
        winnow_doc,
    )

    s = " ".join(f"tok{i * 7 % 93}x{i}" for i in range(60))
    cs = cdc_chunks(s)
    assert "".join(cs) == s
    assert len(cs) > 3  # non-degenerate at divisor 32 on ~500 chars
    assert all(c != "" for c in cs)
    assert cdc_chunks("ab") == ["ab"]  # < CDC_K chars: one whole chunk
    assert cdc_chunks(None) == []
    # boundary law: each cut position (start of chunk j>0) equals
    # previous-content length, and the k-gram ENDING at the cut hashes
    # to 0 mod CDC_DIV — recompute with the same polynomial
    import numpy as np

    # pure-Python ints (arbitrary precision) with one final mod 2^64 —
    # the independent formulation, and no numpy scalar-overflow warning
    codes = [ord(ch) for ch in s]
    pos = 0
    for c in cs[:-1]:
        pos += len(c)
        h = 0
        for cp in codes[pos - CDC_K:pos]:
            h = h * 1_000_003 + cp
        assert (h % 2**64) % CDC_DIV == 0, pos


def test_cdc_chunks_realign_after_insertion(spark, tmp_path):
    """THE content-defined property: a prefix insertion shifts every
    fixed-size chunk but leaves CDC chunks after the first cut
    byte-identical — so the duplicate-chunk counter sees the shared
    content. Both docs must report duplicated chunks, covering most of
    their chunk stream."""
    from erathia_market_etl_spark.plans.text_queries import text_cdc_chunks

    s = " ".join(f"tok{i * 7 % 93}x{i}" for i in range(60))
    rows = [
        (0, s, "en", "s", 1),
        (1, "INSERTED PREFIX " + s, "en", "s", 1),
        (2, "completely different content here entirely", "en", "s", 1),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {r["doc_id"]: r for r in text_cdc_chunks(spark, d).collect()}
    assert out[0]["n_dup_chunks"] >= out[0]["n_chunks"] - 1
    assert out[1]["n_dup_chunks"] >= out[1]["n_chunks"] - 2
    assert out[2]["n_dup_chunks"] == 0
    # chunk streams reconstruct their documents
    assert out[0]["n_chars"] == len(s)
    assert out[1]["n_chars"] == len("INSERTED PREFIX " + s)


def test_cdc_chunks_null_text_symmetric_across_engines(spark, tmp_path):
    """r14 ADVICE: cdc_chunks(None) returns [] so a NULL-text document
    must vanish from BOTH engines' output — before the oracle's bounds
    CTE gained `WHERE text IS NOT NULL` the DuckDB side kept the doc
    with NULL aggregates while Spark dropped it. Planted NULL-text
    corpus, full driver-style compare."""
    from erathia_market_etl_spark.plans.text_queries import (
        TEXT_CDC_CHUNKS_ORACLE,
        text_cdc_chunks,
    )
    from erathia_market_etl_spark.testing import compare_query

    s = " ".join(f"tok{i * 7 % 93}x{i}" for i in range(60))
    rows = [
        (0, s, "en", "s", 1),
        (1, None, "en", "s", 0),
        (2, "short but real text content", "en", "s", 1),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {r["doc_id"]: r for r in text_cdc_chunks(spark, d).collect()}
    assert set(out) == {0, 2}, "NULL-text doc must emit no rows"
    r = compare_query(
        "text_cdc_chunks", text_cdc_chunks(spark, d),
        TEXT_CDC_CHUNKS_ORACLE, d,
    )
    assert r.ok, r


# ---------------------------------------------------------------------------
# HTML extraction laws (operators/html.py + text_html_extract, r16 —
# VERDICT r15 item 4): each rule pinned on a hand-written document
# constructed to exercise exactly that rule, through the REAL column
# expressions (no fixture synthesis in the way).
# ---------------------------------------------------------------------------


def _extract(spark, html: str) -> dict:
    from pyspark.sql import functions as F

    from erathia_market_etl_spark.operators.html import extract_content

    sig = extract_content(F.lit(html))
    row = spark.range(1).select(
        *[v.alias(k) for k, v in sig.items()]
    ).collect()[0]
    return row.asDict()


def test_html_noise_stripped_before_block_walk(spark):
    """script/style vanish wholesale BEFORE segmentation: a '<' and a
    literal '</p>' INSIDE a script body must not open or close blocks,
    and a style element between blocks must not appear in the text."""
    out = _extract(spark, (
        '<p>twenty characters of honest paragraph text</p>'
        '<script>if (x < 2) { y = "</p>"; }</script>'
        '<style>p { color: red; }</style>'
        '<p>another honest paragraph with enough text</p>'
    ))
    assert out["n_blocks"] == 2 and out["n_kept"] == 2
    assert out["kept_text"] == (
        "twenty characters of honest paragraph text\n"
        "another honest paragraph with enough text"
    )


def test_html_nav_dropped_by_density_footer_by_length(spark):
    """The two signals fire independently: an all-links nav fails the
    ppm rule even when long; a short footer fails the length rule even
    with low density; a content paragraph passes both."""
    nav = "<nav>" + " ".join(
        f'<a href="/{i}">navigation</a>' for i in range(6)
    ) + "</nav>"
    out = _extract(spark, (
        nav
        + "<p>the actual article body text sits here with one "
          '<a href="/ref">reference</a> link inside it</p>'
        + '<footer>(c) 2026 <a href="/about">about</a></footer>'
    ))
    assert out["n_blocks"] == 3
    assert out["n_kept"] == 1
    assert out["kept_text"].startswith("the actual article body")
    # the kept paragraph's density is the reported max
    plain = ("the actual article body text sits here with one "
             "reference link inside it")
    assert out["max_kept_ppm"] == len("reference") * 1_000_000 // len(plain)
    assert out["kept_chars"] == len(plain)


def test_html_inline_tags_stripped_anchor_text_kept(spark):
    """Tag stripping keeps display text: bold/em markup and anchor
    display text survive; attributes and the tags themselves do not.
    Nested markup INSIDE an anchor counts its text, not its tags."""
    out = _extract(spark, (
        '<div class="main" id="x">some <b>bold</b> and <em>emphasized'
        '</em> words plus <a href="/y" rel="nofollow">a <b>styled</b> '
        'link</a> here</div>'
    ))
    assert out["n_kept"] == 1
    assert out["kept_text"] == (
        "some bold and emphasized words plus a styled link here"
    )
    plain = out["kept_text"]
    assert out["max_kept_ppm"] == len("a styled link") * 1_000_000 // len(plain)


def test_html_case_insensitive_tags_and_attributes(spark):
    """<P CLASS=..> ... </P> is the same block as <p>...</p>."""
    out = _extract(spark, (
        '<P CLASS="lead">uppercase tagged paragraph with plenty of '
        "text</P><SCRIPT>var z = 1;</SCRIPT>"
    ))
    assert out["n_blocks"] == 1 and out["n_kept"] == 1
    assert out["kept_text"].startswith("uppercase tagged paragraph")


def test_html_empty_block_reads_all_link_and_drops(spark):
    """A block whose plain text is empty gets ppm = 1e6 (all-link by
    convention) and can never pass the keep rule."""
    out = _extract(spark, "<p></p><p>   </p>")
    assert out["n_blocks"] == 2 and out["n_kept"] == 0
    assert out["kept_text"] == "" and out["max_kept_ppm"] == 0


def test_html_extract_query_oracle_and_block_census(spark, tmp_path):
    """The full synthesized-page query on planted docs: 6 blocks per
    doc (script gone), nav/h1/footer never kept, and the DuckDB twin
    hash-matches on the planted table — including the 10-word minimum
    and a doc with single-char words (shortest legal paragraphs)."""
    from erathia_market_etl_spark.plans.text_queries import (
        TEXT_HTML_EXTRACT_ORACLE,
        text_html_extract,
    )
    from erathia_market_etl_spark.testing import compare_query

    rows = [
        (0, " ".join(f"word{i}" for i in range(10)), "en", "s", 1),
        (7, " ".join("abcdefghij"[i % 10] for i in range(25)), "en", "s", 1),
        (123456, " ".join(f"t{i * 13 % 97}longish" for i in range(100)),
         "en", "s", 1),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {r["doc_id"]: r.asDict() for r in text_html_extract(spark, d).collect()}
    assert set(out) == {0, 7, 123456}
    for r in out.values():
        assert r["n_blocks"] == 6
        assert r["n_kept"] <= 3  # only paragraphs can survive
        for line in filter(None, r["kept_text"].split("\n")):
            assert len(line) >= 20 and "<" not in line
    # doc 7: all words are single chars, paragraphs are 3-7 words =
    # 5-13 plain chars < 20 -> everything drops
    assert out[7]["n_kept"] == 0 and out[7]["kept_text"] == ""
    r = compare_query(
        "text_html_extract", text_html_extract(spark, d),
        TEXT_HTML_EXTRACT_ORACLE, d,
    )
    assert r.ok, r


def test_html_link_census_laws(spark):
    """link_stats rules, each on HTML built to exercise exactly it:
    hrefless anchors don't count; scheme-relative '//host' is neither
    internal nor external; mailto/#fragment count as links only; hosts
    are lowercased; a script-embedded anchor string never counts."""
    from pyspark.sql import functions as F

    from erathia_market_etl_spark.operators.html import link_stats

    def stats(html):
        sig = link_stats(F.lit(html))
        return spark.range(1).select(
            *[v.alias(k) for k, v in sig.items()]
        ).collect()[0].asDict()

    out = stats(
        '<p><a href="/local/a">one</a>'
        ' <a href="HTTPS://SiTe.EXample.com/Path">two</a>'
        ' <a href="//cdn.example.com/x">three</a>'
        ' <a href="mailto:a@b.c">four</a>'
        ' <a href="#top">five</a>'
        ' <a name="anchor">not a link</a></p>'
        '<script>var u = \'<a href="https://evil.example.com/x">\';</script>'
    )
    assert out["n_links"] == 5
    assert out["n_internal"] == 1  # only /local/a
    assert out["n_external"] == 1  # only the https one
    assert out["n_hosts"] == 1
    assert out["host_list"] == "site.example.com"  # lowercased

    # host dedup + deterministic ordering
    out = stats(
        '<p><a href="https://b.com/1">x</a> <a href="https://a.com/2">y</a>'
        ' <a href="http://b.com/3">z</a></p>'
    )
    assert out["n_hosts"] == 2 and out["host_list"] == "a.com,b.com"


def test_html_links_query_host_branches(spark, tmp_path):
    """The synthesized query's two host branches: id % 5 == 0 collapses
    all four nav hosts to site0 (n_hosts 1), any other id gives four
    distinct hosts — and the DuckDB twin hash-matches on planted
    docs covering both."""
    from erathia_market_etl_spark.plans.text_queries import (
        TEXT_HTML_LINKS_ORACLE,
        text_html_links,
    )
    from erathia_market_etl_spark.testing import compare_query

    rows = [
        (0, " ".join(f"w{i}" for i in range(12)), "en", "s", 1),
        (3, " ".join(f"w{i}" for i in range(30)), "en", "s", 1),
        (10, " ".join(f"w{i}" for i in range(10)), "en", "s", 1),
    ]
    d = _write_docs(spark, rows, str(tmp_path))
    out = {r["doc_id"]: r.asDict() for r in text_html_links(spark, d).collect()}
    assert out[0]["n_hosts"] == 1 and out[0]["host_list"] == "site0.example.com"
    assert out[10]["n_hosts"] == 1
    assert out[3]["n_hosts"] == 4
    assert out[3]["host_list"] == ",".join(
        sorted(f"site{3 * (j + 1) % 5}.example.com" for j in range(4))
    )
    for r in out.values():
        assert (r["n_links"], r["n_internal"], r["n_external"]) == (8, 4, 4)
    res = compare_query(
        "text_html_links", text_html_links(spark, d),
        TEXT_HTML_LINKS_ORACLE, d,
    )
    assert res.ok, res
