"""Text-analysis queries over the documents table (extension surface).

The text pipeline a 100 TB pre-training corpus run needs: token
statistics, language-ID, quality scoring/gating, repetition and PII
signals, fingerprinting (whole-doc, min-shingle, winnowed k-gram),
decontamination, and BM25 lexical retrieval. Everything is built-in
Catalyst expressions (operators/text.py) except the winnowing core —
a sanctioned narrow Arrow boundary — and every query carries an exact
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ..operators.similarity import round6
from ..sources.parquet_io import adaptive_partitions, load_table
from .registry import query

_MARKER_SQL = {
    lang: "(" + ", ".join(f"'{w}'" for w in words) + ")"
    for lang, words in TX.LANG_MARKERS.items()
}


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           LENGTH(text) AS n_chars,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        w -> CAST(LENGTH(w) AS BIGINT))) AS BIGINT)
               AS sum_token_chars,
           FLOOR(CAST(list_sum(list_transform(string_split(text, ' '),
                                              w -> CAST(LENGTH(w) AS BIGINT))) AS DOUBLE)
                 / len(string_split(text, ' ')) * 1000000 + 0.5) / 1000000 AS avg_token_len,
           len(regexp_extract_all(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens, all
    JVM-side (aggregate/transform HOFs, regexp_count)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        TX.sum_token_chars(t).alias("sum_token_chars"),
        round6(TX.sum_token_chars(t).cast("double") / TX.token_count(t)).alias("avg_token_len"),
        TX.bpe_ish_token_count(t).cast("int").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKER_SQL['en']})) AS score_en,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKER_SQL['de']})) AS score_de,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKER_SQL['es']})) AS score_es,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKER_SQL['fr']})) AS score_fr,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKER_SQL['zh']})) AS score_zh
        FROM documents
    )
    SELECT doc_id, labeled_lang, score_en, score_de, score_es, score_fr, score_zh,
           CASE
             WHEN score_en >= score_de AND score_en >= score_es
                  AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
             WHEN score_de >= score_en AND score_de >= score_es
                  AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
             WHEN score_es >= score_en AND score_es >= score_de
                  AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
             WHEN score_fr >= score_en AND score_fr >= score_de
                  AND score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
             ELSE 'zh'
           END AS predicted_lang
    FROM scored
    ORDER BY doc_id
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language marker-token hit counts with a
    fixed-precedence argmax (deterministic ties on both engines).

    r17 (guide §1.2/§2.3): the token array is projected ONCE and all
    five marker filters read it — the previous shape re-split the text
    inside every score expression (five tokenize passes per row, ten
    counting the ORDER BY range-sampling re-execution). An Arrow
    one-pass kernel was ALSO measured and rejected: 0.67-0.70 s vs
    0.37-0.40 s for the HOF formulations at sf0.1 — the marker sets are
    tiny, so the JVM↔Python round-trip costs more than the five
    interpreted filter walks it saves (OPTIMIZATION_r17.md)."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.tokens(F.col("text")).alias("_toks"),
    )
    scores = TX.language_scores_from_tokens(F.col("_toks"))
    df = tokd.select(
        "doc_id",
        "labeled_lang",
        *[scores[lang].alias(f"score_{lang}") for lang in TX.LANG_ORDER],
    )
    score_cols = {lang: F.col(f"score_{lang}") for lang in TX.LANG_ORDER}
    return df.withColumn(
        "predicted_lang", TX.predicted_language(score_cols)
    ).orderBy("doc_id")


# Driver slot RETIRED r14 (one-in-one-out: paid for the
# mart_pareto_concentration promotion — VERDICT r13 item 8). Strict
# subset of staying siblings: the same map-only per-document signal
# projection over `documents` (narrow scan -> array HOFs -> ORDER BY
# doc_id) as text_quality_signals, and its composite score is one term
# of text_quality_gate's registered C4/Gopher composite. Values stay
# attested by the retired-set sweep (tests/test_oracle_parity.py +
# tools/localcheck.py at sf0.01/sf0.1 every round).
TEXT_QUALITY_SCORE_ORACLE = """
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               LENGTH(text) AS n_chars
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           FLOOR(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 1000000 + 0.5)
               / 1000000 AS unique_ratio,
           FLOOR((
               0.5 * LEAST(1.0, CAST(len(toks) AS DOUBLE) / 100)
             + 0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           ) * 1000000 + 0.5) / 1000000 AS quality_score
    FROM t
    ORDER BY doc_id
    """


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length saturation + lexical diversity composite
    (the shape of a pre-training quality filter; weights are config)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double") / n
    length_sat = F.least(F.lit(1.0), n / 100)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        round6(uniq).alias("unique_ratio"),
        round6(0.5 * length_sat + 0.5 * uniq).alias("quality_score"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
    sh AS (
        SELECT doc_id, text,
               CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE [] END AS shingles
        FROM t
    )
    SELECT doc_id,
           md5(TRIM(LOWER(text))) AS content_fingerprint,
           COALESCE(list_min(list_transform(shingles, s -> md5('fp|' || s))), '')
               AS shingle_fingerprint
    FROM sh
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content md5 plus a min-shingle-hash
    fingerprint (the winnowing idea: min of uniform hashes over rolling
    3-gram shingles).

    Shaped as explode → codegen'd MIN hash-aggregate, NOT
    array_min(transform(...)) — lambda HOFs run interpreted outside
    whole-stage codegen and measured ~2.5× slower here (the MinHash
    lesson, operators/dedup.py). The content md5 is computed once per
    doc BEFORE the explode and rides the shingle rows into the grouping
    key; map-side partial MIN collapses the exchange to one row per
    doc. explode_outer + min-ignores-nulls keeps short documents
    (< 3 tokens) as '' exactly like the oracle's COALESCE.

    The shingle build + per-shingle md5 all run BEFORE the group-by's
    first exchange, so fan_out rebalances small scans (8.3x at sf0.1:
    4.25 s -> 0.51 s) and the token array is projected once instead of
    re-splitting text at every lambda reference (shingles_from_tokens
    docstring)."""
    from ..operators.dedup import shingles_from_tokens
    from ..sources.parquet_io import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents")).withColumn(
        "_toks", TX.tokens(F.col("text"))
    )
    sh = shingles_from_tokens(F.col("_toks"), 3)
    exploded = docs.select(
        "doc_id",
        TX.fingerprint_md5(F.col("text")).alias("content_fingerprint"),
        F.explode_outer(sh).alias("s"),
    )
    return (
        exploded.groupBy("doc_id", "content_fingerprint")
        .agg(
            F.coalesce(
                F.min(F.md5(F.concat(F.lit("fp|"), F.col("s")))), F.lit("")
            ).alias("shingle_fingerprint")
        )
        .select("doc_id", "content_fingerprint", "shingle_fingerprint")
        .orderBy("doc_id")
    )


# DuckDB twin of the winnowing gram hash (operators/text.py:winnow_doc):
# polynomial over codepoints mod 2^64 — HUGEINT products/sums are exact,
# one final % 2^64 equals numpy's uint64 wraparound, ord() == Python
# codepoints, and MIN compares the same uint64 values. Base/k/w come
# from operators.text (single source of truth) so a parameter change
# cannot silently fork the oracle; cross-engine equality of the hash
# itself is pinned in tests/test_winnowing.py.
_WINNOW_P64 = 2 ** 64
_WINNOW_GRAM_HASH_SQL = "(" + " + ".join(
    f"CAST(ord(substr(text, i + {j}, 1)) AS HUGEINT)"
    f" * {pow(TX.WINNOW_BASE, TX.WINNOW_K - 1 - j, _WINNOW_P64)}"
    for j in range(TX.WINNOW_K)
) + f") % {_WINNOW_P64}"

_WINNOW_GRAMS_CTE = f"""
    grams AS (
        SELECT doc_id AS doc, i AS pos, {_WINNOW_GRAM_HASH_SQL} AS h
        FROM documents,
             UNNEST(generate_series(1, length(text) - {TX.WINNOW_K - 1})) AS u(i)
        WHERE length(text) >= {TX.WINNOW_K}
    )
"""
_WINNOW_WIN_SQL = (
    f"ROWS BETWEEN CURRENT ROW AND {TX.WINNOW_W - 1} FOLLOWING"
)


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH {_WINNOW_GRAMS_CTE}
    SELECT DISTINCT doc,
           CAST(MIN(h) OVER (PARTITION BY doc ORDER BY pos
                             {_WINNOW_WIN_SQL})
                AS VARCHAR) AS fingerprint
    FROM grams
    ORDER BY doc, fingerprint
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed k-gram (rolling-hash) fingerprints, MOSS-style: k=8 char
    grams, min hash per window of 5 consecutive gram hashes, distinct per
    doc. Robust near-dup fingerprints with guaranteed match coverage.
    r6: the gram hash is the vectorized codepoint polynomial mod 2^64
    (decimal-string fingerprints), replacing per-position md5."""
    from ..operators.text import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, "text", "doc_id").orderBy("doc", "fingerprint")


STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")
# the [a-zA-Z] class as an explicit char set for translate()-based
# counting (see _gate_frame's n_alpha)
_ASCII_ALPHA = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

GATE_MIN_TOKENS = 10
GATE_MAX_TOKENS = 2000
GATE_MIN_MEAN_LEN = 3.0   # chars per token, inclusive
GATE_MAX_MEAN_LEN = 15.0
GATE_MIN_STOPWORD = 0.02
GATE_MIN_ALPHA = 0.6
GATE_MAX_DUP_BG = 0.10

# gate-rule CTE chain carrying (doc_id, source, text) through so both
# the gate oracle and the funnel oracle share one rule definition
_GATE_SQL_CTE = f"""
    t AS (
        SELECT doc_id, source, text,
               LENGTH(text) AS n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, source, text, n_chars, n_tokens,
               CASE WHEN n_tokens >= 2 THEN len(list_distinct(
                   list_transform(generate_series(1, n_tokens - 1),
                                  i -> toks[i] || ' ' || toks[i + 1])))
                    ELSE 0 END AS n_distinct_bg,
               n_tokens - 1 AS n_bg,
               len(list_filter(toks, w -> w IN ({_SW_SQL}))) AS n_sw,
               len(regexp_extract_all(text, '[a-zA-Z]')) AS n_alpha
        FROM t
    ),
    f AS (
        SELECT doc_id, source, text, n_tokens,
               (n_tokens BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS}) AS len_ok,
               CASE WHEN n_tokens > 0 THEN
                   FLOOR(CAST(n_chars AS DOUBLE) / n_tokens * 1000000 + 0.5) / 1000000
                       BETWEEN {GATE_MIN_MEAN_LEN} AND {GATE_MAX_MEAN_LEN}
               ELSE FALSE END AS mean_len_ok,
               CASE WHEN n_tokens > 0 THEN
                   FLOOR(CAST(n_sw AS DOUBLE) / n_tokens * 1000000 + 0.5) / 1000000
                       >= {GATE_MIN_STOPWORD}
               ELSE FALSE END AS stopword_ok,
               CASE WHEN n_chars > 0 THEN
                   FLOOR(CAST(n_alpha AS DOUBLE) / n_chars * 1000000 + 0.5) / 1000000
                       >= {GATE_MIN_ALPHA}
               ELSE FALSE END AS alpha_ok,
               CASE WHEN n_bg > 0 THEN
                   FLOOR((1.0e0 - CAST(n_distinct_bg AS DOUBLE) / n_bg) * 1000000 + 0.5)
                       / 1000000 <= {GATE_MAX_DUP_BG}
               ELSE TRUE END AS rep_ok
        FROM s
    ),
    gated AS (
        SELECT doc_id, source, text, n_tokens,
               len_ok, mean_len_ok, stopword_ok, alpha_ok, rep_ok,
               (len_ok AND mean_len_ok AND stopword_ok AND alpha_ok AND rep_ok)
                   AS keep
        FROM f
    )
"""

TEXT_QUALITY_GATE_ORACLE = f"""
    WITH {_GATE_SQL_CTE}
    SELECT doc_id, n_tokens, len_ok, mean_len_ok, stopword_ok, alpha_ok, rep_ok,
           keep
    FROM gated
    ORDER BY doc_id
    """


@query(
    "text_quality_signals",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks, LENGTH(text) AS n_chars
        FROM documents
    )
    SELECT doc_id,
           n_chars,
           len(toks) AS n_tokens,
           FLOOR(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
                 / n_chars * 1000000 + 0.5) / 1000000 AS punct_ratio,
           FLOOR(CAST(len(list_filter(toks, w -> w IN ({_SW_SQL}))) AS DOUBLE)
                 / len(toks) * 1000000 + 0.5) / 1000000 AS stopword_ratio,
           FLOOR(CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE)
                 / n_chars * 1000000 + 0.5) / 1000000 AS alpha_ratio
    FROM t
    WHERE n_chars > 0
    ORDER BY doc_id
    """,
)
def text_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals of a pre-training filter: punctuation
    density, stopword ratio (natural-language-ness), alphabetic ratio.
    All regexp/array built-ins - the classifier thresholding these runs
    as a plain filter downstream."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = TX.tokens(F.col("text"))
    n_chars = F.length("text").cast("double")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        round6(F.regexp_count(F.col("text"), F.lit("[^a-zA-Z0-9 ]")) / n_chars)
            .alias("punct_ratio"),
        round6(F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
               / F.size(toks).cast("double")).alias("stopword_ratio"),
        round6(F.regexp_count(F.col("text"), F.lit("[a-zA-Z]")) / n_chars)
            .alias("alpha_ratio"),
    ).orderBy("doc_id")


_REP_TOP_BG = 0.06  # flag if top bigram >= 6% of all bigrams
_REP_DUP_BG = 0.10  # flag if >= 10% of bigram occurrences are repeats


@query(
    "text_repetition_signals",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (
        SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
        FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 2
    ),
    cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
    agg AS (
        SELECT doc_id, MAX(c) AS top_bigram_cnt, SUM(c) AS n_bigrams,
               COUNT(*) AS n_distinct
        FROM cnt GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
           FLOOR(CAST(top_bigram_cnt AS DOUBLE) / n_bigrams * 1000000 + 0.5)
               / 1000000 AS top_bigram_ratio,
           FLOOR((1 - CAST(n_distinct AS DOUBLE) / n_bigrams) * 1000000 + 0.5)
               / 1000000 AS dup_bigram_frac,
           (FLOOR(CAST(top_bigram_cnt AS DOUBLE) / n_bigrams * 1000000 + 0.5)
               / 1000000 >= {_REP_TOP_BG}
            OR FLOOR((1 - CAST(n_distinct AS DOUBLE) / n_bigrams) * 1000000 + 0.5)
               / 1000000 >= {_REP_DUP_BG}) AS is_repetitive
    FROM agg
    ORDER BY doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals: the fraction of bigram
    occurrences taken by the single most frequent bigram, and the
    fraction that are repeats of an earlier bigram (1 − distinct/total)
    — the two cheapest detectors of looping/boilerplate generation junk
    (Rae et al. 2021 §A1.3's top-n-gram and duplicate-n-gram rules,
    re-expressed over whitespace bigrams).

    Scale shape: one explode of bigram rows, then two hash aggregates
    whose keys BOTH include doc_id — (doc_id, bg) counts, then doc_id
    rollup of max/sum/count — so parallelism is per-document at any
    corpus size and map-side partial aggregation collapses the exchange
    to one row per distinct (doc, bigram). Same explode-not-HOF choice
    as text_fingerprint (lambda HOFs run interpreted outside codegen).
    Documents with < 2 tokens emit no bigrams and drop out on both
    engines (inner explode, matching the oracle's WHERE len >= 2).
    Thresholds are config; fixed here so the flag is non-vacuous on the
    fixture (82 of 500 docs flag at sf0.01). The token array is
    projected once (split re-parses text at every lambda reference
    otherwise) and fan_out rebalances small scans before the
    pre-exchange bigram build."""
    from ..sources.parquet_io import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents")).withColumn(
        "_toks", TX.tokens(F.col("text"))
    )
    toks = F.col("_toks")
    bigrams = F.transform(
        F.slice(toks, 1, F.size(toks) - 1),
        lambda w, i: F.concat(w, F.lit(" "), F.element_at(toks, i + 2)),
    )
    exploded = docs.filter(F.size(toks) >= 2).select(
        "doc_id", F.explode(bigrams).alias("bg")
    )
    per_doc = (
        exploded.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_bigram_cnt"),
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    top_ratio = round6(
        F.col("top_bigram_cnt").cast("double") / F.col("n_bigrams")
    )
    dup_frac = round6(
        1 - F.col("n_distinct").cast("double") / F.col("n_bigrams")
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_cnt",
        top_ratio.alias("top_bigram_ratio"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_ratio >= _REP_TOP_BG) | (dup_frac >= _REP_DUP_BG)).alias("is_repetitive"),
    ).orderBy("doc_id")


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 < 2
                       THEN ' contact user' || doc_id || '@mail.example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 2 = 0
                       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS raw
        FROM documents
    ),
    s AS (
        SELECT doc_id, raw,
               regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
        FROM t
    )
    SELECT doc_id,
           len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phones,
           LENGTH(raw) - LENGTH(scrubbed) AS n_chars_redacted,
           md5(scrubbed) AS scrubbed_md5
    FROM s
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: replace email addresses and phone-shaped digit
    runs with typed placeholder tags, reporting per-document match
    counts and the redaction's character delta — the scrub every
    pre-training corpus runs before tokenization.

    Scale shape: pure regexp built-ins, fully map-side/narrow — at
    100 TB the scrub costs exactly one scan plus the write, zero
    shuffle (the ORDER BY here exists only for the driver compare).

    The fixture corpus contains no natural PII, so both engines inject
    the SAME deterministic synthetic PII derived from doc_id (an email
    for doc_id % 3 < 2, a phone for even doc_id) before scrubbing —
    counts vary 0..1 per type, so the evidence covers redacted AND
    untouched documents, and the md5 of the scrubbed text pins the
    replacement extents cross-engine on 500 distinct strings. The
    regexes are restricted to the RE2 ∩ java.util.regex common subset
    (no backrefs/lookaround), so both engines match identically."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 < 2,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                     F.lit("@mail.example.com")),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" call 555-"),
                     F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(""),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        (F.length(raw) - F.length(scrubbed)).cast("long").alias("n_chars_redacted"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_quality_gate: C4/Gopher-style composite keep/drop filter.
# Registered r7 (the round's one free rotation slot, r6 VERDICT item 2)
# after a round queued with local-only oracle parity.
# ---------------------------------------------------------------------------

# oracle: TEXT_QUALITY_GATE_ORACLE, defined next to _SW_SQL above
# (GATE_* thresholds live beside STOPWORDS so the oracle f-string can
# reference them)


def _gate_frame(docs: DataFrame) -> DataFrame:
    """The quality-gate rule frame shared by text_quality_gate and
    pipeline_training_funnel: (doc_id, source, text, n_tokens, five
    rule booleans, keep) — entirely narrow expressions over one
    projected token array; consumers project what they need and
    Catalyst prunes the rest (the registered gate's plan carries no
    source/text columns)."""
    # r17 (guide §1.2/§2.3, the shingles_from_tokens lesson): project
    # the token array ONCE and derive every token signal from it — the
    # previous shape re-split the text inside n_tokens, the bigram
    # builder (three references), n_bg and the stopword filter, and the
    # registered gate's ORDER BY range-sampling pass ran the whole
    # stack a second time. Measured 0.53 s vs 0.63 s at sf0.1. An Arrow
    # one-pass kernel for the three token signals was also measured and
    # REJECTED (0.68-0.76 s — boundary cost exceeds the interpreted HOF
    # walks it saves at this signal mix; OPTIMIZATION_r17.md).
    toks = F.col("_toks")
    t = docs.select(
        "doc_id",
        "source",
        "text",
        F.length("text").alias("n_chars"),
        TX.tokens(F.col("text")).alias("_toks"),
        # count of [a-zA-Z] chars via translate-then-length: identical
        # integer to regexp_count(text, '[a-zA-Z]') (single-char class,
        # non-overlapping) without running the regex engine per char
        # (r16 — measured ~35% cheaper on the fixture corpus; the
        # DuckDB twin keeps its regexp formulation, values equal)
        (
            F.length("text")
            - F.length(F.translate(F.col("text"), _ASCII_ALPHA, ""))
        ).cast("int").alias("n_alpha"),
    ).select(
        "doc_id",
        "source",
        "text",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(_bigrams(toks))).alias("n_distinct_bg"),
        (F.size(toks) - 1).alias("n_bg"),
        TX.marker_hits_from_tokens(toks, STOPWORDS).alias("n_sw"),
        "n_alpha",
    )
    nt = F.col("n_tokens")
    len_ok = (nt >= GATE_MIN_TOKENS) & (nt <= GATE_MAX_TOKENS)
    mean_len = round6(F.col("n_chars") / nt.cast("double"))
    mean_len_ok = F.when(
        nt > 0, (mean_len >= GATE_MIN_MEAN_LEN) & (mean_len <= GATE_MAX_MEAN_LEN)
    ).otherwise(F.lit(False))
    sw_ok = F.when(
        nt > 0, round6(F.col("n_sw") / nt.cast("double")) >= GATE_MIN_STOPWORD
    ).otherwise(F.lit(False))
    alpha_ok = F.when(
        F.col("n_chars") > 0,
        round6(F.col("n_alpha") / F.col("n_chars").cast("double")) >= GATE_MIN_ALPHA,
    ).otherwise(F.lit(False))
    rep_ok = F.when(
        F.col("n_bg") > 0,
        round6(F.lit(1.0) - F.col("n_distinct_bg") / F.col("n_bg").cast("double"))
        <= GATE_MAX_DUP_BG,
    ).otherwise(F.lit(True))
    return t.select(
        "doc_id",
        "source",
        "text",
        "n_tokens",
        len_ok.alias("len_ok"),
        mean_len_ok.alias("mean_len_ok"),
        sw_ok.alias("stopword_ok"),
        alpha_ok.alias("alpha_ok"),
        rep_ok.alias("rep_ok"),
        (len_ok & mean_len_ok & sw_ok & alpha_ok & rep_ok).alias("keep"),
    )


@query("text_quality_gate", oracle=TEXT_QUALITY_GATE_ORACLE)
def text_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pre-training quality filter (C4's length/sentence
    heuristics + Gopher's repetition and symbol rules, re-expressed
    over the fixture signals): per document, boolean rules (thresholds
    are the GATE_* module constants) —

      len_ok       GATE_MIN_TOKENS ≤ n_tokens ≤ GATE_MAX_TOKENS
      mean_len_ok  mean chars/token in [GATE_MIN_MEAN_LEN,
                   GATE_MAX_MEAN_LEN] (junk/binary detector)
      stopword_ok  stopword ratio ≥ GATE_MIN_STOPWORD (language-ness)
      alpha_ok     alphabetic char ratio ≥ GATE_MIN_ALPHA
      rep_ok       duplicate-bigram fraction ≤ GATE_MAX_DUP_BG

    and keep = AND of all five (rule expressions in _gate_frame, shared
    with pipeline_training_funnel). ENTIRELY narrow: every signal is an
    array/regexp expression over the one projected token array —
    including the repetition rule, which uses 1 −
    distinct/total bigrams via array_distinct instead of the grouped
    top-bigram variant (text_repetition_signals) precisely so the gate
    adds ZERO shuffles: at 100 TB this is a map-only scan you bolt
    onto ingestion. All ratio comparisons happen on 6dp-rounded
    doubles so the booleans are engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return _gate_frame(docs).select(
        "doc_id",
        "n_tokens",
        "len_ok",
        "mean_len_ok",
        "stopword_ok",
        "alpha_ok",
        "rep_ok",
        "keep",
    ).orderBy("doc_id")


def _bigrams(toks):
    """whitespace-bigram array: zip_with over two shifted slices."""
    n = F.size(toks)
    return F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )).otherwise(F.array().cast("array<string>"))


BM25_TERMS = ("data", "query", "fast")  # fixture-vocabulary query terms
BM25_K1 = 1.5
BM25_B = 0.75
BM25_TOP = 20

# fully-parenthesized scoring expression, mirrored token-for-token in
# the SQL twin; constants are exact binary fractions written as DOUBLE
# literals (e-notation in DuckDB) so no decimal-literal arithmetic
# sneaks in. idf is the RATIONAL form (N - df + 0.5)/(df + 0.5) — no
# ln(): transcendentals are not correctly-rounded and could differ
# between engines in the last ulp; +,*,/ are IEEE-exact on identical
# inputs, so the whole score is bit-reproducible.
_BM25_SQL = " + ".join(
    f"((((n - df_{t}) + 0.5e0) / (df_{t} + 0.5e0))"
    f" * (tf_{t} * 2.5e0)"
    f" / (tf_{t} + 1.5e0 * (0.25e0 + 0.75e0 * (dl / avgdl))))"
    for t in BM25_TERMS
)


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split(LOWER(text), ' ')) AS dl,
               {", ".join(
                   f"len(list_filter(string_split(LOWER(text), ' '), "
                   f"w -> w = '{t}')) AS tf_{t}" for t in BM25_TERMS)}
        FROM documents
    ),
    s AS (
        SELECT COUNT(*) AS n,
               (CAST(SUM(dl) AS DOUBLE) / COUNT(*)) AS avgdl,
               {", ".join(
                   f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                   for t in BM25_TERMS)}
        FROM t
    )
    SELECT doc_id, {", ".join(f"CAST(tf_{t} AS INT) AS tf_{t}" for t in BM25_TERMS)},
           FLOOR(({_BM25_SQL}) * 1000000 + 0.5) / 1000000 AS bm25
    FROM t, s
    WHERE {" + ".join(f"tf_{t}" for t in BM25_TERMS)} > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring over the corpus for a fixed query
    (BM25_TERMS: data, query, fast) — the lexical-retrieval family
    (r6). The scale shape is deliberately NOT the textbook
    explode→posting-list→join: per-document term frequencies come from
    array filters on the ONE projected token array (narrow, zero
    shuffle), corpus statistics (N, avgdl, per-term document
    frequencies) fold into a single broadcast row, scoring is pure
    arithmetic, and the top-20 cut is a TakeOrderedAndProject. Two
    passes over the corpus (stats, then score) are the only cost — at
    100 TB that is two narrow scans and one 1-row exchange, vs the
    explode shape's full token-table shuffle. Rational idf keeps every
    float op IEEE-exact cross-engine (see _BM25_SQL comment);
    deterministic tiebreak on doc_id."""
    from ..sources.parquet_io import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split(F.lower(F.col("text")), " ")

    def tf_col(term: str):
        # NB: a 2-arg lambda would be called as (element, index) by
        # F.filter — bind the term via closure, single-arg lambda only
        return F.size(F.filter(toks, lambda w: w == F.lit(term))).alias(f"tf_{term}")

    t = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf_col(term) for term in BM25_TERMS],
    )
    s = t.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    score = None
    for term in BM25_TERMS:
        tf, df = F.col(f"tf_{term}"), F.col(f"df_{term}")
        part = (
            (((F.col("n") - df) + F.lit(0.5)) / (df + F.lit(0.5)))
            * (tf * F.lit(2.5))
            / (tf + F.lit(1.5) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))))
        )
        score = part if score is None else score + part
    any_tf = None
    for term in BM25_TERMS:
        any_tf = F.col(f"tf_{term}") if any_tf is None else any_tf + F.col(f"tf_{term}")
    return (
        t.crossJoin(F.broadcast(s))
        .filter(any_tf > 0)
        .select(
            "doc_id",
            *[F.col(f"tf_{t}").cast("int").alias(f"tf_{t}") for t in BM25_TERMS],
            round6(score).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


def bm25_topk_postings(docs: DataFrame, terms: DataFrame,
                       top: int = BM25_TOP) -> DataFrame:
    """BM25 top-k for an ARBITRARY query-term TABLE — the posting-list
    shape that complements text_bm25_topk's narrow fixed-term shape.
    Choose by |Q|: a handful of terms pivot into per-term columns
    (zero shuffle); a large term set (query expansion, multi-query
    batches) can't, so this shape explodes tokens, SEMI-JOINs the
    broadcast term table immediately (the exchange carries only
    query-term hits — the posting lists — never the full token
    stream; plan-pinned in tests/test_plan_shapes.py), aggregates
    per-(doc, term) tf, attaches per-term df as a window count over
    the SAME tf subtree (one corpus explode total — see the inline
    comment) and the 1-row corpus stats by broadcast, and sums
    per-doc scores.

    Same rational-idf per-term score as text_bm25_topk (IEEE-exact
    cross-engine on identical int inputs), but the per-doc sum runs
    over MICRO-INTEGER scores: each term part is rounded once to
    integer micro-units (floor(s·10⁶ + ½) — exact, engines agree
    bit-for-bit), and longs sum associatively, so the total is
    partition-order-independent and hash-exact against the DuckDB twin
    — float summation order was the one nondeterminism that kept this
    shape tolerance-pinned-only before r7. The registered
    ``bm25_topk_postings`` query runs this over a fixed 10-term table;
    cross-shape tolerance vs text_bm25_topk stays pinned in
    tests/test_text_semantics.py (micro-rounding perturbs each 3-term
    score by < 1.5e-6)."""
    from pyspark.sql import Window

    toks = F.split(F.lower(F.col("text")), " ")
    # project the token array ONCE, then explode/size the column: a
    # single select with explode(toks) + size(toks) evaluates the split
    # twice per row (the generator input and the projection are
    # separate expression trees, outside common-subexpression reach)
    t = docs.select("doc_id", toks.alias("_toks")).select(
        "doc_id", F.explode("_toks").alias("term"),
        F.size("_toks").alias("dl"),
    )
    # distinct: a real query-expansion term table carries duplicates,
    # and a dup term row would double every hit row -> inflated tf
    hits = t.join(F.broadcast(terms.select("term").distinct()), "term")
    tf = hits.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    # per-term document frequency as a WINDOW over tf (rows are distinct
    # (doc, term), so COUNT(*) per term IS df) — NOT a groupBy(term) +
    # join back: tf is not materialized, so a second consumer re-plans
    # the whole explode subtree and the corpus gets tokenized TWICE
    # (observed in the r7 plan before this shape); the window keeps one
    # lineage — a single explode — at the cost of one tf-sized exchange
    # on term, which the posting list needs anyway
    tf_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    scored = (
        tf_df.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                (
                    (((F.col("n") - F.col("df")) + F.lit(0.5))
                     / (F.col("df") + F.lit(0.5)))
                    * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                    / (F.col("tf") + F.lit(BM25_K1)
                       * (F.lit(1.0 - BM25_B)
                          + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))))
                ) * F.lit(1000000.0) + F.lit(0.5)
            ).alias("micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("micro").alias("micro_sum"),
        )
        .select(
            "doc_id",
            "n_terms_hit",
            (F.col("micro_sum").cast("double") / F.lit(1000000.0)).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(top)
    )


# The registered posting-shape query's fixed term table: ten distinct
# corpus-vocabulary terms spanning the df range (including the rare
# 'dup' so idf variance is non-trivial) plus a deliberate duplicate —
# a real query-expansion table carries dups, and the operator's
# distinct guard (and the oracle's) must absorb them.
BM25_POSTING_TERMS = (
    "join", "hash", "scan", "filter", "merge",
    "vector", "stream", "window", "sort", "dup", "join",
)

_POSTING_VALUES = ", ".join(f"('{t}')" for t in BM25_POSTING_TERMS)


@query(
    "bm25_topk_postings",
    oracle=f"""
    WITH q(term) AS (VALUES {_POSTING_VALUES}),
    qd AS (SELECT DISTINCT term FROM q),
    tok AS (
        SELECT doc_id, len(string_split(LOWER(text), ' ')) AS dl,
               unnest(string_split(LOWER(text), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT t.doc_id, t.term, COUNT(*) AS tf, MIN(t.dl) AS dl
        FROM tok t JOIN qd USING (term)
        GROUP BY t.doc_id, t.term
    ),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    st AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(len(string_split(LOWER(text), ' '))) AS DOUBLE)
                   / COUNT(*) AS avgdl
        FROM documents
    ),
    sc AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                   (((st.n - dft.df) + 0.5e0) / (dft.df + 0.5e0))
                   * (tf.tf * 2.5e0)
                   / (tf.tf + 1.5e0 * (0.25e0 + 0.75e0 * (tf.dl / st.avgdl)))
                   * 1000000 + 0.5e0) AS BIGINT) AS micro
        FROM tf JOIN dft USING (term), st
    )
    SELECT doc_id, COUNT(*) AS n_terms_hit,
           CAST(SUM(micro) AS DOUBLE) / 1000000 AS bm25
    FROM sc
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def bm25_topk_postings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing run of the posting-list BM25 shape (r6 VERDICT
    item 4): the BM25 plan that actually shuffles — explode → immediate
    broadcast semi-join (only query-term hits ride the exchange) →
    per-(doc, term) tf agg → broadcast df/stats → exact micro-integer
    per-doc sum → top-k. Fixed 10-term query table (BM25_POSTING_TERMS,
    duplicate included on purpose); the DuckDB twin scores the same
    VALUES term table through the same rational-idf micro arithmetic,
    so the compare is hash-exact, not tolerance-based."""
    from ..sources.parquet_io import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    terms = spark.createDataFrame(
        [(t,) for t in BM25_POSTING_TERMS], "term string"
    )
    return bm25_topk_postings(docs, terms)


@query(
    "decon_test_train_overlap",
    oracle=f"""
    WITH {_WINNOW_GRAMS_CTE},
    fp AS (
        SELECT DISTINCT doc,
               MIN(h) OVER (PARTITION BY doc ORDER BY pos
                            {_WINNOW_WIN_SQL}) AS fingerprint
        FROM grams
    )
    SELECT t.doc AS test_doc,
           COUNT(DISTINCT tr.doc) AS n_train_docs,
           COUNT(DISTINCT t.fingerprint) AS n_shared_fingerprints
    FROM fp t JOIN fp tr ON t.fingerprint = tr.fingerprint
    WHERE t.doc < 250 AND tr.doc >= 250
    GROUP BY t.doc
    ORDER BY test_doc
    """,
)
def decon_test_train_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which held-out ('test', doc_id<250)
    documents share winnowed 8-gram fingerprints with the training
    corpus (doc_id>=250), how many training docs each collides with,
    and on how many distinct fingerprints — the report a pre-training
    pipeline runs before shipping an eval set. Join is fingerprint ⋈
    fingerprint (short uint64-decimal strings), never text ⋈ text; at 100 TB the
    fingerprint tables are the only shuffled data and the train side is
    reusable across every eval set checked."""
    from ..operators.text import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fp = winnowing_fingerprints(docs, "text", "doc_id")
    test = fp.filter(F.col("doc") < 250).select(
        F.col("doc").alias("test_doc"), "fingerprint"
    )
    train = fp.filter(F.col("doc") >= 250).select(
        F.col("doc").alias("train_doc"), "fingerprint"
    )
    return (
        test.join(train, "fingerprint")
        .groupBy("test_doc")
        .agg(
            F.countDistinct("train_doc").alias("n_train_docs"),
            F.countDistinct("fingerprint").alias("n_shared_fingerprints"),
        )
        .orderBy("test_doc")
    )


# ---------------------------------------------------------------------------
# pipeline_training_funnel: end-to-end composition of the training-data
# surface — quality gate -> near-dup dedup -> context-window accounting.
# Registered r8 (paid for by the setop_except retirement — COVERAGE.md
# rotation-budget section; locally oracled since r7).
# ---------------------------------------------------------------------------

FUNNEL_CONTEXT_LEN = 512  # tokens per training context window

# the corpus-wide LSH candidate-pair CTE the dedup family publishes —
# imported so the funnel's edges are IDENTICAL (same bands, same
# bucket caps) to dedup_minhash_lsh_pairs' on both engines
from .dedup_queries import _CANDIDATES_CTE  # noqa: E402

PIPELINE_TRAINING_FUNNEL_ORACLE = f"""
    WITH RECURSIVE {_CANDIDATES_CTE},
    {_GATE_SQL_CTE},
    ge AS (SELECT doc_id, source, n_tokens FROM gated WHERE keep),
    ed AS (
        SELECT p.doc_a AS a, p.doc_b AS b
        FROM pairs p
        JOIN ge g1 ON g1.doc_id = p.doc_a
        JOIN ge g2 ON g2.doc_id = p.doc_b
    ),
    sym AS (
        SELECT a, b FROM ed
        UNION
        SELECT b AS a, a AS b FROM ed
    ),
    reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a
    ),
    non_reps AS (SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a),
    kept AS (
        SELECT * FROM ge
        WHERE doc_id NOT IN (SELECT doc_id FROM non_reps)
    ),
    agg_raw AS (
        SELECT source, COUNT(*) AS n_raw,
               SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_gated
        FROM gated GROUP BY source
    ),
    agg_kept AS (
        SELECT source, COUNT(*) AS n_kept,
               CAST(SUM(n_tokens) AS BIGINT) AS tok
        FROM kept GROUP BY source
    )
    SELECT agg_raw.source,
           CAST(agg_raw.n_raw AS BIGINT) AS n_raw,
           CAST(agg_raw.n_gated AS BIGINT) AS n_gated,
           CAST(COALESCE(agg_kept.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(agg_kept.tok, 0) AS BIGINT) AS n_tokens,
           (COALESCE(agg_kept.tok, 0) + {FUNNEL_CONTEXT_LEN - 1})
               // {FUNNEL_CONTEXT_LEN} AS n_windows
    FROM agg_raw LEFT JOIN agg_kept USING (source)
    ORDER BY agg_raw.source
    """


# Session-scoped cache of the funnel's persisted 4-column gate frame
# (r17, VERDICT r16 item 6): the r16 funnel persisted a fresh gate
# frame per invocation and never unpersisted it — a cache-entry leak in
# any long-lived session (the CacheManager would silently serve the
# first invocation's frame to later plan-identical invocations, so the
# leak was also an undisclosed cross-invocation reuse). Keyed and
# evicted exactly like dedup_queries._SHARED_BANDS (the pattern the
# r16 ADVICE prescribes): at most _GATE_CACHE_MAX persisted gate
# frames per session, oldest unpersisted on eviction, all dropped with
# the JVM. Values are deterministic, so reuse is value-invisible.
_SHARED_GATES: dict[tuple[str, str], DataFrame] = {}
_GATE_CACHE_MAX = 4


def _shared_gate_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    g = _SHARED_GATES.get(key)
    if g is None:
        while len(_SHARED_GATES) >= _GATE_CACHE_MAX:
            _SHARED_GATES.pop(next(iter(_SHARED_GATES))).unpersist()
        docs = load_table(spark, sf_dir, "documents")
        g = _gate_frame(docs).select(
            "doc_id", "source", "n_tokens", "keep"
        ).persist()
        _SHARED_GATES[key] = g
    return g


@query("pipeline_training_funnel", oracle=PIPELINE_TRAINING_FUNNEL_ORACLE)
def pipeline_training_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end TRAINING-CORPUS FUNNEL, per source: raw documents
    -> C4/Gopher quality gate (the _gate_frame rules text_quality_gate
    registers) -> NEAR-dup dedup among the gated survivors (the
    corpus-wide MinHash-LSH candidate pairs the dedup family publishes,
    restricted to edges whose BOTH endpoints survived the gate, then
    connected components via the kernel-escalating auto operator;
    representative = component-minimum doc_id — exact content dedup
    would be vacuous here: the fixture corpus carries zero byte-equal
    duplicates, only near-dups) -> token totals and the number of
    FUNNEL_CONTEXT_LEN (512)-token context windows each source fills
    when packed separately (exact integer ceil-division). One row per
    source: n_raw, n_gated, n_kept, n_tokens, n_windows — the report a
    data team reads before every training run, and the composition
    evidence that the gate, LSH, component, and packing operators
    agree on one corpus.

    Contract note: edges are computed corpus-wide (identical bucket
    caps to dedup_minhash_lsh_pairs) and THEN restricted to the
    gated-induced subgraph — a chain through a gate-dropped document
    splits into separate clusters, on both engines alike (the
    recursive-CTE oracle computes the same induced-subgraph fixpoint).

    Scale shape: the gate is the narrow map-only frame; the edge
    restriction is two keys-only semi-joins; components run on the
    (small) candidate-pair set; the final stages are two
    group-count-sized aggregates meeting in a tiny per-source join. No
    stage shuffles document text."""
    from ..operators.graph import connected_components_auto
    from .dedup_queries import shared_minhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    # the gate frame feeds FOUR subtrees (both semi-join key sets, the
    # per-source raw/gated counts, and the kept-side aggregate); persist
    # the narrow 4-column projection so the tokenize/regex rule stack
    # runs once per funnel, not once per consumer (r16, guide §2.4 —
    # profile showed the gate re-executing in every branch). Node-sized:
    # (doc_id, source, n_tokens, keep) — text never enters the cache.
    # r17 (VERDICT r16 item 6 / ADVICE): the persist is now registered
    # in the session-scoped keyed cache below — the r16 version leaked
    # one cached frame per invocation for the session's lifetime.
    g = _shared_gate_frame(spark, sf_dir)
    ge = g.filter(F.col("keep")).select("doc_id", "source", "n_tokens")
    pairs = shared_minhash_pairs(spark, sf_dir)
    ga = ge.select(F.col("doc_id").alias("doc_a"))
    gb = ge.select(F.col("doc_id").alias("doc_b"))
    ed = (
        pairs.join(ga, "doc_a", "left_semi")
        .join(gb, "doc_b", "left_semi")
    )
    non_reps = (
        connected_components_auto(
            ed, "doc_a", "doc_b",
            num_partitions=adaptive_partitions(docs),
        )
        .filter(F.col("v") != F.col("component_id"))
        .select(F.col("v").alias("doc_id"))
    )
    kept = ge.join(non_reps, "doc_id", "left_anti")
    a = g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("keep").cast("long")).alias("n_gated"),
    )
    b = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tok"),
    )
    return (
        a.join(b, "source", "left")
        .select(
            "source",
            F.col("n_raw").cast("long").alias("n_raw"),
            F.col("n_gated").cast("long").alias("n_gated"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("tok"), F.lit(0)).cast("long").alias("n_tokens"),
            F.expr(
                f"(coalesce(tok, 0) + {FUNNEL_CONTEXT_LEN - 1})"
                f" DIV {FUNNEL_CONTEXT_LEN}"
            ).alias("n_windows"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text_lm_familiarity: self-trained capped-bigram LM quality scoring.
# UNREGISTERED (r8-implemented; next in the rotation queue behind the r9
# registrations pack_context_windows / emb_label_centroids — registering
# it is one-in-one-out per the COVERAGE.md standing policy). Oracle
# parity runs locally in
# tests/test_oracle_parity.py::test_queued_queries_match.
# ---------------------------------------------------------------------------

# Model capacity: top LM_TOP_K bigrams by corpus count (deterministic
# tiebreak count DESC, w1, w2 — a total order over distinct bigrams, so
# the LIMIT cut is identical cross-engine). The fixture vocabulary is
# ~916 distinct bigrams at every SF, so 512 keeps BOTH the in-model and
# OOV populations non-vacuous (pinned in tests/test_text_semantics.py).
LM_TOP_K = 512
# Score for a bigram outside the model: a flat penalty well below any
# in-model score (the most negative in-model score is
# ilog2(1) - ilog2(max c1) >= 1 - 63 = -62 in theory, but -16 ~ a
# 1-in-65536 conditional — the standard "unknown" floor).
LM_OOV_BITS = -16

TEXT_LM_FAMILIARITY_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pairs AS (
        SELECT doc_id,
               unnest(t[1:len(t)-1]) AS w1,
               unnest(t[2:len(t)]) AS w2
        FROM toks
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2),
    model AS (
        SELECT w1, w2,
               CAST(length(to_base(c2, 2))
                    - length(to_base(CAST(SUM(c2) OVER (PARTITION BY w1)
                                          AS BIGINT), 2))
                    AS INT) AS bits
        FROM cnt
        ORDER BY c2 DESC, w1, w2
        LIMIT {LM_TOP_K}
    ),
    scored AS (
        SELECT p.doc_id,
               COALESCE(m.bits, {LM_OOV_BITS}) AS bits,
               CASE WHEN m.w1 IS NULL THEN 1 ELSE 0 END AS oov
        FROM pairs p
        LEFT JOIN model m ON p.w1 = m.w1 AND p.w2 = m.w2
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams,
               CAST(SUM(oov) AS BIGINT) AS n_oov,
               CAST(SUM(bits) AS BIGINT) AS sum_bits
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           COALESCE(a.n_oov, 0) AS n_oov,
           COALESCE(a.sum_bits, 0) AS sum_bits,
           CASE WHEN a.n_bigrams IS NULL THEN NULL
                ELSE FLOOR(CAST(a.sum_bits AS DOUBLE) / a.n_bigrams
                           * 1000000 + 0.5) / 1000000
           END AS mean_bits
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id
    """


def text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring, self-trained on the corpus: fit a
    capped bigram model (top LM_TOP_K (512) bigrams by count, each carrying an
    integer log2 conditional score ilog2(c(w1,w2)) - ilog2(c(w1)) where
    ilog2(x) = floor(log2 x) + 1 = LENGTH(BIN(x)) — an exact STRING op,
    so the score is integer-exact cross-engine where a float log2 would
    hash-diverge at the FLOOR boundary), then score every document by
    its mean per-bigram score with an LM_OOV_BITS (-16) penalty for bigrams
    outside the model. Low mean_bits ~ high perplexity ~ the documents
    a perplexity filter drops (CCNet / Gopher keep the low-perplexity
    tail; the integer-bits approximation keeps the ORDERING those
    filters need while staying hash-exact).

    Scale shape: fit + score is TWO corpus passes (the same shape as
    training-then-scoring any quality model). Fit: one vocab-sized
    count shuffle; c(w1) rides a window over the SAME count subtree
    (never a second corpus tokenization — the bm25_topk_postings
    lesson); the top-K cut is TakeOrderedAndProject (per-partition
    top-K, merge of K x partitions rows). Score: narrow bigram explode
    -> BROADCAST join against the <= LM_TOP_K-row model (zipfian-hot
    bigrams hit a broadcast hash table, so the skew that would sink a
    shuffled join never ships a byte) -> one doc-keyed aggregate. At
    100 TB the model stays a few KB; only the doc-keyed partial
    aggregate shuffles, and it collapses map-side because documents
    arrive contiguous."""
    from pyspark.sql import Window

    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    pairs_expr = (
        "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
        " (a, b) -> struct(a AS w1, b AS w2))"
    )
    pairs = (
        fan_out(docs)
        .select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .select("doc_id", F.explode(F.expr(pairs_expr)).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cnt = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    model = (
        cnt.withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
        .orderBy(F.col("c2").desc(), "w1", "w2")
        .limit(LM_TOP_K)
        .select(
            "w1", "w2",
            (F.length(F.bin("c2")) - F.length(F.bin("c1")))
            .cast("int").alias("bits"),
        )
    )
    scored = pairs.join(F.broadcast(model), ["w1", "w2"], "left")
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("bits").isNull().cast("long")).alias("n_oov"),
        F.sum(F.coalesce(F.col("bits"), F.lit(LM_OOV_BITS)).cast("long"))
        .alias("sum_bits"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce(F.col("sum_bits"), F.lit(0)).cast("long")
            .alias("sum_bits"),
            F.when(
                F.col("n_bigrams").isNull(), F.lit(None).cast("double")
            ).otherwise(
                round6(F.col("sum_bits").cast("double") / F.col("n_bigrams"))
            ).alias("mean_bits"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_duplicate_spans: cross-document duplicate-span accounting (the
# exact-substring dedup signal of Lee et al., "Deduplicating Training
# Data Makes Language Models Better" — arXiv:2107.06499 — bounded to
# fixed-length token spans so it runs as three hash aggregates instead
# of a suffix array). UNREGISTERED (r8 queue, behind text_lm_familiarity).
# ---------------------------------------------------------------------------

SPAN_K = 8  # tokens per span; spans overlap (stride 1)

TEXT_DUPLICATE_SPANS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    spans AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(t) - {SPAN_K - 2}),
                   i -> array_to_string(t[i:i + {SPAN_K - 1}], ' '))) AS s
        FROM toks
    ),
    occ AS (
        SELECT doc_id, s, COUNT(*) AS n_occ
        FROM spans GROUP BY doc_id, s
    ),
    wd AS (
        SELECT doc_id, n_occ,
               COUNT(*) OVER (PARTITION BY s) AS n_docs
        FROM occ
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(n_occ) AS BIGINT) AS n_spans,
               COUNT(*) AS n_distinct_spans,
               CAST(SUM(CASE WHEN n_docs >= 2 THEN n_occ ELSE 0 END)
                    AS BIGINT) AS n_dup_spans
        FROM wd GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_spans, 0) AS n_spans,
           CAST(COALESCE(a.n_distinct_spans, 0) AS BIGINT)
               AS n_distinct_spans,
           COALESCE(a.n_dup_spans, 0) AS n_dup_spans,
           CASE WHEN a.n_spans IS NULL THEN NULL
                ELSE FLOOR(CAST(a.n_dup_spans AS DOUBLE) / a.n_spans
                           * 1000000 + 0.5) / 1000000
           END AS dup_fraction
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id
    """


def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-span accounting: every overlapping
    SPAN_K (8)-token span, counted across the corpus; a span is DUPLICATED
    when it appears in >= 2 distinct documents. Reports, per document,
    total spans, distinct spans, spans that are cross-document
    duplicates, and the duplicated fraction — the signal behind
    exact-substring dedup (Lee et al. 2021): documents dominated by
    boilerplate shared with other documents score high and get trimmed
    or dropped.

    Scale shape: spans are hashed to int64 (xxhash64) BEFORE any
    exchange, so ~8 B per span rides the shuffles instead of the
    ~50-byte span string (the dedup_ngram_jaccard trick: every output
    is a COUNT or a ratio of counts, so each engine may hash with its
    own function — DuckDB keeps strings — and results agree unless
    xxhash64 collides inside one span-key's tiny row group, P ~ n²/2⁶⁵).
    Three aggregates, in the bm25_topk_postings pattern: (1) the
    (span, doc) occurrence count — one corpus-sized shuffle with
    map-side combine collapsing within-doc repeats; (2) the
    documents-per-span count as a WINDOW over that same subtree (one
    span-keyed exchange of the already-collapsed table, never a
    re-tokenization or a join-back); (3) the doc-keyed rollup. Short
    documents (< SPAN_K tokens) never enter the window — they are
    re-attached by a doc-keyed left join at the end, so there is no
    all-NULL-key window partition to skew stage 2."""
    from pyspark.sql import Window

    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    span_expr = (
        f"transform(sequence(1, size(t) - {SPAN_K - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice(t, i, {SPAN_K}))))"
    )
    spans = (
        fan_out(docs)
        .select("doc_id", F.split(F.col("text"), " ").alias("t"))
        # pre-filter short docs: sequence(1, n) with n < 1 would count
        # DOWN (Spark infers step -1), not produce an empty array
        .filter(F.size("t") >= SPAN_K)
        .select("doc_id", F.explode(F.expr(span_expr)).alias("s"))
    )
    occ = spans.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("n_occ"))
    wd = occ.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("s"))
    )
    agg = wd.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_spans"),
        F.count(F.lit(1)).alias("n_distinct_spans"),
        F.sum(F.when(F.col("n_docs") >= 2, F.col("n_occ")).otherwise(0))
        .alias("n_dup_spans"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("n_distinct_spans"), F.lit(0)).cast("long")
            .alias("n_distinct_spans"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long")
            .alias("n_dup_spans"),
            F.when(
                F.col("n_spans").isNull(), F.lit(None).cast("double")
            ).otherwise(
                round6(F.col("n_dup_spans").cast("double") / F.col("n_spans"))
            ).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_dedup_span_removal: the REWRITE half of exact-substring dedup
# (Lee et al. 2021, arXiv:2107.06499 §4 removes the duplicated spans
# from the training text — text_duplicate_spans above only SCORES
# them). REGISTERED r15 (VERDICT r14 item 6: promoted one-in-one-out,
# slot paid by the count_probe retirement in plans/relational.py —
# this is the named rewrite-half of the Lee-et-al. dedup story, the
# strongest promotion candidate since mart_pareto_concentration).
# ---------------------------------------------------------------------------

TEXT_DEDUP_SPAN_REMOVAL_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    spans AS (
        SELECT doc_id, i,
               array_to_string(t[i:i + {SPAN_K - 1}], ' ') AS s
        FROM toks, UNNEST(generate_series(1, len(t) - {SPAN_K - 1})) AS u(i)
        WHERE len(t) >= {SPAN_K}
    ),
    per_span AS (
        SELECT s, COUNT(DISTINCT doc_id) AS n_docs,
               MIN(doc_id) AS keeper
        FROM spans GROUP BY s
    ),
    removal AS (
        SELECT sp.doc_id, sp.i
        FROM spans sp JOIN per_span ps ON sp.s = ps.s
        WHERE ps.n_docs >= 2 AND sp.doc_id <> ps.keeper
    ),
    dup AS (
        SELECT doc_id, list(DISTINCT i) AS starts
        FROM removal GROUP BY doc_id
    ),
    rebuilt AS (
        SELECT d.doc_id, t,
               list_filter(
                   range(1, len(t) + 1),
                   p -> len(list_filter(
                            COALESCE(dup.starts, []),
                            st -> st <= p AND p <= st + {SPAN_K - 1})) = 0
               ) AS kept
        FROM toks d LEFT JOIN dup ON d.doc_id = dup.doc_id
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(kept) AS BIGINT) AS n_removed,
           CAST(CASE WHEN len(t) = 0 THEN 0
                     ELSE (len(t) - len(kept)) * 1000000 // len(t)
                END AS BIGINT) AS removed_ppm,
           -- COALESCE: a fully-removed doc is the EMPTY string on both
           -- engines (DuckDB's array_to_string([]) yields NULL where
           -- Spark's concat_ws yields '')
           COALESCE(array_to_string(list_transform(kept, p -> t[p]), ' '),
                    '') AS text_rewritten
    FROM rebuilt
    ORDER BY doc_id
    """


@query("text_dedup_span_removal", oracle=TEXT_DEDUP_SPAN_REMOVAL_ORACLE)
def text_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL — the rewrite that follows
    text_duplicate_spans' scoring (Lee et al. 2021: training text loses
    substrings long enough to be memorizable that the corpus already
    contains elsewhere): every overlapping SPAN_K (8)-token span seen
    in >= 2 distinct documents keeps exactly ONE canonical copy (the
    smallest doc_id — deterministic, so the hash compare attests the
    keep-one rule itself) and every other document drops the tokens
    those span occurrences cover. Per document: token count, removed
    count, exact-ppm removal rate, and the REWRITTEN text (so a silent
    off-by-one in span coverage breaks the hash, not just a count).

    Scale shape: spans are hashed to int64 (xxhash64) before any
    exchange (~8 B rides the shuffles — the text_duplicate_spans
    trick; span identity, keeper election, and removal positions all
    key on the hash, so engines agree unless xxhash64 collides within
    one span's doc set, P ~ n²/2⁶⁵). Start positions travel THROUGH
    the (span, doc) aggregate as a collect_list — never a join back
    onto the corpus-sized span stream — so the plan is: one
    (span, doc) combine-collapsed aggregate, one span-keyed window
    (n_docs + keeper over the same collapsed subtree), one doc-keyed
    collect of removal starts, one doc-keyed left join back to
    documents; the rebuild itself is a narrow array-HOF projection
    (filter positions against the bounded per-doc starts array,
    re-join tokens). Documents shorter than SPAN_K tokens never enter
    the span stream and pass through unchanged via the left join.

    Reference parity: beyond-reference (the reference has no text
    surface); completes the flag->rewrite pair the dedup family's
    production story needs."""
    from pyspark.sql import Window

    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    span_hashes = F.expr(
        f"transform(sequence(1, size(t) - {SPAN_K - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice(t, i, {SPAN_K}))))"
    )
    spans = (
        fan_out(docs)
        .select("doc_id", F.split(F.col("text"), " ").alias("t"))
        # pre-filter short docs: sequence(1, n) with n < 1 counts DOWN
        .filter(F.size("t") >= SPAN_K)
        .select("doc_id", F.posexplode(span_hashes).alias("pos", "s"))
        .select("doc_id", (F.col("pos") + 1).alias("i"), "s")
    )
    occ = spans.groupBy("s", "doc_id").agg(
        F.collect_list("i").alias("starts")
    )
    w = Window.partitionBy("s")
    wd = occ.withColumn("n_docs", F.count(F.lit(1)).over(w)).withColumn(
        "keeper", F.min("doc_id").over(w)
    )
    dup_starts = (
        wd.filter((F.col("n_docs") >= 2) & (F.col("doc_id") != F.col("keeper")))
        .select("doc_id", F.explode("starts").alias("i"))
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("dup_starts"))
    )
    t = F.split(F.col("text"), " ")
    starts = F.coalesce(
        F.col("dup_starts"), F.expr("array()").cast("array<int>")
    )
    kept = F.filter(
        F.sequence(F.lit(1), F.size(t)),
        lambda p: ~F.exists(
            starts, lambda st: (st <= p) & (p <= st + F.lit(SPAN_K - 1))
        ),
    )
    return (
        docs.join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            F.size(t).cast("long").alias("n_tokens"),
            (F.size(t) - F.size(kept)).cast("long").alias("n_removed"),
            F.concat_ws(
                " ", F.transform(kept, lambda p: F.element_at(t, p))
            ).alias("text_rewritten"),
        )
        # exact integer ppm: truncating DIV over the already-computed
        # longs (a double division cast back can cross an integer
        # boundary by one correctly-rounded ULP)
        .withColumn(
            "removed_ppm",
            F.expr(
                "CAST(CASE WHEN n_tokens = 0 THEN 0 "
                "ELSE n_removed * 1000000 DIV n_tokens END AS BIGINT)"
            ),
        )
        .select("doc_id", "n_tokens", "n_removed", "removed_ppm",
                "text_rewritten")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_cdc_chunks: content-defined chunking accounting (Muthitacharoen
# et al. SOSP'01, LBFS — the variable-size chunker under rsync-style
# storage dedup, applied to training text for fragment-level duplicate
# discovery). TERMINAL-LOCAL (r15 decision, VERDICT r14 item 6: stays
# local-only BY DESIGN — its cross-engine value is boundary-placement
# attestation, which the LOCALCHECK sweep's identical compare already
# gives it every round at both SFs; the registry's duplicate-fragment
# driver evidence is carried by the registered span-removal /
# duplicate-spans pair, and no strict-subset retiree remains whose
# loss wouldn't cost more §2 surface than this adds).
# ---------------------------------------------------------------------------

# DuckDB twin of the CDC gram hash = the winnowing polynomial (same
# base/k — operators.text is the single source of truth); a cut falls
# AFTER gram start i wherever h % CDC_DIV == 0, excluding a cut flush
# at the text end (it would emit an empty chunk).
TEXT_CDC_CHUNKS_ORACLE = f"""
    WITH grams AS (
        SELECT doc_id, i, length(text) AS n, {_WINNOW_GRAM_HASH_SQL} AS h
        FROM documents,
             UNNEST(generate_series(1, length(text) - {TX.CDC_K - 1})) AS u(i)
        WHERE length(text) >= {TX.CDC_K}
    ),
    cuts AS (
        SELECT doc_id, list_sort(list(i + {TX.CDC_K})) AS cs
        FROM grams
        WHERE h % {TX.CDC_DIV} = 0 AND i + {TX.CDC_K} <= n
        GROUP BY doc_id
    ),
    bounds AS (
        SELECT d.doc_id, d.text,
               list_concat(
                   list_concat([CAST(1 AS BIGINT)], COALESCE(cs, [])),
                   [CAST(length(d.text) + 1 AS BIGINT)]) AS bs
        FROM documents d LEFT JOIN cuts USING (doc_id)
        -- NULL-text symmetry (r14 ADVICE): the Spark side's
        -- cdc_chunks(None) returns [] so a NULL-text doc emits no
        -- rows; without this filter the oracle would keep the doc
        -- with NULL aggregates — a latent cross-engine divergence the
        -- current fixtures never exercise
        WHERE d.text IS NOT NULL
    ),
    chunks AS (
        SELECT doc_id,
               substr(text, CAST(bs[j] AS INT),
                      CAST(bs[j + 1] - bs[j] AS INT)) AS chunk
        FROM bounds, UNNEST(generate_series(1, len(bs) - 1)) AS v(j)
    ),
    occ AS (
        SELECT doc_id, chunk, COUNT(*) AS n_occ
        FROM chunks GROUP BY doc_id, chunk
    ),
    wd AS (
        SELECT doc_id, chunk, n_occ,
               COUNT(*) OVER (PARTITION BY chunk) AS n_docs
        FROM occ
    )
    SELECT doc_id,
           CAST(SUM(n_occ) AS BIGINT) AS n_chunks,
           CAST(SUM(length(chunk) * n_occ) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN n_occ ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN n_occ ELSE 0 END)
                * 1000000 // SUM(n_occ) AS BIGINT) AS dup_chunk_ppm
    FROM wd GROUP BY doc_id
    ORDER BY doc_id
    """


def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + cross-document chunk-dedup
    accounting: each document is cut into variable-size chunks wherever
    the winnowing rolling hash of the preceding CDC_K (8)-char gram is
    0 mod CDC_DIV (32 — the expected chunk length), and a chunk is
    DUPLICATED when its exact text appears in >= 2 distinct documents.
    Because boundaries depend only on local content, an edit re-aligns
    within ~one chunk — the property that makes CDC the storage-dedup
    standard and a fragment-level near-dup signal fixed-size chunking
    (text_chunk_overlap) structurally cannot give: insert one token at
    a document's head and every fixed chunk shifts, while the CDC
    chunks after the first cut are byte-identical (pinned).

    Scale shape: chunking is the winnowing mapInPandas plumbing
    (fan_out raw-text scan, Arrow batches, zero shuffles — chunk
    strings are born in the map stage and hashed to int64 xxhash64
    before any exchange, the text_duplicate_spans trick: every output
    is a count, so each engine may key dup-detection on its own hash
    of the same chunk text). Then the bm25 window-over-subtree
    pattern: one (chunk-hash, doc) combine-collapsed aggregate, the
    documents-per-chunk count as a window over that same collapsed
    table, one doc-keyed rollup. The DuckDB twin recomputes the cut
    positions from the SAME polynomial (HUGEINT + one final mod 2^64),
    so the compare attests boundary placement itself, not just the
    counting."""
    from pyspark.sql import Window

    from ..operators.text import cdc_chunk_frame

    docs = load_table(spark, sf_dir, "documents")
    chunks = cdc_chunk_frame(docs, "text", "doc_id").select(
        F.col("doc").alias("doc_id"),
        F.xxhash64("chunk").alias("h"),
        F.length("chunk").alias("clen"),
    )
    occ = chunks.groupBy("h", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.sum("clen").alias("len_sum"),
    )
    wd = occ.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    return (
        wd.groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_chunks"),
            F.sum("len_sum").cast("long").alias("n_chars"),
            F.sum(F.when(F.col("n_docs") >= 2, F.col("n_occ")).otherwise(0))
            .cast("long").alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_chunk_ppm",
            F.expr("CAST(n_dup_chunks * 1000000 DIV n_chunks AS BIGINT)"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_html_extract: HTML boilerplate/markup extraction (r16, VERDICT
# r15 item 4 — the last big absent LLM-pipeline stage: real pretraining
# corpora start as crawled HTML, and tags→text + nav/footer/script
# stripping is the stage upstream of every gate this file already has).
# UNREGISTERED (local-only per the COVERAGE.md standing policy;
# driver-style evidence via LOCALCHECK + tests/test_oracle_parity.py).
# Follows the JPEG-codec evidence pattern (plans/multimodal_queries.py
# media_jpeg_real_decode): stage 1 SYNTHESIZES a deterministic HTML
# document from each documents row with pure column arithmetic, stage 2
# runs the REAL generic extractor (operators/html.py — regex block
# segmentation, tag stripping, link-density/length signals) on it, and
# the DuckDB oracle predicts the full output — including the extracted
# text itself — from the same slicing arithmetic, so any defect
# anywhere in synthesis → noise-strip → block parse → tag strip →
# signal math → keep rule breaks the hash.
# ---------------------------------------------------------------------------

TEXT_HTML_EXTRACT_ORACLE = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    blocks AS (
        -- ord 0: nav — four linked words, spaces between anchors are
        -- the only non-link chars, so link density always > 1/2
        SELECT doc_id, 0 AS ord,
               ws[(doc_id*7) % n + 1] || ' ' || ws[(doc_id*7+3) % n + 1]
               || ' ' || ws[(doc_id*7+6) % n + 1] || ' '
               || ws[(doc_id*7+9) % n + 1] AS ptext,
               CAST(length(ws[(doc_id*7) % n + 1])
                    + length(ws[(doc_id*7+3) % n + 1])
                    + length(ws[(doc_id*7+6) % n + 1])
                    + length(ws[(doc_id*7+9) % n + 1]) AS BIGINT) AS link_chars
        FROM w
        UNION ALL
        -- ord 1: heading — always under the length floor
        SELECT doc_id, 1, 'doc ' || CAST(doc_id AS VARCHAR),
               CAST(0 AS BIGINT)
        FROM w
        UNION ALL
        -- ord 2..4: paragraphs — L-word slices with one inline anchor
        SELECT doc_id, 2 + k,
               array_to_string(ws[s+1 : s+L], ' '),
               CAST(length(ws[s + r + 1]) AS BIGINT)
        FROM (
            SELECT doc_id, ws, n, k,
                   3 + (doc_id + k) % 5 AS L,
                   (doc_id + k*11) % (n - (3 + (doc_id + k) % 5) + 1) AS s,
                   (doc_id + 3*k) % (3 + (doc_id + k) % 5) AS r
            FROM w, (VALUES (0), (1), (2)) ks(k)
        )
        UNION ALL
        -- ord 5: footer — always under the length floor
        SELECT doc_id, 5, '(c) 2026 about', CAST(5 AS BIGINT) FROM w
    ),
    sig AS (
        SELECT doc_id, ord, ptext,
               CAST(length(ptext) AS BIGINT) AS chars,
               CASE WHEN length(ptext) > 0
                    THEN (link_chars * 1000000) // length(ptext)
                    ELSE 1000000 END AS ppm
        FROM blocks
    ),
    kept AS (
        SELECT *, (chars >= 20 AND ppm <= 500000) AS keep FROM sig
    )
    SELECT doc_id,
           CAST(6 AS INT) AS n_blocks,
           CAST(COUNT(*) FILTER (WHERE keep) AS INT) AS n_kept,
           CAST(COALESCE(SUM(chars) FILTER (WHERE keep), 0) AS BIGINT)
               AS kept_chars,
           CAST(COALESCE(MAX(ppm) FILTER (WHERE keep), 0) AS BIGINT)
               AS max_kept_ppm,
           COALESCE(string_agg(ptext, chr(10) ORDER BY ord)
                        FILTER (WHERE keep), '') AS kept_text
    FROM kept GROUP BY doc_id ORDER BY doc_id
    """


def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup→text boilerplate extraction under driver-style check:
    each documents row synthesizes a deterministic HTML page — a <nav>
    of 4 linked words (positions (7·id + 3j) mod n), an <h1>, three
    <p> blocks (L = 3 + (id+k) mod 5 words starting at (id + 11k) mod
    (n−L+1), one word anchor-wrapped at offset (id + 3k) mod L), a
    mid-document <script> whose body contains both a bare '<' and a
    literal '</p>' string, and a short linked <footer> — then runs the
    REAL generic extractor from operators/html.py over it: noise
    elements stripped wholesale BEFORE block segmentation, block-level
    elements collected in document order, inline tags stripped, and
    the jusText-style two-signal keep rule (>= 20 plain chars, link
    density <= 500000 ppm) applied. By construction the nav always
    fails density, the h1/footer always fail length, and the script
    must vanish without corrupting the block walk, so the kept set is
    exactly the qualifying paragraphs and the oracle predicts every
    output column — kept_text included — from slicing arithmetic.

    Scale shape: synthesis and extraction are ONE chain of array/regex
    column expressions (operators/html.py — no UDF, no explode, no
    shuffle); the scan is map-only linear like text_quality_gate, and
    the only exchange is the output ORDER BY. At 100 TB this runs at
    parquet-scan speed with whole-stage codegen end to end."""
    from ..operators.html import extract_content

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)

    def word(pos):
        return F.element_at(ws, ((pos % n) + 1).cast("int"))

    def anchor(txt):
        return F.concat(F.lit('<a href="/x">'), txt, F.lit("</a>"))

    nav = F.concat(
        F.lit("<nav>"),
        F.concat_ws(" ", *[anchor(word(d * 7 + j * 3)) for j in range(4)]),
        F.lit("</nav>"),
    )
    h1 = F.concat(F.lit("<h1>doc "), d.cast("string"), F.lit("</h1>"))

    def para(k: int):
        L = (F.lit(3) + (d + F.lit(k)) % 5).cast("int")
        s = ((d + F.lit(k * 11)) % (n - L + 1)).cast("int")
        r = ((d + F.lit(3 * k)) % L).cast("int")
        wrapped = F.transform(
            F.slice(ws, s + 1, L),
            lambda x, i: F.when(i == r, anchor(x)).otherwise(x),
        )
        return F.concat(F.lit("<p>"), F.concat_ws(" ", wrapped), F.lit("</p>"))

    footer = F.lit('<footer>(c) 2026 <a href="/about">about</a></footer>')
    script = F.lit(
        '<script type="text/javascript">var x = 1;'
        ' if (x < 2) { x = "</p>"; }</script>'
    )
    html = F.concat_ws("\n", nav, h1, para(0), para(1), script, para(2), footer)

    sig = extract_content(html)
    return (
        docs.select(
            "doc_id",
            sig["n_blocks"].alias("n_blocks"),
            sig["n_kept"].alias("n_kept"),
            sig["kept_chars"].alias("kept_chars"),
            sig["max_kept_ppm"].alias("max_kept_ppm"),
            sig["kept_text"].alias("kept_text"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_html_links: the link-census half of the markup family (r16) —
# href harvesting, internal/external classification, host extraction:
# the crawl-graph stage (outbound host adjacency feeding host-level
# PageRank / spam screens) that sits beside boilerplate extraction in
# every web-corpus pipeline. UNREGISTERED (local-only per the standing
# policy). Same evidence pattern as text_html_extract: deterministic
# synthesis, REAL extraction, arithmetic oracle.
# ---------------------------------------------------------------------------

TEXT_HTML_LINKS_ORACLE = """
    WITH hs AS (
        SELECT doc_id, (doc_id * (j + 1)) % 5 AS h
        FROM documents, (VALUES (0), (1), (2), (3)) js(j)
    ),
    agg AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   list('site' || CAST(h AS VARCHAR) || '.example.com')
               )) AS hosts
        FROM hs GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(8 AS INT) AS n_links,
           CAST(4 AS INT) AS n_internal,
           CAST(4 AS INT) AS n_external,
           CAST(len(hosts) AS INT) AS n_hosts,
           array_to_string(hosts, ',') AS host_list
    FROM agg ORDER BY doc_id
    """


def text_html_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link census under driver-style check: each documents row
    synthesizes a page whose nav carries 4 EXTERNAL anchors with hosts
    site((id·(j+1)) mod 5).example.com — when id ≡ 0 (mod 5) all four
    collapse to site0 (n_hosts = 1), otherwise id is invertible mod 5
    and all four are distinct (n_hosts = 4), so the distinct-host
    logic is exercised on both branches — plus 4 INTERNAL anchors
    (three paragraph links and /about in the footer), one hrefless
    named anchor that must NOT count, and a <script> decoy containing
    a fake '<a href="https://evil.example.com/x">' string literal that
    noise-stripping must remove before harvesting. The oracle predicts
    the census and the sorted host adjacency from the same modular
    arithmetic.

    Scale shape: like text_html_extract — one chain of regex/array
    expressions (operators/html.py link_stats), map-only, the output
    ORDER BY is the only exchange."""
    from ..operators.html import link_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)

    def word(pos):
        return F.element_at(ws, ((pos % n) + 1).cast("int"))

    nav = F.concat(
        F.lit("<nav>"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit('<a href="https://site'),
                    ((d * (j + 1)) % 5).cast("string"),
                    F.lit(f'.example.com/{j}">'),
                    word(d * 7 + j * 3),
                    F.lit("</a>"),
                )
                for j in range(4)
            ],
        ),
        F.lit("</nav>"),
    )
    h1 = F.concat(
        F.lit('<h1><a name="top">doc '), d.cast("string"), F.lit("</a></h1>")
    )

    def para(k: int):
        L = (F.lit(3) + (d + F.lit(k)) % 5).cast("int")
        s = ((d + F.lit(k * 11)) % (n - L + 1)).cast("int")
        r = ((d + F.lit(3 * k)) % L).cast("int")
        wrapped = F.transform(
            F.slice(ws, s + 1, L),
            lambda x, i: F.when(
                i == r,
                F.concat(F.lit(f'<a href="/w/{k}">'), x, F.lit("</a>")),
            ).otherwise(x),
        )
        return F.concat(F.lit("<p>"), F.concat_ws(" ", wrapped), F.lit("</p>"))

    footer = F.lit('<footer>(c) 2026 <a href="/about">about</a></footer>')
    script = F.lit(
        "<script>var u = '<a href=\"https://evil.example.com/x\">';</script>"
    )
    html = F.concat_ws("\n", nav, h1, para(0), para(1), script, para(2), footer)

    sig = link_stats(html)
    return (
        docs.select(
            "doc_id",
            sig["n_links"].alias("n_links"),
            sig["n_internal"].alias("n_internal"),
            sig["n_external"].alias("n_external"),
            sig["n_hosts"].alias("n_hosts"),
            sig["host_list"].alias("host_list"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_bpe_merges: distributed BPE merge learning (Sennrich et al. 2016,
# arXiv:1508.07909 — the tokenizer-training loop, run on-cluster).
# UNREGISTERED (r8 queue — local-only per the COVERAGE.md standing
# policy).
# ---------------------------------------------------------------------------

BPE_ROUNDS = 5


def _bpe_round_cte(k: int) -> str:
    """One unrolled BPE round: pair counts over seg{k-1}, the top-1
    merge (count DESC, left, right — a total order), seg{k} via the
    padded non-overlapping replace (verified identical left-to-right
    semantics in Spark and DuckDB)."""
    return f"""
    pairs{k} AS (
        SELECT s.cnt,
               unnest(t[1:len(t)-1]) AS x,
               unnest(t[2:len(t)]) AS y
        FROM (SELECT cnt, string_split(seg, '  ') AS t FROM seg{k - 1}) s
    ),
    top{k} AS (
        SELECT x, y, CAST(SUM(cnt) AS BIGINT) AS pc
        FROM pairs{k} GROUP BY x, y
        ORDER BY pc DESC, x, y LIMIT 1
    ),
    seg{k} AS (
        -- LEFT JOIN ON TRUE, not CROSS JOIN: an empty top{k} (vocab
        -- fully merged) must pass seg through unchanged, mirroring the
        -- Spark loop's early break
        SELECT s.word, s.cnt,
               CASE WHEN t.x IS NULL THEN s.seg
                    ELSE trim(replace(' ' || s.seg || ' ',
                                      ' ' || t.x || '  ' || t.y || ' ',
                                      ' ' || t.x || t.y || ' '))
               END AS seg
        FROM seg{k - 1} s LEFT JOIN top{k} t ON TRUE
    )"""


TEXT_BPE_MERGES_ORACLE = (
    """
    WITH words AS (
        SELECT w AS word, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    seg0 AS (
        SELECT word, cnt,
               array_to_string(string_split(word, ''), '  ') AS seg
        FROM words
    ),"""
    + ",".join(_bpe_round_cte(k) for k in range(1, BPE_ROUNDS + 1))
    + """
    """
    + " UNION ALL ".join(
        f"SELECT {k} AS rank, x AS left_sym, y AS right_sym, "
        f"x || y AS merged, pc AS pair_count FROM top{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    + """
    ORDER BY rank
    """
)


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge learning on-cluster: whitespace-tokenize the corpus
    once, reduce to the (word, count) vocabulary, segment each word
    into characters, then run BPE_ROUNDS (5) merge rounds — each round
    counts adjacent-symbol pairs weighted by word frequency, picks the
    top pair under a total order (count DESC, left, right), and applies
    the merge with a padded non-overlapping string replace whose
    left-to-right semantics are identical in Spark and DuckDB.

    Segment representation: symbols joined by TWO spaces, single-space
    padding at replace time, pattern ' x  y ' -> ' xy '. The single-
    space representation is WRONG for repeated-symbol runs: its
    pattern consumes the boundary space shared with the next match, so
    'a a a a' merges to [aa, a, a] where canonical greedy BPE gives
    [aa, aa] (found by the hypothesis property test). With double-space
    joints each match's consumed outer spaces are exactly restored by
    the replacement's own padding, so greedy left-to-right string
    replace == greedy left-to-right list merge — pinned generatively
    against a pure-Python reference in tests/test_text_semantics.py.
    No end-of-word marker — intra-word merges only, documented
    divergence from the tokenizer deployments that add one.

    Exactness: symbols are strings, counts are longs — the oracle
    unrolls the same rounds as chained CTEs and is hash-exact.

    Scale shape: the ONLY corpus-sized stage is the first tokenize +
    vocabulary aggregate (one shuffle, collapsing map-side under
    Zipf); every round after that is VOCAB-local — Heaps' law puts the
    vocabulary at ~millions of rows for a 100 TB corpus, so rounds are
    small narrow jobs. Each round needs the chosen pair as a literal in
    the next round's replace, which costs one bounded `.first()` per
    round (the k-means/PQ precedent); the seg table is eagerly
    localCheckpoint()ed per round so round k never recomputes rounds
    1..k-1 (the pagerank lineage discipline). Production BPE runs
    thousands of merges by batch-applying non-interacting pairs per
    round — this query demonstrates the per-round shape with R=5;
    the round body is rank-count invariant."""
    out_rows, _ = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        out_rows,
        "rank int, left_sym string, right_sym string, merged string, "
        "pair_count long",
    ).orderBy("rank")


def _bpe_learn(spark: SparkSession, sf_dir: str):
    """Shared learn loop: returns (merge rows, final segmented vocab
    (word, cnt, seg) with seg checkpointed) — text_bpe_merges reports
    the former, text_bpe_compression applies the latter."""
    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    words = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seg = words.select(
        "word", "cnt", F.array_join(F.split("word", ""), "  ").alias("seg")
    ).localCheckpoint()

    out_rows = []
    for k in range(1, BPE_ROUNDS + 1):
        t = F.split("seg", "  ")
        pair_expr = (
            "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
            " (a, b) -> struct(a AS x, b AS y))"
        )
        top = (
            seg.select("cnt", t.alias("t"))
            .select("cnt", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("cnt").alias("pc"))
            .orderBy(F.col("pc").desc(), "x", "y")
            .limit(1)
            .first()
        )
        if top is None:
            # vocabulary fully merged (or single-char words only): no
            # adjacent pairs remain. The oracle's top{k} CTE is empty in
            # the same state, so its UNION ALL arm emits no row either —
            # both sides stop at the same rank.
            break
        out_rows.append((k, top["x"], top["y"], top["x"] + top["y"], top["pc"]))
        pat = F.concat(F.lit(" "), F.lit(top["x"]), F.lit("  "),
                       F.lit(top["y"]), F.lit(" "))
        rep = F.concat(F.lit(" "), F.lit(top["x"] + top["y"]), F.lit(" "))
        seg = seg.select(
            "word", "cnt",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seg"), F.lit(" ")), pat, rep
                )
            ).alias("seg"),
        ).localCheckpoint()

    return out_rows, seg


# ---------------------------------------------------------------------------
# text_chunk_overlap: retrieval-prep chunking (fixed window, fixed
# overlap). UNREGISTERED (r8 queue — local-only per the COVERAGE.md
# standing policy).
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64   # tokens per chunk
CHUNK_STRIDE = 48   # start-to-start stride (overlap = 64 - 48 = 16)

TEXT_CHUNK_OVERLAP_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t, n,
               unnest(generate_series(0,
                   CASE WHEN n <= {CHUNK_TOKENS} THEN 0
                        ELSE (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                             // {CHUNK_STRIDE}
                   END)) AS chunk_idx
        FROM toks
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(len(t[chunk_idx * {CHUNK_STRIDE} + 1 :
                     chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}])
                AS BIGINT) AS n_tokens,
           array_to_string(t[chunk_idx * {CHUNK_STRIDE} + 1 :
                             chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
                           ' ') AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_idx
    """


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunker (the RAG / long-context preprocessing
    shape): each document yields chunks of CHUNK_TOKENS (64) tokens
    starting every CHUNK_STRIDE (48) tokens — 16 tokens of overlap so
    no sentence straddles a hard boundary unseen. The chunk count is
    exact integer arithmetic (1 for short docs, else
    (n - C + S - 1) DIV S + 1 — the numerator is kept positive so
    truncating DIV and flooring // agree), the chunk body is a narrow
    slice + join over the one tokenization.

    At scale this is a pure map stage: one corpus scan, a bounded
    sequence-explode (≤ n_tok/S + 1 rows per doc), zero shuffles
    before the presentation sort — chunking 100 TB is
    embarrassingly parallel and this plan keeps it that way."""
    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).alias("n"),
    )
    n_last = F.when(
        F.col("n") <= CHUNK_TOKENS, F.lit(0)
    ).otherwise(
        F.expr(
            f"(n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE}"
        )
    )
    chunk = F.slice(
        F.col("t"),
        F.col("chunk_idx") * CHUNK_STRIDE + 1,
        CHUNK_TOKENS,
    )
    return (
        toks.select(
            "doc_id", "t",
            F.explode(F.sequence(F.lit(0), n_last)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx").cast("long") * CHUNK_STRIDE)
            .alias("start_tok"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# text_bpe_compression: the APPLY side of BPE — segment the corpus with
# the learned merges and account per-source compression. UNREGISTERED
# (r8 queue, with text_bpe_merges).
# ---------------------------------------------------------------------------

TEXT_BPE_COMPRESSION_ORACLE = (
    """
    WITH words AS (
        SELECT w AS word, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    seg0 AS (
        SELECT word, cnt,
               array_to_string(string_split(word, ''), '  ') AS seg
        FROM words
    ),"""
    + ",".join(_bpe_round_cte(k) for k in range(1, BPE_ROUNDS + 1))
    + f"""
    ,
    src_words AS (
        SELECT source, w AS word, COUNT(*) AS cnt FROM (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY source, w
    )
    SELECT sw.source,
           CAST(SUM(sw.cnt) AS BIGINT) AS n_words,
           CAST(SUM(sw.cnt * length(sg.word)) AS BIGINT) AS n_chars,
           CAST(SUM(sw.cnt * len(string_split(sg.seg, '  ')))
                AS BIGINT) AS n_symbols,
           FLOOR(CAST(SUM(sw.cnt * length(sg.word)) AS DOUBLE)
                 / SUM(sw.cnt * len(string_split(sg.seg, '  ')))
                 * 1000000 + 0.5) / 1000000 AS chars_per_symbol
    FROM src_words sw JOIN seg{BPE_ROUNDS} sg ON sw.word = sg.word
    GROUP BY sw.source
    ORDER BY sw.source
    """
)


def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the tokenizer loop: segment every word with
    the merges text_bpe_merges learned (the shared ``_bpe_learn`` runs
    the same rounds and hands back the final segmented vocabulary) and
    report per-source compression — weighted chars, symbols after
    merging, and chars-per-symbol (the metric tokenizer training
    optimizes; sources whose orthography the merges fit show higher
    ratios). Integer counts are hash-exact; the single ratio divides
    identical longs on both engines and FLOOR-rounds.

    Scale shape: learning stays vocab-local (see text_bpe_merges); the
    APPLY is the corpus-sized half, and it runs as a broadcast-friendly
    join of (source, word) counts against the ~vocab-sized segmented
    table — per-document segmentation never touches a shuffle, and the
    per-source rollup collapses map-side. This is exactly how a learned
    tokenizer is deployed over 100 TB: ship the merge table, join or
    map, never re-learn."""
    _, seg = _bpe_learn(spark, sf_dir)
    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    src_words = (
        fan_out(docs)
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seg_sized = seg.select(
        "word",
        F.length("word").alias("n_chars_word"),
        F.size(F.split("seg", "  ")).alias("n_sym_word"),
    )
    joined = src_words.join(seg_sized, "word")
    n_chars = F.sum(F.col("cnt") * F.col("n_chars_word"))
    n_sym = F.sum(F.col("cnt") * F.col("n_sym_word"))
    return (
        joined.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            n_chars.cast("long").alias("n_chars"),
            n_sym.cast("long").alias("n_symbols"),
            (
                F.floor(
                    n_chars.cast("double") / n_sym * 1_000_000 + F.lit(0.5)
                ) / 1_000_000
            ).alias("chars_per_symbol"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text_phrase_search: positional phrase retrieval with a self-derived
# query workload. UNREGISTERED (r9 — local-only per the COVERAGE.md
# standing policy; driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

PHRASE_TOP_Q = 4   # query workload: the corpus's 4 hottest bigrams
PHRASE_TOP_K = 5   # docs returned per phrase

TEXT_PHRASE_SEARCH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 2 THEN
                   list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1])
               ELSE [] END) AS phrase
        FROM toks
    ),
    occ AS (
        SELECT phrase, doc_id, COUNT(*) AS n_occurrences
        FROM big GROUP BY phrase, doc_id
    ),
    tot AS (
        SELECT phrase,
               CAST(SUM(n_occurrences) AS BIGINT) AS phrase_total,
               COUNT(*) AS n_docs
        FROM occ GROUP BY phrase
    ),
    top AS (
        SELECT * FROM tot
        ORDER BY phrase_total DESC, phrase LIMIT {PHRASE_TOP_Q}
    ),
    ranked AS (
        SELECT o.phrase, t.phrase_total, t.n_docs, o.doc_id,
               o.n_occurrences,
               ROW_NUMBER() OVER (PARTITION BY o.phrase
                                  ORDER BY o.n_occurrences DESC, o.doc_id)
                   AS rank
        FROM occ o JOIN top t ON o.phrase = t.phrase
    )
    SELECT phrase, phrase_total, n_docs, doc_id, n_occurrences, rank
    FROM ranked WHERE rank <= {PHRASE_TOP_K}
    ORDER BY phrase, rank
    """


def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search (the exact-phrase complement of BM25's
    bag-of-words ranking): adjacency is captured by materializing word
    BIGRAMS from one corpus tokenization (shingles_from_tokens — the
    dedup shingle machinery reused at n=2), the query workload is
    self-derived as the PHRASE_TOP_Q (4) globally hottest bigrams, and
    each phrase returns its PHRASE_TOP_K (5) top documents by
    occurrence count with deterministic tie-breaks (count DESC,
    doc_id).

    Plan: the corpus is tokenized ONCE into per-(phrase, doc)
    occurrence counts — one map-side-combinable aggregate; phrase
    totals and the top-Q cut derive from THAT table (never a second
    corpus scan): totals are a phrase-sized aggregate, the cut is
    TakeOrderedAndProject, and the cut result rides a BROADCAST join
    back onto the counts, so the final rank window partitions only the
    ~Q surviving phrases' rows. At 100 TB the only corpus-sized
    exchange is the occurrence aggregate (bounded by distinct
    (bigram, doc), with map-side partials); everything downstream is
    query-workload-sized. For a FIXED external phrase list the same
    pipeline drops the fit half — filter the bigram stream by the
    broadcast list before aggregating."""
    return phrase_search_frame(load_table(spark, sf_dir, "documents"))


def phrase_search_frame(docs: DataFrame,
                        top_q: int = PHRASE_TOP_Q,
                        top_k: int = PHRASE_TOP_K) -> DataFrame:
    """Core of text_phrase_search over any (doc_id, text) frame — split
    out so planted-corpus tests can drive the ranking and adjacency
    semantics directly."""
    from ..operators.dedup import shingles_from_tokens
    from ..sources.parquet_io import fan_out

    big = (
        fan_out(docs)
        .withColumn("_toks", TX.tokens(F.col("text")))
        .select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("_toks"), 2)).alias("phrase"),
        )
    )
    # occ feeds both the workload fit (tot -> top) and the retrieval
    # join; localCheckpoint (the bloom/graph lineage pattern)
    # materializes the one corpus-sized aggregate instead of scanning
    # and re-aggregating the corpus once per consumer
    occ = big.groupBy("phrase", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    ).localCheckpoint()
    tot = occ.groupBy("phrase").agg(
        F.sum("n_occurrences").cast("long").alias("phrase_total"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    top = tot.orderBy(F.desc("phrase_total"), "phrase").limit(top_q)
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy("phrase").orderBy(
            F.desc("n_occurrences"), "doc_id"
        )
    )
    return (
        occ.join(F.broadcast(top), "phrase")
        .withColumn("rank", rank)
        .filter(F.col("rank") <= top_k)
        .select(
            "phrase", "phrase_total", "n_docs", "doc_id",
            "n_occurrences", "rank",
        )
        .orderBy("phrase", "rank")
    )


# ---------------------------------------------------------------------------
# text_top_terms_tfidf: per-document keyword extraction. UNREGISTERED
# (r9 — local-only per the COVERAGE.md standing policy; driver-style
# evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 5

TEXT_TOP_TERMS_TFIDF_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM tf),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               CAST(COUNT(*) OVER (PARTITION BY tf.term) AS BIGINT) AS df,
               n.n_docs
        FROM tf, n
    ),
    ranked AS (
        SELECT doc_id, term, tf, df,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY CAST(tf * (2 * (n_docs - df) + 1) AS DOUBLE)
                            / (2 * df + 1) DESC,
                            term
               ) AS rank
        FROM scored
    )
    SELECT doc_id, term, tf, df, rank
    FROM ranked WHERE rank <= {TFIDF_TOP_K}
    ORDER BY doc_id, rank
    """


def text_top_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the TFIDF_TOP_K (5) most
    distinctive terms per document by tf-idf, with the BM25-style
    RATIONAL idf — score = tf * (2*(N - df) + 1) / (2*df + 1), an
    integer numerator and denominator whose single IEEE division is
    correctly rounded on both engines (the `ln()` formulation is not;
    bm25_topk_postings established the idiom). Deterministic term
    tie-break makes the rank hash-exact.

    Plan: the corpus is tokenized ONCE into (doc, term) tf counts (one
    map-side-combinable aggregate); df is a window over the SAME
    subtree partitioned by term (single tokenization — the
    bm25_topk_postings discipline, no second corpus scan); the final
    rank window partitions by doc_id and its rank <= k cut pushes into
    the window sort as WindowGroupLimit. Nothing wider than
    (doc_id, term, counts) rides any exchange. At 100 TB keyword
    extraction is exactly this pipeline with a stopword/df-floor
    pre-filter (one WHERE on the tf table — the same plan)."""
    docs = load_table(spark, sf_dir, "documents")
    from ..sources.parquet_io import fan_out

    tf = (
        fan_out(docs)
        .select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    from pyspark.sql import Window

    w_df = Window.partitionBy("term")
    # n_docs is the distinct doc count, a scalar: a broadcast 1-row
    # cross join, never a global window over the term table
    n_docs = tf.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    score = (
        (F.col("tf") * (2 * (F.col("n_docs") - F.col("df")) + 1))
        .cast("double") / (2 * F.col("df") + 1)
    )
    w_rank = Window.partitionBy("doc_id").orderBy(score.desc(), "term")
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df).cast("long"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "rank")
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# text_vocab_coverage: tokenizer-vocabulary coverage / OOV-rate audit.
# UNREGISTERED (r10 — local-only per the COVERAGE.md standing policy;
# driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

VOCAB_SIZE = 16  # reference vocabulary: top-N terms by document frequency
# (the fixture corpus has exactly 31 distinct whitespace terms at every
# SF, so 16 leaves a REAL out-of-vocab population — a 32-term vocab
# would make every coverage row vacuously 100%)

TEXT_VOCAB_COVERAGE_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ) ORDER BY df DESC, term LIMIT {VOCAB_SIZE}
    )
    SELECT t.doc_id,
           CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(CASE WHEN v.term IS NOT NULL THEN t.tf END), 0)
                AS BIGINT) AS n_in_vocab,
           CAST((SUM(t.tf)
                 - COALESCE(SUM(CASE WHEN v.term IS NOT NULL THEN t.tf END),
                            0)) * 1000000 // SUM(t.tf)
                AS BIGINT) AS oov_ppm,
           CAST(COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS BIGINT)
               AS n_distinct_oov
    FROM tf t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
    ORDER BY doc_id
    """


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV-rate audit — the tokenizer-fit check a
    training pipeline runs before committing a vocab: against a
    reference vocabulary (here self-derived: the VOCAB_SIZE terms with
    the highest document frequency, term-asc tiebreak — in production a
    fixed tokenizer vocab table), report per document the total token
    count, in-vocab token count, the OOV rate in exact ppm
    ((oov * 1e6) DIV total — integer, hash-exact), and the number of
    DISTINCT out-of-vocab terms (the new-vocabulary-mass signal).

    Plan: tokenize -> (doc, term, tf) map-side-combinable aggregate;
    the vocabulary is a TakeOrderedAndProject over the term-df
    aggregate (top-k never sorts globally) broadcast back as a
    VOCAB_SIZE-row hash relation, so coverage is a broadcast LEFT join
    + one per-doc aggregate — no pair of corpus-sized tables ever
    meets at a shuffle. The tf subtree is evaluated once per branch
    (vocab derivation + coverage join); at 100 TB the tf table is the
    thing to materialize once and reuse — same discipline as
    bm25_topk_postings' posting table."""
    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage_frame(fan_out(docs))


def vocab_coverage_frame(
    docs: "DataFrame", vocab_size: int = VOCAB_SIZE
) -> DataFrame:
    """Core of text_vocab_coverage over any (doc_id, text) frame —
    split out so the planted-corpus test can drive known vocab/OOV
    populations directly."""
    tf = (
        docs
        .select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    vocab = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(vocab_size)
        .select("term", F.lit(1).alias("_v"))
    )
    return (
        tf.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("_v").isNotNull(), F.col("tf"))),
                F.lit(0),
            ).cast("long").alias("n_in_vocab"),
            F.count(F.when(F.col("_v").isNull(), 1)).cast("long")
            .alias("n_distinct_oov"),
        )
        .withColumn(
            "oov_ppm",
            F.expr("(n_tokens - n_in_vocab) * 1000000 DIV n_tokens"),
        )
        .select(
            "doc_id", "n_tokens", "n_in_vocab", "oov_ppm", "n_distinct_oov"
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_simpson_diversity: exact lexical-diversity signals per document.
# UNREGISTERED (r10 — local-only per the COVERAGE.md standing policy;
# driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

TEXT_SIMPSON_DIVERSITY_ORACLE = """
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ) GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) * 1000000 // SUM(tf) AS BIGINT) AS ttr_ppm,
           CAST(CASE WHEN SUM(tf) > 1
                     THEN SUM(tf * (tf - 1)) * 1000000
                          // (SUM(tf) * (SUM(tf) - 1))
                     ELSE 0 END AS BIGINT) AS simpson_ppm
    FROM tf
    GROUP BY doc_id
    ORDER BY doc_id
    """


def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lexical-diversity signals per document: type-token ratio
    and the Simpson repeat probability Σ tf·(tf−1) / (n·(n−1)) — the
    probability two tokens drawn without replacement are the same
    term. Entropy/perplexity is the usual diversity score but needs
    log() (not correctly rounded — banned from oracled outputs); the
    Simpson index is its Rényi-2 sibling and PURE integer arithmetic,
    so both signals are hash-exact in ppm. Low diversity (high
    simpson_ppm, low ttr_ppm) flags boilerplate/spam the way
    text_repetition_signals' bigram fractions do, from the unigram
    side.

    Plan: one tokenize -> (doc, term, tf) map-side-combinable
    aggregate, then one per-doc aggregate — both shuffles carry
    (doc_id, term/counts) longs only; nothing else. At 100 TB this is
    the cheapest useful corpus-quality pass after raw token counts."""
    from ..sources.parquet_io import fan_out

    docs = load_table(spark, sf_dir, "documents")
    return simpson_diversity_frame(fan_out(docs))


def simpson_diversity_frame(docs: DataFrame) -> DataFrame:
    """Core of text_simpson_diversity over any (doc_id, text) frame —
    split out so the planted-corpus test can pin the ttr/simpson
    arithmetic on hand-checkable documents."""
    tf = (
        docs
        .select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("tf") * (F.col("tf") - 1)).cast("long").alias("_coll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.expr("n_distinct * 1000000 DIV n_tokens").alias("ttr_ppm"),
            F.when(
                F.col("n_tokens") > 1,
                F.expr("_coll * 1000000 DIV (n_tokens * (n_tokens - 1))"),
            ).otherwise(F.lit(0)).cast("long").alias("simpson_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# decon_ngram_contamination: per-TRAIN-doc n-gram overlap rate vs the
# held-out split — the GPT-3/PaLM-style decontamination direction
# (filter TRAIN docs), complementing decon_test_train_overlap's
# per-test winnowing report. UNREGISTERED (r11 — local-only per the
# COVERAGE.md standing policy; driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

# production pipelines use 8-13-gram exact overlap (GPT-3 appendix C
# used 13-grams); the fixture corpus is short word-soup where >=5-grams
# almost never collide, so the CONTRACT here fixes n=4 — the arithmetic
# and plan shape are n-independent
DECON_NGRAM_N = 4
DECON_CONTAMINATED_PPM = 100_000  # >=10% of a doc's grams seen in test

DECON_NGRAM_CONTAMINATION_ORACLE = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l) - {DECON_NGRAM_N - 2}),
                      i -> array_to_string(l[i:i+{DECON_NGRAM_N - 1}], ' ')))
                   AS gram
        FROM t WHERE len(l) >= {DECON_NGRAM_N}
    ),
    test_set AS (SELECT DISTINCT gram FROM g WHERE doc_id < 250),
    tr AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN gram IN (SELECT gram FROM test_set)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM g WHERE doc_id >= 250 GROUP BY doc_id
    )
    SELECT doc_id AS train_doc, n_grams, n_hits,
           CAST(n_hits * 1000000 // n_grams AS BIGINT) AS contamination_ppm,
           (n_hits * 1000000 // n_grams >= {DECON_CONTAMINATED_PPM})
               AS contaminated
    FROM tr
    ORDER BY train_doc
    """


def decon_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-TRAIN-document n-gram contamination rate against the
    held-out split (test = doc_id < 250, the corpus convention shared
    with decon_test_train_overlap): the fraction of a training doc's
    4-gram OCCURRENCES (DECON_NGRAM_N) that appear anywhere in the
    test set's distinct 4-gram vocabulary, in exact ppm, plus the drop
    flag at DECON_CONTAMINATED_PPM (10%). This is the direction
    production decontamination
    actually filters (drop/trim the TRAIN doc; the winnowing query
    reports the per-test-doc view) — GPT-3-style exact n-gram overlap
    rather than fingerprint sampling.

    Plan: grams are emitted by a narrow sequence/slice transform (no
    python), the test vocabulary is one distinct projection, and the
    contamination count is a LEFT SEMI join from train gram
    occurrences into that vocabulary followed by a doc-keyed count —
    the gram tables are the only shuffled data, text never shuffles.
    At 100 TB the test vocabulary (one eval suite) is millions of
    grams — broadcastable — so the scan over train grams is
    shuffle-free in the regime that matters; the fixture-scale plan
    keeps the general shuffled-semi-join shape."""
    docs = load_table(spark, sf_dir, "documents")
    n = DECON_NGRAM_N
    toked = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("l")
    ).filter(F.size("l") >= n)
    grams = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(l) - {n - 1}),"
                f" i -> concat_ws(' ', slice(l, i, {n})))"
            )
        ).alias("gram"),
    )
    test_set = grams.filter(F.col("doc_id") < 250).select("gram").distinct()
    train = grams.filter(F.col("doc_id") >= 250)
    totals = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    hits = (
        train.join(test_set, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            F.col("doc_id").alias("train_doc"),
            "n_grams",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
            .alias("n_hits"),
            F.expr(
                "coalesce(n_hits, 0) * 1000000 DIV n_grams"
            ).cast("long").alias("contamination_ppm"),
            (
                F.expr("coalesce(n_hits, 0) * 1000000 DIV n_grams")
                >= DECON_CONTAMINATED_PPM
            ).alias("contaminated"),
        )
        .orderBy("train_doc")
    )


# ---------------------------------------------------------------------------
# text_source_divergence: pairwise unigram-distribution L1 distance
# between sources — corpus mixture analysis. UNREGISTERED (r11 —
# local-only per the COVERAGE.md standing policy; driver-style
# evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

TEXT_SOURCE_DIVERGENCE_ORACLE = """
    WITH tf AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents
        ) GROUP BY source, term
    ),
    tot AS (SELECT source, SUM(tf) AS tot FROM tf GROUP BY source),
    p AS (
        SELECT tf.source, term,
               CAST(tf * 1000000 // tot AS BIGINT) AS p_ppm
        FROM tf JOIN tot ON tf.source = tot.source
    ),
    tp AS (SELECT source, SUM(p_ppm) AS tot_ppm FROM p GROUP BY source),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
               SUM(ABS(a.p_ppm - b.p_ppm)) AS l1_shared,
               SUM(a.p_ppm) AS pa_shared,
               SUM(b.p_ppm) AS pb_shared
        FROM p a JOIN p b ON a.term = b.term AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT ta.source AS src_a, tb.source AS src_b,
           CAST(COALESCE(s.n_shared_terms, 0) AS BIGINT) AS n_shared_terms,
           CAST(COALESCE(s.l1_shared, 0)
                + (ta.tot_ppm - COALESCE(s.pa_shared, 0))
                + (tb.tot_ppm - COALESCE(s.pb_shared, 0))
                AS BIGINT) AS l1_ppm
    FROM tp ta
    JOIN tp tb ON ta.source < tb.source
    LEFT JOIN shared s ON s.src_a = ta.source AND s.src_b = tb.source
    ORDER BY l1_ppm, src_a, src_b
    """


def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-mixture divergence: the exact L1 distance (in
    ppm of probability mass) between every two sources' unigram
    frequency distributions — the mixture-analysis pass that tells a
    data curator which sources are near-duplicates of each other and
    which add genuinely new text. KL/JS divergence is the textbook
    score but needs log(); L1 (total variation x2) ranks mixtures the
    same way and is PURE integer arithmetic over truncated-ppm
    frequencies, so the pair table is hash-exact.

    Decomposition that avoids a union-of-vocab join: L1 over the term
    UNION = Σ_shared |p_a - p_b| + (mass_a - shared_a) + (mass_b -
    shared_b), where mass_x = Σ p_ppm over x's whole vocabulary. Only
    the SHARED-term self-equi-join on term ever runs; each side's
    private-vocabulary contribution comes from its (sources-sized)
    mass total. Plan: one (source, term) aggregate, a 20-row totals
    broadcast, the term-keyed self-join (per-term fanout bounded by
    sources², never corpus size), and a sources²-row result. At
    100 TB with S sources the shuffled data is the distinct (source,
    term) frequency table — vocabulary-sized, not corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source", F.explode(TX.tokens(F.col("text"))).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    tot = tf.groupBy("source").agg(F.sum("tf").cast("long").alias("tot"))
    # stage the ppm frequency table ONCE (localCheckpoint): five
    # consumers read it (both self-join sides, both mass totals, the
    # pair assembly) and would otherwise each re-run the tokenize +
    # (source, term) aggregate subtree — the staged frame is
    # vocabulary-sized (distinct terms x sources), never corpus-sized,
    # so materializing it is the cheap side of that trade at any SF
    p = tf.join(F.broadcast(tot), "source").select(
        "source", "term", F.expr("tf * 1000000 DIV tot").alias("p_ppm")
    ).localCheckpoint()
    tp = p.groupBy("source").agg(
        F.sum("p_ppm").cast("long").alias("tot_ppm")
    )
    a = p.select(
        F.col("source").alias("src_a"), "term", F.col("p_ppm").alias("pa")
    )
    b = p.select(
        F.col("source").alias("src_b"), "term", F.col("p_ppm").alias("pb")
    )
    shared = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(F.abs(F.col("pa") - F.col("pb"))).cast("long")
            .alias("l1_shared"),
            F.sum("pa").cast("long").alias("pa_shared"),
            F.sum("pb").cast("long").alias("pb_shared"),
        )
    )
    ta = tp.select(F.col("source").alias("src_a"), F.col("tot_ppm").alias("mass_a"))
    tb = tp.select(F.col("source").alias("src_b"), F.col("tot_ppm").alias("mass_b"))
    # sources-sized frames: broadcast the pair expansion so it plans
    # as BroadcastNestedLoopJoin, never CartesianProduct (lint R1)
    pairs = ta.crossJoin(F.broadcast(tb)).filter(
        F.col("src_a") < F.col("src_b")
    )
    return (
        pairs.join(F.broadcast(shared), ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce(F.col("n_shared_terms"), F.lit(0)).cast("long")
            .alias("n_shared_terms"),
            (
                F.coalesce(F.col("l1_shared"), F.lit(0))
                + (F.col("mass_a") - F.coalesce(F.col("pa_shared"), F.lit(0)))
                + (F.col("mass_b") - F.coalesce(F.col("pb_shared"), F.lit(0)))
            ).cast("long").alias("l1_ppm"),
        )
        .orderBy("l1_ppm", "src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# text_url_canonicalize: URL parsing + canonicalization over
# deterministically-synthesized messy URLs (the PII-injection
# precedent: the fixture corpus has no URLs, so the evidence rides
# planted ones). UNREGISTERED (r11 — local-only per the COVERAGE.md
# standing policy; driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

TEXT_URL_CANONICALIZE_ORACLE = """
    WITH u AS (
        SELECT doc_id, n_chars,
               lower(CASE WHEN doc_id % 3 = 0
                          THEN upper(source) || '.Example.COM'
                          ELSE source || '.example.com' END)
                   AS canon_host,
               CASE WHEN doc_id % 3 = 0
                    THEN upper(source) || '.Example.COM'
                    ELSE source || '.example.com' END
                   || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
                   AS raw_authority,
               rtrim('/' || lang || '/doc/' || doc_id
                     || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
                     '/') AS canon_path
        FROM documents
    )
    SELECT canon_host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_authority) AS BIGINT) AS n_raw_variants,
           CAST(COUNT(DISTINCT canon_path) AS BIGINT) AS n_paths,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM u
    GROUP BY canon_host
    ORDER BY canon_host
    """


def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + domain rollup — the normalization pass
    every crawl pipeline runs before domain-level filtering and URL
    dedup: per document a MESSY url is synthesized deterministically
    (case-shuffled scheme/host on doc_id residues, a redundant :443
    port on every fifth doc, a trailing slash on every seventh — the
    same planted-evidence pattern as text_pii_scrub, since the fixture
    corpus carries no URLs), then Spark's REAL parser takes it apart —
    parse_url(url, 'HOST') / 'FILE' — and the canonical form is
    lower(host) + port-stripped authority + trailing-slash-trimmed
    path. The rollup per canonical host counts docs, RAW authority
    variants collapsed by canonicalization (> 1 per host proves the
    messy forms genuinely differed), distinct canonical paths, and
    total chars. DuckDB has no parse_url, so the oracle reconstructs
    host/path from the synthesis formula directly — the compare
    attests Spark's parser against arithmetic ground truth.

    Scale shape: map-only expression work (parse_url is a JVM-side
    expression, no UDF) into one host-keyed aggregate whose
    cardinality is the domain count — the standard crawl-curation
    rollup grain."""
    docs = load_table(spark, sf_dir, "documents")
    raw_host = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.upper("source"), F.lit(".Example.COM")),
    ).otherwise(F.concat(F.col("source"), F.lit(".example.com")))
    authority = F.concat(
        raw_host,
        F.when(F.col("doc_id") % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
    )
    path = F.concat(
        F.lit("/"), F.col("lang"), F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(
        F.lit("HTTPS")
    )
    url = F.concat(scheme, F.lit("://"), authority, path)
    parsed = docs.select(
        "doc_id",
        "n_chars",
        url.alias("url"),
        authority.alias("raw_authority"),
    ).select(
        "doc_id",
        "n_chars",
        "raw_authority",
        F.lower(F.expr("parse_url(url, 'HOST')")).alias("canon_host"),
        F.expr("rtrim('/', parse_url(url, 'FILE'))").alias("canon_path"),
    )
    return (
        parsed.groupBy("canon_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("raw_authority").cast("long")
            .alias("n_raw_variants"),
            F.countDistinct("canon_path").cast("long").alias("n_paths"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("canon_host")
    )


# ---------------------------------------------------------------------------
# text_vocab_hapax_profile: per-source vocabulary richness profile.
# UNREGISTERED (r12 — local-only per the COVERAGE.md standing policy;
# driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

TEXT_VOCAB_HAPAX_PROFILE_ORACLE = """
    WITH tok AS (
        SELECT source, unnest(string_split(LOWER(text), ' ')) AS token
        FROM documents
    ),
    tc AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok WHERE token <> '' GROUP BY source, token
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(MAX(cnt) AS BIGINT) AS top_type_count,
           CAST(COUNT(*) * 1000000 // SUM(cnt) AS BIGINT) AS ttr_ppm,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hapax_share_ppm
    FROM tc
    GROUP BY source
    ORDER BY source
    """


def text_vocab_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source VOCABULARY RICHNESS profile: token total, distinct
    type count, hapax-legomena count (types occurring exactly once in
    the source), the heaviest type's count, and the two classic
    corpus-quality ratios — type/token ratio and hapax share — as
    exact integer ppm (DIV on both engines, never a float division).
    These are the first diagnostics a data team reads per crawl
    source: machine-generated or boilerplate-heavy sources show
    depressed TTR and hapax share, OCR/noisy sources inflate both —
    the standard screen BEFORE tokenizer training (hapax mass directly
    drives BPE merge-table waste).

    Scale shape: explode tokens (narrow, after a text-column-only
    projection) -> (source, token) counts with map-side partial
    aggregation (the exchange carries one row per distinct type per
    task, not per occurrence) -> per-source rollup of the type table
    (a second, much smaller exchange on source). No window, no single
    partition; both aggregates are classic combinable shapes. At
    100 TB the (source, token) table is the dominant shuffle — the
    same cost envelope as the text_token_frequencies vocabulary
    count, keyed finer."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    from ..sources.parquet_io import fan_out

    tc = (
        fan_out(docs)
        .select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long").alias("n_hapax"),
            F.max("cnt").cast("long").alias("top_type_count"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            "top_type_count",
            F.expr("n_types * 1000000 DIV n_tokens").alias("ttr_ppm"),
            F.expr("n_hapax * 1000000 DIV n_types").alias(
                "hapax_share_ppm"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# mart_corpus_mix: the per-source data-mix report (docs/tokens kept by
# the quality gate, and each source's share of the post-gate token
# budget). UNREGISTERED (r12 — local-only per the COVERAGE.md standing
# policy; driver-style evidence via LOCALCHECK).
# ---------------------------------------------------------------------------

MART_CORPUS_MIX_ORACLE = f"""
    WITH {_GATE_SQL_CTE},
    per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS kept_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
                   AS kept_tokens
        FROM gated GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(kept_tokens) AS BIGINT) AS ck FROM per)
    SELECT per.source, per.n_docs, per.kept_docs, per.total_tokens,
           per.kept_tokens,
           per.kept_tokens * 1000000 // tot.ck AS mix_share_ppm
    FROM per CROSS JOIN tot
    ORDER BY per.source
    """


def mart_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATA-MIX report a pretraining pipeline signs off before a
    run: per corpus source, document and token counts before/after the
    C4/Gopher quality gate, and the source's exact-ppm share of the
    POST-GATE token budget — the number that actually becomes the
    mixture weight (sample_temperature_mixture reweights it; this mart
    is the observed baseline it reweights FROM).

    Scale shape: reuses ``_gate_frame`` (narrow per-doc rules, no
    shuffle) and folds straight into a source-keyed aggregate —
    map-side combinable, group-count-sized output; the corpus-wide
    kept-token total is a 1-row broadcast (the bm25 corpus-stats
    pattern). Nothing but (source, two longs) rides the one exchange.
    All-integer; share is multiply-then-DIV ppm."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    return present_corpus_mix(corpus_mix_state(docs))


def corpus_mix_state(docs: DataFrame) -> DataFrame:
    """The MERGEABLE per-source mix state over any document slice —
    four counter columns keyed by source, a pure counter monoid
    (merge = SUM by source), so partial states from independent
    slices/micro-batches fold to exactly the full-corpus state
    (streaming/event_stream.py streaming_mix_append maintains it
    under ingest)."""
    return (
        _gate_frame(docs)
        .select("source", "n_tokens", "keep")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).cast("long").alias("kept_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
            .cast("long").alias("kept_tokens"),
        )
    )


def merge_mix_states(*states: DataFrame) -> DataFrame:
    """Fold partial corpus-mix states (the counter-monoid merge)."""
    from functools import reduce

    log = reduce(lambda a, b: a.unionByName(b), states)
    return log.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("kept_docs").cast("long").alias("kept_docs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("kept_tokens").cast("long").alias("kept_tokens"),
    )


def present_corpus_mix(state: DataFrame) -> DataFrame:
    """Serving view over a (merged) mix state: attach each source's
    exact-ppm share of the post-gate token budget (1-row broadcast)."""
    tot = state.agg(F.sum("kept_tokens").cast("long").alias("ck"))
    return (
        state.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "kept_docs",
            "total_tokens",
            "kept_tokens",
            F.expr("kept_tokens * 1000000 DIV ck").cast("long")
            .alias("mix_share_ppm"),
        )
        .orderBy("source")
    )
