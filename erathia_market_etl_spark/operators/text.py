"""Text-analysis column builders (extension surface, SURVEY.md §7.3).

Everything is built-in Catalyst expressions (split / transform /
aggregate / regexp) — no Python UDFs — so the whole pipeline stays
inside whole-stage codegen and scales linearly over a 100 TB documents
table. Each builder has an exact DuckDB twin documented for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker vocabularies for the language-ID heuristic. Deterministic toy
# sets over the fixture vocabulary — the operator pattern (per-language
# token-hit scoring + fixed precedence argmax) is what matters; swap in
# real stopword lists for production.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "data", "fast"),
    "de": ("table", "join", "slow"),
    "es": ("row", "key", "group"),
    "fr": ("query", "filter", "merge"),
    "zh": ("vector", "stream", "batch"),
}
# precedence for score ties (checked in this order)
LANG_ORDER = ("en", "de", "es", "fr", "zh")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens. DuckDB twin: string_split(text, ' ')."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token count approximating a BPE pre-tokenizer.
    DuckDB twin: len(regexp_extract_all(lower(text), pattern))."""
    return F.regexp_count(F.lower(text), F.lit(BPE_PATTERN))


def sum_token_chars(text: Column) -> Column:
    """Σ length(token) via aggregate HOF.
    DuckDB twin: CAST(list_sum(list_transform(.., length)) AS BIGINT)."""
    return F.aggregate(
        F.transform(tokens(text), lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens (with duplicates) found in a marker set.
    DuckDB twin: len(list_filter(string_split(..), w -> w IN (...)))."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(text), lambda w: F.array_contains(arr, w)))


def language_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, LANG_MARKERS[lang]) for lang in LANG_ORDER}


def predicted_language(scores: dict[str, Column]) -> Column:
    """Fixed-precedence argmax: first language (in LANG_ORDER) whose
    score is >= every other score. Engine-independent tiebreaks."""
    expr = None
    for lang in reversed(LANG_ORDER):
        cond = None
        for other in LANG_ORDER:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def unique_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def fingerprint_md5(text: Column) -> Column:
    """Whole-document fingerprint over normalized text."""
    return F.md5(F.trim(F.lower(text)))


# winnowing parameters (MOSS-style: k-gram size, window of consecutive
# k-gram hashes from which the minimum is selected)
WINNOW_K = 8
WINNOW_W = 5


def winnowing_fingerprints(df, text_col: str, id_col: str,
                           k: int = WINNOW_K, w: int = WINNOW_W):
    """Winnowed k-gram fingerprints (the rolling-hash document
    fingerprinting scheme): slide a k-char window over the text, hash
    each k-gram, then keep the minimum hash of every w consecutive
    k-gram hashes — a guaranteed-coverage sample of the document robust
    to insertions/reordering.

    Formulated for codegen (same lesson as MinHash): explode positions
    -> substring -> md5 -> windowed MIN over (doc, pos) -> distinct.
    The only shuffle is the window sort by (doc, pos); at 100 TB this is
    one sort-based stage partitioned by document.

    DuckDB twin: generate_series positions + MIN() OVER (PARTITION BY
    doc ORDER BY pos ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING), then
    DISTINCT. Tail windows are partial in both engines (identical
    semantics)."""
    from pyspark.sql import Window

    grams = (
        df.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - (k - 1))
            ).alias("pos"),
            F.col(text_col),
        )
        .select(
            "doc", "pos",
            F.md5(F.col(text_col).substr(F.col("pos"), F.lit(k))).alias("h"),
        )
    )
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.select("doc", F.min("h").over(win).alias("fingerprint"))
        .distinct()
    )
