"""Deduplication queries over documents (extension surface).

exact-hash dedup, MinHash-LSH candidate generation, and n-gram-Jaccard
verification — the standard near-dup stack for pre-training corpora,
expressed as pure DataFrame pipelines (operators/dedup.py) with exact
DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    N_MINHASH,
    exact_dedup_groups,
    jaccard,
    minhash_candidate_pairs,
    shingles,
)
from ..operators.similarity import round6
from ..sources.parquet_io import load_table
from .registry import query

# shared SQL fragments for the oracle twins ---------------------------------

_SHINGLES_CTE = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                   list_transform(generate_series(1, len(t) - 2),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE [] END AS s
        FROM toks
    )
"""

def _rot_hash(j: int) -> str:
    if j == 0:
        return "md5('mh|' || x)"
    return f"substr(md5('mh|' || x), {4*j+1}) || substr(md5('mh|' || x), 1, {4*j})"


_SIG_SQL = ", ".join(
    f"list_min(list_transform(s, x -> {_rot_hash(j)})) AS h{j}" for j in range(N_MINHASH)
)
_BANDS_SQL = ", ".join(f"md5('{b}|' || h{2*b} || h{2*b+1}) AS band{b}" for b in range(4))
_BAND_UNION = "\n        UNION ALL\n".join(
    f"        SELECT doc_id, {b} AS band_idx, band{b} AS band_key FROM banded"
    for b in range(4)
)

_CANDIDATES_CTE = f"""
    {_SHINGLES_CTE},
    sig AS (SELECT doc_id, {_SIG_SQL} FROM sh WHERE len(s) > 0),
    banded AS (SELECT doc_id, {_BANDS_SQL} FROM sig),
    bands AS (
{_BAND_UNION}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id
    )
"""


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY content_hash
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the content hash; representative =
    min(doc_id). At 100 TB: hash the bytes, never the parsed row."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "text", "doc_id").orderBy("content_hash")


@query(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_CANDIDATES_CTE}
    SELECT doc_a, doc_b FROM pairs
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 3-gram shingles -> 8-element minhash
    (lexicographic min of md5 — engine-portable) -> 4 bands of 2 ->
    self-equi-join on band key. Catches Jaccard ≳ 0.5 pairs; the only
    shuffle is the band-key join."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, "text", "doc_id").orderBy("doc_a", "doc_b")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_CANDIDATES_CTE}
    SELECT p.doc_a, p.doc_b,
           FLOOR(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / len(list_distinct(sa.s || sb.s)) * 1000000 + 0.5) / 1000000
               AS jaccard_3gram
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.doc_a
    JOIN sh sb ON sb.doc_id = p.doc_b
    WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
          / len(list_distinct(sa.s || sb.s)) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup verification: exact distinct-set Jaccard computed ONLY on
    LSH candidates (never all-pairs), thresholded at 0.5. The expensive
    O(n²) stage is bounded by the LSH collision rate."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles(F.col("text"), 3).alias("s"))
    pairs = minhash_candidate_pairs(docs, "text", "doc_id")
    jc = jaccard(F.col("sa.s"), F.col("sb.s"))
    return (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jc >= 0.5)
        .select("doc_a", "doc_b", round6(jc).alias("jaccard_3gram"))
        .orderBy("doc_a", "doc_b")
    )
