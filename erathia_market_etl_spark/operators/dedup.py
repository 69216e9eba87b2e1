"""Deduplication operators: exact, normalized, and MinHash-LSH near-dup.

Design for 100 TB (SURVEY.md §7.3): everything is expressed as DataFrame
transformations whose only shuffles are (a) the groupBy on the content
hash for exact dedup and (b) the self-equi-join on LSH band keys for
near-dup — both key-partitioned, AQE-skew-tolerant, and free of any
driver-side collection. Signatures use cross-engine hashing: md5 hex
strings compared lexicographically (min of uniform hashes is a valid
MinHash), so the DuckDB oracle computes the identical pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

N_MINHASH = 8  # signature length
N_BANDS = 4    # rows-per-band = 2 -> catches jaccard ≳ 0.5 pairs


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles. Guarded: Spark's sequence(1, 0) yields
    [1, 0] (descending!) where DuckDB's generate_series(1, 0) is empty —
    short documents must short-circuit to an empty array.
    DuckDB twin:
        CASE WHEN len(toks) >= n THEN
          list_transform(generate_series(1, len(toks)-n+1),
                         i -> toks[i] || ' ' || ... )
        ELSE [] END
    """
    toks = tokens(text)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingle_col: Column, k: int = N_MINHASH) -> Column:
    """k-element MinHash signature: per hash function j, the
    lexicographic min of md5(j || '|' || shingle). Min over uniform
    hashes — string order works as well as integer order, and md5 is
    bit-identical across engines.
    DuckDB twin per element: list_min(list_transform(sh, s -> md5('j|' || s)))."""

    def hasher(j: int):
        # NB: a two-parameter lambda would make PySpark pass (element,
        # index) — the seed must be captured via closure, not default arg.
        prefix = f"{j}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    return F.array(
        *[F.array_min(F.transform(shingle_col, hasher(j))) for j in range(k)]
    )


def band_keys(sig: Column, n_bands: int = N_BANDS) -> Column:
    """LSH banding: hash consecutive signature pairs into band keys.
    Equal band key => candidate pair. DuckDB twin: md5('b|' || sig[i] || sig[i+1])."""
    rows_per_band = N_MINHASH // n_bands
    keys = []
    for b in range(n_bands):
        parts = [F.lit(f"{b}|")] + [
            F.element_at(sig, b * rows_per_band + r + 1) for r in range(rows_per_band)
        ]
        keys.append(F.md5(F.concat(*parts)))
    return F.array(*keys)


def jaccard(a: Column, b: Column) -> Column:
    """Distinct-set Jaccard over shingle arrays.
    DuckDB twin: len(list_intersect(a, b)) / len(list_distinct(a || b))
    (list_intersect is distinct-valued)."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one shuffle on the md5 key. Returns
    one row per distinct content with the representative (min id) and
    multiplicity."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("representative_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                            n: int = 3) -> DataFrame:
    """doc pairs sharing ≥1 LSH band: shingle -> minhash -> band ->
    self-equi-join. The join is on (band_idx, band_key) — at scale the
    band table is hash-partitioned by key, so candidates co-locate and
    nothing but genuinely-colliding documents ever meet."""
    sig = (
        df.select(F.col(id_col).alias("doc"), shingles(F.col(text_col), n).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc", band_keys(minhash_signature(F.col("sh"))).alias("bands"))
        .select("doc", F.posexplode("bands").alias("band_idx", "band_key"))
    )
    left = sig.select(F.col("doc").alias("doc_a"), "band_idx", "band_key")
    right = sig.select(F.col("doc").alias("doc_b"), "band_idx", "band_key")
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
