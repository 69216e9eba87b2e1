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


def rotated(h: Column, j: int) -> Column:
    """Hash function j of the rotate-one-hash MinHash scheme: the md5
    hex string rotated left by 4·j chars. Rotations of a uniform 128-bit
    hash give k effectively-independent orderings at 1/k the hashing
    cost, and lexicographic min over uniform hex strings is a valid
    MinHash. DuckDB twin: substr(h, 4j+1) || substr(h, 1, 4j)."""
    if j == 0:
        return h
    return F.concat(F.substring(h, 4 * j + 1, 32), F.substring(h, 1, 4 * j))


def minhash_signature_cols(k: int = N_MINHASH) -> list[Column]:
    """Aggregate expressions computing the k-element signature from a
    per-shingle md5 column ``h``: MIN(rotate_j(h)) as h{j}.

    Expressed as plain MIN aggregates over an exploded (doc, shingle-md5)
    table rather than array higher-order functions on purpose: HOF
    lambdas (transform/array_min) are excluded from whole-stage codegen,
    so the array formulation runs interpreted — measured 8-15x slower on
    bench. MIN over codegen'd string rotations gets map-side partial
    aggregation, so the shuffle carries one row per (doc, partition).
    DuckDB twin per element:
        min(substr(md5('mh|'||s), {4j+1}) || substr(md5('mh|'||s), 1, {4j}))."""
    return [F.min(rotated(F.col("h"), j)).alias(f"h{j}") for j in range(k)]


def band_key_array(n_bands: int = N_BANDS) -> Column:
    """LSH banding over signature columns h0..h7: hash consecutive
    signature pairs into band keys. Each h{j} is referenced exactly once,
    so Catalyst may collapse projections without duplicating work.
    Equal band key => candidate pair. DuckDB twin: md5('b|' || h_{2b} || h_{2b+1})."""
    rows_per_band = N_MINHASH // n_bands
    keys = []
    for b in range(n_bands):
        parts = [F.lit(f"{b}|")] + [
            F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)
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


def pair_array(docs: Column) -> Column:
    """All (a, b) pairs with a < b from a SORTED id array — nested
    index-aware transform + slice, evaluated entirely in codegen."""
    return F.flatten(
        F.transform(
            docs,
            lambda x, i: F.transform(
                F.slice(docs, i + 2, F.size(docs)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def minhash_candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                            n: int = 3) -> DataFrame:
    """doc pairs sharing ≥1 LSH band: explode shingles -> one md5 per
    shingle -> groupBy(doc) MIN-rotations signature -> band keys ->
    groupBy bucket -> in-bucket pair expansion.

    Plan shape matters here:
      * the signature is 8 MIN aggregates over exploded per-shingle
        hashes, NOT array_min(transform(...)) — HOF lambdas are excluded
        from whole-stage codegen and ran interpreted (measured 33s vs 4s
        at sf0.1); MIN gets map-side partial agg, so each doc contributes
        one row per partition to the shuffle;
      * pairs come from collect_list per bucket, NOT a band self-join —
        one shuffle on the band key, no recomputation of the signature
        pipeline for a second join side, and LSH buckets are small by
        construction so the in-bucket expansion is O(bucket²) on tiny
        buckets. At 100 TB this is the standard formulation: the only
        large shuffles are (doc, shingle-hash) pre-agg and the band
        table, both hash-partitioned by key."""
    from ..sources.parquet_io import fan_out

    hashed = (
        fan_out(df)
        .select(F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), n)).alias("s"))
        .select("doc", F.md5(F.concat(F.lit("mh|"), F.col("s"))).alias("h"))
    )
    sig = hashed.groupBy("doc").agg(*minhash_signature_cols())
    bands = sig.select("doc", F.posexplode(band_key_array()).alias("band_idx", "band_key"))
    return (
        bands.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs") > 1)
        .select(F.explode(pair_array(F.col("docs"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
