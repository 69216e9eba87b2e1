"""Similarity-search queries over the embeddings table (extension
surface): brute-force cosine top-k (baseline), sign-bit-LSH bucketed
top-k (scale path), and embedding-cosine near-dup pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine, round6, sign_bucket
from ..sources.parquet_io import load_table
from .registry import query

QUERY_VEC_ID = 0  # fixture row used as the search query
TOP_K = 10

_COSINE_SQL = """
    list_sum(list_transform(list_zip({a}, {b}),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
    / (SQRT(list_sum(list_transform(list_zip({a}, {a}),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))
       * SQRT(list_sum(list_transform(list_zip({b}, {b}),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))))
"""

_BUCKET_SQL = "||".join(
    f"(CASE WHEN {{v}}[{i + 1}] > 0 THEN '1' ELSE '0' END)" for i in range(8)
)


def _query_vector(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("query_vec")
    )


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS query_vec FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           FLOOR(({_COSINE_SQL.format(a='e.embedding', b='q.query_vec')})
                 * 1000000 + 0.5) / 1000000 AS cosine_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the 1-row query vector, score
    every embedding with zip_with/aggregate HOFs (JVM-side, no UDF),
    TakeOrderedAndProject for the top k. Full-scan but perfectly
    parallel — the correctness baseline for any ANN variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label",
            round6(cosine(F.col("embedding"), F.col("query_vec"))).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "sim_topk_lsh_bucket",
    oracle=f"""
    WITH q AS (SELECT embedding AS query_vec,
                      {_BUCKET_SQL.format(v='embedding')} AS qbucket
               FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           FLOOR(({_COSINE_SQL.format(a='e.embedding', b='q.query_vec')})
                 * 1000000 + 0.5) / 1000000 AS cosine_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
      AND {_BUCKET_SQL.format(v='e.embedding')} = q.qbucket
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def sim_topk_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-bit LSH
    bucket (~1/256 of the data). At scale, write the table partitioned by
    bucket and this filter becomes partition pruning — the scan itself
    shrinks 256×."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir).select(
        "query_vec", sign_bucket(F.col("query_vec")).alias("qbucket")
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("bucket", sign_bucket(F.col("embedding")))
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id", "label",
            round6(cosine(F.col("embedding"), F.col("query_vec"))).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "sim_near_dup_pairs",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               {_BUCKET_SQL.format(v='embedding')} AS bucket
        FROM embeddings
    )
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
           FLOOR(({_COSINE_SQL.format(a='x.embedding', b='y.embedding')})
                 * 1000000 + 0.5) / 1000000 AS cosine_sim
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE ({_COSINE_SQL.format(a='x.embedding', b='y.embedding')}) >= 0.9
    ORDER BY vec_a, vec_b
    """,
)
def sim_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: bucket self-join (never all-pairs) +
    cosine threshold — the embedding analog of MinHash-LSH dedup."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", sign_bucket(F.col("embedding")).alias("bucket")
    )
    x = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket")
    y = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket")
    cs = cosine(F.col("ea"), F.col("eb"))
    return (
        x.join(y, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cs >= 0.9)
        .select("vec_a", "vec_b", round6(cs).alias("cosine_sim"))
        .orderBy("vec_a", "vec_b")
    )
