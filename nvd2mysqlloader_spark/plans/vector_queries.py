"""Similarity-search query surface over ``embeddings`` (array<float>).

Brute-force cosine top-k is the exact baseline (and the oracle-checked
path); the LSH-bucketed variant in ``operators.similarity`` is the
100 TB scale path (rows-only check, verified against this baseline in
tests).

Determinism: dot products fold left-to-right in DOUBLE on both engines
(Spark ``aggregate`` HOF; DuckDB ``list_zip``+``list_sum``) — bit-equal,
so ranking ties cannot diverge. DuckDB's own ``list_dot_product`` is NOT
used: it accumulates in float32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..sources.tpch import load_table
from .registry import query

_N_QUERIES = 5   # vectors with vec_id < 5 act as the query set
_TOP_K = 10

_COS_SQL = """
    list_sum(list_transform(list_zip(q.embedding, c.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
"""


@query(
    "cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
             {_COS_SQL} AS cos_sim
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, label, cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) <= {_TOP_K}
    """,
    doc="brute-force cosine top-k ANN baseline (north-star similarity search); query side broadcast, corpus scanned once, per-query heap via ranking window",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "label",
                   F.col("embedding").alias("c_emb"))
    scored = (c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", "label",
                      cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _TOP_K))


@query(
    "embedding_norms",
    oracle="""
    SELECT label, count(*) AS n_vecs,
           sum(CAST(len(embedding) AS BIGINT)) AS total_dims
    FROM embeddings GROUP BY label
    """,
    doc="embedding-table profile: per-label counts and dimensionality (schema sanity for the vector path)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum(F.size("embedding").cast("bigint")).alias("total_dims")))
