"""Graph-operator queries — the O(log n) connected-components variant
under the same DuckDB recursive-CTE oracle as the propagation-based
``dedup_cluster_sizes`` (plans/chunking_queries.py).

Registered AFTER every other module so existing registry positions are
stable (the external harness samples a fixed-size prefix; appends must
never reshuffle it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import connected_components_alternating
from ..sources.tpch import load_table
from .registry import query

_CLUSTER_SIZE_ORACLE = """
    WITH RECURSIVE
    k1 AS (SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY md5(text)) AS root
           FROM documents),
    k2 AS (SELECT doc_id,
                  min(doc_id) OVER
                    (PARTITION BY md5(substring(text, 1, 64))) AS root
           FROM documents),
    edges AS (
      SELECT doc_id AS src, root AS dst FROM k1 WHERE doc_id <> root
      UNION SELECT root, doc_id FROM k1 WHERE doc_id <> root
      UNION SELECT doc_id, root FROM k2 WHERE doc_id <> root
      UNION SELECT root, doc_id FROM k2 WHERE doc_id <> root),
    reach(node, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
    assign AS (SELECT node, min(label) AS cluster_id
               FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, count(*) AS cluster_size
              FROM assign GROUP BY cluster_id)
    SELECT cluster_size, count(*) AS n_clusters,
           min(cluster_id) AS min_cluster_id
    FROM sizes GROUP BY cluster_size
"""


@query(
    "dedup_cluster_sizes_logn",
    oracle=_CLUSTER_SIZE_ORACLE,
    doc=(
        "same near-dup clustering as dedup_cluster_sizes but via "
        "alternating large-star/small-star contraction "
        "(operators/graph.connected_components_alternating, Kiveris "
        "SoCC'14): O(log n) rounds regardless of graph diameter — the "
        "variant to reach for when edge relations chain deeply "
        "(transitive record linkage) rather than forming shallow "
        "dedup-bucket stars. Must hash-match the recursive-CTE oracle "
        "AND therefore the propagation variant."
    ),
)
def dedup_cluster_sizes_logn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k1 = docs.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("root"))
    k2 = docs.select(
        "doc_id",
        F.min("doc_id").over(
            Window.partitionBy(F.md5(F.substring("text", 1, 64)))).alias("root"))
    edges = (k1.union(k2)
             .filter(F.col("doc_id") != F.col("root"))
             .select(F.col("doc_id").alias("src"), F.col("root").alias("dst")))
    assign = connected_components_alternating(docs.select("doc_id"), edges,
                                              id_col="doc_id")
    sizes = (assign.groupBy("component")
             .agg(F.count(F.lit(1)).alias("cluster_size")))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"),
                 F.min("component").alias("min_cluster_id")))
