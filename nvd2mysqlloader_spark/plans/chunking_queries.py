"""Training-data curation queries: document chunking, quality-band
filtering, and near-dup cluster rollup (north-star extensions — the
reference's query surface is single-table SELECTs over the flattened
CVE table, nvd2mysqlloader.py:452-506; none of this exists there).

All chunk/band logic is pure column expressions (sequence/transform/
posexplode, ranking windows) — JVM-side, no Python in the hot path, so
the plans scale as ordinary scans + shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import connected_components
from ..sources.tpch import load_table
from ._helpers import disc_percentile
from .registry import query

# chunk window / stride in characters: 25% overlap between consecutive
# chunks, the usual LLM-context packing shape (window 128, stride 96)
_W, _S = 128, 96


@query(
    "chunk_documents",
    oracle=f"""
    WITH idx AS (
      SELECT lang, text,
             unnest(generate_series(0, (n_chars-1)//{_S})) AS i
      FROM documents WHERE n_chars > 0),
    chunks AS (
      SELECT lang, substring(text, CAST(i*{_S}+1 AS INT), {_W}) AS chunk
      FROM idx)
    SELECT lang, count(*) AS n_chunks,
           CAST(sum(length(chunk)) AS BIGINT) AS sum_chunk_chars,
           count(DISTINCT md5(chunk)) AS n_uniq_chunks
    FROM chunks GROUP BY lang
    """,
    doc=(
        "fixed-window overlapping chunking (window 128 chars, stride 96 "
        "— the LLM-context packing op): chunk starts generated with "
        "sequence(), sliced with transform()+substring, one posexplode; "
        "chunk count per doc = ((n_chars-1) div stride)+1 so every char "
        "is covered and the generator never emits an empty chunk. "
        "All JVM-side; the explode multiplies rows BEFORE the per-lang "
        "rollup, which partial-aggregates map-side — at 100 TB the "
        "chunker is a single scan, no pre-shuffle."
    ),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chunks = (docs.filter(F.col("n_chars") > 0)
              .select("lang", F.posexplode(F.expr(
                  f"transform(sequence(0, int((n_chars-1) div {_S})),"
                  f" i -> substring(text, i*{_S}+1, {_W}))"))
                  .alias("chunk_idx", "chunk")))
    return (chunks.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(F.length("chunk")).alias("sum_chunk_chars"),
                 F.count_distinct(F.md5("chunk")).alias("n_uniq_chunks")))


@query(
    "quality_band_filter",
    oracle="""
    WITH q AS (
      SELECT lang, quantile_disc(n_chars, 0.25) AS p25,
                   quantile_disc(n_chars, 0.75) AS p75
      FROM documents GROUP BY lang)
    SELECT d.lang, min(q.p25) AS p25, min(q.p75) AS p75,
           count(*) AS n_kept,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
    FROM documents d JOIN q ON q.lang = d.lang
    WHERE d.n_chars BETWEEN q.p25 AND q.p75
    GROUP BY d.lang
    """,
    doc=(
        "quality-band curation: keep each language's interquartile band "
        "of document length (drops both truncation artifacts and "
        "concatenation blobs — a standard pretraining filter). Exact "
        "discrete quantiles via value-at-ceil(q·n) ranking (same "
        "convention as DuckDB quantile_disc); the per-lang (p25,p75) "
        "table is 5 rows, broadcast back onto the fact so the band "
        "filter itself never shuffles the corpus. At 100 TB swap the "
        "ranking window for approxQuantile and the plan is identical."
    ),
)
def quality_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    ranked = (docs.select("lang", "n_chars")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy("lang"))))

    def pick(q: float):
        return disc_percentile(q, "n_chars")

    bands = (ranked.groupBy("lang")
             .agg(pick(0.25).alias("p25"), pick(0.75).alias("p75"))
             .withColumnRenamed("lang", "b_lang"))
    return (docs.join(F.broadcast(bands), docs.lang == bands.b_lang)
            .filter(F.col("n_chars").between(F.col("p25"), F.col("p75")))
            .groupBy("lang")
            .agg(F.min("p25").alias("p25"), F.min("p75").alias("p75"),
                 F.count(F.lit(1)).alias("n_kept"),
                 F.sum("n_chars").alias("sum_chars")))


CLUSTER_SIZE_ORACLE = """
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


def cluster_size_rollup(spark: SparkSession, sf_dir: str,
                        cc_fn) -> DataFrame:
    """Shared body for the dedup-clustering queries: build the
    exact-content + 64-char-prefix edge relations over ``documents``,
    collapse them with the given connected-components function, and
    roll up the cluster-size histogram. ONE definition so the
    propagation and alternating variants can never drift apart (they
    share CLUSTER_SIZE_ORACLE too)."""
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
    assign = cc_fn(docs.select("doc_id"), edges, id_col="doc_id")
    sizes = (assign.groupBy("component")
             .agg(F.count(F.lit(1)).alias("cluster_size")))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"),
                 F.min("component").alias("min_cluster_id")))


@query(
    "dedup_cluster_sizes",
    oracle=CLUSTER_SIZE_ORACLE,
    doc=(
        "near-dup clustering: docs sharing exact content (md5(text)) OR "
        "a 64-char prefix fingerprint are edges; connected components "
        "(operators/graph.py min-label propagation) merge the two "
        "relations transitively into dedup groups — the pairs→groups "
        "step every fuzzy-dedup pipeline needs, which no single groupBy "
        "can express. Cluster id = min doc_id (the canonical keeper). "
        "Oracle = DuckDB recursive-CTE transitive closure of the same "
        "edges. Output is the cluster-size histogram."
    ),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cluster_size_rollup(spark, sf_dir, connected_components)
