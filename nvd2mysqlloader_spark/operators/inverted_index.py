"""Persisted inverted index for lexical (BM25) search — the
build-once/query-many operating mode for text retrieval, the exact
analog of the persisted ANN index tables in
``operators/similarity.py`` (write_*_index / *_topk_from_index).

The reference promises FULLTEXT search (nvd.sql:69,
nvd2mysqlloader.py:401) — MySQL maintains that inverted index
transparently. This module is the engine's explicit version: the
postings relation is materialized ONCE per corpus batch
(``write_inverted_index``), bucketed by token hash so every query
probe (``bm25_topk_from_index``) is a PARTITION-PRUNED read of the
|query-terms| buckets it needs — at 100 TB the probe touches
~|terms|/N_BUCKETS of the postings bytes plus the doclen sidecar,
never the corpus text.

Scoring is shared VERBATIM with the in-memory path
(``plans/retrieval_queries._bm25_scored`` calls
``score_bm25_pivot``): probe == direct is an exact double equality,
which the ``bm25_search_indexed`` verdict query pins every round.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Token-hash partitioning fan-out for the postings table. Small
# enough that empty buckets cost nothing at fixture scale; at 100 TB
# raise it so each bucket is a few parquet files — probe cost stays
# |terms| buckets regardless.
N_BUCKETS = 16


def score_bm25_pivot(per_tf: DataFrame, corpus: DataFrame,
                     n_terms: int, k1: float, b: float) -> DataFrame:
    """BM25 scores from a pivoted per-doc tf relation.

    ``per_tf``: (doc_id, doclen, tf1..tfN) — one row per doc with ≥1
    query-term occurrence. ``corpus``: 1-row (n_docs, avgdl). The df
    scalars derive from ``per_tf`` itself (one extra pass over the
    rollup, never the corpus). The expression tree here is THE
    definition both the direct and the from-index paths share — any
    fork would break the indexed verdict's exact equality.
    """
    stats = per_tf.agg(
        *[F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
          for i in range(1, n_terms + 1)])
    scored = (per_tf.crossJoin(F.broadcast(stats))
              .crossJoin(F.broadcast(corpus)))

    def term_s(i: int):
        idf = F.log(
            ((F.col("n_docs") - F.col(f"df{i}")).cast("double")
             + F.lit(0.5))
            / (F.col(f"df{i}").cast("double") + F.lit(0.5))
            + F.lit(1.0))
        tf_d = F.col(f"tf{i}").cast("double")
        norm = (tf_d + k1 * (F.lit(1.0 - b)
                             + b * (F.col("doclen").cast("double")
                                    / F.col("avgdl"))))
        return idf * (tf_d * F.lit(k1 + 1.0)) / norm

    total = term_s(1)
    for i in range(2, n_terms + 1):
        total = total + term_s(i)
    return scored.select("doc_id", F.round(total, 6).alias("score"))


def write_inverted_index(docs: DataFrame, path: str) -> None:
    """Materialize the inverted index for a documents relation:

    * ``{path}/postings`` — (token, doc_id, tf), bucketed by
      ``pmod(xxhash64(token), N_BUCKETS)`` partition dirs so a query
      probe partition-prunes to its terms' buckets;
    * ``{path}/doclen`` — (doc_id, doclen), the length sidecar the
      scorer's normalization and corpus stats need.

    One explode + one (token, doc_id) rollup; the shuffle carries
    pre-aggregated (token, doc_id, tf) partials, never raw text.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    # tokenize ONCE for both writes: without the persist each write
    # job re-executes the corpus scan + split/filter (the build is a
    # build-once operation, but 2x the corpus text pass is still 2x).
    # NOT derived from the written postings: zero-token docs have no
    # postings but MUST appear in the sidecar with doclen 0, or the
    # probe's n_docs/avgdl would drift from the direct path's.
    base = docs.select("doc_id", toks.alias("toks")).persist()
    try:
        postings = (base.select("doc_id", F.explode("toks").alias("token"))
                    .groupBy("token", "doc_id")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
                    .withColumn("bucket",
                                F.pmod(F.xxhash64("token"),
                                       F.lit(N_BUCKETS)).cast("int")))
        postings.write.partitionBy("bucket").parquet(path + "/postings")
        dl = base.select("doc_id",
                         F.size("toks").cast("bigint").alias("doclen"))
        dl.write.parquet(path + "/doclen")
    finally:
        base.unpersist()


def bm25_topk_from_index(spark: SparkSession, path: str,
                         terms: Sequence[str], k: int = 10,
                         k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Probe the persisted index: read ONLY the query terms' hash
    buckets (partition pruning) + the doclen sidecar, rebuild the
    pivoted per-doc tf relation, and score with the SAME expression
    tree as the direct path. Returns the top-k (doc_id, score) by
    (score desc, doc_id) via the heap."""
    post = spark.read.parquet(path + "/postings")
    # the terms' buckets, computed with the engine's own xxhash64 so
    # the literal list can never drift from the write-side function
    # (k-bounded driver collect: one row per query term)
    buckets = sorted({r.b for r in spark.createDataFrame(
        [(t,) for t in terms], "token string")
        .select(F.pmod(F.xxhash64("token"), F.lit(N_BUCKETS))
                .cast("int").alias("b")).collect()})
    probe = post.filter(F.col("bucket").isin(buckets)
                        & F.col("token").isin(*list(terms)))
    dl = spark.read.parquet(path + "/doclen")
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1)))
        .alias("avgdl"))
    per_tf = (probe.groupBy("doc_id")
              .agg(*[F.sum(F.when(F.col("token") == t, F.col("tf"))
                           .otherwise(F.lit(0).cast("bigint")))
                     .cast("bigint").alias(f"tf{i}")
                     for i, t in enumerate(terms, 1)])
              .join(dl, "doc_id")
              .select("doc_id", "doclen",
                      *[f"tf{i}" for i in range(1, len(terms) + 1)]))
    return (score_bm25_pivot(per_tf, corpus, len(terms), k1, b)
            .orderBy(F.desc("score"), "doc_id")
            .limit(k))
