"""Sequence packing, per-group sampling, embedding centroids, and
time-range rolling windows — training-data assembly ops (north-star
extensions; none exist in the reference, whose surface is single-table
SELECTs, nvd2mysqlloader.py:452-506).

Determinism notes per registry rules: running sums and rolling sums
aggregate in DECIMAL; per-dimension centroid sums promote FLOAT →
DOUBLE (exact) → DECIMAL so the shuffle order can't change the value;
every ranking carries a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

_PACK = 4096          # context-window capacity in chars
_EMB_DIM = 64         # fixture embedding dimensionality (constant)


@query(
    "group_sample_topk",
    oracle="""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM documents) t
    WHERE rk <= 10
    """,
    doc=(
        "deterministic k-per-group sample: rank docs inside each "
        "language by md5(doc_id) (a uniform but reproducible shuffle "
        "order) and keep the first 10 — the fixed-size per-stratum "
        "pick a training-mix builder uses where rand() ordering would "
        "be unverifiable. One shuffle on lang; at scale the rank "
        "window partial-sorts per partition and k rows per group "
        "survive."
    ),
)
def group_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (docs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 10)
            .select("lang", "doc_id", "rk"))


@query(
    "sequence_packing",
    oracle=f"""
    WITH cum AS (
      SELECT lang, n_chars,
             sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS c
      FROM documents),
    packs AS (
      SELECT lang, (c - n_chars) // {_PACK} AS pack_id,
             count(*) AS docs_in_pack,
             sum(n_chars) AS chars_in_pack
      FROM cum GROUP BY lang, (c - n_chars) // {_PACK})
    SELECT lang, count(*) AS n_packs,
           CAST(sum(docs_in_pack) AS BIGINT) AS n_docs,
           CAST(sum(chars_in_pack) AS BIGINT) AS sum_chars,
           max(docs_in_pack) AS max_docs_in_pack
    FROM packs GROUP BY lang
    """,
    doc=(
        "sequence packing (context-window assembly): documents stream "
        "per language in doc_id order; a doc's pack is the 4096-char "
        "window its running-sum START offset falls in — fill-then-"
        "overflow packing as one running-sum window + integer "
        "division, no greedy loop. The running sum is exact BIGINT. "
        "One shuffle for the window; pack rollup reuses the same "
        "partitioning (lang prefix), then the tiny per-pack relation "
        "aggregates again. The per-(lang,pack) layer is what a writer "
        "would `partitionBy` to emit one training shard per pack."
    ),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = docs.select(
        "lang", "n_chars",
        F.sum("n_chars").over(w).alias("c"))
    packs = (cum
             .withColumn("pack_id",
                         F.expr(f"(c - n_chars) div {_PACK}"))
             .groupBy("lang", "pack_id")
             .agg(F.count(F.lit(1)).alias("docs_in_pack"),
                  F.sum("n_chars").alias("chars_in_pack")))
    return (packs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.sum("docs_in_pack").alias("n_docs"),
                 F.sum("chars_in_pack").alias("sum_chars"),
                 F.max("docs_in_pack").alias("max_docs_in_pack")))


@query(
    "bfd_packing_verdict",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           TRUE AS no_overflow,
           TRUE AS each_doc_packed_once,
           TRUE AS half_full_bound
    FROM documents WHERE n_chars <= {_PACK}
    """,
    doc=(
        "best-fit-decreasing sequence packing "
        "(operators/packing.bfd_pack) — the padding-minimizing "
        "context-window assembler, verdict-oracled: the packing "
        "itself is algorithmic (not SQL-expressible), but its "
        "guarantees are exactly checkable — no pack exceeds capacity, "
        "every doc lands in exactly one pack, and BFD's classic "
        "quality bound (at most ONE bin per shard ≤ half full, hence "
        "n_packs ≤ 2·total/capacity + n_shards) rides as TRUE beside "
        "exact doc-count and char-sum anchors DuckDB recomputes. "
        "Scale shape: deterministic md5 shards → independent "
        "applyInPandas BFD per shard (one exchange), bin count within "
        "one-per-shard of a global pack."
    ),
)
def bfd_packing_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from ..operators._lineage import cut_lineage
    from ..operators.packing import bfd_pack
    n_shards = 16
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("n_chars") <= _PACK))
    packed = bfd_pack(docs, "doc_id", "n_chars", _PACK,
                      n_shards=n_shards).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        per_pack = (packed.groupBy("pack_id")
                    .agg(F.sum("n_chars").alias("fill")))
        pack_stats = per_pack.agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.max("fill").alias("max_fill"),
            F.sum("fill").alias("sum_fill"))
        doc_stats = packed.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("doc_id").alias("n_ids"),
            F.sum("n_chars").alias("sum_chars"))
        from ._helpers import one_row
        verdict = (one_row(doc_stats, pack_stats)
                   .select(
                       F.col("n_rows").alias("n_docs"),
                       "sum_chars",
                       (F.col("max_fill") <= _PACK).alias("no_overflow"),
                       ((F.col("n_ids") == F.col("n_rows"))
                        & (F.col("sum_fill") == F.col("sum_chars")))
                       .alias("each_doc_packed_once"),
                       (F.col("n_packs")
                        <= 2.0 * F.col("sum_chars") / _PACK + n_shards)
                       .alias("half_full_bound")))
        return cut_lineage(verdict)
    finally:
        packed.unpersist()


@query(
    "embedding_centroids",
    oracle=f"""
    SELECT label, i AS dim,
           CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6)
                         AS BIGINT)) AS DOUBLE) / 1e6 / count(*)
             AS centroid,
           count(*) AS n_vecs
    FROM embeddings, generate_series(1, {_EMB_DIM}) AS t(i)
    GROUP BY label, i
    """,
    doc=(
        "per-label centroid of the embedding column (the M-step of "
        "k-means / class prototypes for retrieval): posexplode to "
        "(label, dim, value), per-dim mean accumulated in FIXED-POINT "
        "MICROS — round(v·1e6) to BIGINT, exact integer sum, one "
        "double division at the end. Float→decimal casts tie-break "
        "differently across engines in the 13th digit; integer "
        "accumulation is order-independent AND engine-exact, and at "
        "100 TB it's also the cheap path (longs, not decimals, "
        "through the shuffle). One exchange on (label, dim) — "
        "64·|labels| cells regardless of corpus size after map-side "
        "partial aggregation."
    ),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    micros = F.round(F.col("v").cast("double") * 1e6).cast("bigint")
    return (ex.groupBy("label", (F.col("pos") + 1).alias("dim"))
            .agg((F.sum(micros).cast("double") / F.lit(1e6)
                  / F.count(F.lit(1))).alias("centroid"),
                 F.count(F.lit(1)).alias("n_vecs")))


@query(
    "rolling_time_range",
    oracle="""
    WITH r AS (
      SELECT user_id,
             sum(CAST(value AS DECIMAL(18,4))) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS rsum,
             count(*) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS rn
      FROM events)
    SELECT user_id, CAST(max(rsum) AS DOUBLE) AS max_rolling_sum,
           max(rn) AS max_rolling_n
    FROM r GROUP BY user_id
    """,
    doc=(
        "value-based RANGE frame (trailing 1 hour in epoch micros) — "
        "the rolling-window shape ROWS frames can't express when "
        "events are irregularly spaced: per-user trailing-hour "
        "activity sum + count, reduced to each user's peak. Rolling "
        "sums accumulate in DECIMAL (exact under reordering of equal "
        "timestamps); frame bounds are integer micros on both "
        "engines. One shuffle on user_id shared by window and rollup."
    ),
)
def rolling_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    frame = (Window.partitionBy("user_id").orderBy(us)
             .rangeBetween(-3_600_000_000, 0))
    roll = ev.select(
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(frame).alias("rsum"),
        F.count(F.lit(1)).over(frame).alias("rn"))
    return (roll.groupBy("user_id")
            .agg(F.max("rsum").cast("double").alias("max_rolling_sum"),
                 F.max("rn").alias("max_rolling_n")))
