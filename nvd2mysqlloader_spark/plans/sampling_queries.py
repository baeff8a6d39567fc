"""Deterministic sampling + sequence analytics for training-data
pipelines (north-star extensions; the reference has no sampling or
sequence surface — its queries are single-table SELECTs,
nvd2mysqlloader.py:339-420).

Sampling here is HASH-based, never ``rand()``: a row is kept iff a hex
prefix of md5(stable key) falls under a threshold. That makes samples

  * reproducible across runs, engines and partitionings (md5 of the
    same key is the same everywhere — rand() samples can't be
    oracle-checked at all),
  * stable under incremental reruns (a re-ingested row lands in the
    same bucket, so downstream training sets don't churn),
  * embarrassingly parallel at 100 TB: the keep-decision is a
    stateless per-row expression evaluated at the scan — no shuffle,
    no coordination, no seed distribution.

Thresholds compare fixed-width lowercase hex STRINGS ('1a' < '80'),
which orders identically to the integer value on every engine — no
hex→int conversion differences to chase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query


def _hx(col: str, n: int):
    """First ``n`` lowercase-hex chars of md5 of a stable key column."""
    return F.substring(F.md5(F.col(col).cast("string")), 1, n)


@query(
    "deterministic_sample",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          IN ('0','1','2','3')
    GROUP BY lang
    """,
    doc=(
        "deterministic 25% sample of documents: keep iff the first hex "
        "char of md5(doc_id) ∈ {0,1,2,3}. Stateless per-row predicate "
        "evaluated before the only shuffle (the per-lang rollup), "
        "reproducible on any engine/partitioning — the property "
        "rand()-based sampling can't give. Sums stay BIGINT (exact)."
    ),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .filter(_hx("doc_id", 1).isin("0", "1", "2", "3"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars")))


@query(
    "stratified_sample_mix",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           count(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                           < (CASE lang WHEN 'en' THEN '1a'
                                        WHEN 'zh' THEN '40'
                                        ELSE '80' END)
                      THEN 1 END) AS n_kept
    FROM documents
    GROUP BY lang
    """,
    doc=(
        "stratified training-mix sampling: per-language keep-rates "
        "(en≈10%, zh≈25%, rest 50% — downsample the dominant language, "
        "keep the tail) applied as hash thresholds from a broadcast "
        "rate table. Two hex chars of md5(doc_id) compared against the "
        "stratum's threshold string — fixed-width lowercase hex orders "
        "like the integer, so no conversion. One conditional aggregate "
        "pass emits total and kept per stratum; at 100 TB the rate "
        "table joins map-side (broadcast) and the fact never shuffles "
        "before the rollup."
    ),
)
def stratified_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", "1a"), ("zh", "40"), ("de", "80"), ("fr", "80"), ("es", "80")],
        ["r_lang", "threshold"])
    return (docs
            .join(F.broadcast(rates), docs.lang == rates.r_lang)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.count(F.when(_hx("doc_id", 2) < F.col("threshold"),
                                F.lit(1))).alias("n_kept")))


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_type, event_type, count(*) AS n_trans,
           CAST(sum(gap_us) AS DOUBLE) / count(*) AS avg_gap_us
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    doc=(
        "per-user event-sequence bigrams (Markov transition counts + "
        "mean inter-event gap): lag() over (user, time) then a pair "
        "rollup — the sequence-model feature extraction a behavioral "
        "training pipeline runs. Gaps are exact BIGINT micros summed "
        "exactly; ONE double division at the end. The window and "
        "nothing else shuffles the fact (on user_id); ties broken by "
        "event_id so the sequence is total-ordered on both engines."
    ),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (events
           .withColumn("prev_type", F.lag("event_type").over(w))
           .withColumn("gap_us",
                       F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)))
    return (seq.filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", "event_type")
            .agg(F.count(F.lit(1)).alias("n_trans"),
                 (F.sum("gap_us").cast("double")
                  / F.count(F.lit(1))).alias("avg_gap_us")))


_N_SHARDS = 8


@query(
    "training_order",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS k
      FROM documents),
    sharded AS (
      SELECT doc_id, n_chars, k,
             CAST((CASE substring(k, 1, 1)
                     WHEN 'a' THEN 10 WHEN 'b' THEN 11 WHEN 'c' THEN 12
                     WHEN 'd' THEN 13 WHEN 'e' THEN 14 WHEN 'f' THEN 15
                     ELSE CAST(substring(k, 1, 1) AS INT) END)
                  % {_N_SHARDS} AS INT) AS shard
      FROM keyed)
    SELECT shard, doc_id,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos,
           n_chars
    FROM sharded
    """,
    doc=(
        "reproducible global training order + shard assignment (what a "
        "trainer's data loader consumes): every document gets a "
        "deterministic pseudo-random key md5(doc_id||':epoch0') — "
        "change the epoch tag and the whole order reshuffles "
        "reproducibly, with no rand() and no driver coordination — a "
        f"shard in [0, {_N_SHARDS}) from the key's first hex nibble, "
        "and a dense position within its shard (row_number over the "
        "key). One hash-partitioned exchange on shard; each shard "
        "sorts independently, so at 100 TB the global shuffle is "
        "N_SHARDS independent sorts (one per loader worker), never a "
        "single total order. Stable under re-runs and engines: the "
        "oracle reproduces the identical order bit-for-bit."
    ),
)
def training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch0")))
    keyed = docs.select("doc_id", "n_chars", k.alias("k"))
    shard = (F.conv(F.substring("k", 1, 1), 16, 10).cast("int")
             % _N_SHARDS).cast("int")
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (keyed.withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .select("shard", "doc_id", "pos", "n_chars"))


@query(
    "mixture_temperature_weights",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(
                      regexp_split_to_array(coalesce(text, ''), '\\s+'),
                      x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    mx AS (SELECT max(n_tokens) AS max_tokens FROM per)
    SELECT p.source, p.n_docs, p.n_tokens,
           round(sqrt(CAST(p.n_tokens AS DOUBLE))
                 / sqrt(CAST(m.max_tokens AS DOUBLE)), 6) AS rel_weight
    FROM per p CROSS JOIN mx m
    """,
    doc=(
        "temperature-based source mixture weights (the multilingual/"
        "multi-domain sampling formula w_i ∝ n_i^α, here α=0.5): "
        "per-source exact token counts roll up once, and each "
        "source's sampling weight is emitted RELATIVE TO THE LARGEST "
        "source — sqrt(n_i)/sqrt(n_max) — rather than sum-normalized, "
        "deliberately: sqrt and one division are IEEE-correctly-"
        "rounded (bit-exact across engines) while a sum of doubles "
        "has engine-chosen accumulation order; the absolute "
        "probability is one client-side constant away. The 1-row max "
        "broadcasts back; at 100 TB this is a per-source metadata "
        "rollup, the cheapest query in the pipeline."
    ),
)
def mixture_temperature_weights(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.coalesce("text", F.lit("")), r"\s+"),
                    lambda x: x != "")
    per = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size(toks)).cast("bigint").alias("n_tokens")))
    mx = per.agg(F.max("n_tokens").alias("max_tokens"))
    w = F.round(F.sqrt(F.col("n_tokens").cast("double"))
                / F.sqrt(F.col("max_tokens").cast("double")), 6)
    return (per.crossJoin(F.broadcast(mx))
            .select("source", "n_docs", "n_tokens",
                    w.alias("rel_weight")))
