"""Pipeline-maintenance ops: incremental aggregate-state merge
(materialized-view maintenance) and applyInPandas per-group feature
extraction (north-star extensions; the reference recomputes everything
per run and has no incremental or per-group surface beyond its per-row
loop, nvd2mysqlloader.py:452-506).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

_CUT = "1997-01-01"   # base/delta split for the incremental merge


@query(
    "agg_state_merge",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "incremental materialized-view maintenance: the base partition "
        "(shipped before 1997) and the delta batch are pre-aggregated "
        "INDEPENDENTLY into algebraic states (count, decimal sum), "
        "then the states merge by re-aggregation — count-of-counts "
        "and sum-of-sums. The oracle recomputes from scratch; equality "
        "proves the states are mergeable, which is the property that "
        "lets a 100 TB rollup refresh by touching only the new "
        "partition (and is exactly how Spark's own partial aggregation "
        "and streaming state stores work). Each branch partial-aggs "
        "map-side; the merge exchange carries |flags| rows per branch."
    ),
)
def agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def state(df: DataFrame) -> DataFrame:
        return (df.groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                     .alias("sum_qty")))

    base = state(li.filter(F.col("l_shipdate") < _CUT))
    delta = state(li.filter(F.col("l_shipdate") >= _CUT))
    return (base.unionByName(delta)
            .groupBy("l_returnflag")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("sum_qty").cast("double").alias("sum_qty")))


_FEAT_SCHEMA = ("user_id bigint, n_events bigint, n_error bigint, "
                "n_types bigint, max_gap_us bigint")


def _user_features(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["t", "event_id"])
    gaps = pdf["t"].diff()
    return pd.DataFrame({
        "user_id": [pdf["user_id"].iloc[0]],
        "n_events": [len(pdf)],
        "n_error": [int((pdf["event_type"] == "error").sum())],
        "n_types": [int(pdf["event_type"].nunique())],
        "max_gap_us": [int(gaps.max()) if len(pdf) > 1 else 0],
    })


@query(
    "user_event_features",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap
      FROM events)
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           count(DISTINCT event_type) AS n_types,
           coalesce(max(gap), 0) AS max_gap_us
    FROM s GROUP BY user_id
    """,
    doc=(
        "per-user behavioral features via applyInPandas — the "
        "cogroup-style escape hatch for feature logic that wants a "
        "whole group as one pandas frame (sessions-to-training-"
        "examples, per-entity sequence featurization). Timestamps "
        "arrive pre-converted to exact epoch micros so the pandas diff "
        "is integer arithmetic; every output is an integer, making the "
        "Arrow path oracle-checkable. One shuffle on user_id (the "
        "grouping applyInPandas requires); a group must fit one "
        "worker's memory — per-user event streams do at any corpus "
        "scale. Hot-path note: this shape is for genuinely imperative "
        "features; pure aggregates belong in JVM exprs (see "
        "scd2_intervals for the declarative twin of the gap logic)."
    ),
)
def user_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    src = ev.select("user_id", "event_id", "event_type",
                    F.unix_micros("ts").alias("t"))
    return src.groupBy("user_id").applyInPandas(_user_features,
                                                schema=_FEAT_SCHEMA)


@query(
    "udtf_word_trigrams",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), x -> x <> '')
                        AS toks
               FROM documents WHERE doc_id < 5),
    e AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks) - 2, 0))) AS pos
          FROM t)
    SELECT doc_id, CAST(pos AS INT) AS pos,
           array_to_string(toks[pos + 1:pos + 3], ' ') AS ngram
    FROM e
    """,
    doc=(
        "native Python UDTF (Spark 4 table function, §2 row 51): a "
        "word-trigram generator invoked as a LATERAL table function in "
        "SQL — one input row expands to N output rows inside the Python "
        "worker, per partition, no shuffle (the UDTF analog of "
        "posexplode for logic a builtin can't express). The same "
        "expansion is SQL-expressible here by construction so the "
        "DuckDB oracle can hash-verify the full output; in production "
        "the UDTF body is where non-relational row-expanding logic "
        "(parsers, tokenizers, samplers) lives"
    ),
)
def udtf_word_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class WordTrigrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(len(toks) - 2):
                yield i, " ".join(toks[i:i + 3])

    spark.udtf.register("word_trigrams", WordTrigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, t.pos, t.ngram
        FROM __udtf_docs d, LATERAL word_trigrams(d.text) t
        WHERE d.doc_id < 5
    """)
