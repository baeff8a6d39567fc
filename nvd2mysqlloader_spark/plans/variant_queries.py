"""VARIANT-type queries — Spark 4's binary semi-structured column.

`json_extract` (plans/reference_queries.py, SURVEY §2 #44) navigates
the JSON column with ``get_json_object``, which RE-PARSES the string
for every extraction. The VARIANT path parses once into Spark's binary
variant encoding and every subsequent ``variant_get`` is a cheap
binary probe — at 100 TB with many extracted fields, parse-once is the
difference between one and N passes over every JSON byte (and exactly
the shredding model Parquet VARIANT is standardizing). The oracle is
engine-neutral: DuckDB extracts the same fields with its JSON probes,
so a hash match proves the typed values, absent-path NULL semantics,
and filters agree across the string-JSON and binary-variant paths.

Registered after every other module so registry positions are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query


@query(
    "variant_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(count(*) AS BIGINT) AS n_missing_null
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 25
    GROUP BY event_type
    """,
    doc=(
        "semi-structured navigation via the VARIANT type: parse_json "
        "ONCE into the binary variant encoding, then typed "
        "variant_get probes for every field (no re-parse per "
        "extraction, unlike get_json_object) and try_variant_get "
        "NULL semantics for absent paths (n_missing_null counts rows "
        "where '$.does_not_exist' is NULL — pinned to count(*)). "
        "Hash-matches DuckDB's JSON probes over the same column."
    ),
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    events = events.select("event_type", v.alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    missing = F.try_variant_get("v", "$.does_not_exist", "string")
    return (events.filter(k > 25)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(k).alias("sum_k"),
                 F.max(k).alias("max_k"),
                 F.sum(missing.isNull().cast("bigint"))
                 .alias("n_missing_null")))
