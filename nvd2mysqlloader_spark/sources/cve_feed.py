"""NVD CVE 1.1 feed source.

Reference behavior: whole-file ``json.loads`` into driver memory, then a
Python loop over ``data['CVE_Items']`` (nvd2mysqlloader.py:524, 452).
Spark-first: a schema'd distributed multiLine JSON scan + ``explode`` —
one DataFrame row per CVE, parallel by file. Never ``inferSchema``: the
explicit nullable StructType reproduces every try/except-absent-field
default of the reference as plain NULL semantics (SURVEY §2 #5, #6, #18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CVE_FEED_SCHEMA


def read_feed(spark: SparkSession, path: str) -> DataFrame:
    """Read one or many feed files (glob ok) → raw feed documents.

    ``multiLine=True`` because each feed is a single pretty-printed JSON
    document. ``PERMISSIVE`` + ``_corrupt_record`` surfaces malformed
    feeds as rows instead of the reference's silent ``except: pass``
    (nvd2mysqlloader.py:186-188 → SURVEY §4.1 'catch-all').
    """
    # StructType.add mutates in place — copy so the shared schema
    # constant stays pristine across calls
    schema = T.StructType(list(CVE_FEED_SCHEMA.fields)).add("_corrupt_record", "string")
    return (spark.read.schema(schema)
            .option("multiLine", True)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def explode_items(feed: DataFrame) -> DataFrame:
    """One row per CVE record — the ``for cve in data['CVE_Items']``
    loop (nvd2mysqlloader.py:452) as a generator expression."""
    return (feed
            .filter(F.col("CVE_Items").isNotNull())
            .select(F.explode("CVE_Items").alias("cve")))
