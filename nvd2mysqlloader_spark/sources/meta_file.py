""".meta sidecar parser (nvd2mysqlloader.py:46-64).

Feed sidecars are tiny ``key:value`` text files. Parse = value after
the FIRST colon — deliberately NOT the reference's
``lstrip('sha256:')``, whose char-set semantics corrupt hex digests
beginning with any of {s,h,a,2,5,6} (SURVEY §2 #2; the reference's own
docstring example ``64310FE…`` would lose its leading 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_KEYS = ("lastModifiedDate", "size", "zipSize", "gzSize", "sha256")


def parse_meta_text(text: str) -> dict[str, str]:
    """Pure-Python twin of :func:`parse_meta` for task-side use (the
    nvdfeed custom data source reads the sidecar inside its file
    task): value after the FIRST colon, CR stripped — same semantics,
    one file's worth."""
    out: dict[str, str] = {}
    for line in text.splitlines():
        line = line.rstrip("\r")
        if ":" in line:
            k, v = line.split(":", 1)
            if k:
                out[k] = v
    return out


def parse_meta(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.meta`` files (glob ok) → one row per file:
    (download_name, lastModifiedDate, size, zipSize, gzSize, sha256).

    ``download_name`` is the file stem, mirroring the reference's feed
    naming (nvdcve-1.1-<year>); sizes cast to long.
    """
    lines = (spark.read.text(path)
             .withColumn("file", F.input_file_name())
             .withColumn("value", F.regexp_replace("value", "\r$", "")))
    kv = lines.select(
        F.regexp_extract("file", r"([^/]+)\.meta$", 1).alias("download_name"),
        F.regexp_extract("value", r"^([^:]+):", 1).alias("key"),
        F.regexp_extract("value", r"^[^:]+:(.*)$", 1).alias("val"),
    ).filter(F.col("key") != "")
    pivoted = (kv.groupBy("download_name")
               .pivot("key", list(META_KEYS))
               .agg(F.first("val")))
    return pivoted.select(
        "download_name",
        F.col("lastModifiedDate"),
        F.col("size").cast("long").alias("size"),
        F.col("zipSize").cast("long").alias("zipSize"),
        F.col("gzSize").cast("long").alias("gzSize"),
        F.col("sha256"),
    )
