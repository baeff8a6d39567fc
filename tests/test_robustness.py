"""ANSI-mode robustness: malformed/degenerate values must yield NULLs
or empty arrays, never abort the job (Spark 4 defaults ANSI on, where
a bad cast / out-of-bounds element_at / divide-by-zero is an ERROR —
the clean test fixtures never hit these, real feeds will)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.functions.cpe import split_cpe23
from nvd2mysqlloader_spark.functions.text import (shingle3_udf, tokens,
                                                  word_shingles)
from nvd2mysqlloader_spark.functions.vectors import cosine


def test_tokens_never_emit_empty_strings(spark):
    df = spark.createDataFrame(
        [("\n\t",), ("",), (None,), ("  a  b  ",), ("\tx",)], ["t"])
    rows = df.select(tokens("t").alias("toks")).collect()
    got = [r["toks"] for r in rows]
    assert got == [[], [], [], ["a", "b"], ["x"]]


def test_word_shingles_short_docs_yield_empty(spark):
    df = spark.createDataFrame([("one two",), ("one",), ("",)], ["t"])
    rows = df.select(
        word_shingles(tokens("t"), 3).alias("s")).collect()
    assert [r["s"] for r in rows] == [[], [], []]


def test_shingler_udf_matches_jvm_on_unicode_whitespace(spark):
    # NBSP must NOT split (Java/RE2 \s is ASCII): UDF and HOF twin agree
    text = "a b c d e"
    df = spark.createDataFrame([(text,)], ["t"])
    [udf_row] = df.select(shingle3_udf()("t").alias("s")).collect()
    [hof_row] = df.select(
        F.array_distinct(word_shingles(tokens("t"), 3)).alias("s")).collect()
    assert udf_row["s"] == hof_row["s"] == ["a b c d", "c d e"]


def test_cosine_zero_norm_is_null_not_error(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])], ["a", "b"])
    rows = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert rows[0]["c"] is None
    assert abs(rows[1]["c"] - 1.0) < 1e-12


def test_malformed_cpe_yields_nulls_not_error(spark):
    df = spark.createDataFrame(
        [("garbage",), ("cpe:2.3:a:v:p:1.0:*:*:*:*:*:*:*",), (None,)],
        ["uri"])
    rows = df.select(split_cpe23("uri").alias("s")).collect()
    assert rows[0]["s"]["vendor"] is None
    assert rows[1]["s"] == ("a", "v", "p", "1.0")
    assert rows[2]["s"]["part"] is None


def test_missing_published_date_does_not_abort_ingest(spark, tmp_path):
    """A CVE without publishedDate flattens to published_year 0 (the
    sentinel) under ANSI mode rather than CAST_INVALID_INPUT."""
    import json

    landing = tmp_path / "landing"
    landing.mkdir()
    item = {"cve": {"CVE_data_meta": {"ID": "CVE-2024-0000001"},
                    "description": {"description_data": [
                        {"lang": "en", "value": "undated"}]}},
            "lastModifiedDate": "2024-06-01T00:00Z"}
    feed = {"CVE_Items": [item]}
    (landing / "nvdcve-1.1-2024.json").write_text(json.dumps(feed))
    (landing / "nvdcve-1.1-2024.meta").write_text(
        "lastModifiedDate:2024-06-01T00:00:00-04:00\r\nsha256:ab\r\n")

    from nvd2mysqlloader_spark.ingest import run_ingest
    stats = run_ingest(spark, str(landing), str(tmp_path / "wh"))
    assert stats["cves"] == 1
    silver = spark.read.parquet(str(tmp_path / "wh" / "nvd"))
    [row] = silver.select("cve_id", "published_year").collect()
    assert row["cve_id"] == "CVE-2024-0000001"
    assert row["published_year"] == 0


def test_oracle_canon_timezone_independent():
    """The harness canonicalizes Spark-side naive timestamps from
    machine-local to UTC, so value hashes match on any host timezone
    (Spark's collect() renders TimestampType in the driver machine's
    local zone; DuckDB returns naive UTC)."""
    import datetime
    import os
    import time

    from .oracle_harness import _canon

    prev = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        # a UTC instant rendered by Spark on an EST machine
        local_rendering = datetime.datetime(2024, 1, 1, 5, 0, 0)
        assert _canon(local_rendering, localize=True) == \
            "2024-01-01 10:00:00"
        # DuckDB side: already naive UTC, untouched
        assert _canon(datetime.datetime(2024, 1, 1, 10, 0, 0)) == \
            "2024-01-01 10:00:00"
        # TIMESTAMP_NTZ columns (localize not set — compare() only
        # flags tz-aware TimestampType columns) pass through verbatim:
        # NTZ values have no local-zone semantics to correct for
        assert _canon(datetime.datetime(2024, 1, 1, 5, 0, 0)) == \
            "2024-01-01 05:00:00"
    finally:
        if prev is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev
        time.tzset()


def test_oracle_canon_separator_and_sentinels_collision_free():
    from .oracle_harness import _lines

    # 'a|b','c' vs 'a','b|c' must canonicalize differently
    assert _lines(["x", "y"], [("a|b", "c")]) != \
        _lines(["x", "y"], [("a", "b|c")])
    # a literal 'nan' string is not a NaN double; literal '∅' not NULL
    assert _lines(["x"], [("nan",)]) != _lines(["x"], [(float("nan"),)])
    assert _lines(["x"], [("∅",)]) != _lines(["x"], [(None,)])


def test_oracle_compare_ntz_column_on_non_utc_host(spark):
    """ADVICE r4 end-to-end: events.ts is TIMESTAMP_NTZ — it collects
    as a naive datetime but has NO local-zone semantics, so the
    harness's local→UTC correction must not touch it. Under a shifted
    host timezone the old code converted NTZ values too (spurious 5h
    shift → hash mismatch); compare() now keys the conversion on the
    Spark column type."""
    import os
    import time

    from .oracle_harness import compare

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    def q(spark, sf_dir):
        return (spark.read.parquet(f"{sf_dir}/events.parquet")
                .orderBy("event_id").limit(20).select("event_id", "ts"))

    sql = ("SELECT event_id, ts FROM "
           "(SELECT event_id, ts FROM events ORDER BY event_id LIMIT 20)")

    prev = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        ok, msg = compare(spark, sf, q, sql)
        assert ok, msg
    finally:
        if prev is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev
        time.tzset()
