"""Group statistics, vocabulary analytics, weighted sampling, and
SCD2 interval building — dataset-profiling ops a training pipeline
runs before/while assembling a corpus (north-star extensions; the
reference's surface is single-table SELECTs, nvd2mysqlloader.py:339-420).

Determinism notes per registry rules: moments accumulate as exact
integer sums and every derived double (mean, variance, z-bound) is
written as the IDENTICAL expression tree on both engines — IEEE
+ - * / sqrt are correctly rounded, so equal inputs and equal
parenthesization give bit-equal outputs. Sampling keys derive from
md5, never rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

_TWO52 = 4503599627370496  # 2^52: 13 hex chars of md5 -> uniform (0,1]


@query(
    "zscore_outliers",
    oracle="""
    WITH st AS (
      SELECT lang, count(*) AS n,
             sum(n_chars) AS s, sum(n_chars*n_chars) AS sq
      FROM documents GROUP BY lang),
    m AS (
      SELECT lang, n, CAST(s AS DOUBLE)/n AS mean,
             sqrt(greatest((CAST(sq AS DOUBLE)
                            - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/n,
                           0.0)) AS std
      FROM st)
    SELECT d.lang, min(m.n) AS n_docs,
           min(m.mean) AS mean_chars, min(m.std) AS std_chars,
           CAST(sum(CASE WHEN abs(CAST(d.n_chars AS DOUBLE) - m.mean)
                              > 2*m.std
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM documents d JOIN m ON m.lang = d.lang
    GROUP BY d.lang
    """,
    doc=(
        "per-group z-score outlier profile (length-anomaly detection "
        "before curation): per-lang moments accumulate as exact BIGINT "
        "sum / sum-of-squares (order-independent, engine-exact); mean "
        "and population std are derived in double with one fixed "
        "expression tree so both engines produce bit-equal values; "
        "|x-mean| > 2*std counts the outliers. The 5-row stats table "
        "broadcasts back onto the corpus, so the second pass never "
        "shuffles the fact — at 100 TB this is two scans, one tiny "
        "exchange, and integer-only shuffle traffic."
    ),
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    st = (docs.groupBy("lang")
          .agg(F.count(F.lit(1)).alias("n"),
               F.sum("n_chars").alias("s"),
               F.sum(F.col("n_chars") * F.col("n_chars")).alias("sq")))
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("sq").cast("double")
           - F.col("s").cast("double") * F.col("s").cast("double")
           / F.col("n")) / F.col("n")
    m = st.select("lang", "n", mean.alias("mean"),
                  F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"))
    d = docs.select("lang", "n_chars")
    out = (F.abs(F.col("n_chars").cast("double") - F.col("mean"))
           > 2 * F.col("std")).cast("bigint")
    return (d.join(F.broadcast(m), "lang")
            .groupBy("lang")
            .agg(F.min("n").alias("n_docs"),
                 F.min("mean").alias("mean_chars"),
                 F.min("std").alias("std_chars"),
                 F.sum(out).alias("n_outliers")))


@query(
    "df_top_terms",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    d AS (
      SELECT token, count(DISTINCT doc_id) AS df
      FROM t WHERE token <> '' GROUP BY token)
    SELECT token, df FROM d ORDER BY df DESC, token LIMIT 20
    """,
    doc=(
        "document-frequency vocabulary head (the df side of TF-IDF and "
        "the stopword-candidate list a curation pipeline derives): "
        "explode tokens, count(DISTINCT doc_id) per token, global "
        "top-20 with the token itself as the unique tie-break. "
        "Spark plans the distinct as two partial-agg phases — "
        "(token,doc_id) dedup is map-side-combined before either "
        "exchange — and the global top-k is TakeOrderedAndProject "
        "(per-partition heaps, never a full sort): at 100 TB only "
        "20 rows reach the driver."
    ),
)
def df_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id",
                        F.explode(F.split("text", " ")).alias("token"))
            .filter(F.col("token") != ""))
    dfreq = toks.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df"))
    return dfreq.orderBy(F.desc("df"), "token").limit(20)


@query(
    "weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, doc_id,
             ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                      AS BIGINT) + 1.0) / 4503599627370496.0)
               / n_chars AS es_key
      FROM documents WHERE n_chars > 0),
    r AS (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY es_key DESC, doc_id) AS rk
      FROM keyed)
    SELECT lang, doc_id, rk FROM r WHERE rk <= 5
    """,
    doc=(
        "weighted sampling without replacement (Efraimidis-Spirakis "
        "A-ES): per-doc uniform u from 13 hex chars of md5(doc_id) "
        "(so the draw is reproducible and oracle-checkable — rand() "
        "is neither, and 13 hex chars = 52 bits normalized by 2^52 "
        "to a true (0,1] uniform — ln(u) in (-36, 0]), selection key "
        "ln(u)/weight with weight = n_chars, keep each language's "
        "top-5 keys. Longer docs ARE proportionally likelier "
        "(measured: selected mean n_chars ~390 vs corpus mean ~297 "
        "at sf0.1), yet reruns and engines agree exactly. One shuffle on lang; the rank window keeps 5 rows "
        "per group, so at 100 TB the output is |langs|*5 regardless "
        "of corpus size — the distributed form of reservoir sampling."
    ),
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("bigint") + F.lit(1.0)) / F.lit(float(_TWO52))
    key = F.log(u) / F.col("n_chars")
    keyed = docs.select("lang", "doc_id", key.alias("es_key"))
    w = Window.partitionBy("lang").orderBy(F.desc("es_key"), "doc_id")
    return (keyed.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("lang", "doc_id", "rk"))


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderpriority", "o_orderdate")


@query(
    "column_profile",
    oracle="""
    WITH a AS (
      SELECT count(*) AS n_rows,
             count(DISTINCT o_orderkey) AS d1,
             sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS z1,
             CAST(min(o_orderkey) AS VARCHAR) AS lo1,
             CAST(max(o_orderkey) AS VARCHAR) AS hi1,
             count(DISTINCT o_custkey) AS d2,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS z2,
             CAST(min(o_custkey) AS VARCHAR) AS lo2,
             CAST(max(o_custkey) AS VARCHAR) AS hi2,
             count(DISTINCT o_orderstatus) AS d3,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS z3,
             min(o_orderstatus) AS lo3, max(o_orderstatus) AS hi3,
             count(DISTINCT o_orderpriority) AS d4,
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS z4,
             min(o_orderpriority) AS lo4, max(o_orderpriority) AS hi4,
             count(DISTINCT o_orderdate) AS d5,
             sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS z5,
             CAST(min(o_orderdate) AS VARCHAR) AS lo5,
             CAST(max(o_orderdate) AS VARCHAR) AS hi5
      FROM orders)
    SELECT 'o_orderkey' AS col_name, n_rows,
           d1 AS n_distinct, CAST(z1 AS BIGINT) AS n_null,
           lo1 AS min_val, hi1 AS max_val FROM a
    UNION ALL SELECT 'o_custkey', n_rows, d2, CAST(z2 AS BIGINT),
           lo2, hi2 FROM a
    UNION ALL SELECT 'o_orderstatus', n_rows, d3, CAST(z3 AS BIGINT),
           lo3, hi3 FROM a
    UNION ALL SELECT 'o_orderpriority', n_rows, d4, CAST(z4 AS BIGINT),
           lo4, hi4 FROM a
    UNION ALL SELECT 'o_orderdate', n_rows, d5, CAST(z5 AS BIGINT),
           lo5, hi5 FROM a
    """,
    doc=(
        "one-pass data profiling (the schema-health report a pipeline "
        "runs on every new drop before curation): per-column distinct "
        "count, null count, and min/max for five orders columns, all "
        "computed in a SINGLE aggregate over one scan — Spark plans "
        "the five count(DISTINCT)s with one Expand (5× row multiply, "
        "partial-agged map-side before the only exchange), then the "
        "1-row wide result melts to long (col_name, stats) rows "
        "driver-free. min/max stringify in-engine; the DOUBLE column "
        "is deliberately excluded (float→string formatting is "
        "engine-specific; profile doubles as numeric quantiles "
        "instead — see percentile_disc/value_histogram). At 100 TB "
        "this is one scan and one tiny exchange regardless of "
        "column count."
    ),
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count_distinct(c).alias(f"d_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"z_{c}"),
            F.min(c).cast("string").alias(f"lo_{c}"),
            F.max(c).cast("string").alias(f"hi_{c}"),
        ]
    wide = orders.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(f"d_{c}").alias("n_distinct"),
                 F.col(f"z_{c}").alias("n_null"),
                 F.col(f"lo_{c}").alias("min_val"),
                 F.col(f"hi_{c}").alias("max_val"))
        for c in _PROFILE_COLS])
    return (wide.select("n_rows", F.explode(rows).alias("p"))
            .select(F.col("p.col_name").alias("col_name"),
                    "n_rows",
                    F.col("p.n_distinct").alias("n_distinct"),
                    F.col("p.n_null").alias("n_null"),
                    F.col("p.min_val").alias("min_val"),
                    F.col("p.max_val").alias("max_val")))


@query(
    "scd2_intervals",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) AS t0,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               AS t1
      FROM events)
    SELECT event_type,
           count(*) AS n_intervals,
           CAST(sum(t1 - t0) AS BIGINT) AS total_us,
           max(t1 - t0) AS max_us
    FROM s WHERE t1 IS NOT NULL GROUP BY event_type
    """,
    doc=(
        "SCD2 validity-interval build (slowly-changing-dimension "
        "snapshots from an event log): each event's state is valid "
        "from its timestamp until the user's next event — "
        "effective_to = lead(ts) over (user, ts, event_id) — then "
        "interval durations roll up per state. Exact epoch-micros "
        "integers end to end (ns parquet truncated identically on "
        "both engines). The lead window shuffles on user_id once; "
        "the rollup's second exchange carries only "
        "(event_type, partial sums). The open intervals (t1 IS NULL) "
        "are the CURRENT dimension rows a MERGE would upsert."
    ),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t0 = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("t0", "event_id")
    iv = (ev.select("user_id", "event_type", t0.alias("t0"), "event_id")
          .withColumn("t1", F.lead("t0").over(w))
          .filter(F.col("t1").isNotNull()))
    dur = F.col("t1") - F.col("t0")
    return (iv.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 F.sum(dur).alias("total_us"),
                 F.max(dur).alias("max_us")))


_CORR_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"
)


@query(
    "corr_quantity_price",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             sum(CAST(round(l_quantity * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
             sum(CAST(round(l_quantity * 100) AS BIGINT)
                 * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           {_CORR_EXPR} AS corr_qty_price
    FROM m
    """,
    doc=(
        "Pearson correlation per group from EXACT integer moments: "
        "values quantized to cents (BIGINT) so the five sums are "
        "order-independent and engine-exact; the correlation itself is "
        "ONE shared double expression over those exact moments, "
        "rounded to 6 dp to absorb the final-step ulp (the bm25/PMI "
        "rounding discipline). Never avg()/corr() over doubles — both "
        "are accumulation-order-dependent under parallel partials. One "
        "partial-aggregating exchange at any scale."
    ),
)
def corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    # DuckDB sums of BIGINT are HUGEINT (exact); mirror with DECIMAL(38,0)
    # partials so Spark is exact too, then the shared expression casts
    dec = "decimal(38,0)"
    m = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x.cast(dec)).alias("sx"),
              F.sum(y.cast(dec)).alias("sy"),
              F.sum((x * y).cast(dec)).alias("sxy"),
              F.sum((x * x).cast(dec)).alias("sxx"),
              F.sum((y * y).cast(dec)).alias("syy")))
    return m.select("l_returnflag",
                    F.col("n").alias("n_rows"),
                    F.expr(_CORR_EXPR).alias("corr_qty_price"))


@query(
    "heavy_hitter_keys",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM per_key
    )
    SELECT p.o_custkey, p.n_orders,
           round(CAST(p.n_orders AS DOUBLE) / CAST(t.total AS DOUBLE), 9)
             AS share
    FROM per_key p, tot t
    ORDER BY p.n_orders DESC, p.o_custkey LIMIT 20
    """,
    doc=(
        "skew diagnostics: top-20 heaviest join/agg keys with their "
        "share of all rows — the detection side of the skew toolkit "
        "(operators.scale.salted_join + AQE skew-join are the cure; "
        "this query is how a 100 TB pipeline finds the keys that melt "
        "a shuffle partition). Per-key rollup partial-aggregates; the "
        "1-row total joins back as a broadcast scalar; heap top-20 "
        "(TakeOrderedAndProject), never a global sort."
    ),
)
def heavy_hitter_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_key = (orders.groupBy("o_custkey")
               .agg(F.count(F.lit(1)).alias("n_orders")))
    total = per_key.agg(F.sum("n_orders").cast("bigint").alias("total"))
    share = F.round(F.col("n_orders").cast("double")
                    / F.col("total").cast("double"), 9)
    return (per_key.crossJoin(F.broadcast(total))
            .select("o_custkey", "n_orders", share.alias("share"))
            .orderBy(F.desc("n_orders"), F.asc("o_custkey"))
            .limit(20))
