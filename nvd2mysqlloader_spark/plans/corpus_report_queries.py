"""Corpus composition reports — the cross-source duplication matrix
and token-budget carving that mixture planning runs before training.
North-star extensions (the reference has no corpus surface; its query
layer is single-table CVE SELECTs, nvd2mysqlloader.py:339-420).

``cross_source_overlap``: which pairs of ingest sources share content?
The standard pre-mix audit (two crawls of the same site, a dataset
re-released under a new name) — counts shared 5-gram shingles per
source pair and the Jaccard similarity of their shingle sets.

``token_budget_carve``: given a per-source token quota, keep each
source's best documents (quality rank) until the budget fills — the
selection step that turns "weights say 12% web, 3% code" into an
actual document set. One window per source, exact integer token
arithmetic, no joins.

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

_N = 5              # shingle width (words) for the overlap matrix
_BUDGET = 600       # per-source token quota for the carve


@query(
    "cross_source_overlap",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents WHERE len(list_filter(
             string_split(text, ' '), x -> x <> '')) >= {_N}),
    g AS (
      SELECT DISTINCT source,
             md5(array_to_string(list_slice(t, i, i + {_N - 1}), ' '))
               AS gram
      FROM (SELECT source, t,
                   unnest(generate_series(1, len(t) - {_N - 1})) AS i
            FROM w)),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams
           FROM g GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2)
    SELECT p.source_a, p.source_b, p.n_shared,
           sa.n_grams AS grams_a, sb.n_grams AS grams_b,
           round(CAST(p.n_shared AS DOUBLE)
                 / CAST(sa.n_grams + sb.n_grams - p.n_shared
                        AS DOUBLE), 6) AS jaccard
    FROM pairs p
    JOIN sz sa ON sa.source = p.source_a
    JOIN sz sb ON sb.source = p.source_b
    """,
    doc=(
        "cross-source duplication matrix: distinct 5-gram shingles "
        "per source (md5'd to fixed width), self-joined on the "
        "shingle to count shared grams per source pair, plus each "
        "pair's Jaccard similarity — the audit that catches two "
        "ingest sources feeding the same underlying content before "
        "it double-counts in the training mix. The per-gram fan-out "
        "is bounded by the SOURCE count (each gram matches ≤ "
        "|sources|² pairs regardless of corpus size), the distinct "
        "relation shuffles 128-bit digests never text, and the "
        "source-size table broadcasts back onto the ≤|sources|² "
        "pair rows. At 100 TB the same plan holds: the only "
        "data-sized exchange is the per-source shingle distinct."
    ),
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split("text", " "), lambda x: x != "")
    w = docs.select("source", t.alias("t")).filter(F.size("t") >= _N)
    # the distinct (source, gram) relation feeds BOTH self-join sides
    # and the size rollup — materialize the tokenize+md5+distinct
    # pipeline once (the repo's eager shared-input idiom)
    from ..operators._lineage import cut_lineage
    g = cut_lineage(w.select("source", F.explode(F.expr(
        f"transform(sequence(0, size(t) - {_N}),"
        f" i -> md5(array_join(slice(t, i + 1, {_N}), ' ')))"
    )).alias("gram")).distinct())
    sz = g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_grams"))
    a, b = g.alias("a"), g.alias("b")
    pairs = (a.join(b, (F.col("a.gram") == F.col("b.gram"))
                    & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("source_a"),
                      F.col("b.source").alias("source_b"))
             .agg(F.count(F.lit(1)).alias("n_shared")))
    sa = sz.select(F.col("source").alias("source_a"),
                   F.col("n_grams").alias("grams_a"))
    sb = sz.select(F.col("source").alias("source_b"),
                   F.col("n_grams").alias("grams_b"))
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("grams_a") + F.col("grams_b")
           - F.col("n_shared")).cast("double"), 6)
    return (pairs.join(F.broadcast(sa), "source_a")
            .join(F.broadcast(sb), "source_b")
            .select("source_a", "source_b", "n_shared",
                    "grams_a", "grams_b", jac.alias("jaccard")))


@query(
    "token_budget_carve",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             CAST(len(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS BIGINT) AS n_toks
      FROM documents),
    r AS (
      SELECT doc_id, source, n_toks,
             sum(n_toks) OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM d),
    kept AS (SELECT * FROM r WHERE cum <= {_BUDGET})
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_toks) AS BIGINT) AS kept_tokens,
           min(doc_id) AS first_doc,
           round(CAST(sum(n_toks) AS DOUBLE) / {_BUDGET}.0, 6)
             AS budget_used
    FROM kept GROUP BY source
    """,
    doc=(
        "token-budget corpus carving: each source keeps its "
        "highest-quality documents (n_chars rank, doc_id tie-break) "
        "until a fixed per-source token quota fills — the selection "
        "step that turns mixture weights into an actual document set "
        "(sources under budget contribute everything; sources over "
        "budget are cut at the quota boundary). One window per "
        "source computes the running token sum — a single exchange "
        "keyed on source, exact BIGINT arithmetic, no joins — then "
        "the per-source utilization rollup reuses the same "
        "partitioning. At 100 TB this is the cheapest possible "
        "shape: the corpus shuffles once and the output is "
        "|sources| rows."
    ),
)
def token_budget_carve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    d = docs.select("doc_id", "source", "n_chars",
                    toks.cast("bigint").alias("n_toks"))
    w = (Window.partitionBy("source")
         .orderBy(F.desc("n_chars"), "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    kept = (d.withColumn("cum", F.sum("n_toks").over(w))
            .filter(F.col("cum") <= _BUDGET))
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("n_toks").alias("kept_tokens"),
                 F.min("doc_id").alias("first_doc"),
                 F.round(F.sum("n_toks").cast("double")
                         / F.lit(float(_BUDGET)), 6)
                 .alias("budget_used")))


@query(
    "contamination_overlap_ratio",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 x -> x <> '') AS t
      FROM documents
      WHERE len(list_filter(string_split(text, ' '),
                            x -> x <> '')) >= {_N}),
    g AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(t, i, i + {_N - 1}), ' '))
               AS gram
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - {_N - 1})) AS i
            FROM w)),
    test AS (
      SELECT DISTINCT gram FROM g
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '10'),
    train AS (
      SELECT doc_id, gram FROM g
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '10'),
    hitrate AS (
      SELECT tr.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN te.gram IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      FROM train tr LEFT JOIN test te ON te.gram = tr.gram
      GROUP BY tr.doc_id),
    banded AS (
      SELECT CASE WHEN n_hits * 2 >= n_grams THEN 'contaminated'
                  WHEN n_hits > 0 THEN 'partial'
                  ELSE 'clean' END AS band,
             n_grams, n_hits
      FROM hitrate)
    SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS grams,
           CAST(sum(n_hits) AS BIGINT) AS gram_hits
    FROM banded GROUP BY band
    """,
    doc=(
        "thresholded decontamination (the ratio form production "
        "pipelines use — a doc is contaminated when a FRACTION of "
        "its n-grams hits the held-out set, here ≥50%, not when any "
        "single gram does; decontaminate_ngrams is the any-gram "
        "form): per-training-doc hit rates against the distinct "
        "test-gram relation, banded clean/partial/contaminated with "
        "exact gram accounting. The gram stream counts hits WITH "
        "MULTIPLICITY (a repeated contaminated gram weighs its "
        "repetitions — that is what the ratio means). Same probe "
        "shape as decontaminate_ngrams: the distinct holdout side "
        "broadcasts (or blooms at 100 TB), training grams are never "
        "distinct'd or join-shuffled, and the per-doc rollup is the "
        "one doc-keyed exchange."
    ),
)
def contamination_overlap_ratio(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split("text", " "), lambda x: x != "")
    w = docs.select("doc_id", t.alias("t")).filter(F.size("t") >= _N)
    # the gram stream feeds BOTH the holdout distinct and the train
    # probe — materialize the tokenize+md5 pipeline once
    from ..operators._lineage import cut_lineage
    g = cut_lineage(w.select("doc_id", F.explode(F.expr(
        f"transform(sequence(0, size(t) - {_N}),"
        f" i -> md5(array_join(slice(t, i + 1, {_N}), ' ')))"
    )).alias("gram")))
    holdout = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    test = (g.filter(holdout < "10").select("gram").distinct()
            .withColumn("hit", F.lit(1)))
    train = g.filter(holdout >= "10")
    hitrate = (train.join(F.broadcast(test), "gram", "left")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.coalesce("hit", F.lit(0)))
                    .cast("bigint").alias("n_hits")))
    band = (F.when(F.col("n_hits") * 2 >= F.col("n_grams"),
                   "contaminated")
            .when(F.col("n_hits") > 0, "partial")
            .otherwise("clean"))
    return (hitrate.select(band.alias("band"), "n_grams", "n_hits")
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_grams").alias("grams"),
                 F.sum("n_hits").alias("gram_hits")))


@query(
    "source_drift_kl",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS token
      FROM documents),
    vocab AS (
      SELECT token FROM (
        SELECT token, count(*) AS c FROM toks
        GROUP BY 1 ORDER BY c DESC, token LIMIT 100)),
    cnt AS (
      SELECT t.source, t.token, CAST(count(*) AS BIGINT) AS c
      FROM toks t JOIN vocab v USING (token)
      GROUP BY 1, 2),
    stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS st
             FROM cnt GROUP BY source),
    gcnt AS (SELECT token, CAST(sum(c) AS BIGINT) AS g
             FROM cnt GROUP BY token),
    gtot AS (SELECT CAST(sum(c) AS BIGINT) AS gt FROM cnt),
    terms AS (
      SELECT c.source,
             CAST(round(
               (CAST(c.c AS DOUBLE) / CAST(s.st AS DOUBLE))
               * ln((CAST(c.c AS DOUBLE) * CAST(t.gt AS DOUBLE))
                    / (CAST(s.st AS DOUBLE) * CAST(g.g AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS kl_fp
      FROM cnt c JOIN stot s USING (source)
                 JOIN gcnt g USING (token)
                 CROSS JOIN gtot t)
    SELECT source, CAST(sum(kl_fp) AS BIGINT) AS kl_micros,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM terms GROUP BY source
    """,
    doc=(
        "mixture drift monitor: per-source KL divergence of the "
        "top-100-vocabulary token distribution vs the corpus "
        "distribution — the report that catches one ingest source "
        "shifting register/topic before it skews the training mix. "
        "Restricting to a fixed top-k vocabulary makes every "
        "per-source term count strictly positive (no zero-probability "
        "smoothing question) and bounds the broadcast model table by "
        "k·|sources|. Each KL term quantizes to fixed-point micros "
        "BEFORE the per-source sum (the bigram_lm trick), so the "
        "divergences are exact integers DuckDB reproduces "
        "bit-for-bit. One token rollup exchange; everything "
        "downstream is ≤ k·|sources| rows."
    ),
)
def source_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.filter(F.split("text", " "),
                           lambda x: x != "")).alias("token"))
    vocab = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.desc("c"), "token").limit(100)
             .select("token"))
    cnt = (toks.join(F.broadcast(vocab), "token")
           .groupBy("source", "token")
           .agg(F.count(F.lit(1)).alias("c")))
    stot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("st"))
    gcnt = cnt.groupBy("token").agg(F.sum("c").cast("bigint").alias("g"))
    gtot = cnt.agg(F.sum("c").cast("bigint").alias("gt"))
    term = ((F.col("c").cast("double") / F.col("st").cast("double"))
            * F.log((F.col("c").cast("double")
                     * F.col("gt").cast("double"))
                    / (F.col("st").cast("double")
                       * F.col("g").cast("double"))))
    kl_fp = F.round(term * F.lit(1000000.0), 0).cast("bigint")
    terms = (cnt.join(F.broadcast(stot), "source")
             .join(F.broadcast(gcnt), "token")
             .crossJoin(F.broadcast(gtot))
             .select("source", kl_fp.alias("kl_fp")))
    return (terms.groupBy("source")
            .agg(F.sum("kl_fp").cast("bigint").alias("kl_micros"),
                 F.count(F.lit(1)).alias("n_terms")))
