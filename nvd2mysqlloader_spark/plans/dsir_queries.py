"""DSIR-style data selection with importance resampling — the
published hashed-n-gram method (Xie et al., arXiv:2302.03169) for
picking pretraining data that looks like a target distribution, over
the ``documents`` table. North-star extension: the reference has no
corpus-selection surface at all (its query layer is single-table CVE
SELECTs, nvd2mysqlloader.py:339-420).

Method, faithfully re-expressed Spark-first:

1. Features: every unigram and bigram of each doc, hashed into
   ``_B`` buckets with the repo's shared cross-engine md5 arithmetic
   (cms_bucket / weighted_sample / training_order use the same 52-bit
   ``conv(substr(md5(...)))`` trick).
2. Two smoothed categorical ("hashed n-gram") models over the
   buckets: the TARGET distribution p̂ (here: the ``lang = 'en'``
   slice — in production, a small high-quality corpus) and the RAW
   distribution q̂ (the whole corpus). One conditional aggregate
   computes both counts in a single pass over the gram stream.
3. Per-doc importance weight: log w(x) = Σ_grams (ln p̂(b) − ln q̂(b)).
   Each bucket's log-ratio is QUANTIZED to fixed-point micros
   (BIGINT) before the per-doc sum — the bigram_lm_scores /
   embedding_centroids trick — so the accumulation is exact,
   order-independent integer arithmetic and DuckDB reproduces every
   weight bit-for-bit.
4. Resampling: Gumbel-max with the md5-derived uniform (the
   weighted_sample idiom) — sampling WITHOUT replacement with
   probability ∝ w(x), reproducible on any engine and any rerun.

Scale (100 TB): the bucket-count table is ≤ ``_B`` rows BY
CONSTRUCTION regardless of corpus size (map-side combine collapses
each task to ≤ _B partials before the tiny shuffle), and the
log-ratio table broadcasts back onto the gram stream — so the corpus
is scanned once, shuffled only by doc_id for the per-doc sum, and the
only non-linear state is a 4096-row broadcast. The final top-k is a
heap (TakeOrderedAndProject), never a global sort.

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

_B = 4096            # hash buckets (DSIR uses 10k for 2 models; 4096
#                      keeps the fixture's buckets well-populated)
_TARGET = "en"       # target distribution: the English slice
_TWO52 = 4503599627370496  # 2^52; md5 13-hex → uniform in (0,1)

# Shared CTE prologue: hashed (uni+bi)-gram stream → per-bucket
# target/raw counts → fixed-point log-ratio table.  ln arguments are
# strictly positive (add-1 smoothing) and every division/ln/round
# mirrors the Spark expression tree node-for-node.
_DSIR_CTES = f"""
    toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    g AS (
      SELECT doc_id, lang, unnest(t) AS gram FROM toks
      UNION ALL
      SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS gram
      FROM (SELECT doc_id, lang, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks)),
    b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('dsir:' || gram), 1, 13))
                  AS BIGINT) % {_B} AS bkt
      FROM g),
    counts AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS r,
             CAST(sum(CASE WHEN lang = '{_TARGET}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tt
      FROM b GROUP BY bkt),
    tot AS (
      SELECT CAST(sum(r) AS BIGINT) AS rtot,
             CAST(sum(tt) AS BIGINT) AS ttot
      FROM counts),
    q AS (
      SELECT bkt,
             CAST(round((ln((CAST(tt AS DOUBLE) + 1.0)
                            / (CAST(ttot AS DOUBLE) + {_B}.0))
                         - ln((CAST(r AS DOUBLE) + 1.0)
                              / (CAST(rtot AS DOUBLE) + {_B}.0)))
                        * 1000000.0) AS BIGINT) AS q
      FROM counts CROSS JOIN tot),
    per_doc AS (
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(q.q) AS BIGINT) AS logw_fp
      FROM b JOIN q USING (bkt) GROUP BY b.doc_id)"""


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_grams, logw_fp): exact fixed-point DSIR
    importance log-weights for every non-empty document."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", "lang", t.alias("t"))
    bigrams = F.when(F.size("t") > 1, F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(" ", F.element_at("t", i),
                              F.element_at("t", i + F.lit(1))))
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "doc_id", "lang",
        F.explode(F.concat(F.col("t"), bigrams)).alias("gram"))
    bkt = (F.conv(F.substring(
        F.md5(F.concat(F.lit("dsir:"), F.col("gram"))), 1, 13),
        16, 10).cast("bigint") % _B)
    # the hashed gram stream feeds BOTH the bucket-count rollup and
    # the per-doc weight sum — materialize the tokenize+md5 pipeline
    # once (the repo's eager shared-input idiom) instead of running
    # it per consumer
    from ..operators._lineage import cut_lineage
    b = cut_lineage(grams.select("doc_id", "lang", bkt.alias("bkt")))

    # ONE pass over the gram stream yields both models: raw count r
    # and (conditional) target count tt per bucket — ≤ _B rows out.
    counts = b.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(F.when(F.col("lang") == _TARGET, 1).otherwise(0))
        .cast("bigint").alias("tt"))
    tot = counts.agg(F.sum("r").cast("bigint").alias("rtot"),
                     F.sum("tt").cast("bigint").alias("ttot"))
    lr = (F.log((F.col("tt").cast("double") + F.lit(1.0))
                / (F.col("ttot").cast("double") + F.lit(float(_B))))
          - F.log((F.col("r").cast("double") + F.lit(1.0))
                  / (F.col("rtot").cast("double") + F.lit(float(_B)))))
    q = (counts.crossJoin(F.broadcast(tot))
         .select("bkt", F.round(lr * F.lit(1000000.0), 0)
                 .cast("bigint").alias("q")))
    return (b.join(F.broadcast(q), "bkt")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum("q").cast("bigint").alias("logw_fp")))


@query(
    "dsir_importance_weights",
    oracle="WITH" + _DSIR_CTES + """
    SELECT p.doc_id, d.lang, d.source, p.n_grams, p.logw_fp,
           CAST(p.logw_fp AS DOUBLE) / 1000000.0 AS logw
    FROM per_doc p JOIN documents d USING (doc_id)
    ORDER BY p.logw_fp DESC, p.doc_id LIMIT 25
    """,
    doc=(
        "DSIR importance weights (hashed-n-gram data selection, Xie "
        "et al. arXiv:2302.03169): per-doc log importance weight "
        "log w = Σ_grams ln(p̂_target(bucket)/q̂_raw(bucket)) under "
        "add-1-smoothed bucket models fit in ONE conditional "
        "aggregate over the hashed (uni+bi)-gram stream; the top-25 "
        "most-target-like docs. Per-bucket log-ratios quantize to "
        "fixed-point micros before the per-doc BIGINT sum, so DuckDB "
        "reproduces every weight bit-for-bit. The ≤4096-row model "
        "table broadcasts; the corpus shuffles once (by doc_id); "
        "top-k is a heap — at 100 TB nothing here grows but the scan."
    ),
)
def dsir_importance_weights(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _dsir_weights(spark, sf_dir)
    return (per_doc
            .join(docs.select("doc_id", "lang", "source"), "doc_id")
            .select("doc_id", "lang", "source", "n_grams", "logw_fp",
                    (F.col("logw_fp").cast("double")
                     / F.lit(1000000.0)).alias("logw"))
            .orderBy(F.desc("logw_fp"), "doc_id").limit(25))


@query(
    "dsir_resample",
    oracle="WITH" + _DSIR_CTES + f""",
    keyed AS (
      SELECT p.doc_id, d.lang,
             CAST(p.logw_fp AS DOUBLE) / 1000000.0
             - ln(-ln((CAST(('0x' || substr(
                               md5('u:' || CAST(p.doc_id AS VARCHAR)),
                               1, 13)) AS BIGINT) + 0.5)
                      / {_TWO52}.0)) AS gkey
      FROM per_doc p JOIN documents d USING (doc_id)),
    sel AS (
      SELECT doc_id, lang FROM keyed
      ORDER BY gkey DESC, doc_id LIMIT 100)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_selected,
           min(doc_id) AS min_doc
    FROM sel GROUP BY lang
    """,
    doc=(
        "DSIR resampling step: sample 100 docs without replacement "
        "with probability ∝ exp(log w) via the Gumbel-max trick — "
        "selection key logw + (−ln(−ln u)) with u the md5-derived "
        "52-bit uniform in (0,1) (the weighted_sample idiom, shifted "
        "by +0.5 so u is never exactly 0 or 1), then the per-lang "
        "composition of the selected set, which measurably skews "
        "toward the '" + _TARGET + "' target. Deterministic and "
        "engine-exact: the key is one fixed double expression tree "
        "over integers both engines derive identically. The top-100 "
        "is a heap over |corpus| keys — the distributed form of "
        "weighted reservoir sampling, one pass, no global sort."
    ),
)
def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = _dsir_weights(spark, sf_dir)
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("u:"), F.col("doc_id").cast("string"))),
        1, 13), 16, 10).cast("bigint") + F.lit(0.5))
        / F.lit(float(_TWO52)))
    gkey = (F.col("logw_fp").cast("double") / F.lit(1000000.0)
            - F.log(-F.log(u)))
    sel = (per_doc.join(docs.select("doc_id", "lang"), "doc_id")
           .select("doc_id", "lang", gkey.alias("gkey"))
           .orderBy(F.desc("gkey"), "doc_id").limit(100))
    return (sel.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_selected"),
                 F.min("doc_id").alias("min_doc")))
