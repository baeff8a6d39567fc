"""Ranked retrieval (BM25) and fuzzy record linkage (edit-distance
join) — the lexical-search side of a training-data pipeline (dedup's
sibling: finding *related*, not identical, records). North-star
extensions; the reference's only search surface is the FULLTEXT
MATCH..AGAINST promise on vulnerable_software_list
(nvd2mysqlloader.py:401, docstring 174-177), which `like_search`
covers — these queries add scored relevance ranking and approximate
key matching on top.

Determinism: tf/df/doclen are exact integers; every derived double is
one fixed expression tree evaluated identically by both engines
(IEEE + - * / are correctly rounded; `ln` is NOT — JVM Math.log and
libm log drift by 1 ulp on some inputs, measured here — so BM25
scores are rounded to 6 decimals in BOTH engines, absorbing the ulp
while the ordering stays exact: distinct score gaps are ~1e-2, ties
are bit-identical by construction). Per-doc score totals are written
as an explicit fixed-order sum over per-term columns, never a float
`sum()` whose accumulation order the engine picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from .registry import query

# BM25 free parameters (classic Robertson defaults).
_K1 = 1.2
_B = 0.75
# Fixed query: three mid-df vocabulary terms.
_TERMS = ("spark", "join", "window")


# The BM25 scored-posting-list CTE chain, shared VERBATIM by the
# bm25_search oracle and the retrieval_eval_metrics oracle
# (mining_queries.py) — the per-term expression tree must be
# byte-identical across every oracle that rescores it: e.g.
# `({_K1} + 1.0)` and the literal 2.2 differ in the last ulp, which
# the 6-dp rounding does NOT always absorb at a rounding boundary.
BM25_ORACLE_CTES = f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS doclen FROM base),
    corpus AS (
      SELECT count(*) AS n_docs,
             CAST(sum(doclen) AS DOUBLE) / count(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS token FROM base)
      WHERE token IN ('spark', 'join', 'window')
      GROUP BY doc_id, token),
    df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ln((CAST(c.n_docs - df.df AS DOUBLE) + 0.5)
                / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
             * (CAST(tf.tf AS DOUBLE) * ({_K1} + 1.0))
             / (CAST(tf.tf AS DOUBLE)
                + {_K1} * (1.0 - {_B}
                           + {_B} * (CAST(dl.doclen AS DOUBLE)
                                     / c.avgdl))) AS s
      FROM tf
      JOIN df ON df.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus c),
    per_doc AS (
      SELECT doc_id,
             coalesce(max(CASE WHEN token = 'spark' THEN s END), 0.0)
               AS s1,
             coalesce(max(CASE WHEN token = 'join' THEN s END), 0.0)
               AS s2,
             coalesce(max(CASE WHEN token = 'window' THEN s END), 0.0)
               AS s3
      FROM scored GROUP BY doc_id)"""


@query(
    "bm25_search",
    oracle=BM25_ORACLE_CTES + """
    SELECT doc_id, round((s1 + s2) + s3, 6) AS score
    FROM per_doc
    ORDER BY round((s1 + s2) + s3, 6) DESC, doc_id
    LIMIT 10
    """,
    doc=(
        "BM25 ranked retrieval over documents for the fixed query "
        "{spark, join, window}: doclen is a projection "
        "(size∘filter∘split — no explode, no shuffle), tf explodes "
        "tokens but filters to the 3 query terms BEFORE the "
        "(doc,token) rollup so the exchange carries only matching "
        "postings, df and the 1-row corpus stats broadcast back, and "
        "the per-doc total is an explicit fixed-order (s1+s2)+s3 so "
        "the doubles are engine-exact. Top-10 is "
        "TakeOrderedAndProject with doc_id tie-break. The full-corpus "
        "exchanges carry only query-term postings pre-reduced to one "
        "row per (doc, term-pivot) — inverted-index-probe "
        "asymptotics; Spark plans the scalar df stats as a second "
        "pass over that rollup (a real deployment persists the "
        "postings table or maintains df incrementally, so scoring is "
        "one pass)."
    ),
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_bm25_scored(spark, sf_dir)
            .orderBy(F.desc("score"), "doc_id")
            .limit(10))


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for every document containing ≥1 query term —
    the full scored posting list bm25_search top-10s and
    rrf_hybrid_search fuses."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = docs.select("doc_id", toks.alias("toks"))
    dl = base.select(
        "doc_id", F.size("toks").cast("bigint").alias("doclen"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1)))
        .alias("avgdl"))

    # ONE explode → ONE doc_id rollup: per-term tf pivoted to columns,
    # doclen carried through (constant per doc). df then derives from
    # this same aggregate as a scalar — never a second corpus scan,
    # never a 3-key token shuffle (which would skew).
    tok = (base.select(
        "doc_id", F.size("toks").cast("bigint").alias("doclen"),
        F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*_TERMS)))
    per_tf = (tok.groupBy("doc_id")
              .agg(F.min("doclen").alias("doclen"),
                   *[F.sum((F.col("token") == t).cast("bigint"))
                     .alias(f"tf{i}")
                     for i, t in enumerate(_TERMS, 1)]))
    # Scoring (df scalars + the per-term expression tree) is shared
    # verbatim with the persisted-index probe path — see
    # operators/inverted_index.score_bm25_pivot: tf=0 ⇒ numerator
    # 0.0 ⇒ exact 0.0, matching the oracle's coalesce(max(CASE ...),
    # 0.0) for absent postings; the total is the fixed-order
    # (s1 + s2) + s3.
    from ..operators.inverted_index import score_bm25_pivot
    return score_bm25_pivot(per_tf, corpus, len(_TERMS), _K1, _B)


@query(
    "fuzzy_token_join",
    oracle="""
    WITH v AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents)
      WHERE token <> '' GROUP BY token)
    SELECT a.token AS token_a, b.token AS token_b,
           levenshtein(a.token, b.token) AS dist,
           a.freq AS freq_a, b.freq AS freq_b
    FROM v a JOIN v b
      ON a.token < b.token
     AND abs(length(a.token) - length(b.token)) <= 2
     AND levenshtein(a.token, b.token) <= 2
    """,
    doc=(
        "fuzzy record linkage / typo-tolerant key matching: the "
        "token vocabulary self-joins on edit distance ≤ 2. Blocking "
        "is a LENGTH BAND — lev(a,b) ≤ 2 implies |len(a)−len(b)| ≤ 2, "
        "a sound necessary condition, so one side expands each token "
        "under candidate lengths len−2..len+2 and the join is a hash "
        "EQUI-join on length (never a nested-loop cross product); "
        "levenshtein runs only inside blocks. The vocabulary is an "
        "aggregate of the corpus (millions of rows at 100 TB, not "
        "billions), and the expansion factor is a constant 5. The "
        "oracle states the same semantics declaratively — results "
        "are plan-independent."
    ),
)
def fuzzy_token_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = (docs.select(
        F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq")))
    # left side: each token under every candidate partner length
    lens = F.array(*[F.length("token") + F.lit(d)
                     for d in (-2, -1, 0, 1, 2)])
    a = vocab.select(F.col("token").alias("token_a"),
                     F.col("freq").alias("freq_a"),
                     F.explode(lens).alias("cand_len"))
    b = vocab.select(F.col("token").alias("token_b"),
                     F.col("freq").alias("freq_b"),
                     F.length("token").alias("len_b"))
    pairs = a.join(b, (F.col("cand_len") == F.col("len_b"))
                   & (F.col("token_a") < F.col("token_b")))
    return (pairs
            .withColumn("dist",
                        F.levenshtein("token_a", "token_b"))
            .filter(F.col("dist") <= 2)
            .select("token_a", "token_b", "dist",
                    "freq_a", "freq_b"))


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, token,
             round(tf * ln(CAST(n.n_docs AS DOUBLE)
                           / count(*) OVER (PARTITION BY token)), 6)
               AS score
      FROM tf, n),
    ranked AS (
      SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rk
      FROM scored)
    SELECT doc_id, token, score, rk FROM ranked WHERE rk <= 3
    """,
    doc="per-document top-3 TF-IDF terms: df from a COUNT window over "
        "the (doc,token) rollup (never a second corpus scan), n_docs a "
        "1-row broadcast, per-doc rank a window top-k; ln rounds to "
        "6 dp in both engines (JVM vs libm 1-ulp drift)",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # (doc, token) rollup is the ONLY place raw tokens shuffle; df is
    # a window over that aggregate (|docs|x|vocab| rows max), so the
    # frequent-token skew a token-keyed join would hit never appears
    # at full row width — only (doc_id, token, tf) triples move.
    tf = (docs.select("doc_id", F.explode(toks).alias("token"))
          .groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_w = Window.partitionBy("token")
    scored = (tf.crossJoin(F.broadcast(n))
              .select("doc_id", "token",
                      F.round(F.col("tf")
                              * F.log(F.col("n_docs").cast("double")
                                      / F.count(F.lit(1)).over(df_w)), 6)
                      .alias("score")))
    rk_w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (scored
            .withColumn("rk", F.row_number().over(rk_w))
            .filter(F.col("rk") <= 3))


_RRF_K = 60       # classic reciprocal-rank-fusion constant
_RRF_TOP = 100    # candidate-list depth per ranker

# the bit-exact cosine fold shared with the vector query surface
# (q./c. aliases match the semantic CTE below)
from .vector_queries import _COS_SQL  # noqa: E402


@query(
    "rrf_hybrid_search",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS doclen FROM base),
    corpus AS (
      SELECT count(*) AS n_docs,
             CAST(sum(doclen) AS DOUBLE) / count(*) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS token FROM base)
      WHERE token IN ('spark', 'join', 'window')
      GROUP BY doc_id, token),
    df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ln((CAST(c.n_docs - df.df AS DOUBLE) + 0.5)
                / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
             * (CAST(tf.tf AS DOUBLE) * ({_K1} + 1.0))
             / (CAST(tf.tf AS DOUBLE)
                + {_K1} * (1.0 - {_B}
                           + {_B} * (CAST(dl.doclen AS DOUBLE)
                                     / c.avgdl))) AS s
      FROM tf
      JOIN df ON df.token = tf.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus c),
    per_doc AS (
      SELECT doc_id,
             coalesce(max(CASE WHEN token = 'spark' THEN s END), 0.0) AS s1,
             coalesce(max(CASE WHEN token = 'join' THEN s END), 0.0) AS s2,
             coalesce(max(CASE WHEN token = 'window' THEN s END), 0.0) AS s3
      FROM scored GROUP BY doc_id),
    lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY round((s1 + s2) + s3, 6) DESC,
                                doc_id) AS lex_rank
      FROM per_doc
      QUALIFY row_number() OVER (ORDER BY round((s1 + s2) + s3, 6) DESC,
                                 doc_id) <= {_RRF_TOP}),
    sem AS (
      SELECT c.vec_id AS doc_id, {_COS_SQL} AS cs
      FROM embeddings c
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
    semr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cs DESC, doc_id) AS sem_rank
      FROM sem
      QUALIFY row_number() OVER (ORDER BY cs DESC, doc_id) <= {_RRF_TOP})
    SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
           CAST(l.lex_rank AS BIGINT) AS lex_rank,
           CAST(s.sem_rank AS BIGINT) AS sem_rank,
           coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
             + coalesce(1.0 / ({_RRF_K} + s.sem_rank), 0.0) AS rrf_score
    FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    ORDER BY coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
               + coalesce(1.0 / ({_RRF_K} + s.sem_rank), 0.0) DESC,
             coalesce(l.doc_id, s.doc_id)
    LIMIT 10
    """,
    doc=(
        "hybrid retrieval via reciprocal-rank fusion (the standard "
        "lexical+vector production shape): the BM25 posting ranking "
        "and the exact-cosine ranking against a query-by-example "
        "vector (vec_id 0, docs 1:1 with embeddings) are each cut to "
        "a top-100 candidate list, full-outer fused on doc_id, and "
        "re-ranked by sum(1/(60+rank)). Ranks are integers derived "
        "from engine-exact scores (rounded BM25, bit-exact cosine "
        "fold), so the fused doubles are identical across engines. "
        "At 100 TB each candidate list is a bounded top-N retrieval "
        "output (TakeOrdered/WindowGroupLimit — never a global sort "
        "of the corpus) and the fusion join is candidate-sized."
    ),
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine

    lex = _bm25_scored(spark, sf_dir)
    lex_w = Window.orderBy(F.desc("score"), "doc_id")
    lexr = (lex.withColumn("lex_rank",
                           F.row_number().over(lex_w).cast("bigint"))
            .filter(F.col("lex_rank") <= _RRF_TOP)
            .select("doc_id", "lex_rank"))

    emb = load_table(spark, sf_dir, "embeddings")
    qv = (emb.filter(F.col("vec_id") == 0)
          .select(F.col("embedding").alias("q_emb")))
    sem = (emb.crossJoin(F.broadcast(qv))
           .select(F.col("vec_id").alias("doc_id"),
                   cosine(F.col("q_emb"), F.col("embedding")).alias("cs")))
    sem_w = Window.orderBy(F.desc("cs"), "doc_id")
    semr = (sem.withColumn("sem_rank",
                           F.row_number().over(sem_w).cast("bigint"))
            .filter(F.col("sem_rank") <= _RRF_TOP)
            .select("doc_id", "sem_rank"))

    fused = lexr.join(semr, "doc_id", "full_outer")
    rrf = (F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")),
                      F.lit(0.0))
           + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("sem_rank")),
                        F.lit(0.0)))
    return (fused.select("doc_id", "lex_rank", "sem_rank",
                         rrf.alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), "doc_id")
            .limit(10))
