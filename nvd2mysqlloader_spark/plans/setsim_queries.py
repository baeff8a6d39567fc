"""Set-similarity / substring-duplication / phrase-search queries.

Round-7 surface growth — three operators a 100 TB training-data
pipeline runs constantly, each exact and DuckDB-oracled:

* ``prefix_filter_jaccard_join`` — the PPJoin-style prefix-filtered
  set-similarity join (Chaudhuri et al., "A Primitive Operator for
  Similarity Joins", ICDE 2006; Xiao et al., PPJoin, WWW 2008). The
  existing ``ngram_jaccard_pairs`` builds the FULL shingle inverted
  index before the self-join; prefix filtering indexes only each
  set's rarest-first prefix — the provably sufficient slice — so the
  candidate join shrinks by ~t/(1+t) of postings and the exact
  verification runs candidates-only. This is the exact-Jaccard join
  you would actually run at corpus scale.
* ``duplicate_substring_spans`` — maximal duplicated-substring span
  detection, the Spark re-expression of suffix-array substring dedup
  (Lee et al., "Deduplicating Training Data Makes Language Models
  Better", arXiv:2107.06499). A suffix array is inherently a
  single-address-space structure; the distributed equivalent anchors
  duplication at k-gram granularity (every duplicated substring of
  length ≥ k contains a duplicated k-gram) and merges adjacent
  duplicated anchors into maximal spans with one gaps-and-islands
  window per doc.
* ``phrase_search`` — positional phrase matching, the engine analog
  of the reference's FULLTEXT surface (nvd.sql:69,
  nvd2mysqlloader.py:401 — ``alter table nvd add
  fulltext(vulnerable_software_list)``): MySQL FULLTEXT's
  double-quoted phrase query needs token positions, not just
  presence. The corpus's dominant trigram is derived in-query (a
  1-row rollup scalar) and probed against the positional gram
  relation map-side.

Determinism: every ranking carries a lexicographic tie-break; all
thresholds use integer arithmetic (no float ceil drift between
engines); gram-frequency shuffles carry md5 digests, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import shingle3_udf, tokens
from ..operators._lineage import cut_lineage as _cut
from ..sources.tpch import load_table
from .registry import query

# Jaccard threshold for the prefix-filtered join, as a ratio of
# integers so both engines compute prefix lengths in exact integer
# arithmetic (ceil(0.7*n) == (7n+9) div 10 — no IEEE ceil edge).
_T_NUM, _T_DEN = 7, 10
_SPAN_K = 8   # k-gram anchor width for substring-duplication spans


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tokens("text").alias("t"))


def prefix_filter_candidates(docs: DataFrame, *, t_num: int = _T_NUM,
                             t_den: int = _T_DEN):
    """(shingled, candidates) — the prefix-filter candidate stage,
    split out so the verify stage and the scale instrumentation
    (scripts/stress_decade.py measures candidate-pair growth, the
    operator's scaling axis) share one definition."""
    from ..operators.dedup import prefix_filter_candidate_pairs
    sc = docs.sparkSession.sparkContext
    sh = (docs
          .repartition(sc.defaultParallelism)
          .select("doc_id", shingle3_udf()("text").alias("s"))
          .withColumn("nsh", F.size("s")))
    sh = _cut(sh)
    # Candidate core (rarest-first prefix cut + PPJoin length filter)
    # lives in operators/dedup.py since it also supplies the
    # completeness channel of minhash_near_dups_exact.
    cand = prefix_filter_candidate_pairs(sh, t_num=t_num, t_den=t_den)
    return sh, cand


def prefix_filter_pairs(docs: DataFrame, *, t_num: int = _T_NUM,
                        t_den: int = _T_DEN) -> DataFrame:
    """Exact Jaccard >= t_num/t_den pairs over 3-shingle sets via
    prefix filtering (core shared by the registered query and the
    planted-data tests). ``docs``: (doc_id, text)."""
    sh, cand = prefix_filter_candidates(docs, t_num=t_num, t_den=t_den)

    # Exact verification on candidates only: join the full sets back.
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"),
                   F.col("nsh").alias("na"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"),
                   F.col("nsh").alias("nb"))
    v = cand.join(sa, "id_a").join(sb, "id_b")
    n_inter = F.size(F.array_intersect("sa", "sb"))
    jac = (n_inter.cast("double")
           / (F.col("na") + F.col("nb") - n_inter))
    return (v.select("id_a", "id_b",
                     n_inter.cast("long").alias("n_inter"),
                     jac.alias("jaccard"))
            .filter(F.col("jaccard")
                    >= F.lit(t_num).cast("double") / F.lit(t_den)))


def duplicated_span_relation(toks: DataFrame, k: int = _SPAN_K) -> DataFrame:
    """Maximal duplicated-substring spans over a (doc_id, t) token
    relation — k-gram anchors + per-doc gaps-and-islands merge."""
    # sequence() guarded: Spark's sequence(1, n) DESCENDS for n < 1
    # (would emit phantom positions on short docs) while DuckDB's
    # generate_series is empty — hence the explicit when().
    idx = F.when(F.size("t") >= k,
                 F.sequence(F.lit(1), F.size("t") - k + 1)
                 ).otherwise(F.array().cast("array<int>"))
    grams = (toks
             .select("doc_id", F.explode(idx).alias("pos"), "t")
             .select("doc_id", "pos",
                     F.md5(F.concat_ws(
                         " ", F.slice("t", F.col("pos"), k))).alias("dig")))
    grams = _cut(grams)
    # Anchors duplicated anywhere in the corpus (within- OR cross-doc:
    # self-duplication is also removal-worthy, per Lee et al. §3).
    dup = (grams.groupBy("dig").agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") >= 2).select("dig"))
    hits = grams.join(dup, "dig").select("doc_id", "pos")
    # Gaps-and-islands: consecutive duplicated anchors merge into one
    # maximal span covering [min(pos), max(pos)+k-1].
    grp = (F.col("pos")
           - F.row_number().over(
               Window.partitionBy("doc_id").orderBy("pos")))
    return (hits.withColumn("grp", grp)
            .groupBy("doc_id", "grp")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + k - 1).cast("long").alias("span_end"),
                 (F.max("pos") - F.min("pos") + k).cast("long")
                 .alias("span_len"))
            .drop("grp"))


def dominant_phrase_matches(toks: DataFrame) -> DataFrame:
    """Positional matches of the corpus-dominant word trigram over a
    (doc_id, t) token relation."""
    idx = F.when(F.size("t") >= 3,
                 F.sequence(F.lit(1), F.size("t") - 2)
                 ).otherwise(F.array().cast("array<int>"))
    grams = (toks
             .select("doc_id", F.explode(idx).alias("pos"), "t")
             .select("doc_id", "pos",
                     F.concat_ws(" ", F.slice("t", F.col("pos"), 3))
                     .alias("gram")))
    grams = _cut(grams)
    # Corpus-dominant trigram: partial-aggregated rollup, then a
    # 1-row TakeOrderedAndProject (heap, no global sort) scalar.
    top = (grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.col("n").desc(), F.col("gram").asc())
           .limit(1)
           .select(F.col("gram").alias("phrase")))
    # 1-row broadcast probe: the join degenerates to a map-side filter.
    top = F.broadcast(top)
    return (grams.join(top, grams["gram"] == top["phrase"])
            .groupBy("doc_id", "phrase")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.min("pos").cast("long").alias("first_pos")))


@query(
    "prefix_filter_jaccard_join",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
             AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(a.s) > 0 AND len(b.s) > 0
      AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= CAST({_T_NUM} AS DOUBLE) / {_T_DEN}
    """,
    doc=(
        "exact Jaccard>=0.7 set-similarity join via PREFIX FILTERING "
        "(PPJoin family): global rarest-first token order, index only "
        "each set's first |s|-ceil(t*|s|)+1 shingles (sufficient by "
        "the prefix-filter theorem), exact array_intersect verify on "
        "candidates only. The oracle is the NAIVE all-pairs join — "
        "hash equality per round is an empirical completeness proof "
        "that the prefix index lost no qualifying pair. At 100 TB the "
        "full-index self-join (ngram_jaccard_pairs) is the fallback "
        "verifier; THIS is the operating mode."
    ),
)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distinct 3-shingle sets are computed ONCE inside the core and
    # reused by the prefix index and both verify sides (same
    # materialize-once discipline as ngram_jaccard_pairs: AQE re-plans
    # self-join sides independently, so without the lineage cut the
    # Arrow shingler would run 3x).
    return prefix_filter_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "duplicate_substring_spans",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i:i+{_SPAN_K}-1], ' ')) AS dig
      FROM tok, unnest(generate_series(1, greatest(len(t) - {_SPAN_K} + 1, 0)))
                AS u(i)
    ), dup AS (
      SELECT dig FROM g GROUP BY dig HAVING count(*) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos FROM g JOIN dup USING (dig)
    ), isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM hits
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + {_SPAN_K} - 1 AS BIGINT) AS span_end,
           CAST(max(pos) - min(pos) + {_SPAN_K} AS BIGINT) AS span_len
    FROM isl GROUP BY doc_id, grp
    """,
    doc=(
        "maximal duplicated-substring spans (suffix-array dedup re-"
        "expressed for Spark, Lee et al. arXiv:2107.06499): every "
        "duplicated substring of >= k tokens contains a duplicated "
        "k-gram, so k-gram anchors + one gaps-and-islands window per "
        "doc reconstruct the maximal spans exactly; frequency shuffle "
        "carries md5 digests (32 B) never text, the dup-anchor probe "
        "is a semi join, and the only per-doc state is the window "
        "partition. Complements dedup_spans (fixed segments): this "
        "finds ARBITRARY-ALIGNMENT duplication."
    ),
)
def duplicate_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicated_span_relation(_doc_tokens(spark, sf_dir))


@query(
    "phrase_search",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, i AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
      FROM tok, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
    ), top AS (
      SELECT gram AS phrase FROM g
      GROUP BY gram ORDER BY count(*) DESC, gram ASC LIMIT 1
    )
    SELECT g.doc_id, top.phrase,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(g.pos) AS BIGINT) AS first_pos
    FROM g JOIN top ON g.gram = top.phrase
    GROUP BY g.doc_id, top.phrase
    """,
    doc=(
        "positional phrase search — the reference's FULLTEXT surface "
        "(nvd.sql:69, nvd2mysqlloader.py:401) extended to MySQL's "
        'double-quoted "exact phrase" mode, which needs token '
        "POSITIONS not just presence (like_search covers presence): "
        "the corpus-dominant trigram is derived in-query (rollup + "
        "1-row heap top-1, lexicographic tie-break) and broadcast "
        "back as a map-side probe of the positional gram relation — "
        "at 100 TB the probe is a pushed filter over a materialized "
        "positional index, never a re-scan of text."
    ),
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dominant_phrase_matches(_doc_tokens(spark, sf_dir))


# ---------------------------------------------------------------------------
# Containment (subset) similarity — the ASYMMETRIC dedup relation
# Jaccard misses: a short document quoted wholesale inside a longer
# one has high containment C(a->b) = |a∩b|/|a| but low Jaccard
# (the union is dominated by b). Quote-inclusion is a first-class
# concern in training-data dedup (Lee et al. arXiv:2107.06499 §5
# observe exact substring duplication across otherwise-distinct
# docs); this is the set-level form.

_C_NUM, _C_DEN = 4, 5          # containment threshold 0.8


@query(
    "containment_dup_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM tok
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_inter,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
             AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE len(a.s) > 0
      AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
          >= CAST({_C_NUM} AS DOUBLE) / {_C_DEN}
    """,
    doc=(
        "asymmetric containment dedup C(a->b)=|a∩b|/|a| >= 0.8 over "
        "3-shingle sets — catches short-doc-quoted-in-long-doc "
        "duplication that Jaccard's union denominator hides. Scale "
        "path: the PREFIX-FILTER theorem holds one-sidedly (|a∩b| >= "
        "ceil(t|a|) forces a's rarest-first prefix of "
        "|a|-ceil(t|a|)+1 shingles to hit b), so only the CONTAINED "
        "side's prefixes probe the full inverted index, plus the "
        "one-sided length bound t_den*|b| >= t_num*|a|; exact "
        "array_intersect verification runs candidates-only. The "
        "oracle is the naive ordered all-pairs join — hash equality "
        "per round is the completeness proof."
    ),
)
def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return containment_pairs(load_table(spark, sf_dir, "documents"))


def containment_candidates(docs: DataFrame, *, t_num: int = _C_NUM,
                           t_den: int = _C_DEN):
    """(postings, candidates) — the one-sided prefix-filter candidate
    stage of the containment join, split out for the verify stage and
    the scale instrumentation (scripts/stress_decade.py)."""
    sc = docs.sparkSession.sparkContext
    sh = (docs
          .repartition(sc.defaultParallelism)
          .select("doc_id", shingle3_udf()("text").alias("s"))
          .withColumn("nsh", F.size("s"))
          .filter(F.col("nsh") > 0))
    ex = _cut(sh.select("doc_id", "nsh",
                        F.explode("s").alias("shingle")))
    # df as a COUNT window over shingle, not groupBy + join-back —
    # same values, one less join/exchange (see
    # operators/dedup.prefix_filter_candidate_pairs)
    ranked = (ex.withColumn("df", F.count(F.lit(1)).over(
                  Window.partitionBy("shingle")))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "shingle"))))
    alpha = F.floor((F.lit(t_num) * F.col("nsh") + F.lit(t_den - 1))
                    / F.lit(t_den)).cast("long")
    # prefix of the CONTAINED side only; the container side is probed
    # through its full postings (ex) — the one-sided theorem
    prefix = _cut(ranked.filter(F.col("rn") <= F.col("nsh") - alpha
                                + F.lit(1))
                  .select("doc_id", "nsh", "shingle"))

    a, b = prefix.alias("a"), ex.alias("b")
    len_ok = (F.lit(t_den) * F.col("b.nsh")
              >= F.lit(t_num) * F.col("a.nsh"))
    cand = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") != F.col("b.doc_id")) & len_ok)
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())
    cand = _cut(cand)
    return ex, cand


def containment_pairs(docs: DataFrame, *, t_num: int = _C_NUM,
                      t_den: int = _C_DEN) -> DataFrame:
    """Exact containment >= t_num/t_den ordered pairs via one-sided
    prefix filtering (core shared with the planted-data tests)."""
    ex, cand = containment_candidates(docs, t_num=t_num, t_den=t_den)

    # Count-based verification bounded by Σ_candidates |a|: expand
    # each candidate pair with the contained side's postings, keep the
    # shingles the container also holds ((doc, shingle) equi-join),
    # count. Measured 2.2x faster than re-joining full shingle ARRAYS
    # (the shuffle carries shingle strings, not array payloads) and —
    # unlike a full postings self-join — the expansion is candidates-
    # only, exactly what prefix filtering bought. Pairs with zero
    # shared shingles never reach the rollup and could not pass the
    # threshold anyway.
    pa = ex.select(F.col("doc_id").alias("id_a"),
                   F.col("nsh").alias("na"), "shingle")
    pb = ex.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (cand.join(pa, "id_a")
             .join(pb, ["id_b", "shingle"])
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter"),
                  F.min("na").alias("na")))
    cont = F.col("n_inter").cast("double") / F.col("na")
    return (inter.select("id_a", "id_b", "n_inter",
                         cont.alias("containment"))
            .filter(F.col("containment")
                    >= F.lit(t_num).cast("double") / F.lit(t_den)))
