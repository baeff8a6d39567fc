"""Pattern-mining + retrieval-evaluation queries.

Two more workloads a production analytics engine ships beside its
query surface, both exactly DuckDB-oracled:

* ``association_rules`` — market-basket co-occurrence mining
  (support / confidence / lift) over the events stream, baskets =
  the distinct ``props.k`` items each user touched. The classic
  retail/recsys rollup the reference's row-store schema could never
  express without N round-trips per pair.
* ``retrieval_eval_metrics`` — the IR evaluation harness: NDCG@10 /
  MRR@10 / recall@10 of the engine's own BM25 ranking, graded
  against an independent exactly-computable relevance signal
  (query-term coverage per doc). Ranking-quality evaluation is a
  first-class pipeline stage for any corpus feeding retrieval; the
  metrics themselves are exact cross-engine (the only
  transcendental, log2, follows the bm25 6-dp rounding discipline).

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators._lineage import cut_lineage as _cut
from ..sources.tpch import load_table
from .registry import query
from .retrieval_queries import BM25_ORACLE_CTES, _TERMS, _bm25_scored

# Basket cap: deterministic top-K items per user by event count
# (count desc, item asc). At 100 TB the per-user pair fan-out is
# quadratic in basket size, so an uncapped power user would dominate
# a partition; the cap bounds every user's contribution at K(K-1)/2
# pairs. K=64 trims the fixture's heaviest baskets (max 67), so the
# cap path is exercised, not vacuous.
_BASKET_K = 64
# Support threshold RELATIVE to the user population (integer form:
# 10*n_pair >= n_users, i.e. >= 10% support) — an absolute count
# would be vacuous at small SFs and never-satisfied at large ones.
_SUPP_DEN = 10
_TOP_RULES = 20


@query(
    "association_rules",
    oracle=f"""
    WITH item_events AS (
      -- NULL items (props without '$.k') are dropped BEFORE the cap
      -- ranking: Spark's ASC sort puts NULLs first while DuckDB's
      -- default puts them last, so an unguarded NULL at the cap
      -- boundary would displace a different real item per engine
      SELECT user_id, json_extract_string(props, '$.k') AS item,
             count(*) AS n_ev
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
      GROUP BY user_id, json_extract_string(props, '$.k')
    ), basket AS (
      SELECT user_id, item FROM (
        SELECT user_id, item,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n_ev DESC, item ASC) AS rn
        FROM item_events)
      WHERE rn <= {_BASKET_K}
    ), n_users AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM basket
    ), item_supp AS (
      SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM basket
      GROUP BY item
    ), pair AS (
      SELECT a.item AS item_x, b.item AS item_y,
             CAST(count(*) AS BIGINT) AS n_pair
      FROM basket a JOIN basket b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY a.item, b.item
    ), supported AS (
      SELECT p.* FROM pair p CROSS JOIN n_users nu
      WHERE p.n_pair * {_SUPP_DEN} >= nu.n
    ), directed AS (
      SELECT item_x AS antecedent, item_y AS consequent, n_pair
      FROM supported
      UNION ALL
      SELECT item_y AS antecedent, item_x AS consequent, n_pair
      FROM supported
    ), rules AS (
      SELECT d.antecedent, d.consequent, d.n_pair,
             CAST(d.n_pair AS DOUBLE) / sa.n_item AS confidence,
             CAST(d.n_pair AS DOUBLE) * nu.n / (sa.n_item * sc.n_item)
               AS lift
      FROM directed d
      JOIN item_supp sa ON d.antecedent = sa.item
      JOIN item_supp sc ON d.consequent = sc.item
      CROSS JOIN n_users nu
    )
    SELECT antecedent, consequent, n_pair, confidence, lift
    FROM rules
    ORDER BY lift DESC, antecedent ASC, consequent ASC
    LIMIT {_TOP_RULES}
    """,
    doc=(
        "market-basket association rules over events (basket = "
        "distinct props.k per user, capped at the top-64 items per "
        "user by event count — the fan-out bound that keeps the "
        "per-user pair explosion at K(K-1)/2 under power-user skew): "
        "unordered co-occurrence counted ONCE per pair, filtered to "
        ">=10% relative support (integer comparison against the "
        "1-row user-count scalar) BEFORE the direction expansion "
        "and dimension joins, then the top-20 rules by lift via a "
        "rank-bounded heap (TakeOrderedAndProject, never a full "
        "sort). Confidence/lift are pure integer ratios — IEEE "
        "division is engine-identical, no rounding needed. The "
        "per-user self-join shuffles baskets once on user_id; item "
        "supports broadcast back (|items| rows)."
    ),
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ONE exchange on user_id serves the whole basket pipeline (r12
    # optimization, guide §2.4): HashPartitioning(user_id) satisfies
    # the (user_id, item) aggregate's clustering requirement, the
    # rn-window's partitionBy(user_id), AND both sides of the basket
    # self-join below — the former groupBy(user_id, item) shape
    # exchanged on the pair key and then re-exchanged both join
    # inputs on user_id alone. (Trade-off: the explicit repartition
    # forgoes map-side partial aggregation of the raw events — a
    # win here because per-(user, item) multiplicity is low, and the
    # join-exchange removal is 2 exchanges of the basket relation.)
    item_events = (ev
                   .select("user_id",
                           F.get_json_object("props", "$.k").alias("item"))
                   .filter(F.col("item").isNotNull())
                   .repartition("user_id")
                   .groupBy("user_id", "item")
                   .agg(F.count(F.lit(1)).alias("n_ev")))
    basket = (item_events
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("user_id")
                  .orderBy(F.col("n_ev").desc(), F.col("item").asc())))
              .filter(F.col("rn") <= _BASKET_K)
              .select("user_id", "item"))
    # One aggregation pass gives both scalars the rule stage needs.
    n_users = basket.agg(
        F.countDistinct("user_id").cast("long").alias("n"))
    item_supp = (basket.groupBy("item")
                 .agg(F.count(F.lit(1)).cast("long").alias("n_item")))

    a, b = basket.alias("a"), basket.alias("b")
    pair = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("a.item") < F.col("b.item")))
            .groupBy(F.col("a.item").alias("item_x"),
                     F.col("b.item").alias("item_y"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_pair")))
    supported = (pair.crossJoin(F.broadcast(n_users))
                 .filter(F.col("n_pair") * _SUPP_DEN >= F.col("n")))
    directed = (supported
                .select(F.col("item_x").alias("antecedent"),
                        F.col("item_y").alias("consequent"),
                        "n_pair", "n")
                .unionAll(
                    supported.select(
                        F.col("item_y").alias("antecedent"),
                        F.col("item_x").alias("consequent"),
                        "n_pair", "n")))
    sa = item_supp.select(F.col("item").alias("antecedent"),
                          F.col("n_item").alias("n_a"))
    sc_ = item_supp.select(F.col("item").alias("consequent"),
                           F.col("n_item").alias("n_c"))
    out = (directed
           .join(F.broadcast(sa), "antecedent")
           .join(F.broadcast(sc_), "consequent"))
    conf = F.col("n_pair").cast("double") / F.col("n_a")
    lift = (F.col("n_pair").cast("double") * F.col("n")
            / (F.col("n_a") * F.col("n_c")))
    return (out.select("antecedent", "consequent", "n_pair",
                       conf.alias("confidence"), lift.alias("lift"))
            .orderBy(F.col("lift").desc(), F.col("antecedent").asc(),
                     F.col("consequent").asc())
            .limit(_TOP_RULES))


@query(
    "retrieval_eval_metrics",
    oracle=BM25_ORACLE_CTES + f"""
    , rel AS (
      SELECT doc_id,
             CASE WHEN tft >= 8 THEN 3
                  WHEN tft >= 5 THEN 2
                  WHEN tft >= 2 THEN 1
                  ELSE 0 END AS g
      FROM (SELECT doc_id,
                   len(list_filter(toks,
                       x -> x IN ('{_TERMS[0]}', '{_TERMS[1]}',
                                  '{_TERMS[2]}'))) AS tft
            FROM base)
    ), ranked AS (
      SELECT p.doc_id, r.g,
             row_number() OVER (
               ORDER BY round((p.s1 + p.s2) + p.s3, 6) DESC,
                        p.doc_id ASC) AS rank
      FROM per_doc p JOIN rel r ON p.doc_id = r.doc_id
    ), top10 AS (
      SELECT rank, g FROM ranked WHERE rank <= 10
    ), grade_counts AS (
      SELECT CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n3,
             CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM rel
    ), dcg AS (
      SELECT coalesce(
               sum((pow(2.0, g) - 1.0)
                   / (ln(rank + 1.0) / ln(2.0))), 0.0) AS dcg10
      FROM top10
    ), idcg AS (
      SELECT sum((pow(2.0, CASE WHEN r <= n3 THEN 3
                            WHEN r <= n3 + n2 THEN 2
                            WHEN r <= n3 + n2 + n1 THEN 1
                            ELSE 0 END) - 1.0)
                 / (ln(r + 1.0) / ln(2.0))) AS idcg10
      FROM grade_counts, unnest(generate_series(1, 10)) AS s(r)
    ), mrr AS (
      SELECT coalesce(max(1.0 / rank) FILTER (WHERE g = 3), 0.0)
               AS mrr10
      FROM top10
    ), rec AS (
      SELECT CAST(count(*) FILTER (WHERE g >= 2) AS BIGINT) AS hits10
      FROM top10
    )
    SELECT round(dcg.dcg10 / idcg.idcg10, 6) AS ndcg_at_10,
           round(mrr.mrr10, 6) AS mrr_at_10,
           round(CAST(rec.hits10 AS DOUBLE) / 10.0, 6)
             AS precision_at_10,
           CAST(gc.n3 + gc.n2 AS BIGINT) AS n_relevant
    FROM dcg, idcg, mrr, rec, grade_counts gc
    """,
    doc=(
        "IR evaluation harness: NDCG@10 / MRR@10 / precision@10 of "
        "the engine's BM25 ranking (reusing _bm25_scored and the "
        "VERBATIM shared oracle CTEs — identical posting-list plan "
        "and expression tree) graded against an independent exact "
        "relevance signal (total query-term occurrences bucketed "
        "0-3; BM25's k1 saturation + length norm disagree with raw "
        "counts, so NDCG measures 0.87-0.96, not a vacuous 1.0). "
        "The ideal DCG derives from grade COUNTS (n3/n2/n1) joined "
        "to a 10-row sequence — never a corpus-wide global sort; "
        "the system top-10 is the only ordered relation and it is "
        "rank-bounded. log2 follows the bm25 6-dp rounding "
        "discipline; every other metric is an integer ratio."
    ),
)
def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # Graded relevance INDEPENDENT of the ranker's scoring function:
    # total query-term occurrence count, bucketed 0-3. BM25's per-term
    # saturation (k1) and length normalization deliberately disagree
    # with raw counts, so the metrics discriminate (measured NDCG@10
    # 0.87-0.96 across SFs, not a vacuous 1.0).
    tft = F.size(F.filter(toks, lambda x: x.isin(*_TERMS)))
    g = (F.when(tft >= 8, F.lit(3))
         .when(tft >= 5, F.lit(2))
         .when(tft >= 2, F.lit(1))
         .otherwise(F.lit(0)))
    rel = _cut(docs.select("doc_id", g.alias("g")))

    scored = _bm25_scored(spark, sf_dir)
    # Top-10 via the heap (TakeOrderedAndProject) FIRST, then ranks
    # attached by a window over just those 10 rows — ranking the full
    # posting list with an unpartitioned row_number would drag every
    # posting into one partition. Same order key both stages, so the
    # result equals the oracle's rank-then-filter formulation.
    top = _cut(scored.join(rel, "doc_id")
               .orderBy(F.col("score").desc(), F.col("doc_id").asc())
               .limit(10))
    top10 = top.withColumn("rank", F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
    ).select("rank", "g")
    top10 = _cut(top10)

    # log2 spelled as ln(x)/ln(2) — the oracle's exact expression
    # tree; a precomputed 1/ln(2) literal would multiply instead of
    # divide and can differ in the last ulp.
    dcg_term = (F.pow(F.lit(2.0), F.col("g")) - F.lit(1.0)) / (
        F.log(F.col("rank") + F.lit(1.0)) / F.log(F.lit(2.0)))
    dcg = top10.agg(F.coalesce(F.sum(dcg_term), F.lit(0.0)).alias("dcg10"))

    grade_counts = rel.agg(
        F.sum((F.col("g") == 3).cast("long")).cast("long").alias("n3"),
        F.sum((F.col("g") == 2).cast("long")).cast("long").alias("n2"),
        F.sum((F.col("g") == 1).cast("long")).cast("long").alias("n1"))
    ranks10 = (grade_counts
               .select("n3", "n2", "n1",
                       F.explode(F.sequence(F.lit(1), F.lit(10)))
                       .alias("r")))
    ideal_g = (F.when(F.col("r") <= F.col("n3"), F.lit(3))
               .when(F.col("r") <= F.col("n3") + F.col("n2"), F.lit(2))
               .when(F.col("r") <= F.col("n3") + F.col("n2")
                     + F.col("n1"), F.lit(1))
               .otherwise(F.lit(0)))
    idcg_term = (F.pow(F.lit(2.0), ideal_g) - F.lit(1.0)) / (
        F.log(F.col("r") + F.lit(1.0)) / F.log(F.lit(2.0)))
    idcg = ranks10.agg(F.sum(idcg_term).alias("idcg10"))

    mrr = top10.agg(F.coalesce(
        F.max(F.when(F.col("g") == 3,
                     F.lit(1.0) / F.col("rank"))), F.lit(0.0))
        .alias("mrr10"))
    rec = top10.agg(
        F.sum((F.col("g") >= 2).cast("long")).cast("long").alias("hits10"))

    from ._helpers import one_row
    one = one_row(dcg, idcg, mrr, rec,
                  grade_counts.select(
                      (F.col("n3") + F.col("n2")).alias("n_rel")))
    return one.select(
        F.round(F.col("dcg10") / F.col("idcg10"), 6).alias("ndcg_at_10"),
        F.round(F.col("mrr10"), 6).alias("mrr_at_10"),
        F.round(F.col("hits10").cast("double") / F.lit(10.0), 6)
        .alias("precision_at_10"),
        F.col("n_rel").cast("long").alias("n_relevant"))


# ---------------------------------------------------------------------------
# Persisted inverted-index probe (the lexical twin of the
# ann_*_indexed family): bm25_search's own docstring concedes that a
# real deployment persists the postings table so scoring is one
# pass — this query puts exactly that operating mode on the oracle
# surface, with probe == direct pinned as exact equality (score
# doubles included — the scoring expression tree is shared verbatim
# via operators/inverted_index.score_bm25_pivot).


@query(
    "bm25_search_indexed",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS probe_matches_direct,
           TRUE AS full_k_returned
    FROM documents
    """,
    doc=(
        "BM25 against the PERSISTED inverted index "
        "(write_inverted_index + bm25_topk_from_index): postings "
        "bucketed by pmod(xxhash64(token), 16) so the probe is a "
        "partition-pruned read of the query terms' buckets plus the "
        "doclen sidecar — never the corpus text — and must equal "
        "the direct bm25_search top-10 exactly (same shared scoring "
        "expression tree, score doubles included, via exceptAll "
        "both ways). Pinned TRUE beside DuckDB's corpus-count "
        "anchor; the postings are a session-scoped read-only "
        "artifact (built once per process, probed thereafter)."
    ),
)
def bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.inverted_index import (bm25_topk_from_index,
                                            write_inverted_index)
    from . import _phases
    from ._helpers import session_artifact
    from .retrieval_queries import bm25_search

    docs = load_table(spark, sf_dir, "documents")
    # postings persist once per session (build-once/probe-many, like
    # the ann_*_indexed family); repeated calls probe the prebuilt
    # index and the build is reported via phase_split instead of
    # recurring in query wall
    path, _, build_sec, cached = session_artifact(
        ("bm25_idx", sf_dir),
        lambda p: write_inverted_index(docs, p))
    _phases.report("bm25_search_indexed", build_sec=build_sec,
                   build_cached=float(cached))

    cols = ["doc_id", "score"]
    direct = _cut(bm25_search(spark, sf_dir).select(*cols))
    probed = _cut(bm25_topk_from_index(spark, path, _TERMS, k=10)
                  .select(*cols))
    from ._helpers import multiset_diff_count
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    # single-pass signed-count diff — value-identical to the former
    # exceptAll-both-ways probe, half the exchanges (r13)
    n_diff = multiset_diff_count(direct, probed, "n_diff")
    n_res = probed.agg(F.count(F.lit(1)).alias("n_results"))
    from ._helpers import one_row
    out = (one_row(n_docs, n_diff, n_res)
           .select("n_docs",
                   (F.col("n_diff") == 0).alias("probe_matches_direct"),
                   (F.col("n_results") == 10).alias("full_k_returned")))
    return _cut(out)


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase graph — the cohesion
# primitive completing the graph family (cc / pagerank / hits). The
# graph: parts are nodes, an edge joins two parts co-ordered in >= 2
# distinct orders (the weight threshold is the domain densifier —
# one shared order is noise, repeat co-purchase is signal — and the
# |E| bound: it holds the edge set at 2.4-3.9k across all three SFs
# while the unthresholded graph grows 9k -> 1.2M).

_TRI_MIN_W = 2
_TRI_TOP = 20

# SHARED edge derivation — the SQL prologue and the Spark builder are
# single-sourced so copurchase_triangles and copurchase_kcore can
# never silently rank different graphs (a threshold change lands on
# both or neither). Canonical x < y pairs, weight >= _TRI_MIN_W.
_COPURCHASE_EDGE_CTES = f"""
    WITH li AS (
      SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT a.p AS x, b.p AS y
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING count(*) >= {_TRI_MIN_W}
    )"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (load_table(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")))
    a, b = li.alias("a"), li.alias("b")
    return (a.join(b, (F.col("a.o") == F.col("b.o"))
                   & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
            .agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= _TRI_MIN_W)
            .select("x", "y"))


@query(
    "copurchase_triangles",
    oracle=_COPURCHASE_EDGE_CTES + f""", tri AS (
      SELECT e1.x AS u, e1.y AS v1, e2.y AS v2
      FROM e e1
      JOIN e e2 ON e1.y = e2.x
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    ), tn AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v1 FROM tri
      UNION ALL SELECT v2 FROM tri
    )
    SELECT node AS part, CAST(count(*) AS BIGINT) AS n_triangles
    FROM tn GROUP BY node
    ORDER BY n_triangles DESC, part ASC
    LIMIT {_TRI_TOP}
    """,
    doc=(
        "per-part triangle participation in the co-purchase graph "
        "(parts co-ordered in >=2 distinct orders), top-20 by count: "
        "degree-ordered wedge generation (operators/graph."
        "triangle_participation — each edge oriented low->high by "
        "(degree, id) so wedge fan-out is bounded by out-degree, "
        "each triangle generated exactly once at its lowest-order "
        "vertex, closure a plain 2-key equi-join against the "
        "canonical edge set) where the oracle spells the naive "
        "3-way self-join. The weight-thresholded edge build is one "
        "per-order self-join + one rollup whose shuffle carries "
        "(part, part) pairs, bounded by sum over orders of "
        "lines-per-order squared."
    ),
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_participation

    out = triangle_participation(_copurchase_edges(spark, sf_dir),
                                 a="x", b="y")
    return (out.select(F.col("node").alias("part"), "n_triangles")
            .orderBy(F.col("n_triangles").desc(), F.col("part").asc())
            .limit(_TRI_TOP))


# ---------------------------------------------------------------------------
# CUSUM changepoint monitor — sequential drift detection over the
# hourly event-rate series. The recursive CUSUM S_i = max(0,
# S_{i-1} + (c_i - k)) is NOT directly a window function, but the
# classic prefix transform makes it one: S_i = PS_i - min(0,
# running_min(PS_i)) with PS the cumulative sum of (c_i - k) — two
# frames over ONE window spec, exact BIGINT throughout. The
# reference allowance k adapts per series (floor(mean)+2), so the
# monitor is rate-scale-free across SFs; h = 3k. On the stationary
# fixture the alarm count is 0 at every SF (specificity);
# tests/test_mining.py plants a level shift and pins the alarm
# rising exactly where the shift starts (sensitivity).

_CUSUM_SLACK = 2      # k = floor(per-series mean) + slack
_CUSUM_H_MULT = 3     # alarm threshold h = mult * k


@query(
    "cusum_changepoints",
    oracle=f"""
    WITH hc AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), kk AS (
      -- floor(), not a bare CAST: DuckDB CAST(DOUBLE AS BIGINT)
      -- rounds-to-nearest while Spark's floor truncates toward -inf
      SELECT event_type,
             CAST(floor(sum(c) / count(*)) AS BIGINT)
               + {_CUSUM_SLACK} AS k
      FROM hc GROUP BY event_type
    ), p AS (
      SELECT hc.event_type, hr, kk.k,
             sum(c - kk.k) OVER (PARTITION BY hc.event_type
                                 ORDER BY hr) AS ps
      FROM hc JOIN kk USING (event_type)
    ), s AS (
      SELECT event_type, hr, k,
             ps - least(min(ps) OVER (PARTITION BY event_type
                                      ORDER BY hr), 0) AS cu
      FROM p
    ), ranked AS (
      SELECT event_type, hr, k, cu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cu DESC, hr ASC) AS rn
      FROM s
    )
    SELECT r.event_type, CAST(r.k AS BIGINT) AS k,
           CAST({_CUSUM_H_MULT} * r.k AS BIGINT) AS h,
           CAST(r.cu AS BIGINT) AS max_cusum,
           r.hr AS peak_hr,
           CAST(a.n_alarms AS BIGINT) AS n_alarms
    FROM ranked r
    JOIN (SELECT event_type,
                 sum(CASE WHEN cu > {_CUSUM_H_MULT} * k
                     THEN 1 ELSE 0 END) AS n_alarms
          FROM s GROUP BY event_type) a USING (event_type)
    WHERE r.rn = 1
    """,
    doc=(
        "CUSUM changepoint monitor over hourly event rates: the "
        "recursive alarm statistic rewritten as cumsum minus "
        "clamped running-min (two frames, ONE window spec per "
        "series -> one event_type exchange shared by both), "
        "per-series integer allowance k = floor(mean)+2 broadcast "
        "back, output = per-series (k, h, max statistic, argmax "
        "hour with earliest-hour tie-break, alarm count). Exact "
        "BIGINT end to end; at 100 TB each series' state is one "
        "window partition and the monitor is the batch twin of a "
        "streaming drift detector. Hours with zero events are absent "
        "from the series (no gap fill): the statistic skips them "
        "identically in both engines; compose with gap_filled_hourly "
        "first if silence itself should count as negative drift."
    ),
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.groupBy("event_type",
                     F.date_trunc("hour", "ts").alias("hr"))
          .agg(F.count(F.lit(1)).cast("long").alias("c")))
    hc = _cut(hc)
    kk = (hc.groupBy("event_type")
          .agg((F.floor(F.sum("c") / F.count(F.lit(1)))
                + F.lit(_CUSUM_SLACK)).cast("long").alias("k")))
    w = Window.partitionBy("event_type").orderBy("hr")
    p = (hc.join(F.broadcast(kk), "event_type")
         .withColumn("ps", F.sum(F.col("c") - F.col("k")).over(w)))
    cu = (F.col("ps")
          - F.least(F.min("ps").over(w), F.lit(0).cast("long")))
    s = p.select("event_type", "hr", "k", cu.alias("cu"))
    s = _cut(s)
    rn = F.row_number().over(
        Window.partitionBy("event_type")
        .orderBy(F.col("cu").desc(), F.col("hr").asc()))
    peaks = (s.withColumn("rn", rn).filter(F.col("rn") == 1)
             .select("event_type", "k", "cu", "hr"))
    alarms = (s.groupBy("event_type")
              .agg(F.sum((F.col("cu") > _CUSUM_H_MULT * F.col("k"))
                         .cast("long")).cast("long").alias("n_alarms")))
    return (peaks.join(alarms, "event_type")
            .select("event_type",
                    F.col("k").cast("long").alias("k"),
                    (F.lit(_CUSUM_H_MULT) * F.col("k")).cast("long")
                    .alias("h"),
                    F.col("cu").cast("long").alias("max_cusum"),
                    F.col("hr").alias("peak_hr"),
                    "n_alarms"))


# ---------------------------------------------------------------------------
# k-core decomposition over the same co-purchase graph — the
# cohesion family's second member beside triangles: the 2-core drops
# every tree-like tendril and keeps only nodes embedded in cycles.
# The oracle unrolls a FIXED 10 peeling rounds as chained CTEs
# (convergence measures 1/4/7 rounds at the three SFs, and the peel
# is idempotent once stable, so 10 rounds == the fixpoint); the
# engine peels with a count-stable early stop (monotone removal
# makes count equality prove set equality).

_KCORE_K = 2
_KCORE_ROUNDS = 10


def _kcore_oracle() -> str:
    # e0 re-materializes the SHARED edge CTE (single-sourced with
    # copurchase_triangles via _COPURCHASE_EDGE_CTES): the unrolled
    # rounds reference e0 three times each, so inlining would expand
    # 3^rounds base scans (surfaced as too-many-open-files).
    parts = [_COPURCHASE_EDGE_CTES
             + ", e0 AS MATERIALIZED (SELECT x, y FROM e)"]
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(f""",
    d{i} AS MATERIALIZED (
      SELECT n, count(*) AS d FROM (
        SELECT x AS n FROM e{i - 1}
        UNION ALL SELECT y FROM e{i - 1})
      GROUP BY n),
    e{i} AS MATERIALIZED (
      SELECT e.x, e.y FROM e{i - 1} e
      JOIN d{i} da ON da.n = e.x AND da.d >= {_KCORE_K}
      JOIN d{i} db ON db.n = e.y AND db.d >= {_KCORE_K})""")
    parts.append(f"""
    SELECT n AS part, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT x AS n FROM e{_KCORE_ROUNDS}
          UNION ALL SELECT y FROM e{_KCORE_ROUNDS})
    GROUP BY n
    ORDER BY core_degree DESC, part ASC LIMIT 20""")
    return "".join(parts)


@query(
    "copurchase_kcore",
    oracle=_kcore_oracle(),
    doc=(
        "2-core of the >=2-orders co-purchase graph (operators/"
        "graph.kcore — iterative peeling, per round one degree "
        "rollup + two endpoint semi joins, lineage cut per round, "
        "count-stable early stop that monotone removal makes exact): "
        "the maximal subgraph where every part keeps >=2 co-purchase "
        "partners, i.e. tendrils pruned, cycle-embedded parts only — "
        "top-20 by residual core degree. The oracle unrolls a fixed "
        "10 peeling rounds as chained CTEs; idempotence past the "
        "fixpoint (measured depth 1/4/7 across SFs) makes the "
        "early-stopped engine loop and the fixed unroll identical."
    ),
)
def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore

    core = kcore(_copurchase_edges(spark, sf_dir), k=_KCORE_K,
                 max_rounds=_KCORE_ROUNDS, a="x", b="y")
    deg = (core.select(F.col("x").alias("part"))
           .unionAll(core.select(F.col("y").alias("part")))
           .groupBy("part")
           .agg(F.count(F.lit(1)).cast("long").alias("core_degree")))
    return (deg.orderBy(F.col("core_degree").desc(),
                        F.col("part").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) —
# PageRank over the word co-occurrence graph, the classic
# graph-based keyword extractor pretraining pipelines use for
# unsupervised doc tagging. Pure composition: the co-occurrence
# relation feeds the SAME exact-BIGINT pagerank operator and the
# SAME unrolled oracle as the trade-graph ranking
# (_pagerank_oracle(ctes=...)). Word nodes stay strings: the graph
# is VOCABULARY-bounded (|V| = distinct tokens), so the long-key
# shuffle discipline for unbounded id graphs does not apply.

_TEXTRANK_WINDOW = 2
_TEXTRANK_TOP = 20

_TEXTRANK_CTES = f"""
    tok AS MATERIALIZED (
      SELECT doc_id, i AS pos, t[i] AS w
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(
                     coalesce(text, ''), '\\s+'), x -> x <> '') AS t
            FROM documents),
           unnest(generate_series(1, len(t))) AS u(i)
    ), cooc AS MATERIALIZED (
      SELECT DISTINCT a.w AS src, b.w AS dst
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id
       AND b.pos - a.pos BETWEEN 1 AND {_TEXTRANK_WINDOW}
       AND a.w <> b.w
    ), edges AS MATERIALIZED (
      SELECT src, dst FROM cooc
      UNION
      SELECT dst AS src, src AS dst FROM cooc
    ), deg AS MATERIALIZED (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src)"""


def _textrank_oracle() -> str:
    from .linkgraph_queries import _pagerank_oracle
    return _pagerank_oracle(ctes=_TEXTRANK_CTES, top=_TEXTRANK_TOP)


@query(
    "textrank_keywords",
    oracle=_textrank_oracle(),
    doc=(
        "TextRank keywords (Mihalcea & Tarau 2004): undirected word "
        "co-occurrence graph (window 2, distinct pairs, both "
        "orientations) ranked by the engine's exact-BIGINT pagerank "
        "— the same operator and the same unrolled DuckDB oracle as "
        "the trade-graph ranking, swapped onto a different edge "
        "relation (operator reuse, not reimplementation). The "
        "co-occurrence build is one position self-join per doc with "
        "a <=window band; the graph itself is vocabulary-bounded, "
        "so every per-iteration exchange is |V|+|E| rows regardless "
        "of corpus size — at 100 TB the edge DERIVATION is the only "
        "corpus-scale stage, and it partial-aggregates to the "
        "distinct pair set map-side."
    ),
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank
    from ..functions.text import tokens
    from .linkgraph_queries import _PR_ITERS, _PR_TOTAL

    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id", tokens("text").alias("t"))
           .select("doc_id", F.posexplode("t").alias("pos0", "w")))
    a, b = tok.alias("a"), tok.alias("b")
    # canonicalize (least, greatest) BEFORE the distinct: the
    # symmetric closure of distinct canonical pairs is then a plain
    # unionAll of both orientations with no duplicates possible —
    # one distinct exchange instead of two over the edge set, same
    # edge relation exactly
    cooc = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("b.pos0") - F.col("a.pos0"))
                   .between(1, _TEXTRANK_WINDOW)
                   & (F.col("a.w") != F.col("b.w")))
            .select(F.least(F.col("a.w"), F.col("b.w")).alias("src"),
                    F.greatest(F.col("a.w"), F.col("b.w")).alias("dst"))
            .distinct())
    edges = cooc.unionAll(cooc.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
    pr = pagerank(None, edges, id_col="id", iters=_PR_ITERS,
                  total=_PR_TOTAL)
    return (pr.select(F.col("id").alias("node"), "rank_fp")
            .orderBy(F.col("rank_fp").desc(), "node")
            .limit(_TEXTRANK_TOP))


# ---------------------------------------------------------------------------
# Quantile normalization of quality scores across sources — the
# curation step that makes per-source quality thresholds comparable:
# each source's score distribution is mapped rank-for-rank onto a
# REFERENCE source's distribution (the cross-batch form of quantile
# normalization used in quality-score calibration). Normalizing to a
# reference (not to the pooled global distribution) keeps every
# ranking window PARTITIONED by source — no unpartitioned global
# sort anywhere, the same discipline as every other window in this
# repo; at 100 TB each source ranks independently and only the
# (rank -> value) map of the one reference source joins back.


@query(
    "quantile_normalize_scores",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
      FROM documents
    ), ref_name AS (
      SELECT min(source) AS ref FROM scored
    ), ranked AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score, doc_id) AS r,
             count(*) OVER (PARTITION BY source) AS n_s
      FROM scored
    ), ref_map AS (
      SELECT k.r AS g, k.score AS norm_score, k.n_s AS n_ref
      FROM ranked k CROSS JOIN ref_name
      WHERE k.source = ref_name.ref
    )
    SELECT t.doc_id, t.source, t.score, m.norm_score
    FROM ranked t
    JOIN ref_map m
      ON m.g = (t.r * m.n_ref + t.n_s - 1) // t.n_s
    """,
    doc=(
        "cross-source quantile normalization of quality scores "
        "(score = n_chars as the length-quality proxy): each "
        "source's rank-r score maps to the reference source's value "
        "at rank ceil(r*n_ref/n_s) — rank-for-rank distribution "
        "matching in pure integer arithmetic (the value-at-ceil "
        "discipline of percentile_disc / quality_band_filter). Every "
        "window is PARTITIONED by source (one exchange serves "
        "row_number and the count frame); the reference (rank -> "
        "value) map is |n_ref| rows joined back on the computed "
        "rank. Ties break by doc_id identically in both engines."
    ),
)
def quantile_normalize_scores(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source",
                         F.col("n_chars").cast("long").alias("score"))
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    ranked = (scored
              .withColumn("r", F.row_number().over(w))
              .withColumn("n_s", F.count(F.lit(1)).over(
                  Window.partitionBy("source"))))
    ranked = _cut(ranked)
    ref_name = ranked.agg(F.min("source").alias("ref"))
    ref_map = (ranked.join(F.broadcast(ref_name),
                           ranked["source"] == F.col("ref"))
               .select(F.col("r").alias("g"),
                       F.col("score").alias("norm_score"),
                       F.col("n_s").alias("n_ref")))
    # Exact integer ceiling-division (`div` stays in BIGINT) — the
    # double-division + floor form is exact only while r*n_ref < 2^53,
    # which a 100 TB corpus exceeds; the oracle's `//` is integer, so
    # both engines now share the same arithmetic at any scale.
    g = F.expr("(r * n_ref + n_s - 1) div n_s").cast("long")
    t = ranked.select("doc_id", "source", "score", "r", "n_s")
    return (t.crossJoin(F.broadcast(ref_map.select("n_ref").limit(1)))
            .withColumn("g", g)
            .join(ref_map.select("g", "norm_score"), "g")
            .select("doc_id", "source", "score", "norm_score"))


# ---------------------------------------------------------------------------
# Marketing-style conversion attribution: for every purchase, the
# user's FIRST and LAST click in the preceding 24h — first-touch /
# last-touch attribution, the classic event-analytics join that
# needs no join at all: conditional MIN/MAX over a VALUE-based RANGE
# frame (epoch-µs) per user. Value-based frames make tie handling
# engine-independent (all rows at equal ts enter the frame
# regardless of physical order), the same discipline as
# rolling_time_range.

_ATTR_WINDOW_US = 24 * 3600 * 1_000_000


@query(
    "purchase_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us
      FROM events
    ), attributed AS (
      SELECT event_id, user_id, event_type, t_us,
             min(CASE WHEN event_type = 'click' THEN t_us END)
               OVER (PARTITION BY user_id ORDER BY t_us
                     RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                           AND CURRENT ROW) AS first_click_us,
             max(CASE WHEN event_type = 'click' THEN t_us END)
               OVER (PARTITION BY user_id ORDER BY t_us
                     RANGE BETWEEN {_ATTR_WINDOW_US} PRECEDING
                           AND CURRENT ROW) AS last_click_us
      FROM ev
    )
    SELECT event_id, user_id, CAST(t_us AS BIGINT) AS t_us,
           CAST(first_click_us AS BIGINT) AS first_click_us,
           CAST(last_click_us AS BIGINT) AS last_click_us
    FROM attributed WHERE event_type = 'purchase'
    """,
    doc=(
        "first-touch / last-touch purchase attribution: conditional "
        "MIN/MAX of click timestamps over a 24h VALUE-based RANGE "
        "frame per user (epoch-µs) — no self-join, one user_id "
        "exchange shared by both frames (same window spec), and "
        "value-based framing makes equal-timestamp ties "
        "engine-independent by construction. Purchases with no click "
        "in the window carry NULLs identically in both engines. The "
        "funnel family's attribution member (funnel_conversion "
        "answers did-they-convert; this answers which-touch-gets-"
        "credit)."
    ),
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("t_us")))
    w = (Window.partitionBy("user_id").orderBy("t_us")
         .rangeBetween(-_ATTR_WINDOW_US, 0))
    click_ts = F.when(F.col("event_type") == "click", F.col("t_us"))
    out = (ev
           .withColumn("first_click_us", F.min(click_ts).over(w))
           .withColumn("last_click_us", F.max(click_ts).over(w))
           .filter(F.col("event_type") == "purchase"))
    return out.select("event_id", "user_id",
                      F.col("t_us").cast("long").alias("t_us"),
                      F.col("first_click_us").cast("long")
                      .alias("first_click_us"),
                      F.col("last_click_us").cast("long")
                      .alias("last_click_us"))


# ---------------------------------------------------------------------------
# Per-series OLS trend — slope/intercept of event value over time,
# the metric-drift rollup beside cusum_changepoints (CUSUM detects
# WHEN a rate shifted; this quantifies the value trend). Exact-
# moment discipline from corr_quantity_price: cents-quantized y,
# per-series-rebased x in whole SECONDS (per-row x*x stays far
# inside BIGINT in both engines — raw epoch-µs squared would
# overflow DuckDB's BIGINT multiply), DECIMAL(38,0) partial sums,
# and slope/intercept each ONE shared double expression rounded 6dp.

# Zero-x-variance guard (a series with one event, or every event in
# the same rebased second): the denominator is exactly 0 and Spark's
# 0.0/0.0 (NaN) vs DuckDB's can differ — an explicit CASE makes the
# degenerate series NULL identically in both engines.
_TREND_DEN = ("(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
              " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))")
_SLOPE_EXPR = (
    f"CASE WHEN {_TREND_DEN} = 0.0 THEN NULL ELSE "
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    f" / {_TREND_DEN}, 6) END"
)
_ICEPT_EXPR = (
    f"CASE WHEN {_TREND_DEN} = 0.0 THEN NULL ELSE "
    "round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))"
    f" / {_TREND_DEN}, 6) END"
)


@query(
    "per_type_value_trend",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    ), base AS (
      SELECT event_type, min(t_us) AS t0 FROM ev GROUP BY event_type
    ), xy AS (
      SELECT ev.event_type,
             (ev.t_us - base.t0) // 1000000 AS x, ev.y
      FROM ev JOIN base USING (event_type)
    ), m AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           {_SLOPE_EXPR} AS slope_cents_per_sec,
           {_ICEPT_EXPR} AS intercept_cents
    FROM m
    """,
    doc=(
        "per-event-type OLS trend of value over time: y in exact "
        "cents, x in whole seconds REBASED to each series' first "
        "event (two-pass min + broadcast join-back — raw epoch-µs "
        "squared would overflow 64-bit per-row products in both "
        "engines), five moments as order-independent DECIMAL(38,0) "
        "partials, slope and intercept each one shared double "
        "expression over the exact moments rounded 6dp (the "
        "corr_quantity_price discipline — never regr_slope() over "
        "doubles, whose accumulation order the engine picks). Two "
        "partial-aggregating exchanges total at any scale."
    ),
)
def per_type_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull() & ~F.isnan("value"))
          .select("event_type", F.unix_micros("ts").alias("t_us"),
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("y")))
    base = ev.groupBy("event_type").agg(F.min("t_us").alias("t0"))
    xy = (ev.join(F.broadcast(base), "event_type")
          .select("event_type",
                  F.expr("(t_us - t0) div 1000000").alias("x"), "y"))
    dec = "decimal(38,0)"
    x, y = F.col("x"), F.col("y")
    m = (xy.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x.cast(dec)).alias("sx"),
              F.sum(y.cast(dec)).alias("sy"),
              F.sum((x * y).cast(dec)).alias("sxy"),
              F.sum((x * x).cast(dec)).alias("sxx")))
    return m.select("event_type", F.col("n").alias("n_rows"),
                    F.expr(_SLOPE_EXPR).alias("slope_cents_per_sec"),
                    F.expr(_ICEPT_EXPR).alias("intercept_cents"))
