"""Link-graph analytics over the transaction graph — PageRank and the
degree profile, the web-graph curation ops (Common Crawl ranks its
host link graph to decide what to crawl/keep; pretraining pipelines
reuse the score as a document-quality prior).

Graph: supplier↔customer transaction links from lineitem⋈orders —
node ``'s'||suppkey`` / ``'c'||custkey`` (prefix-disjoint ids), one
directed edge EACH WAY per distinct trading pair, so the chain is
ergodic and the fixture exercises real degree skew. At 100 TB the
same derivation is a distinct-pair rollup of a trillion-row fact —
itself a scale-relevant step (one shuffle on the join key, then the
distinct partial-aggregates map-side).

PageRank is exactly oracle-checked: integer fixed-point arithmetic
(operators/graph.pagerank) makes every rank a BIGINT that DuckDB
reproduces bit-for-bit by unrolling the same recurrence — a hash
match on the scores themselves, not a bound verdict. The reference
has no graph surface at all (nvd2mysqlloader.py:452-506).

Registered after every other module: appends must never reshuffle
the harness's fixed-size registry prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..sources.tpch import load_table
from .registry import query

_PR_ITERS = 6
_PR_TOTAL = 1_000_000_000_000

# Shared CTE prologue: the derived link graph. UNION ALL is dupe-free
# because the 's'/'c' prefixes make the two orientations disjoint.
# MATERIALIZED pins single evaluation: the unrolled iteration CTEs
# reference these 6-12 times, and DuckDB would otherwise inline and
# re-run the distinct-pair derivation per reference (measured >500 s
# vs 3.6 s at sf0.1 for the pagerank oracle).
_GRAPH_CTES = """
    pairs AS MATERIALIZED (
      SELECT DISTINCT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o.o_custkey AS VARCHAR) AS dst
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    edges AS MATERIALIZED (
              SELECT src, dst FROM pairs
              UNION ALL
              SELECT dst AS src, src AS dst FROM pairs),
    deg AS MATERIALIZED (
      SELECT src, count(*) AS outdeg FROM edges GROUP BY src)"""


def _link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected trade edges with LONG-encoded nodes (role in the
    low bit: supplier=0, customer=1). The iterative rankers shuffle
    the node key |E| times per round — long keys halve the exchange
    payload vs 's123'-style strings and avoid the full-GC stalls the
    string build measured in long bench sessions (see the cve2cpe
    entry in PLANS.md). ``_decode_trade`` restores the oracle-shaped
    labels BEFORE any ranking or min-witness aggregation, so output
    order and the DuckDB oracle are byte-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pairs = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
             .select((F.col("l_suppkey") * 2).alias("src"),
                     (F.col("o_custkey") * 2 + 1).alias("dst"))
             .distinct())
    return pairs.union(pairs.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))


def _decode_trade(col):
    return F.concat(
        F.when(F.pmod(col, F.lit(2)) == 0, F.lit("s"))
        .otherwise(F.lit("c")),
        (col / 2).cast("long").cast("string"))


def _pagerank_oracle(iters: int = _PR_ITERS, ctes: str = _GRAPH_CTES,
                     top: int = 25) -> str:
    """Unroll the integer-fixed-point recurrence as chained CTEs —
    fixed iteration count makes PageRank plain (non-recursive) SQL,
    and BIGINT arithmetic makes it bit-identical to the Spark loop.
    CASTs pin DuckDB's HUGEINT sum results back to BIGINT so the
    result schema matches Spark's LONG. ``ctes`` may swap in any
    prologue defining ``edges (src, dst)`` + ``deg (src, outdeg)``
    (the textrank word graph reuses this, mining-style)."""
    parts = ["WITH" + ctes + f""",
    nn AS (SELECT count(*) AS n
           FROM (SELECT DISTINCT src FROM edges)),
    r0 AS (SELECT e.src AS node,
                  CAST({_PR_TOTAL} // nn.n AS BIGINT) AS rank_fp
           FROM (SELECT DISTINCT src FROM edges) e CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(f""",
    inc{i} AS (SELECT e.dst AS node,
                      CAST(sum(r.rank_fp // d.outdeg) AS BIGINT) AS inc
               FROM {p} r JOIN edges e ON e.src = r.node
                          JOIN deg d ON d.src = r.node
               GROUP BY e.dst),
    dang{i} AS (SELECT CAST(COALESCE(sum(r.rank_fp), 0) AS BIGINT) AS dang
                FROM {p} r
                WHERE NOT EXISTS (SELECT 1 FROM deg d
                                  WHERE d.src = r.node)),
    r{i} AS (SELECT b.node,
                    CAST((15 * ({_PR_TOTAL} // nn.n)) // 100
                         + (85 * (COALESCE(i.inc, 0)
                                  + dg.dang // nn.n)) // 100
                         AS BIGINT) AS rank_fp
             FROM r0 b LEFT JOIN inc{i} i ON i.node = b.node
             CROSS JOIN nn CROSS JOIN dang{i} dg)""")
    parts.append(f"""
    SELECT node, rank_fp FROM r{iters}
    ORDER BY rank_fp DESC, node LIMIT {top}""")
    return "".join(parts)


@query(
    "pagerank_scores",
    oracle=_pagerank_oracle(),
    doc=(
        "PageRank over the supplier↔customer link graph "
        "(operators/graph.pagerank): 6 damped power-iteration steps in "
        "exact BIGINT fixed-point (rank mass 1e12, per-edge "
        "contribution rank div outdeg, dangling mass teleported "
        "uniformly), top-25 nodes with node-id tie-break. Integer "
        "arithmetic is order-independent, so the scores hash-match a "
        "DuckDB oracle that unrolls the identical recurrence as "
        "chained CTEs — exact cross-engine agreement on an iterative "
        "graph algorithm, not a bound verdict. Per iteration: one "
        "|E|-linear join keyed on src + one sum keyed on dst + a "
        "broadcast dangling singleton; lineage cut per round. The "
        "web-graph document-importance score of Common-Crawl-style "
        "curation, absent from the reference (its query layer is "
        "single-table SELECTs, nvd2mysqlloader.py:452-506)."
    ),
)
def pagerank_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(None, _link_edges(spark, sf_dir), id_col="id",
                  iters=_PR_ITERS, total=_PR_TOTAL)
    # decode long node keys BEFORE ranking: the tie-break must order
    # the oracle-shaped string labels, not the numeric encoding
    return (pr.select(_decode_trade(F.col("id")).alias("node"),
                      "rank_fp")
            .orderBy(F.col("rank_fp").desc(), "node").limit(25))


@query(
    "link_degree_profile",
    oracle="WITH" + _GRAPH_CTES + """
    SELECT outdeg AS degree, count(*) AS n_nodes,
           min(src) AS min_node
    FROM deg GROUP BY outdeg
    """,
    doc=(
        "degree distribution of the same link graph (graph-shape "
        "profiling — the first thing run on any new web-graph crawl to "
        "see skew/hubs before ranking it): distinct trading pairs in "
        "both orientations, per-node out-degree, histogram with a "
        "min-node witness per degree. The distinct pair rollup "
        "partial-aggregates map-side; the degree histogram is a "
        "two-level groupBy on already-shuffled keys."
    ),
)
def link_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    deg = (_link_edges(spark, sf_dir)
           .groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    # decode before the min-witness: the oracle's min is over the
    # string labels ('c10' < 'c2'), not the numeric encoding
    return (deg.select(_decode_trade(F.col("src")).alias("src"),
                       "outdeg")
            .groupBy(F.col("outdeg").alias("degree"))
            .agg(F.count(F.lit(1)).alias("n_nodes"),
                 F.min("src").alias("min_node")))


_HITS_ITERS = 4
_HITS_TOTAL = 1_000_000_000


def _hits_oracle(iters: int = _HITS_ITERS, ctes: str = _GRAPH_CTES,
                 top: int = 10) -> str:
    """Unroll the integer fixed-point HITS recurrence (div-by-scalar
    renormalization, operators/graph.hits) as chained CTEs over any
    prologue defining a ``pairs`` CTE of DIRECTED (src, dst) edges
    (default: the supplier→customer trading graph). Every score is
    BIGINT, so DuckDB reproduces the Spark loop bit-for-bit."""
    t = _HITS_TOTAL
    parts = ["WITH" + ctes + f""",
    hn AS MATERIALIZED (
           SELECT src AS node FROM pairs
           UNION SELECT dst FROM pairs),
    hnn AS (SELECT count(*) AS n FROM hn),
    a0 AS (SELECT hn.node, CAST({t} // hnn.n AS BIGINT) AS a
           FROM hn CROSS JOIN hnn)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    h{i}r AS MATERIALIZED (
              SELECT p.src AS node, CAST(sum(a.a) AS BIGINT) AS raw
              FROM pairs p JOIN a{i - 1} a ON a.node = p.dst
              GROUP BY p.src),
    h{i}s AS (SELECT greatest(CAST(coalesce(sum(raw), 0) AS BIGINT)
                              // {t}, 1) AS s FROM h{i}r),
    h{i} AS MATERIALIZED (
             SELECT hn.node,
                    CAST(coalesce(r.raw, 0) // s.s AS BIGINT) AS h
             FROM hn LEFT JOIN h{i}r r USING (node)
             CROSS JOIN h{i}s s),
    a{i}r AS MATERIALIZED (
              SELECT p.dst AS node, CAST(sum(h.h) AS BIGINT) AS raw
              FROM pairs p JOIN h{i} h ON h.node = p.src
              GROUP BY p.dst),
    a{i}s AS (SELECT greatest(CAST(coalesce(sum(raw), 0) AS BIGINT)
                              // {t}, 1) AS s FROM a{i}r),
    a{i} AS MATERIALIZED (
             SELECT hn.node,
                    CAST(coalesce(r.raw, 0) // s.s AS BIGINT) AS a
             FROM hn LEFT JOIN a{i}r r USING (node)
             CROSS JOIN a{i}s s)""")
    parts.append(f"""
    (SELECT 'hub' AS role, node, h AS score_fp FROM h{iters}
     ORDER BY h DESC, node LIMIT {top})
    UNION ALL
    (SELECT 'authority' AS role, node, a AS score_fp FROM a{iters}
     ORDER BY a DESC, node LIMIT {top})""")
    return "".join(parts)


@query(
    "hits_scores",
    oracle=_hits_oracle(),
    doc=(
        "HITS hubs/authorities over the DIRECTED supplier→customer "
        "pair graph (operators/graph.hits): 4 mutual-recursion "
        "rounds in exact BIGINT fixed-point, each half-step "
        "renormalized by the single integer scalar "
        "greatest(Σraw div 1e9, 1) instead of a float division — so "
        "the scores are order-independent integers and hash-match a "
        "DuckDB oracle unrolling the identical recurrence (the "
        "second exactly-checked iterative graph algorithm beside "
        "pagerank_scores). On the bipartite trading graph hubs are "
        "suppliers whose customer base is itself widely supplied; "
        "authorities are the most-supplied customers. Top-10 per "
        "role with node tie-break. Per half-step: one |E|-linear "
        "shuffle-hash join against a pre-partitioned edge cache + "
        "one sum + a 1-row broadcast normalizer."
    ),
)
def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hits

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    # dedup folded INTO the operator's orientation-cache build
    # (hits(dedup=True), r12): a caller-side .distinct() exchanged
    # the pairs on (src, dst) only for hits() to re-exchange them on
    # dst — one |E| exchange instead of two, same edge set (raw
    # duplication factor measured 1.02 here, so the lost map-side
    # partial dedup is noise)
    pairs = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
             .select((F.col("l_suppkey") * 2).alias("src"),
                     (F.col("o_custkey") * 2 + 1).alias("dst")))
    hs = hits(pairs, id_col="node", iters=_HITS_ITERS,
              total=_HITS_TOTAL, dedup=True)
    hs = hs.select(_decode_trade(F.col("node")).alias("node"),
                   "hub_fp", "auth_fp")
    hubs = (hs.select(F.lit("hub").alias("role"), "node",
                      F.col("hub_fp").alias("score_fp"))
            .orderBy(F.desc("score_fp"), "node").limit(10))
    auths = (hs.select(F.lit("authority").alias("role"), "node",
                       F.col("auth_fp").alias("score_fp"))
             .orderBy(F.desc("score_fp"), "node").limit(10))
    return hubs.union(auths)


# Weighted variant: the same graph with edge weight = trade count per
# pair (the natural weighted-link-graph form: hyperlink multiplicity,
# co-purchase frequency). Contribution is (rank·w) div wsum(u).
_WGRAPH_CTES = """
    wpairs AS MATERIALIZED (
      SELECT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
             'c' || CAST(o.o_custkey AS VARCHAR) AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    wedges AS MATERIALIZED (
      SELECT src, dst, w FROM wpairs
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM wpairs),
    wdeg AS MATERIALIZED (
      SELECT src, CAST(sum(w) AS BIGINT) AS wsum
      FROM wedges GROUP BY src)"""


def _pagerank_weighted_oracle(iters: int = _PR_ITERS) -> str:
    """Weighted unroll — identical structure to _pagerank_oracle with
    per-edge contribution (rank · w) // wsum."""
    parts = ["WITH" + _WGRAPH_CTES + f""",
    nn AS (SELECT count(*) AS n
           FROM (SELECT DISTINCT src FROM wedges)),
    r0 AS (SELECT e.src AS node,
                  CAST({_PR_TOTAL} // nn.n AS BIGINT) AS rank_fp
           FROM (SELECT DISTINCT src FROM wedges) e CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(f""",
    inc{i} AS (SELECT e.dst AS node,
                      CAST(sum((r.rank_fp * e.w) // d.wsum) AS BIGINT)
                        AS inc
               FROM {p} r JOIN wedges e ON e.src = r.node
                          JOIN wdeg d ON d.src = r.node
               GROUP BY e.dst),
    dang{i} AS (SELECT CAST(COALESCE(sum(r.rank_fp), 0) AS BIGINT)
                  AS dang
                FROM {p} r
                WHERE NOT EXISTS (SELECT 1 FROM wdeg d
                                  WHERE d.src = r.node)),
    r{i} AS (SELECT b.node,
                    CAST((15 * ({_PR_TOTAL} // nn.n)) // 100
                         + (85 * (COALESCE(i.inc, 0)
                                  + dg.dang // nn.n)) // 100
                         AS BIGINT) AS rank_fp
             FROM r0 b LEFT JOIN inc{i} i ON i.node = b.node
             CROSS JOIN nn CROSS JOIN dang{i} dg)""")
    parts.append(f"""
    SELECT node, rank_fp FROM r{iters}
    ORDER BY rank_fp DESC, node LIMIT 25""")
    return "".join(parts)


@query(
    "pagerank_weighted_scores",
    oracle=_pagerank_weighted_oracle(),
    doc=(
        "WEIGHTED PageRank over the trading graph — edge weight = "
        "trade count per supplier↔customer pair, per-edge "
        "contribution (rank·w) div wsum (operators/graph.pagerank "
        "with weight_col): frequent trading relationships carry "
        "proportionally more rank mass, the form real link-graph "
        "ranking uses (hyperlink multiplicity / interaction counts). "
        "Same exact BIGINT fixed-point recurrence and the same "
        "unrolled hash-matching DuckDB oracle as pagerank_scores; "
        "overflow contract total·max(w) < 2^63 documented on the "
        "operator. The weight rollup replaces the distinct-pair "
        "rollup — same single shuffle; everything downstream is the "
        "one plan, with wsum a SUM window instead of a COUNT."
    ),
)
def pagerank_weighted_scores(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    wpairs = (li.join(od, li["l_orderkey"] == od["o_orderkey"])
              .groupBy((F.col("l_suppkey") * 2).alias("src"),
                       (F.col("o_custkey") * 2 + 1).alias("dst"))
              .agg(F.count(F.lit(1)).alias("w")))
    wedges = wpairs.union(wpairs.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst"),
                                        "w"))
    pr = pagerank(None, wedges, id_col="id", iters=_PR_ITERS,
                  total=_PR_TOTAL, weight_col="w")
    return (pr.select(_decode_trade(F.col("id")).alias("node"),
                      "rank_fp")
            .orderBy(F.col("rank_fp").desc(), "node").limit(25))
