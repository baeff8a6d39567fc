"""Semantic pins for the pattern-mining / retrieval-eval queries
beyond the hash-oracle match (tests/test_oracle.py): planted
correlated baskets must surface as the top lift rule, the basket cap
must bound a power user's fan-out, and the IR metrics must be live
discriminative computations (0 < NDCG < 1 on the fixture)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.plans import QUERIES

from .conftest import SF_ORACLE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_association_rules_planted_correlation(spark, tmp_path):
    """Items 'A' and 'B' planted to co-occur in every basket while
    'C' floats independently: the (A,B) rules must rank first by
    lift, with confidence 1.0 both directions."""
    rows = []
    eid = 0
    for u in range(10):
        items = ["A", "B"] + (["C"] if u % 2 == 0 else ["D"])
        for it in items:
            rows.append((eid, 1000 + eid, u, "click", 1.0,
                         '{"k": "%s"}' % it))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sf")
    import os
    os.makedirs(d, exist_ok=True)
    ev.write.parquet(d + "/events.parquet")
    out = QUERIES["association_rules"].fn(spark, d).collect()
    assert out, "no rules on perfectly correlated baskets"
    top = out[0]
    assert {top.antecedent, top.consequent} <= {"A", "B", "C", "D"}
    ab = [r for r in out if {r.antecedent, r.consequent} == {"A", "B"}]
    assert len(ab) == 2                      # both directions
    assert all(r.confidence == 1.0 for r in ab)
    assert all(r.lift == 1.0 for r in ab)    # A,B in every basket
    # C appears in half the baskets: lift(C->A) = 1.0 as well, but
    # C->D never co-occurs (disjoint halves) => absent entirely
    assert not [r for r in out if {r.antecedent, r.consequent}
                == {"C", "D"}]


def test_association_rules_respects_basket_cap(spark, tmp_path):
    """A power user touching 80 items contributes only its top-64 by
    event count — pairs involving the user's 16 coldest items never
    form from that user."""
    from nvd2mysqlloader_spark.plans.mining_queries import _BASKET_K
    rows = []
    eid = 0
    # hot items get 2 events each, cold items 1 — deterministic cap
    for i in range(80):
        reps = 2 if i < 64 else 1
        for _ in range(reps):
            rows.append((eid, 1000 + eid, 0, "view", 1.0,
                         '{"k": "i%02d"}' % i))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, "
              "event_type string, value double, props string")
    import os
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    ev.write.parquet(d + "/events.parquet")
    out = QUERIES["association_rules"].fn(spark, d).collect()
    items = {r.antecedent for r in out} | {r.consequent for r in out}
    assert all(int(it[1:]) < _BASKET_K for it in items)


def test_retrieval_metrics_are_live_and_discriminative(spark):
    """On the real fixture the metrics must be genuine measurements:
    NDCG strictly between 0 and 1 (the grade signal disagrees with
    BM25 somewhere in the top-10), n_relevant a plausible corpus
    fraction, and MRR consistent with a direct recount of the first
    rank-1-grade-3 hit."""
    r = QUERIES["retrieval_eval_metrics"].fn(spark, SF_ORACLE).collect()[0]
    assert 0.0 < r.ndcg_at_10 < 1.0
    assert 0.0 <= r.mrr_at_10 <= 1.0
    assert 0.0 < r.precision_at_10 <= 1.0
    assert 0 < r.n_relevant
    # direct recount of MRR from the engine's own ranking
    from nvd2mysqlloader_spark.plans.retrieval_queries import (_TERMS,
                                                               _bm25_scored)
    from nvd2mysqlloader_spark.sources.tpch import load_table
    docs = load_table(spark, SF_ORACLE, "documents")
    tft = F.size(F.filter(F.split("text", " "),
                          lambda x: x.isin(*_TERMS)))
    rel = docs.select("doc_id", tft.alias("tft"))
    ranked = (_bm25_scored(spark, SF_ORACLE)
              .orderBy(F.col("score").desc(), F.col("doc_id").asc())
              .limit(10).collect())
    grades = {x.doc_id: x.tft for x in rel.collect()}
    mrr = 0.0
    for i, row in enumerate(ranked, start=1):
        if grades[row.doc_id] >= 8:
            mrr = 1.0 / i
            break
    assert abs(r.mrr_at_10 - round(mrr, 6)) < 1e-12


def test_rules_topk_heap_and_broadcast_supports(spark):
    """Top-20-by-lift must be a rank-bounded heap, never a full
    sort, and the item-support/user-count scalars must broadcast —
    no sort-merge join anywhere in the plan."""
    p = _plan(QUERIES["association_rules"].fn(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_metrics_no_corpus_global_sort(spark):
    """The system top-10 must come from the heap
    (TakeOrderedAndProject), never an unpartitioned corpus-wide
    window sort; ideal DCG comes from grade counts + a 10-row
    sequence, so no second corpus-wide sort appears either."""
    from nvd2mysqlloader_spark.plans.mining_queries import \
        retrieval_eval_metrics
    from nvd2mysqlloader_spark.plans.retrieval_queries import _bm25_scored
    from nvd2mysqlloader_spark.sources.tpch import load_table
    # plan of the pre-checkpoint top-10 stage (the full query cuts
    # lineage, so inspect the stage the cut materializes)
    docs = load_table(spark, SF_ORACLE, "documents")
    scored = _bm25_scored(spark, SF_ORACLE)
    staged = (scored.join(docs.select("doc_id"), "doc_id")
              .orderBy(F.col("score").desc(), F.col("doc_id").asc())
              .limit(10))
    p = _plan(staged)
    assert "TakeOrderedAndProject" in p
    p_full = _plan(retrieval_eval_metrics(spark, SF_ORACLE))
    assert "CartesianProduct" not in p_full


def test_bm25_index_probe_prunes_buckets(spark, tmp_path):
    """The persisted-postings probe must partition-prune to the query
    terms' hash buckets (PartitionFilters at the scan — the layout
    skips the other buckets' bytes) and push the token IN-filter into
    parquet. (DataFrame.inputFiles() reports the pre-pruning file
    index, so the assertion reads the physical plan.)"""
    from nvd2mysqlloader_spark.operators.inverted_index import (
        N_BUCKETS, bm25_topk_from_index, write_inverted_index)
    from nvd2mysqlloader_spark.plans.retrieval_queries import _TERMS
    from nvd2mysqlloader_spark.sources.tpch import load_table

    path = str(tmp_path / "index")
    docs = load_table(spark, SF_ORACLE, "documents")
    write_inverted_index(docs, path)
    expected = sorted({r.b for r in spark.createDataFrame(
        [(t,) for t in _TERMS], "token string")
        .select(F.pmod(F.xxhash64("token"), F.lit(N_BUCKETS))
                .cast("int").alias("b")).collect()})
    assert len(expected) < N_BUCKETS          # pruning is non-vacuous
    probe = bm25_topk_from_index(spark, path, _TERMS, k=10)
    p = _plan(probe)
    in_list = ",".join(str(x) for x in expected)
    assert f"IN ({in_list})" in p             # PartitionFilters
    assert "In(token, [" in p                 # pushed parquet filter


def test_bm25_indexed_verdict_is_live(spark):
    """probe == direct must hold on the real fixture (the booleans
    are computed, not constants): the verdict row is all-TRUE and the
    probe's own top-10 equals bm25_search's row for row."""
    from nvd2mysqlloader_spark.operators.inverted_index import (
        bm25_topk_from_index, write_inverted_index)
    from nvd2mysqlloader_spark.plans.retrieval_queries import _TERMS
    from nvd2mysqlloader_spark.sources.tpch import load_table
    import tempfile

    r = QUERIES["bm25_search_indexed"].fn(spark, SF_ORACLE).collect()[0]
    assert r.probe_matches_direct and r.full_k_returned
    with tempfile.TemporaryDirectory() as d:
        docs = load_table(spark, SF_ORACLE, "documents")
        write_inverted_index(docs, d + "/idx")
        probed = bm25_topk_from_index(spark, d + "/idx", _TERMS, k=10)
        direct = QUERIES["bm25_search"].fn(spark, SF_ORACLE)
        assert [tuple(x) for x in probed.collect()] \
            == [tuple(x) for x in direct.collect()]


def test_cusum_detects_planted_level_shift(spark, tmp_path):
    """A series whose rate triples halfway must alarm, with the peak
    inside the shifted half; a stationary sibling series must stay
    quiet. The window-transform statistic (cumsum minus clamped
    running-min) is re-verified against the textbook recursion
    S_i = max(0, S_{i-1} + x_i) in plain Python."""
    import datetime
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    counts = {}
    for hour in range(48):
        ts = base + datetime.timedelta(hours=hour)
        n_shift = 3 if hour < 24 else 12         # planted 4x shift
        for series, n in (("shifty", n_shift), ("calm", 3)):
            counts.setdefault(series, []).append(n)
            for i in range(n):
                rows.append((eid, ts + datetime.timedelta(seconds=i),
                             0, series, 1.0, "{}"))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import os
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    ev.write.parquet(d + "/events.parquet")
    got = {r.event_type: r
           for r in QUERIES["cusum_changepoints"].fn(spark, d).collect()}

    # textbook recursion twin with the query's own k per series
    for series, cs in counts.items():
        k = sum(cs) // len(cs) + 2
        assert got[series].k == k
        s_max, s = 0, 0
        n_alarms = 0
        for c in cs:
            s = max(0, s + (c - k))
            s_max = max(s_max, s)
            if s > 3 * k:
                n_alarms += 1
        assert got[series].max_cusum == s_max
        assert got[series].n_alarms == n_alarms

    assert got["shifty"].n_alarms > 0            # sensitivity
    assert got["shifty"].peak_hr >= base + datetime.timedelta(hours=24)
    assert got["calm"].n_alarms == 0             # specificity


def test_textrank_hub_word_outranks_periphery(spark, tmp_path):
    """A word co-occurring with every other word (the planted hub)
    must take rank 1; words appearing once in one pair rank below
    it. Sanity for the co-occurrence window too: words further than
    2 positions apart must NOT form an edge."""
    import os
    docs = spark.createDataFrame(
        [(1, "hub a1 hub a2 hub a3 hub a4 hub a5"),
         (2, "b1 hub b2 hub b3 hub b4"),
         (3, "far1 x x x x far2")],      # far1..far2 gap > 2
        "doc_id long, text string")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.write.parquet(d + "/documents.parquet")
    out = QUERIES["textrank_keywords"].fn(spark, d).collect()
    assert out[0].node == "hub"
    nodes = {r.node for r in out}
    # far1/far2 are 5 apart: no direct edge, but both touch 'x' so
    # they ARE in the graph — presence ok, direct edge impossible is
    # what the window bound guarantees (checked via the build below)
    from nvd2mysqlloader_spark.plans.mining_queries import \
        _TEXTRANK_WINDOW
    assert _TEXTRANK_WINDOW == 2
    assert "x" in nodes


def test_quantile_normalize_reference_is_identity_and_maps_shift(
        spark, tmp_path):
    """The reference source (lexicographic min) must map rank-for-rank
    to ITSELF (g = ceil(r*n_ref/n_ref) = r — an exact identity), and
    a shifted second source's normalized values must all come from
    the reference's value set, preserving rank order."""
    import os
    rows = []
    # srcA (reference): scores 10,20,...,100 ; srcB: 1010..1100
    for i in range(10):
        rows.append((i, "srcA", "x", "en", (i + 1) * 10))
        rows.append((100 + i, "srcB", "x", "en", 1010 + i * 10))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, lang string, "
              "n_chars long")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    docs.write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in
           QUERIES["quantile_normalize_scores"].fn(spark, d).collect()}
    a_vals = sorted((i + 1) * 10 for i in range(10))
    for i in range(10):
        assert out[i].norm_score == out[i].score          # identity
        assert out[100 + i].norm_score == a_vals[i]       # rank map
    # order preserved: B's normalized scores ascend with B's raw
    bs = [out[100 + i] for i in range(10)]
    assert all(x.norm_score < y.norm_score
               for x, y in zip(bs, bs[1:]))


def test_purchase_attribution_window_and_ties(spark, tmp_path):
    """Planted timeline: a click 25h before the purchase is OUTSIDE
    the 24h window; clicks inside map to first/last touch; a click at
    the exact purchase timestamp counts (value-based frame); a
    purchase with no click carries NULLs."""
    import datetime
    import os
    base = datetime.datetime(2024, 1, 2, 0, 0, 0)

    def at(h):
        return base + datetime.timedelta(hours=h)

    rows = [
        (1, at(-25), 1, "click", 1.0, "{}"),     # outside 24h
        (2, at(-23), 1, "click", 1.0, "{}"),     # first touch
        (3, at(-1), 1, "click", 1.0, "{}"),      # later touch
        (4, at(0), 1, "click", 1.0, "{}"),       # tie with purchase
        (5, at(0), 1, "purchase", 9.0, "{}"),
        (6, at(0), 2, "purchase", 9.0, "{}"),    # no clicks at all
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    ev.write.parquet(d + "/events.parquet")
    out = {r.event_id: r for r in
           QUERIES["purchase_attribution"].fn(spark, d).collect()}
    us = lambda h: int((at(h) - datetime.datetime(1970, 1, 1)
                        ).total_seconds() * 1_000_000)
    assert out[5].first_click_us == us(-23)      # -25h excluded
    assert out[5].last_click_us == us(0)         # the tied click
    assert out[6].first_click_us is None
    assert out[6].last_click_us is None


def test_value_trend_recovers_planted_line_exactly(spark, tmp_path):
    """A noiseless planted line y = 3.5 + 0.02*x_sec must come back
    with slope 0.02 $/s = 2.0 cents/s and intercept 350 cents
    EXACTLY (6dp); a planted flat series returns slope 0."""
    import datetime
    import os
    base = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for s in range(0, 600, 60):               # one point per minute
        ts = base + datetime.timedelta(seconds=s)
        rows.append((eid, ts, 1, "lin", 3.5 + 0.02 * s, "{}")); eid += 1
        rows.append((eid, ts, 1, "flat", 7.25, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    ev.write.parquet(d + "/events.parquet")
    got = {r.event_type: r for r in
           QUERIES["per_type_value_trend"].fn(spark, d).collect()}
    assert got["lin"].slope_cents_per_sec == 2.0
    assert got["lin"].intercept_cents == 350.0
    assert got["flat"].slope_cents_per_sec == 0.0
    assert got["flat"].intercept_cents == 725.0
