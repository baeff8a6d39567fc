"""Semantic pins for the set-similarity / substring-span / phrase
queries beyond the hash-oracle match (tests/test_oracle.py covers
all three cross-engine): prefix-filter completeness against an
in-test brute force on planted near-dups, maximal-span geometry on
planted duplicated passages (cross-doc, within-doc, overlap edges),
and phrase positions including overlapping occurrences."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.plans import QUERIES
from nvd2mysqlloader_spark.plans.setsim_queries import (
    dominant_phrase_matches, duplicated_span_relation, prefix_filter_pairs)

from .conftest import SF_ORACLE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _shingles(text: str) -> set[str]:
    t = text.split()
    return {" ".join(t[i:i + 3]) for i in range(max(len(t) - 2, 0))}


def test_prefix_filter_matches_bruteforce_on_planted(spark):
    """Prefix filtering must lose no qualifying pair (the theorem the
    oracle hash-match proves on the fixture, re-proved here on data
    built to sit NEAR the 0.7 threshold on both sides)."""
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, base),
        (2, base + " extra"),                      # J barely under 1
        (3, " ".join(f"w{i}" for i in range(20))   # J ~ 18/38 < 0.7
            + " " + " ".join(f"x{i}" for i in range(20))),
        (4, " ".join(f"y{i}" for i in range(30))),  # disjoint
        (5, ""),                                    # empty set edge
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in prefix_filter_pairs(docs).collect()}
    # brute force over the same shingle sets
    sets = {i: _shingles(t) for i, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a < b and (sets[a] or sets[b]):
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter / union >= 0.7:
                    want[(a, b)] = inter / union
    assert got == want
    assert (1, 2) in got          # the near-identical pair survives
    assert (1, 3) not in got      # the half-overlap pair is excluded


def test_duplicate_spans_planted_geometry(spark):
    """A 20-token passage shared by two docs yields EXACTLY one
    maximal span per doc of span_len 20 at the right offsets; a doc
    repeating its own passage gets two spans (within-doc duplication
    counts, per Lee et al. §3); boundary 8-grams that straddle the
    passage edge are unique and must NOT widen the span."""
    passage = " ".join(f"p{i}" for i in range(20))
    a = " ".join(f"a{i}" for i in range(5)) + " " + passage \
        + " " + " ".join(f"A{i}" for i in range(4))
    b = " ".join(f"b{i}" for i in range(9)) + " " + passage
    c = passage + " " + " ".join(f"c{i}" for i in range(10)) \
        + " " + passage
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string")
    toks = docs.select(
        "doc_id",
        F.array_remove(F.split(F.col("text"), r"\s+"), "").alias("t"))
    spans = {(r.doc_id, r.span_start, r.span_end, r.span_len)
             for r in duplicated_span_relation(toks).collect()}
    assert (1, 6, 25, 20) in spans     # after the 5 unique a-tokens
    assert (2, 10, 29, 20) in spans    # after the 9 unique b-tokens
    assert (3, 1, 20, 20) in spans     # self-duplicated copy #1
    assert (3, 31, 50, 20) in spans    # copy #2 after 10 fillers
    assert len(spans) == 4             # and nothing else


def test_phrase_search_counts_overlapping_occurrences(spark):
    """Dominant-trigram selection is frequency-then-lexicographic,
    and sliding positions count OVERLAPPING matches (the 'a b a b a'
    edge: 'a b a' occurs at pos 1 and pos 3)."""
    docs = spark.createDataFrame(
        [(1, "a b a b a"),
         (2, "q r s a b a t u v"),
         (3, "z1 z2 z3 z4")],
        "doc_id long, text string")
    toks = docs.select(
        "doc_id",
        F.array_remove(F.split(F.col("text"), r"\s+"), "").alias("t"))
    got = {r.doc_id: (r.phrase, r.n_matches, r.first_pos)
           for r in dominant_phrase_matches(toks).collect()}
    # 'a b a' appears 3x corpus-wide (2 overlapping + 1), beating
    # every other trigram (<= 1 each)
    assert got == {1: ("a b a", 2, 1), 2: ("a b a", 1, 4)}


def test_phrase_probe_is_broadcast_and_scan_pruned(spark):
    """The 1-row dominant-phrase scalar must broadcast (the probe is
    a map-side filter, never a shuffled join), and the documents scan
    must read only (doc_id, text) — the untouched lang/source/n_chars
    columns never leave parquet."""
    p = _plan(QUERIES["phrase_search"].fn(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "n_chars" not in p and "lang" not in p


def test_prefix_join_no_cartesian_and_pruned(spark):
    """The candidate join is an equi-join on the prefix shingle —
    never a nested-loop — and the scan reads only (doc_id, text)."""
    p = _plan(QUERIES["prefix_filter_jaccard_join"].fn(spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "n_chars" not in p and "lang" not in p


def test_duplicate_spans_single_window_exchange(spark):
    """The islands merge needs exactly one hashpartitioning exchange
    on doc_id (window + rollup share it); the frequency pass
    exchanges digests only."""
    p = _plan(QUERIES["duplicate_substring_spans"].fn(spark, SF_ORACLE))
    assert p.count("hashpartitioning(doc_id") <= 2  # window + reuse
    assert "CartesianProduct" not in p


def test_prefix_filter_matches_bruteforce_random(spark):
    """Randomized twin: 60 docs over a 12-word vocab (dense shingle
    collisions — the adversarial regime for prefix selection) must
    produce EXACTLY the brute-force Jaccard>=0.7 pair set."""
    import random
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(60):
        n = rng.randint(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant a few near-identical pairs so the >=0.7 band is populated
    for j in range(3):
        base = " ".join(rng.choice(vocab) for _ in range(30))
        rows.append((100 + 2 * j, base))
        rows.append((101 + 2 * j, base + " " + rng.choice(vocab)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in prefix_filter_pairs(docs).collect()}
    sets = {i: _shingles(t) for i, t in rows}
    want = set()
    for a_ in sets:
        for b_ in sets:
            if a_ < b_:
                u = len(sets[a_] | sets[b_])
                if u and len(sets[a_] & sets[b_]) / u >= 0.7:
                    want.add((a_, b_))
    assert got == want
    assert want, "planted near-dup pairs must populate the band"


def test_duplicate_spans_match_bruteforce_random(spark):
    """Randomized twin for the span merge: random token lists with
    planted shared passages, spans recomputed by a direct Python
    implementation of anchor-marking + run-merging."""
    import random
    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(500)]      # big vocab: no chance dups
    passage = [f"p{i}" for i in range(15)]
    docs_tok = {}
    for i in range(20):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
        if i % 3 == 0:                         # plant the passage
            pos = rng.randint(0, len(toks))
            toks = toks[:pos] + passage + toks[pos:]
        docs_tok[i] = toks
    k = 8
    grams = {}
    for i, toks in docs_tok.items():
        for p in range(len(toks) - k + 1):
            grams.setdefault(" ".join(toks[p:p + k]), []).append((i, p))
    dup_pos = {}
    for g, occ in grams.items():
        if len(occ) >= 2:
            for i, p in occ:
                dup_pos.setdefault(i, set()).add(p + 1)   # 1-based
    want = set()
    for i, ps in dup_pos.items():
        run = []
        for p in sorted(ps):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    want.add((i, run[0], run[-1] + k - 1,
                              run[-1] - run[0] + k))
                run = [p]
        want.add((i, run[0], run[-1] + k - 1, run[-1] - run[0] + k))
    from pyspark.sql import functions as F2
    toks_df = spark.createDataFrame(
        [(i, t) for i, t in docs_tok.items()],
        "doc_id long, t array<string>")
    got = {(r.doc_id, r.span_start, r.span_end, r.span_len)
           for r in duplicated_span_relation(toks_df).collect()}
    assert got == want
    assert want, "planted passages must produce spans"


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A short doc quoted wholesale inside a much longer one: high
    containment (the dedup signal) but LOW Jaccard — the asymmetric
    relation must fire exactly where the symmetric one cannot, and
    match a brute force over the same sets including the direction."""
    from nvd2mysqlloader_spark.plans.setsim_queries import (
        containment_pairs, prefix_filter_pairs)
    quote = " ".join(f"q{i}" for i in range(12))
    rows = [
        (1, quote),                                       # the short doc
        (2, " ".join(f"l{i}" for i in range(40)) + " " + quote
            + " " + " ".join(f"r{i}" for i in range(40))),  # quotes it
        (3, " ".join(f"z{i}" for i in range(30))),          # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in containment_pairs(docs).collect()}
    sets = {i: _shingles(t) for i, t in rows}
    want = {}
    for a_ in sets:
        for b_ in sets:
            if a_ != b_ and sets[a_]:
                c = len(sets[a_] & sets[b_]) / len(sets[a_])
                if c >= 0.8:
                    want[(a_, b_)] = c
    assert got == want
    assert (1, 2) in got and (2, 1) not in got   # direction matters
    # and Jaccard at 0.7 misses the pair entirely
    jac = {(r.id_a, r.id_b)
           for r in prefix_filter_pairs(docs).collect()}
    assert (1, 2) not in jac and (2, 1) not in jac


def test_containment_matches_bruteforce_random(spark):
    """Randomized twin over a dense small vocab (adversarial for the
    one-sided prefix): exact ordered-pair equality with brute force."""
    import random
    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(10)]
    rows = []
    for i in range(50):
        n = rng.randint(0, 20)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant containment: short docs embedded in longer ones
    for j in range(3):
        core = [rng.choice(vocab) for _ in range(10)]
        pad = [rng.choice(vocab) for _ in range(25)]
        rows.append((200 + 2 * j, " ".join(core)))
        rows.append((201 + 2 * j, " ".join(pad[:12] + core + pad[12:])))
    from nvd2mysqlloader_spark.plans.setsim_queries import containment_pairs
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in containment_pairs(docs).collect()}
    sets = {i: _shingles(t) for i, t in rows}
    want = {(a_, b_) for a_ in sets for b_ in sets
            if a_ != b_ and sets[a_]
            and len(sets[a_] & sets[b_]) / len(sets[a_]) >= 0.8}
    assert got == want
    assert want, "planted quote-inclusions must populate the result"
