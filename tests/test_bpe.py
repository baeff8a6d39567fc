"""Learned-BPE operator tests — incremental trainer vs a naive
full-rescan reference, encode semantics, and end-to-end determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.functions.text import tokens
from nvd2mysqlloader_spark.operators.bpe import (
    _EOW, bpe_encode_udf, bpe_train, bpe_train_on, word_frequencies)

from .conftest import SF_SMOKE


def _naive_bpe(word_freqs, num_merges):
    """Full-rescan reference: recount every pair from scratch each
    round — O(rounds x corpus) but obviously correct."""
    words = {i: list(w) + [_EOW] for i, (w, _) in enumerate(word_freqs)}
    freqs = {i: f for i, (_, f) in enumerate(word_freqs)}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for i, sym in words.items():
            for p in zip(sym, sym[1:]):
                counts[p] = counts.get(p, 0) + freqs[i]
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        a, b = best
        for i, sym in words.items():
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
    return merges


CORPUS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          ("newer", 4), ("wide", 1), ("lowest", 2)]


def test_incremental_trainer_matches_naive_reference():
    for n in (1, 5, 10, 40):
        assert bpe_train(CORPUS, n) == _naive_bpe(CORPUS, n), n


def test_classic_sennrich_example_first_merges():
    # the canonical example: "es" (9) then "est" (9) dominate
    merges = bpe_train([("low", 5), ("lower", 2), ("newest", 6),
                        ("widest", 3)], 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_train_exhausts_gracefully():
    # tiny corpus: more merges requested than pairs exist
    merges = bpe_train([("ab", 1)], 100)
    assert len(merges) <= 2  # (a,b) then (ab,</w>)


def test_encode_applies_merges_by_rank(spark):
    merges = bpe_train(CORPUS, 10)
    enc = bpe_encode_udf(merges)
    df = spark.createDataFrame([(["newest", "lowest", "unseen"],)], ["t"])
    [row] = df.select(enc("t").alias("s")).collect()
    subs = row["s"]
    # "newest"/"lowest" compress via the learned est merge; the
    # never-seen word falls back to characters joined only by merges
    # that happen to apply
    assert len(subs) > 3
    assert "".join(subs) == "newestlowestunseen"


def test_end_to_end_deterministic_across_partitionings(spark):
    from nvd2mysqlloader_spark.sources.tpch import load_table
    docs = load_table(spark, SF_SMOKE, "documents")
    m1 = bpe_train_on(docs, tokens("text"), num_merges=32)
    m2 = bpe_train_on(docs.repartition(7), tokens("text"), num_merges=32)
    assert m1 == m2 and len(m1) == 32

    from nvd2mysqlloader_spark.plans import QUERIES
    r1 = sorted(map(tuple, QUERIES["bpe_learned_tokens"]
                    .fn(spark, SF_SMOKE).collect()))
    r2 = sorted(map(tuple, QUERIES["bpe_learned_tokens"]
                    .fn(spark, SF_SMOKE).collect()))
    assert r1 == r2 and r1


def test_word_frequencies_bounded_and_ordered(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "c", "b", "a"],)], ["t"])
    rows = word_frequencies(df, F.col("t"), top_words=2).collect()
    assert [(r["word"], r["freq"]) for r in rows] == [("a", 3), ("b", 2)]


def test_tab_edged_text_keeps_invariants(spark):
    """split('\\tabc', \\s+) yields a leading '' token (trim strips
    spaces only): the empty artifact must count as no word and emit no
    subword, or the oracle-pinned subs_le_chars invariant breaks."""
    df = spark.createDataFrame(
        [("s", "\ta"), ("s", "b\n"), ("s", " ok two ")],
        ["source", "text"])
    merges = bpe_train(CORPUS, 5)
    enc = bpe_encode_udf(merges)
    from nvd2mysqlloader_spark.functions.text import tokens
    toks = F.filter(tokens("text"), lambda x: x != "")
    rows = df.select(
        F.size(toks).alias("n_words"),
        F.size(enc(toks)).alias("n_subs"),
        F.length(F.concat_ws("", toks)).alias("n_chars")).collect()
    for r in rows:
        assert r["n_words"] <= r["n_subs"] <= max(r["n_chars"], r["n_words"]), r


def test_empty_word_encodes_to_nothing(spark):
    enc = bpe_encode_udf(bpe_train(CORPUS, 3))
    [row] = (spark.createDataFrame([(["", "low", ""],)], ["t"])
             .select(enc("t").alias("s")).collect())
    assert "".join(row["s"]) == "low"
