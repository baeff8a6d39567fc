"""End-to-end curation pipeline: every stage accounted for, known
duplicates collapsed, holdout and contaminated docs dropped, output
readable and scrubbed."""

from __future__ import annotations

from pyspark.sql import functions as F

from nvd2mysqlloader_spark.corpus import curate_corpus

from .conftest import SF_SMOKE


def test_curate_corpus_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # the synthetic corpus carries no natural PII — PLANT some so the
    # scrub stage is genuinely exercised end-to-end (without this, the
    # no-unscrubbed-emails assertion below would be vacuously true)
    pii_doc = docs.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"),
                 F.lit(" reach me at leaky.address@example.com or "
                       "10.1.2.3 or 555-123-4567 thanks")).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")])
    docs = docs.unionByName(pii_doc.select(*docs.columns))
    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, docs, out, shards=4)

    # monotone shrinkage with full accounting
    seq = [stats["input"], stats["after_quality"], stats["after_lang"],
           stats["after_exact_dedup"], stats["after_near_dedup"],
           stats["after_decontaminate"], stats["exported"]]
    assert all(a >= b for a, b in zip(seq, seq[1:])), seq
    assert stats["exported"] == stats["after_decontaminate"]
    assert stats["exported"] > 0

    # exact dedup must collapse the corpus's known exact duplicates:
    # distinct normalized fingerprints >= survivors after stage 3
    from nvd2mysqlloader_spark.functions.text import fingerprint
    n_fp = docs.select(fingerprint("text").alias("f")).distinct().count()
    assert stats["after_exact_dedup"] <= n_fp

    # output: readable, unique ids, planted PII scrubbed to
    # placeholders (and none of it survives anywhere)
    back = spark.read.json(out)
    assert back.count() == stats["exported"]
    assert back.select("doc_id").distinct().count() == stats["exported"]
    assert back.filter(
        F.col("text").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ).count() == 0
    assert back.filter(F.col("text").contains("555-123-4567")).count() == 0
    planted = back.filter(F.col("text").contains("<EMAIL>"))
    if planted.count() == 0:
        # the planted doc may legitimately fall to the md5 holdout or
        # a dedup cluster — but if it survived, it must be scrubbed
        assert back.filter(
            F.col("text").contains("leaky.address")).count() == 0

    # decontamination dropped the holdout docs themselves
    held = back.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "10")
    assert held.count() == 0


def test_curate_corpus_near_dup_collapses_clusters(spark, tmp_path):
    """Planted near-identical docs collapse to one survivor even when
    only chained pairwise (A~B, B~C)."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the quiet green forest tonight without any fear")
    rows = [(1, base, "en"), (2, base + " extra", "en"),
            (3, base + " extra words", "en"),
            (4, "completely unrelated text about databases and shuffle "
                "partitions inside a distributed query engine cluster",
             "en")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = str(tmp_path / "mini")
    stats = curate_corpus(spark, docs, out, min_tokens=3,
                          holdout_prefix="00",   # no holdout: tiny corpus
                          shards=1)
    assert stats["after_near_dedup"] == 2        # {1,2,3} -> 1, plus 4
    back = spark.read.json(out)
    assert sorted(r.doc_id for r in back.collect()) == [1, 4]


def test_curate_corpus_rejection_log_partitions_input(spark, tmp_path):
    """The per-document provenance log: every input doc_id is either
    exported or logged with exactly one (stage, detail) — a partition
    of the input, the "where did my document go?" invariant. Near-dup
    losers carry their keeper's id; holdout and contaminated docs are
    distinguished."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = str(tmp_path / "curated")
    log_dir = str(tmp_path / "rejections")
    # langs + span_min_df ON so the 'lang' and 'all_boilerplate'
    # logging paths (stage 4b both rewrites text AND drops emptied
    # docs — the likeliest to break the exactly-once invariant) are
    # actually exercised, not skipped
    stats = curate_corpus(spark, docs, out, shards=2,
                          langs=["en", "fr", "es", "de"],
                          span_min_df=3,
                          rejection_log_dir=log_dir)

    log = spark.read.parquet(log_dir)
    exported = spark.read.json(out).select("doc_id")
    n_in = docs.count()

    # partition: exported ⊎ logged == input, no overlap, no repeats
    assert log.count() == stats["rejected_logged"]
    assert log.count() + exported.count() == n_in
    assert log.select("doc_id").distinct().count() == log.count()
    assert log.join(exported, "doc_id", "inner").count() == 0
    assert (log.select("doc_id").union(exported)
            .distinct().count() == n_in)

    # stage tallies reconcile with the pipeline's own counters
    by_stage = {r["stage"]: r["n"] for r in
                log.groupBy("stage").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    assert by_stage.get("quality", 0) == \
        stats["input"] - stats["after_quality"]
    assert by_stage.get("lang", 0) == \
        stats["after_quality"] - stats["after_lang"]
    assert by_stage.get("lang", 0) > 0           # zh docs dropped here
    assert by_stage.get("exact_dup", 0) == \
        stats["after_lang"] - stats["after_exact_dedup"]
    assert by_stage.get("near_dup", 0) == \
        stats["after_exact_dedup"] - stats["after_near_dedup"]
    assert by_stage.get("all_boilerplate", 0) == \
        stats["after_near_dedup"] - stats["after_span_dedup"]
    assert (by_stage.get("holdout", 0) + by_stage.get("contaminated", 0)
            == stats["after_span_dedup"] - stats["after_decontaminate"])

    # near-dup losers name their keeper, and the keeper survived to
    # the near-dup stage's output (it may drop later for other reasons)
    near_rows = log.filter(F.col("stage") == "near_dup").collect()
    for r in near_rows:
        assert r["detail"].startswith("kept=")
    if near_rows:
        keepers = {int(r["detail"][5:]) for r in near_rows}
        logged_near = {r["doc_id"] for r in near_rows}
        assert not (keepers & logged_near)   # a keeper never also lost


def test_tokenize_and_pack_matches_python_twin(spark):
    """tokenize_and_pack: every doc lands in exactly one pack of its
    group, assembly order is doc_id-ascending, and pack assignment
    matches a pure-Python overflow-packing twin on the same encoded
    lengths. Deterministic under repartitioning."""
    from nvd2mysqlloader_spark.corpus import tokenize_and_pack

    rows = [("en", i, "word" + " tok" * (i % 7)) for i in range(1, 30)]
    docs = spark.createDataFrame(rows, ["lang", "doc_id", "text"])
    out = tokenize_and_pack(spark, docs, seq_len=16, num_merges=8)
    got = {(r["lang"], r["pack_id"]):
           (list(r["doc_ids"]), r["n_tokens"], list(r["input_tokens"]))
           for r in out.collect()}

    # python twin over the SAME encoded lengths
    from nvd2mysqlloader_spark.functions.text import tokens as _toks
    from nvd2mysqlloader_spark.operators.bpe import (bpe_encode_udf,
                                                     bpe_train_on)
    merges = bpe_train_on(docs, _toks("text"), num_merges=8)
    enc = bpe_encode_udf(merges)
    doc_lens = {r["doc_id"]: r["n"] for r in
                docs.select("doc_id",
                            F.size(enc(_toks("text"))).alias("n"))
                .collect()}
    c, want = 0, {}
    for doc_id in sorted(doc_lens):
        pack = c // 16
        want.setdefault(("en", pack), []).append(doc_id)
        c += doc_lens[doc_id]
    assert {k: v[0] for k, v in got.items()} == want
    for (lang, pack), (ids, n_tok, toks_flat) in got.items():
        assert ids == sorted(ids)
        assert n_tok == sum(doc_lens[i] for i in ids)
        assert len(toks_flat) == n_tok

    rep = tokenize_and_pack(spark, docs.repartition(7), seq_len=16,
                            num_merges=8)
    got2 = {(r["lang"], r["pack_id"]): list(r["doc_ids"])
            for r in rep.collect()}
    assert got2 == {k: v[0] for k, v in got.items()}


def test_curate_corpus_span_removal_stage(spark, tmp_path):
    """Opt-in stage 4b: a boilerplate sentence planted across many
    docs is scrubbed from the exported text, an all-boilerplate doc is
    dropped and accounted, and with the flag off the text is
    untouched."""
    from nvd2mysqlloader_spark.functions.text import tokens

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    boiler = "subscribe to our newsletter for updates and exclusive offers"
    # 9 tokens > span_seg_tokens=4 below: the prefix fills two whole
    # 4-token segments (shared across tainted docs) plus a partial
    # third that continues into each doc's own text
    assert len(boiler.split()) == 9
    tainted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(boiler + " "), F.col("text")))
        .otherwise(F.col("text")))
    # one all-boilerplate doc: its text must consist of the SAME
    # fixed-offset segments the tainted prefix produces (segmentation
    # is positional — an offset-shifted repeat would create unique
    # segments and survive), so take the first 8 tokens = exactly the
    # two 4-token segments every tainted doc leads with
    pure = tainted.limit(1).select(
        F.lit(2_000_000).cast("long").alias("doc_id"),
        F.lit(" ".join(boiler.split()[:8])).alias("text"),
        *[c for c in tainted.columns if c not in ("doc_id", "text")])
    tainted = tainted.unionByName(pure.select(*tainted.columns))

    # holdout disabled (prefix "00") so decontamination cannot also
    # remove the boilerplate (shared 5-grams with holdout docs would
    # mask what the span stage did) — span removal is the ONLY
    # boilerplate remover in this run
    out = str(tmp_path / "c")
    stats = curate_corpus(spark, tainted, out, shards=2,
                          holdout_prefix="00",
                          span_min_df=3, span_seg_tokens=4)
    assert stats["after_span_dedup"] <= stats["after_near_dedup"]
    back = spark.read.json(out)
    assert back.filter(F.col("text").contains("newsletter")).count() == 0
    assert back.filter(F.col("doc_id") == 2_000_000).count() == 0

    # flag off: stage absent, boilerplate survives
    stats2 = curate_corpus(spark, tainted, str(tmp_path / "c2"), shards=2,
                           holdout_prefix="00")
    assert "after_span_dedup" not in stats2
    back2 = spark.read.json(str(tmp_path / "c2"))
    assert back2.filter(F.col("text").contains("newsletter")).count() > 0
