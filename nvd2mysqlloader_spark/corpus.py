"""End-to-end corpus curation — the pipeline a training-data team
actually runs, composed from this engine's individually-verified
stages (each stage's operator is oracle- or twin-tested on its own;
this module wires them in the canonical order and accounts for every
dropped row).

    raw documents
      1. quality gate        (token-count bounds + stopword ratio)
      2. language filter     (optional allow-list on claimed lang)
      3. exact dedup         (normalized fingerprint, keep longest)
      4. near-dup dedup      (MinHash+LSH candidates → connected
                              components → keep min-id per cluster)
      4b. span removal       (opt-in ``span_min_df``: corpus-wide
                              duplicated-segment boilerplate pass;
                              fully-boilerplate docs dropped)
      5. decontamination     (drop docs sharing 5-grams with the
                              md5-prefix holdout — eval-set hygiene)
      6. PII scrub           (emails / IPv4s / phone numbers)
      7. export              (deterministic JSONL shards + manifest)

Scale notes: every stage is a narrow map or an already-audited
shuffle (hash groupBy, banded LSH self-join, label propagation,
broadcast semi-probe); text never rides through a sketch shuffle; the
only full-width materialization is the final export. Stage row counts
are collected as the pipeline's audit trail — at 100 TB these counts
are the difference between "the corpus shrank 40%" and knowing WHICH
gate ate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import (fingerprint, scrub_pii, shingle3_udf,
                             stopword_hits, tokens)
from .operators.dedup import minhash_near_dups
from .operators.graph import connected_components
from .sources.export import export_jsonl


def curate_corpus(spark: SparkSession, docs: DataFrame, out_dir: str,
                  min_tokens: int = 5, max_tokens: int = 100_000,
                  min_stopword_ratio: float = 0.0,
                  langs: list[str] | None = None,
                  near_dup_threshold: float = 0.5,
                  holdout_prefix: str = "10",
                  ngram: int = 5,
                  shards: int = 8,
                  span_min_df: int | None = None,
                  span_seg_tokens: int = 8,
                  rejection_log_dir: str | None = None) -> dict:
    """Run the full curation pipeline over ``docs`` (needs doc_id,
    text, lang); export survivors to ``out_dir``; return per-stage row
    counts plus the export manifest.

    Stage outputs that later stages (and the audit counts) re-read are
    persisted MEMORY_AND_DISK for the duration, so the expensive
    middle (LSH self-join, label propagation, gram joins) executes
    once, not once per downstream action.

    ``rejection_log_dir``: when set, a per-DOCUMENT provenance log
    (doc_id, stage, detail) is written there — which stage dropped
    each document and why (near-dup losers carry their keeper's id,
    holdout docs are distinguished from contaminated ones). The log
    partitions the input exactly: every input doc_id appears in the
    export or in the log, never both, never twice — the invariant a
    data-debugging session needs ("where did my document go?") and a
    100 TB pipeline can afford, because each stage's rejected side is
    an ids-only anti-join of already-persisted stage outputs."""
    from pyspark import StorageLevel

    persisted = []

    def _stage(df: DataFrame) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(df)
        return df

    rejections: list[DataFrame] = []

    def _log_dropped(prev: DataFrame, cur: DataFrame, stage: str) -> None:
        if rejection_log_dir is None:
            return
        rejections.append(
            prev.select("doc_id")
            .join(cur.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(stage).alias("stage"),
                    F.lit(None).cast("string").alias("detail")))

    try:
        stats: dict = {"input": docs.count()}

        # 1. quality gate — cheap column predicates first (prune early
        # so every later stage touches less data)
        t = docs.withColumn("__toks", tokens("text"))
        n_tok = F.size("__toks")
        stop_ratio = stopword_hits(F.col("__toks"), "en") / \
            F.greatest(n_tok, F.lit(1))
        quality = _stage(
            t.filter((n_tok >= min_tokens) & (n_tok <= max_tokens)
                     & (stop_ratio >= min_stopword_ratio))
            .drop("__toks"))
        # persist BEFORE the count: the tokenize+score scan is the
        # most expensive narrow stage and both the count and the next
        # stage consume it — unpersisted it would execute twice
        stats["after_quality"] = quality.count()
        _log_dropped(docs, quality, "quality")

        # 2. language allow-list (claimed lang; swap in lang_id
        # evidence argmax when labels are untrusted)
        if langs:
            pre_lang = quality
            quality = _stage(quality.filter(F.col("lang").isin(list(langs))))
            stats["after_lang"] = quality.count()
            _log_dropped(pre_lang, quality, "lang")
            # the stage-1 cache is a superset of stage 2 and nothing
            # downstream reads it again — release it now rather than
            # holding two corpus-sized caches through the LSH middle.
            # EXCEPT when the rejection log is on: the lang rejection
            # increment above reads pre_lang at log-write time, and an
            # early unpersist would re-execute the quality scan over
            # the raw input just to write the log — so the cache is
            # held until the finally block (after the log write).
            if rejection_log_dir is None:
                pre_lang.unpersist()
                persisted.remove(pre_lang)
        else:
            stats["after_lang"] = stats["after_quality"]

        # 3. exact dedup — normalized fingerprint, keep the longest
        # copy (one window serves rank; text itself never shuffles
        # wide: the hash does)
        from pyspark.sql import Window
        w = Window.partitionBy(fingerprint("text")) \
                  .orderBy(F.desc(F.length("text")), "doc_id")
        exact = _stage(quality.withColumn("__rk", F.row_number().over(w))
                       .filter(F.col("__rk") == 1).drop("__rk"))
        stats["after_exact_dedup"] = exact.count()
        _log_dropped(quality, exact, "exact_dup")

        # 4. near-dup dedup — LSH candidates only (never all-pairs),
        # then transitive closure so A~B~C collapses to one keeper.
        # The DROP side (docs inside a dup cluster that lost) is the
        # small set — anti-join against it; the keeper set is
        # corpus-sized and must never be broadcast/collected.
        shingled = exact.select("doc_id", shingle3_udf()("text").alias("s"))
        pairs = minhash_near_dups(shingled, threshold=near_dup_threshold) \
            .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        comp = connected_components(exact.select(F.col("doc_id")
                                                 .alias("id")),
                                    pairs, id_col="id")
        losers = comp.filter(F.col("id") != F.col("component")) \
                     .select(F.col("id").alias("doc_id"))
        near = _stage(exact.join(losers, "doc_id", "left_anti"))
        stats["after_near_dedup"] = near.count()
        if rejection_log_dir is not None:
            # richer than the generic anti-join: a near-dup loser's
            # most useful provenance is WHICH document it collapsed to
            rejections.append(
                comp.filter(F.col("id") != F.col("component"))
                .select(F.col("id").alias("doc_id"),
                        F.lit("near_dup").alias("stage"),
                        F.concat(F.lit("kept="),
                                 F.col("component").cast("string"))
                        .alias("detail")))

        # 4b. (opt-in) corpus-wide duplicated-span removal — the
        # CCNet-style boilerplate pass AFTER document-level dedup (a
        # span shared only among copies of one document is not
        # boilerplate) and BEFORE decontamination (the probe should
        # see the text that will actually be trained on). Docs whose
        # every segment was boilerplate are dropped here, counted
        # separately from the rewrite.
        if span_min_df is not None:
            # the survivors aggregate (no doc-spine join-back): the
            # inner join below drops emptied docs by construction, so
            # the full operator's accounting columns would cost one
            # redundant corpus-wide join just to be discarded
            from .operators.dedup import duplicated_span_survivors
            pre_span = near
            cleaned = duplicated_span_survivors(
                near, seg_tokens=span_seg_tokens, min_df=span_min_df)
            near = _stage(
                near.drop("text")
                .join(cleaned.select("doc_id",
                                     F.col("clean_text").alias("text")),
                      "doc_id"))
            stats["after_span_dedup"] = near.count()
            _log_dropped(pre_span, near, "all_boilerplate")

        # 5. decontamination — md5-prefix holdout is the eval set;
        # drop training docs sharing any word n-gram with it. Semi-
        # probe against holdout grams: its size scales with the
        # holdout, so the join strategy is left to AQE (broadcast when
        # it fits, shuffle join when it doesn't) rather than forced.
        # the SAME tokenizer as every other stage (\s+, empty tokens
        # dropped): split(text, ' ') would keep '' tokens for double
        # spaces and glue words across newlines, so a contaminated
        # doc reformatted with line breaks would slip past the probe
        ws = near.withColumn("__ws", tokens("text"))
        grams = ws.filter(F.size("__ws") >= ngram).select(
            "doc_id",
            F.explode(F.expr(
                f"transform(sequence(0, size(__ws) - {ngram}),"
                f" i -> md5(array_join(slice(__ws, i + 1, {ngram}), ' ')))"
            )).alias("g"),
            (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
             < holdout_prefix).alias("is_holdout"))
        hold_grams = grams.filter("is_holdout").select("g").distinct()
        dirty = (grams.filter(~F.col("is_holdout"))
                 .join(hold_grams, "g", "left_semi")
                 .select("doc_id").distinct())
        if rejection_log_dir is not None:
            # dirty is consumed twice when logging (clean's anti-join
            # AND the log write) — persist the tiny id set so the
            # corpus-wide gram join doesn't execute a second time
            dirty = _stage(dirty)
        is_holdout_doc = (F.substring(F.md5(F.col("doc_id").cast("string")),
                                      1, 2) < holdout_prefix)
        clean = _stage(near.filter(~is_holdout_doc)
                       .join(dirty, "doc_id", "left_anti"))
        stats["after_decontaminate"] = clean.count()
        if rejection_log_dir is not None:
            # holdout (the eval set — withheld, not "bad") and
            # contaminated (shares a gram with the holdout) are
            # distinct fates and logged as such; together they are
            # exactly near \ clean
            rejections.append(
                near.filter(is_holdout_doc)
                .select("doc_id", F.lit("holdout").alias("stage"),
                        F.lit(None).cast("string").alias("detail")))
            rejections.append(
                dirty.select("doc_id",
                             F.lit("contaminated").alias("stage"),
                             F.lit(None).cast("string").alias("detail")))
            log = rejections[0]
            for r in rejections[1:]:
                log = log.unionByName(r)
            log.write.mode("overwrite").parquet(rejection_log_dir)
            stats["rejected_logged"] = \
                spark.read.parquet(rejection_log_dir).count()

        # 6 + 7. scrub and export in one pass
        final = clean.withColumn("text", scrub_pii("text"))
        stats["manifest"] = export_jsonl(final, out_dir, key="doc_id",
                                         shards=shards)
        stats["exported"] = stats["manifest"]["total"]
        return stats
    finally:
        for df in persisted:
            df.unpersist()


def tokenize_and_pack(spark: SparkSession, docs: DataFrame,
                      seq_len: int = 512, num_merges: int = 64,
                      group_col: str = "lang") -> DataFrame:
    """The assembly stage after curation: learned-BPE tokenize every
    document, then pack documents into fixed-capacity training
    sequences — (group, pack_id, doc_ids, input_tokens, n_tokens).

    Composition of the engine's own primitives, end to end:

    * tokenize: ``operators.bpe`` — distributed word count, bounded
      driver merge induction, Arrow greedy encode (the corpus never
      shuffles for tokenization; the encode is a narrow map);
    * pack: the ``sequence_packing`` shape — documents stream per
      ``group_col`` in doc_id order and a doc's pack is the
      ``seq_len``-token window its running-sum START offset falls in
      (fill-then-overflow as one exact-BIGINT running-sum window +
      integer division, no greedy loop, no driver involvement);
    * assemble: per (group, pack) the doc token arrays concatenate in
      doc_id order — ``flatten(sort_array(collect_list(struct)))``
      keeps the assembly order-deterministic under any partitioning.

    A pack can exceed ``seq_len`` by at most one document's tail
    (standard overflow packing — the trainer truncates or splits);
    every doc lands in exactly one pack of its group. At 100 TB the
    two shuffles are the window partition and the pack rollup, both
    keyed on (group, pack) — token arrays shuffle ONCE, into their
    pack."""
    from .operators.bpe import bpe_encode_udf, bpe_train_on

    merges = bpe_train_on(docs, tokens("text"), num_merges=num_merges)
    enc = bpe_encode_udf(merges)
    toks = docs.select(group_col, "doc_id",
                       enc(tokens("text")).alias("subs"))
    toks = toks.withColumn("n", F.size("subs").cast("long"))

    from pyspark.sql import Window
    w = (Window.partitionBy(group_col).orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = toks.withColumn("c", F.sum("n").over(w))
    # exact BIGINT `div`, not float `/`: past 2^53 cumulative tokens
    # per group double rounding would misassign documents to packs
    # (same expression shape as the oracle-checked sequence_packing)
    packed = cum.withColumn(
        "pack_id", F.expr(f"(c - n) div {int(seq_len)}"))
    return (packed.groupBy(group_col, "pack_id")
            .agg(F.sort_array(F.collect_list(
                     F.struct("doc_id", "subs"))).alias("_docs"))
            .select(group_col, "pack_id",
                    F.col("_docs.doc_id").alias("doc_ids"),
                    F.flatten(F.col("_docs.subs")).alias("input_tokens"))
            .withColumn("n_tokens",
                        F.size("input_tokens").cast("long")))
