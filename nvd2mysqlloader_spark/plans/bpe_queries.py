"""Learned-BPE tokenizer query — train merges on the corpus, encode
the corpus with them, roll up subword statistics.

Rows-only verification (the merge loop is iterative and not SQL-
expressible — same class as kmeans); tests/test_bpe.py pins the
training against a naive full-rescan reference implementation and the
encode against hand-worked examples, and determinism across runs and
partitionings.

Registered after graph_queries so existing registry positions are
stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.bpe import bpe_encode_udf, bpe_train_on
from ..sources.tpch import load_table
from .registry import query


@query(
    "bpe_learned_tokens",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(list_filter(
                    regexp_split_to_array(coalesce(text, ''), '\\s+'),
                    x -> x <> ''))) AS BIGINT) AS total_words,
           CAST(sum(length(regexp_replace(coalesce(text, ''),
                                          '\\s+', '', 'g')))
                AS BIGINT) AS total_word_chars,
           TRUE AS subs_ge_words,
           TRUE AS subs_le_chars,
           TRUE AS concat_preserved
    FROM documents GROUP BY source
    """,
    doc=(
        "learned-BPE tokenization: distributed word count -> driver "
        "merge induction over the bounded frequency table (64 merges, "
        "the PQ-codebook scale pattern) -> Arrow-batched greedy encode "
        "of the corpus. The merge list itself is engine-specific, so "
        "the oracle-checkable surface is (a) exact word/char anchors "
        "and (b) three tokenizer INVARIANTS as booleans the oracle "
        "pins TRUE: every word yields >=1 subword and >=1 char per "
        "subword (words <= subwords <= word-chars), and concatenating "
        "a doc's subwords reproduces its whitespace-stripped text "
        "exactly (lossless segmentation). Trainer additionally pinned "
        "to a naive reference implementation in tests/test_bpe.py."
    ),
)
def bpe_learned_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_on(docs, tokens("text"), num_merges=64)
    enc = bpe_encode_udf(merges)
    toks = tokens("text")   # \s+ split, empty tokens dropped
    per_doc = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_words"),
        F.length(F.concat_ws("", toks)).cast("long").alias("n_word_chars"),
        F.concat_ws("", toks).alias("joined_words"),
        enc(toks).alias("subs"))
    per_doc = per_doc.select(
        "source", "n_words", "n_word_chars",
        F.size("subs").cast("long").alias("n_subs"),
        (F.concat_ws("", "subs") == F.col("joined_words"))
        .alias("doc_concat_ok"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_words"),
                 F.sum("n_word_chars").alias("total_word_chars"),
                 (F.sum("n_subs") >= F.sum("n_words"))
                 .alias("subs_ge_words"),
                 (F.sum("n_subs") <= F.sum("n_word_chars"))
                 .alias("subs_le_chars"),
                 F.min("doc_concat_ok").alias("concat_preserved")))


@query(
    "bpe_pack_sequences",
    oracle=None,
    doc=(
        "training-sequence assembly: learned-BPE encode + overflow "
        "packing (corpus.tokenize_and_pack) -> per-lang pack stats. "
        "Rows-only (the merge list is engine-specific, like kmeans); "
        "the packing arithmetic alone is oracle-checked by "
        "sequence_packing, and tests/test_corpus.py pins the full "
        "composition against a pure-Python packing twin."
    ),
)
def bpe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..corpus import tokenize_and_pack
    docs = load_table(spark, sf_dir, "documents")
    packed = tokenize_and_pack(spark, docs, seq_len=512, num_merges=64)
    return (packed.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.sum(F.size("doc_ids")).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.max("n_tokens").alias("max_pack_tokens")))
