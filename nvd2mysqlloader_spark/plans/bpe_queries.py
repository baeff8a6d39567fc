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
    oracle=None,
    doc=(
        "learned-BPE tokenization: distributed word count -> driver "
        "merge induction over the bounded frequency table (64 merges, "
        "the PQ-codebook scale pattern) -> Arrow-batched greedy encode "
        "of the corpus -> per-source subword stats. Deterministic "
        "(frequency/lexicographic tie-breaks), verified against a "
        "naive reference trainer in tests/test_bpe.py."
    ),
)
def bpe_learned_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train_on(docs, tokens("text"), num_merges=64)
    enc = bpe_encode_udf(merges)
    sub = enc(tokens("text"))
    return (docs.select("source", sub.alias("subs"))
            .select("source", F.size("subs").cast("long").alias("n_subs"),
                    F.size(F.array_distinct("subs")).cast("long")
                    .alias("n_distinct"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_subs").alias("total_subwords"),
                 F.sum("n_distinct").alias("sum_doc_distinct"),
                 F.max("n_subs").alias("max_doc_subwords")))
