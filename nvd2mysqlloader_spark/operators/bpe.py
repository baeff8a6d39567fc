"""Learned byte-pair-encoding tokenizer — train + encode, Spark-first.

The reference has no tokenizer surface at all (its string ops are
replace/split/concat, nvd2mysqlloader.py:150-205); this is a
training-data-pipeline extension: every LLM corpus pipeline needs to
tokenize with a LEARNED subword vocabulary, not just a regex splitter
(plans/text_queries.bpe_token_stats is the regex baseline).

Scale shape (the same one PQ codebook training uses):

* The corpus-sized work — word counting and the final encode — is
  distributed: one explode + one groupBy(word) for frequencies (the
  shuffle carries (word, count) pairs, never documents), and an
  Arrow-batched ``pandas_udf`` for the encode scan.
* Merge induction runs on the DRIVER over the word-FREQUENCY table,
  which Heaps' law keeps orders of magnitude smaller than the corpus
  (~10^6-10^7 distinct words at 100 TB) and which ``top_words`` hard-
  bounds regardless of corpus size — identical in spirit to training
  k-means/PQ codebooks on a bounded sample: the driver cost is a
  function of the CAP, not the data. This mirrors how production BPE
  trainers work (they stream word counts, then induce merges on the
  count table).

Determinism: ties in pair frequency break on the lexicographically
smaller pair; word selection ties break on the word string. Training
twice on the same corpus yields byte-identical merge lists, so the
encode — greedy, lowest-rank-merge-first (the standard BPE inference
rule) — is reproducible across runs, partitionings, and executors.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# end-of-word sentinel: distinguishes "low" in "lowest" from the word
# "low" — merges never cross word boundaries
_EOW = "</w>"


def word_frequencies(docs: DataFrame, tokens_col: Column,
                     top_words: int = 100_000) -> DataFrame:
    """(word, freq) for the ``top_words`` most frequent words — the
    bounded training table. One explode + one groupBy; the top-N is a
    TakeOrdered heap (never a full sort). Deterministic: frequency
    desc, then word asc."""
    return (docs.select(F.explode(tokens_col).alias("word"))
            # split("\tabc", \s+) yields a leading "" token (trim
            # strips spaces only); the empty word is not a word
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.desc("freq"), F.asc("word"))
            .limit(top_words))


def bpe_train(word_freqs: list[tuple[str, int]],
              num_merges: int) -> list[tuple[str, str]]:
    """Exact BPE merge induction over a (word, freq) list — pure
    Python, incremental pair-count maintenance (only words containing
    the merged pair are re-scanned per round, the Sennrich-style index)
    so cost is ~O(num_merges · touched_words), not a full rescan.

    Returns the ordered merge list [(left, right), ...]; merge rank =
    list position (lower = applied first at encode time)."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in sorted(word_freqs, key=lambda x: (-x[1], x[0])):
        words.append(list(w) + [_EOW])
        freqs.append(int(f))

    import heapq

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    # lazy-invalidation max-heap over (-count, pair): argmax is
    # amortized O(log) per touched pair instead of a full pass over
    # the pair table each round — this is what keeps the per-round
    # cost proportional to TOUCHED words, as the docstring claims.
    # heapq's smallest = highest count, ties by lexicographically
    # smallest pair — exactly the deterministic merge rule.
    heap: list[tuple[int, tuple[str, str]]] = []

    def add_word_pairs(i: int, sign: int) -> None:
        sym = words[i]
        for a, b in zip(sym, sym[1:]):
            p = (a, b)
            c = pair_counts.get(p, 0) + sign * freqs[i]
            pair_counts[p] = c
            if c > 0:
                heapq.heappush(heap, (-c, p))
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(words)):
        add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best_pair = None
        while heap:
            neg_c, p = heap[0]
            if pair_counts.get(p, 0) == -neg_c:   # live entry
                best_pair = p
                break
            heapq.heappop(heap)                   # stale: superseded
        if best_pair is None:
            break
        merges.append(best_pair)
        a, b = best_pair
        merged = a + b
        for i in list(pair_words.get(best_pair, ())):
            sym = words[i]
            if best_pair not in set(zip(sym, sym[1:])):
                continue
            add_word_pairs(i, -1)
            out: list[str] = []
            j = 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = out
            add_word_pairs(i, +1)
        pair_counts.pop(best_pair, None)
        pair_words.pop(best_pair, None)
    return merges


def bpe_train_on(docs: DataFrame, tokens_col: Column,
                 num_merges: int = 64,
                 top_words: int = 100_000) -> list[tuple[str, str]]:
    """Distributed word count → driver-side merge induction. The
    driver sees at most ``top_words`` (word, freq) rows — bounded
    irrespective of corpus size."""
    rows = word_frequencies(docs, tokens_col, top_words).collect()
    return bpe_train([(r["word"], r["freq"]) for r in rows], num_merges)


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched encoder: token array → subword array, applying
    the learned merges greedily (lowest rank first — standard BPE
    inference). The merge table is captured in the closure (tiny:
    ``num_merges`` string pairs), so executors need no broadcast."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        if not word:
            return []        # empty split artifact: no subwords
        hit = cache.get(word)
        if hit is not None:
            return hit
        sym = list(word) + [_EOW]
        while len(sym) > 1:
            best_rank, best_at = None, -1
            for j, p in enumerate(zip(sym, sym[1:])):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_at = r, j
            if best_rank is None:
                break
            sym[best_at:best_at + 2] = [sym[best_at] + sym[best_at + 1]]
        # strip the sentinel off the final subword for readability
        if sym and sym[-1] == _EOW:
            sym = sym[:-1] if len(sym) > 1 else [""]
        elif sym and sym[-1].endswith(_EOW):
            sym = sym[:-1] + [sym[-1][:-len(_EOW)]]
        cache[word] = sym
        return sym

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(token_arrays: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for toks in token_arrays:
            subs: list[str] = []
            for w in (toks if toks is not None else []):
                subs.extend(encode_word(w, cache))
            out.append(subs)
        return pd.Series(out)

    return encode
