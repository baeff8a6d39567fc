"""Text column expressions — all JVM-side (whole-stage codegen), no UDFs.

These are the building blocks of the text-analysis / dedup surface the
north star adds on top of the reference (BASELINE.json): tokenization,
shingling, normalization, language-evidence scoring, fingerprinting.
Every helper returns a Column so Catalyst can fold it into one
projection; nothing here forces a Python round-trip.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tiny per-language stopword evidence lists for the heuristic language
# scorer (n-gram/stopword language-ID is a standard public technique)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "con", "una", "por"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}


def normalize_ws(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim —
    canonical form for fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank/NULL text → empty array
    (the reference's null-tolerance discipline, SURVEY §2 #19).

    Split on ``\\s+`` then DROP empty tokens: ``trim`` strips only
    ASCII spaces, so tab/newline-edged text would otherwise yield
    phantom ``''`` tokens (a blank-only doc counted 2 tokens).
    ``array_remove`` rather than a ``filter`` lambda: identical
    semantics (removes every ``''`` element) but it stays inside
    whole-stage codegen — this feeds every corpus-wide text pass, and
    interpreted HOF lambdas measured ~2.5× slower on this repo's hot
    paths. Oracle twin: ``list_filter(regexp_split_to_array(
    coalesce(text, ''), '\\s+'), x -> x <> '')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.coalesce(c, F.lit("")), r"\s+"), "")


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array (1-indexed element_at so
    the expression reads identically to the DuckDB oracle).

    Guarded for short docs: ``sequence(1, 0)`` is the DESCENDING array
    [1, 0], not empty, so fewer than ``n`` tokens must short-circuit to
    [] or element_at would index out of bounds (an error under ANSI)."""
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok_col, i + k) for k in range(n)]))
    ).otherwise(F.array().cast("array<string>"))


def shingle3_udf():
    """Arrow-batched 3-gram word shingler (distinct, order-preserving).

    Semantically identical to ``array_distinct(word_shingles(tokens(c),
    3))`` — the split is ``re.split(r"\\s+", ..., flags=re.ASCII)``,
    NOT ``str.split()``: Python's default split breaks on Unicode
    whitespace (NBSP, U+2028, …) while Java/RE2 ``\\s`` is ASCII-only,
    and the tokenization must agree byte-for-byte with the JVM twin
    and the DuckDB oracle. Exists because the measured cost of the
    interpreted higher-order-function form is ~2.5× this vectorized
    UDF at sf0.1 (HOF lambdas are not codegen'd); shingling is the one
    hot path where the Pandas escape hatch wins.
    """
    ws = re.compile(r"\s+", re.ASCII)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def shingle3(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in ws.split(t or "") if w]
            out.append(list(dict.fromkeys(
                " ".join(toks[i:i + 3]) for i in range(max(len(toks) - 2, 0)))))
        return pd.Series(out)

    return shingle3


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"\p{Punct}", ""))


def stopword_hits(tok_col: Column, lang: str) -> Column:
    """How many tokens are stopwords of ``lang`` (language evidence)."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok_col, lambda x: F.array_contains(words, F.lower(x))))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over the lowercased,
    whitespace-normalized text (content-defined identity for exact and
    normalized dedup)."""
    return F.md5(F.lower(normalize_ws(col)))


# --- winnowing fingerprints (rolling hash) -------------------------------
# Schleimer/Wilkerson/Aiken "Winnowing: Local Algorithms for Document
# Fingerprinting" (SIGMOD 2003): polynomial rolling hash over K-char
# grams, keep the minimum hash of each W-hash window. All-integer mod
# arithmetic, so any engine computing the same formula agrees exactly.
WINNOW_K = 8            # chars per gram
WINNOW_W = 4            # hashes per winnowing window
WINNOW_B = 257          # polynomial base
WINNOW_M = 1_000_000_007
WINNOW_POW = [pow(WINNOW_B, j, WINNOW_M) for j in range(WINNOW_K)]


def winnow_fingerprints_udf():
    """Arrow-batched winnowing fingerprinter: normalized string →
    array<long> of distinct selected gram hashes.

    gram hash at position i (0-based, chars c):
        (sum_j (ord(c[i+j]) * B^(K-1-j) mod M) ) mod M
    then the min of each W-long sliding window, de-duplicated.

    Vectorized: one sliding_window_view matmul-free pass per doc —
    the interpreted-HOF twin (nested aggregate over sequence()) is an
    order of magnitude slower for the same integers, same reasoning as
    shingle3_udf. The SQL oracle spells out the identical formula.
    """
    import numpy as np

    powrev = np.array(WINNOW_POW[::-1], dtype=np.int64)   # B^(K-1) .. B^0

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view
        out = []
        for s in texts:
            codes = np.frombuffer((s or "").encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.int64)
            if len(codes) < WINNOW_K:
                out.append([])
                continue
            grams = sliding_window_view(codes, WINNOW_K)
            hashes = ((grams * powrev) % WINNOW_M).sum(axis=1) % WINNOW_M
            if len(hashes) < WINNOW_W:
                out.append([])
                continue
            mins = sliding_window_view(hashes, WINNOW_W).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return winnow


# ---------------------------------------------------------------------------
# PII scrubbing — training-corpus redaction. Patterns are restricted to
# the Java-regex ∩ RE2 common subset (no lookarounds, no backrefs) so
# the exact same pattern strings run under Spark (Java) and any
# RE2-based engine (DuckDB oracle, Go/Rust tooling) with identical
# semantics — which is what makes the scrub hash-verifiable.

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def scrub_pii(col: Column | str) -> Column:
    """Redact emails, IPv4 addresses, and NNN-NNN-NNNN phone numbers.

    Pure JVM-side regexp_replace chain (no UDF); applied in PATTERN
    ORDER, which matters: emails are scrubbed before IPs so a
    dotted-quad local-part can't be half-eaten. At 100 TB this is a
    narrow map over the text column — no shuffle, fully pipelined with
    whatever scan feeds it.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """Per-category match counts (audit metric for the scrub).

    Category k is counted on the text AFTER categories 1..k-1 were
    replaced — the same sequential order :func:`scrub_pii` applies —
    so each count equals what the scrub actually redacts for that
    category. Counting every pattern on the raw text would over-report
    (a dotted-quad inside an email local-part counts as an IPv4 there,
    but the scrub replaces the whole email first)."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, rep in PII_PATTERNS:
        out.append(F.regexp_count(c, F.lit(pat)).alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, rep)
    return out
