"""Reusable text column expressions — all built-in functions, JVM-side.

These are the building blocks for the text-analysis and dedup operators
(north-star LLM-data-pipeline surface, BASELINE.json). Everything here
stays inside WholeStageCodegen: no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer regex: runs of word chars, runs of digits, or single
#: non-space symbols. Valid in both Java regex (Spark) and RE2 (DuckDB
#: oracle) — keep it metacharacter-simple.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def text_or_empty(col="text") -> Column:
    """The repo-wide NULL contract for document text: a missing text is
    the EMPTY document — the ONE Spark-side body of the convention the
    oracles state as COALESCE(text, ''), pinned by the null-text corpus
    in tests/test_adversarial_corpora.py. Every operator reading
    documents.text goes through this (or textstats._docs, which applies
    it at the loader) so the next operator cannot silently reintroduce
    the NULL-divergence class it closed."""
    col = F.col(col) if isinstance(col, str) else col
    return F.coalesce(col, F.lit(""))


def ws_tokens(col) -> Column:
    """Whitespace tokenization (reference-style split, stg_logs.sql:11 idiom)."""
    return F.split(col, " ")


def bpe_ish_tokens(col) -> Column:
    """Regex tokenization approximating BPE pre-tokenization."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0))


def token_count(col) -> Column:
    """len(split(text, ' ')) without materializing the array: the count
    equals #spaces + 1 (split keeps empty tokens, so consecutive spaces
    count too — same as the oracle's len(string_split)). Pure length
    arithmetic stays in whole-stage codegen with zero per-row allocation;
    the split/array_size form allocated a token array per document and
    its GC cost dominated the corpus-stats scan at the 100x bench leg."""
    return F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit(""))) + 1


def distinct_token_count(col) -> Column:
    return F.array_size(F.array_distinct(ws_tokens(col)))


def avg_token_len(col) -> Column:
    """Mean token length = chars-without-spaces / token count (double)."""
    chars = F.length(F.replace(col, F.lit(" "), F.lit("")))
    return chars / token_count(col)


def quality_score(col) -> Column:
    """Deterministic [0,1] quality heuristic: half unique-token ratio, half
    saturating length score. Rational arithmetic only — no exp/log, so the
    DuckDB oracle computes bit-identical doubles."""
    toks = token_count(col).cast("double")
    uniq_ratio = distinct_token_count(col) / toks
    len_score = F.least(F.lit(1.0), toks / F.lit(100.0))
    return F.round(uniq_ratio * 0.5 + len_score * 0.5, 6)


def char_shingles(col, n: int = 5) -> Column:
    """Character n-gram shingles (array<string>) via sliding substrings.

    Expressed with transform over an index sequence — stays in codegen.
    Used by MinHash / SimHash / Jaccard dedup.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: col.substr(i, F.lit(n)))


def token_shingles(col, n: int = 3) -> Column:
    """Token n-gram shingles from whitespace tokens (array<string>)."""
    toks = ws_tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.array_size(toks) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))))
