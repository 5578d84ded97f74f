"""Repeated-span curation: corpus-frequent n-gram (boilerplate) mining
and duplicated-segment removal.

Pretrain pipelines screen for text that repeats ACROSS documents at a
finer grain than whole-document dedup catches — navigation bars, cookie
banners, license headers, templated sentences (C4 dropped repeated
3-sentence spans; CCNet dedups paragraph hashes; Gopher gates on
duplicated-line ratios; the reference has no analog — this is part of
the LLM-data extension surface, same family as operators/dedup.py).

Two driver-checkable corpus queries (the driver's documents table is
single-line word streams, so the *n-gram* grain is where cross-document
repetition actually lives there) plus a generic segment-dedup library
operator for corpora that do have line/paragraph structure (goldens in
tests/test_spans.py exercise it on multi-line fixtures).

Scale shapes:
- frequent-gram mining: explode → per-doc distinct → count per gram.
  Shuffle rows are (gram, doc_id) ≈ 40 B; partial aggregation collapses
  per-doc repeats map-side; the final top-K is TakeOrdered.
- boilerplate share: the frequent-gram SET (grams in ≥K docs) is small
  by construction — boilerplate is by definition a tiny fraction of
  distinct grams — so it broadcasts, and the per-occurrence flagging
  join is map-only. Never join the full gram-frequency table back to
  the corpus.
- segment removal: one shuffle by segment hash (the window key), then
  one by doc_id to reassemble. Segment text travels because the
  reassembled document needs it; at 100 TB you would hash-partition by
  doc prefix and keep both shuffles, which stay linear.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.functions.text import token_shingles
from mini_log_lakehouse_spark.sources.registry import load_table

#: Span width for boilerplate mining. Real pipelines use sentence-to-
#: paragraph spans (C4: 3 sentences); the driver corpus's 90-word
#: vocabulary makes 3 tokens the span where cross-document repetition
#: concentrates (5-grams top out at document frequency 3 there), so the
#: operator stays non-degenerate on its own test data.
N_GRAM = 3

#: A gram present in at least this many distinct documents counts as
#: boilerplate for the share query.
MIN_DOC_FREQ = 5

TOP_N = 20


def doc_frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top boilerplate candidates: n-grams ranked by the number of
    distinct documents containing them (document frequency, not raw
    occurrences — a single doc repeating itself is dedup's business,
    not boilerplate's)."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(token_shingles(F.col("text"), N_GRAM)).alias("gram"),
    ).distinct()
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "gram")
        .limit(TOP_N)
    )


def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty scoring in corpus order: per document, how many of its
    distinct n-grams appear here FIRST (no lower doc_id contains them)
    — the "is this document new information or a remix" curation
    signal; a streaming ingest computes the same thing against the
    accumulated gram index (cf. dedup.incremental_dedup at gram grain).

    Shape: first-occurrence attribution is one min-aggregate over the
    distinct (gram, doc_id) pairs — gram-grain, the same shuffle the
    boilerplate queries already pay; counts stay integers (consumers
    divide, same discipline as doc_boilerplate_share)."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(token_shingles(F.col("text"), N_GRAM)).alias("gram"),
    ).distinct()
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("distinct_grams"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("long")
            ).alias("novel_grams"),
        )
        .orderBy("doc_id")
    )


def doc_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate exposure: of all n-gram positions in a
    source's documents, how many are corpus-frequent grams. Counts stay
    integers (no cross-engine float ratio); consumers divide.

    The frequent set is computed once, filtered to ≥MIN_DOC_FREQ docs,
    and broadcast — the flagging join is map-only."""
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        "source",
        F.explode(token_shingles(F.col("text"), N_GRAM)).alias("gram"),
    )
    frequent = (
        grams.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= MIN_DOC_FREQ)
        .select("gram")
    )
    flagged = grams.join(F.broadcast(frequent), "gram", "left_semi")
    totals = grams.groupBy("source").agg(F.count(F.lit(1)).alias("total_grams"))
    boiler = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("boilerplate_grams")
    )
    return (
        totals.join(boiler, "source", "left")
        .select(
            "source",
            "total_grams",
            F.coalesce("boilerplate_grams", F.lit(0)).alias("boilerplate_grams"),
        )
        .orderBy("source")
    )


def remove_duplicated_segments(
    docs: DataFrame,
    min_count: int = 2,
    delim: str = "\n",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus segment dedup (CCNet paragraph-hash / line-dedup
    shape): drop every occurrence of any ``delim``-separated segment
    whose total occurrence count across the corpus reaches
    ``min_count`` — boilerplate like headers and nav bars disappears
    from ALL documents, not just later ones.

    Returns the input rows with ``text`` rewritten to the surviving
    segments (original order, ``delim``-rejoined; empty string when
    nothing survives) plus ``n_segments`` and ``n_removed``. Corpora
    without the delimiter pass through unchanged (every doc is one
    unique segment — unless the whole doc repeats, which is exact
    dedup's grain)."""
    other_cols = [c for c in docs.columns if c != text_col]
    # F.split takes a Java REGEX; the advertised contract is a literal
    # delimiter, so escape it (an unescaped '.' or '|' would shatter
    # every document into 1-char segments)
    lit_delim = re.escape(delim)
    segs = docs.select(
        *other_cols,
        F.posexplode(F.split(F.col(text_col), lit_delim)).alias("_pos", "_seg"),
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy(F.md5(F.col("_seg"))))
    kept = segs.withColumn("_occ", occ)
    rebuilt = (
        kept.groupBy(*other_cols)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum((F.col("_occ") >= min_count).cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_occ") < min_count,
                                F.struct("_pos", "_seg"),
                            )
                        )
                    ),
                    lambda s: s["_seg"],
                ),
                delim,
            ).alias(text_col),
        )
    )
    return rebuilt.select(*other_cols, text_col, "n_segments", "n_removed")


_SQL_GRAMS = f"""
        SELECT doc_id, source,
               array_to_string(list_slice(t, i, i + {N_GRAM - 1}), ' ') AS gram
        FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
             unnest(range(1, greatest(len(t) - {N_GRAM - 1}, 1) + 1)) AS r(i)
"""

ORACLES: dict[str, str] = {
    # Both oracles restate token_shingles exactly: 1-based slice of the
    # whitespace split, length clamped at the array end, and at least
    # one (possibly partial) shingle per document.
    "doc_frequent_ngrams": f"""
        WITH grams AS ({_SQL_GRAMS})
        SELECT gram, COUNT(DISTINCT doc_id) AS n_docs
        FROM grams
        GROUP BY gram
        ORDER BY n_docs DESC, gram
        LIMIT {TOP_N}
    """,
    "doc_ngram_novelty": f"""
        WITH grams AS (
            SELECT DISTINCT doc_id, gram FROM ({_SQL_GRAMS})
        ), first_seen AS (
            SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
        )
        SELECT g.doc_id,
               COUNT(*) AS distinct_grams,
               CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
                    AS BIGINT) AS novel_grams
        FROM grams g JOIN first_seen f USING (gram)
        GROUP BY 1
        ORDER BY 1
    """,
    "doc_boilerplate_share": f"""
        WITH grams AS ({_SQL_GRAMS}),
        frequent AS (
            SELECT gram
            FROM (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
            WHERE nd >= {MIN_DOC_FREQ}
        )
        SELECT source,
               COUNT(*) AS total_grams,
               CAST(SUM(CASE WHEN gram IN (SELECT gram FROM frequent) THEN 1 ELSE 0 END)
                    AS BIGINT) AS boilerplate_grams
        FROM grams
        GROUP BY source
        ORDER BY source
    """,
}

QUERIES = {
    "doc_frequent_ngrams": doc_frequent_ngrams,
    "doc_ngram_novelty": doc_ngram_novelty,
    "doc_boilerplate_share": doc_boilerplate_share,
}
