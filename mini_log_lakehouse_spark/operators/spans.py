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

from mini_log_lakehouse_spark.functions.text import (
    text_or_empty,
    token_shingles,
    ws_tokens,
)
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
        F.explode(token_shingles(text_or_empty(), N_GRAM)).alias("gram"),
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
        F.explode(token_shingles(text_or_empty(), N_GRAM)).alias("gram"),
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
        F.explode(token_shingles(text_or_empty(), N_GRAM)).alias("gram"),
    )
    frequent = (
        grams.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= MIN_DOC_FREQ)
        .select("gram")
    )
    # one broadcast marker join + ONE aggregate: the previous
    # semi-join/totals/boiler/left-join shape paid two shuffles AND
    # silently dropped a NULL source's boilerplate count (the re-join on
    # source is an equi-join, and NULL never equals NULL — found by the
    # null-text adversarial corpus)
    marked = grams.join(
        F.broadcast(frequent.withColumn("_b", F.lit(1))), "gram", "left"
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.coalesce(F.sum("_b"), F.lit(0))
            .cast("long")
            .alias("boilerplate_grams"),
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


#: Exact-substring span matching (the suffix-array dedup grain of Lee
#: et al. 2022, "Deduplicating Training Data Makes Language Models
#: Better", re-expressed relationally): window width in tokens.
SPAN_K = 8

#: Stop-shingle cap: a window whose hash occurs in more than this many
#: distinct documents is corpus boilerplate (the frequent-gram queries'
#: business) and is dropped BEFORE the pair join — the standard
#: suffix-array-dedup guard that bounds candidate pairs per shingle at
#: SPAN_MAX_DF² instead of corpus².
SPAN_MAX_DF = 50


def substring_spans(
    docs: DataFrame, k: int = SPAN_K, max_df: int = SPAN_MAX_DF
) -> DataFrame:
    """Cross-document EXACT substring spans: for every document pair
    sharing at least one identical ``k``-token window, the number of
    matched windows and the longest shared span in tokens — the
    operator suffix-array pipelines (Lee et al. 2022) run over
    pretraining corpora, here as pure relational steps so it shards:

    1. positioned shingles: each document emits (pos, md5(window)) for
       every SPAN_K-token window — one map-side explode, ~n rows/doc;
    2. eligibility: only hashes seen in 2..SPAN_MAX_DF distinct docs
       survive (uniques can't match; ultra-frequent windows are
       boilerplate and would blow the pair join quadratically);
    3. pair join BY HASH — the only shuffle grain that ever sees two
       documents together, bounded per hash by the DF cap;
    4. span reassembly: matched positions on the same alignment
       diagonal (pa − pb) with consecutive pa form one contiguous
       shared substring — the classic gaps-and-islands window
       (island = pa − row_number), giving max-run per pair without
       ever materializing text.

    Shape at 100 TB: shingle hashing is map-only (hash travels, text
    never does — 16 B/window); the eligibility aggregate and pair join
    both shuffle on the hash; islands shuffle on (pair, diagonal).
    Nothing is ever quadratic in the corpus — only in occurrences of a
    single window, capped at SPAN_MAX_DF by construction. A production
    run would swap the md5-of-concat for a rolling Rabin–Karp hash to
    shave the K× hashing constant; the relational skeleton is
    identical."""
    toks = ws_tokens(F.col("text"))
    _t = F.col("_toks")
    hashes = F.transform(
        F.sequence(F.lit(1), F.array_size(_t) - F.lit(k - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(_t, i, F.lit(k)))),
    )
    g = (
        docs.filter(F.array_size(toks) >= k)
        .select("doc_id", toks.alias("_toks"))
        .select("doc_id", F.posexplode(hashes).alias("pos0", "h"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )
    eligible = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= max_df))
        .select("h")
    )
    ge = g.join(eligible, "h", "left_semi")
    a, b = ge.alias("a"), ge.alias("b")
    m = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    diag = (F.col("pa") - F.col("pb")).alias("gdiag")
    w = Window.partitionBy("doc_a", "doc_b", "gdiag").orderBy("pa")
    runs = (
        m.select("doc_a", "doc_b", diag, "pa")
        .withColumn("island", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "gdiag", "island")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    best = runs.groupBy("doc_a", "doc_b").agg(F.max("run").alias("max_run"))
    counts = m.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_matches"))
    return (
        counts.join(best, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.col("n_matches").cast("long").alias("n_matches"),
            (F.col("max_run") + F.lit(k - 1)).cast("long").alias("longest_span_tokens"),
        )
        .orderBy("doc_a", "doc_b")
    )


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: exact substring spans over the documents table at
    the default window/DF-cap. Hash-checked — positions, hashes, and
    the gaps-and-islands reassembly are all integer/string exact."""
    return substring_spans(load_table(spark, sf_dir, "documents"))


_SQL_GRAMS = f"""
        SELECT doc_id, source,
               array_to_string(list_slice(t, i, i + {N_GRAM - 1}), ' ') AS gram
        FROM (SELECT doc_id, source, string_split(COALESCE(text, ''), ' ') AS t FROM documents),
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
    # Restates the span matcher step for step: full windows only
    # (1-based starts 1..len-K+1, docs shorter than K emit nothing),
    # md5 over the space-rejoined window, the DF-capped eligibility
    # filter, the hash pair join, and the diagonal gaps-and-islands
    # run reassembly. g and m are MATERIALIZED: each is referenced
    # more than once and DuckDB otherwise re-inlines the whole prefix
    # per reference (the SSSP-oracle lesson).
    "dedup_substring_spans": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), g AS MATERIALIZED (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')) AS h
            FROM t, unnest(range(1, len(t) - {SPAN_K - 1} + 1)) AS r(i)
            WHERE len(t) >= {SPAN_K}
        ), eligible AS (
            SELECT h FROM (
                SELECT h, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY h
            ) WHERE nd BETWEEN 2 AND {SPAN_MAX_DF}
        ), m AS MATERIALIZED (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
            FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
            WHERE a.h IN (SELECT h FROM eligible)
        ), runs AS (
            SELECT doc_a, doc_b, pa - pb AS gdiag, pa,
                   pa - ROW_NUMBER() OVER (
                       PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa
                   ) AS island
            FROM m
        ), islands AS (
            SELECT doc_a, doc_b, COUNT(*) AS run
            FROM runs GROUP BY doc_a, doc_b, gdiag, island
        ), best AS (
            SELECT doc_a, doc_b, MAX(run) AS max_run FROM islands GROUP BY 1, 2
        ), counts AS (
            SELECT doc_a, doc_b, COUNT(*) AS n_matches FROM m GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               CAST(c.n_matches AS BIGINT) AS n_matches,
               CAST(b.max_run + {SPAN_K - 1} AS BIGINT) AS longest_span_tokens
        FROM counts c JOIN best b USING (doc_a, doc_b)
        ORDER BY doc_a, doc_b
    """,
}

QUERIES = {
    "doc_frequent_ngrams": doc_frequent_ngrams,
    "doc_ngram_novelty": doc_ngram_novelty,
    "doc_boilerplate_share": doc_boilerplate_share,
    "dedup_substring_spans": dedup_substring_spans,
}
