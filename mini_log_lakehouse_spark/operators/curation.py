"""End-to-end corpus curation: the composed keep/drop decision a
training-data pipeline runs before tokenization, built entirely from the
individual operators in this package —

1. **normalize** (textstats.normalize_text): whitespace/case-canonical
   form, so formatting-only variants collapse;
2. **exact dedup** on the normalized fingerprint: one representative
   (min doc_id) per distinct content — the shuffle carries a 16-byte
   md5 per doc, the standard 100 TB dedup shape;
3. **PII gate** (textstats.pii_any): any detector hit drops the doc
   (a redaction-instead-of-drop pipeline would swap in redact_pii);
4. **quality gate** (functions/text.quality_score ≥ QUALITY_MIN);
5. **split assignment** (sampling.assign_split) for the survivors.

Drop reasons are prioritized (duplicate → pii → low_quality) so each
document lands in exactly one outcome bucket and the summary partitions
the corpus. Every step is rational/hash arithmetic — the DuckDB oracle
reproduces the whole pipeline exactly, threshold compares included
(IEEE quotients of identical integer operands are identical doubles in
both engines).

Scale shape: one map pass computes fingerprint+signals, one shuffle by
fingerprint for the dedup window, then a tiny aggregate. No joins, no
collects; the window's partition key is the content hash, so skew equals
duplicate-cluster size (bounded by the dedup itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.functions.text import quality_score, text_or_empty
from mini_log_lakehouse_spark.operators.sampling import (
    SQL_SPLIT_CASE,
    assign_split,
)
from mini_log_lakehouse_spark.operators.textstats import (
    PII_ANY_PATTERN,
    SQL_QUALITY,
    _SQL_NORM,
    normalize_text,
    pii_any,
)
from mini_log_lakehouse_spark.sources.registry import load_table

#: Minimum quality_score (unique-token ratio + saturating length, both
#: rational — see functions/text.py) a document must reach to survive.
QUALITY_MIN = 0.45


def curate_documents(docs: DataFrame) -> DataFrame:
    """Per-document curation verdict: input columns plus ``split`` and
    ``outcome`` ∈ {kept, duplicate, pii, low_quality}. Library-surface
    form — callers filter ``outcome = 'kept'`` for the surviving corpus."""
    # NULL contract: missing text is the empty document — symmetric
    # with the oracle's _SQL_NORM/SQL_QUALITY (both COALESCE), so every
    # null-text doc lands in the md5('')-fingerprint duplicate class
    # instead of a Spark-only NULL class
    t = text_or_empty()
    fp = F.md5(normalize_text(t))
    rep = F.min("doc_id").over(Window.partitionBy("_fp"))
    outcome = (
        F.when(F.col("doc_id") != rep, F.lit("duplicate"))
        # presence test, not counts: one short-circuiting alternation
        # scan (textstats.pii_any) instead of four full extract_all
        # passes — the gate only asks "any PII?"
        .when(F.col("_pii"), F.lit("pii"))
        .when(F.col("_q") < QUALITY_MIN, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return (
        assign_split(docs)
        .withColumn("_fp", fp)
        .withColumn("_pii", pii_any(t))
        .withColumn("_q", quality_score(t))
        .withColumn("outcome", outcome)
        .drop("_fp", "_pii", "_q")
    )


def doc_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: corpus partition by (split, outcome) with doc
    counts — the acceptance report of the curation pipeline."""
    d = load_table(spark, sf_dir, "documents")
    return (
        curate_documents(d)
        .groupBy("split", "outcome")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "outcome")
    )


def source_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: a χ²-style statistic per source
    comparing its language mix against the whole corpus — the "did this
    crawl source change character" alarm of a continuously-ingesting
    pipeline.

    Exactness: the statistic is DEFINED as the sum of per-(source,
    lang) micro-quantized terms — term = ⌊(o·N − n_s·c_l)²·10⁶ /
    (N·n_s·c_l)⌋, i.e. (observed − expected)²/expected with expected =
    n_s·c_l/N, cross-multiplied so every operation is decimal(38,0)
    integer arithmetic (quantize-then-sum is the deterministic
    composition; sum-then-quantize would need unbounded rationals).
    Languages a source has zero docs in still contribute (o = 0 →
    term = n_s·c_l·10⁶/N DIV …), so sparse sources read high — as a
    drift alarm should.

    Shape at 100 TB: one corpus scan to (source, lang) counts
    (partial-agg'd), then everything is stratum-grain; the corpus
    totals broadcast. Domain: the squared cross-product stays inside
    decimal(38,0) for corpora to ~10⁷ docs; a larger corpus first
    right-shifts the counts by a common power of two (the statistic is
    scale-free), which the monitor would do before quantizing."""
    d = load_table(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    langs = sl.groupBy("lang").agg(F.sum("o").alias("c_l"))
    sources = sl.groupBy("source").agg(F.sum("o").alias("n_s"))
    total = sl.agg(F.sum("o").cast("decimal(38,0)").alias("n_total"))
    # dense (source × lang) grid: zero-observed cells still contribute
    grid = (
        sources.crossJoin(F.broadcast(langs))
        .join(sl, ["source", "lang"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .crossJoin(F.broadcast(total))
    )
    term = F.expr(
        "CAST(((CAST(o AS DECIMAL(38,0)) * n_total - CAST(n_s AS DECIMAL(38,0)) * c_l)"
        " * (CAST(o AS DECIMAL(38,0)) * n_total - CAST(n_s AS DECIMAL(38,0)) * c_l)"
        " * 1000000)"
        " DIV (n_total * CAST(n_s AS DECIMAL(38,0)) * c_l) AS LONG)"
    )
    return (
        grid.select("source", F.col("n_s").cast("long").alias("n_docs"), term.alias("_t"))
        .groupBy("source", "n_docs")
        .agg(F.sum("_t").cast("long").alias("chi2_micro"))
        .orderBy("source")
    )


ORACLES: dict[str, str] = {
    "source_lang_drift": """
        WITH sl AS (
            SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2
        ), langs AS (SELECT lang, SUM(o) AS c_l FROM sl GROUP BY 1),
        sources AS (SELECT source, SUM(o) AS n_s FROM sl GROUP BY 1),
        total AS (SELECT CAST(SUM(o) AS HUGEINT) AS n_total FROM sl),
        grid AS (
            SELECT s.source, l.lang, s.n_s, l.c_l, COALESCE(x.o, 0) AS o
            FROM sources s CROSS JOIN langs l
            LEFT JOIN sl x ON x.source = s.source AND x.lang = l.lang
        )
        SELECT g.source,
               CAST(g.n_s AS BIGINT) AS n_docs,
               CAST(SUM(
                   ((CAST(g.o AS HUGEINT) * t.n_total - CAST(g.n_s AS HUGEINT) * g.c_l)
                    * (CAST(g.o AS HUGEINT) * t.n_total - CAST(g.n_s AS HUGEINT) * g.c_l)
                    * 1000000)
                   // (t.n_total * CAST(g.n_s AS HUGEINT) * g.c_l)
               ) AS BIGINT) AS chi2_micro
        FROM grid g CROSS JOIN total t
        GROUP BY 1, 2
        ORDER BY 1
    """,
    # Every fragment is shared with the oracle of the operator it came
    # from (split CASE, PII alternation pattern, normalization, rounded
    # quality score), so a change to any individual operator's semantics
    # cannot silently diverge from the composed pipeline's oracle.
    "doc_curation_summary": f"""
        WITH verdicts AS (
            SELECT {SQL_SPLIT_CASE} AS split,
                   CASE
                     WHEN doc_id != MIN(doc_id) OVER (PARTITION BY md5({_SQL_NORM}))
                       THEN 'duplicate'
                     WHEN regexp_matches(text, '{PII_ANY_PATTERN}') THEN 'pii'
                     WHEN {SQL_QUALITY} < {QUALITY_MIN} THEN 'low_quality'
                     ELSE 'kept'
                   END AS outcome
            FROM documents
        )
        SELECT split, outcome, COUNT(*) AS n_docs
        FROM verdicts
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}

QUERIES = {
    "doc_curation_summary": doc_curation_summary,
    "source_lang_drift": source_lang_drift,
}
