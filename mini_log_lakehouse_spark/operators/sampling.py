"""Training-data curation operators: deterministic train/test split,
stratified (per-language) downsampling, fixed-budget sequence packing,
and benchmark-contamination detection.

These are the corpus-assembly steps of an LLM data pipeline that sit
between cleaning/dedup (operators/dedup.py, textstats.py) and training:

- **Split** and **sample** must be *deterministic functions of the row
  key*, never ``rand()``: reruns, backfills, and per-partition retries
  must land every document in the same split on every executor. Both use
  an md5-derived uniform hash (salted per use so split and sample draws
  are independent), which Spark and DuckDB compute identically — so the
  oracle checks the exact same rows, not just counts.
- **Packing** is the concat-and-chunk shape used to fill fixed context
  windows: documents are concatenated in a deterministic order and cut
  every PACK_BUDGET tokens; a document's pack is ``floor(exclusive
  running token offset / budget)``. The running sum is windowed *per
  source shard*, so at 100 TB each shard packs independently in parallel
  — no global ordering, no single-partition window.
- **Contamination** flags training documents sharing ≥ K distinct word
  n-grams with a held-out benchmark set (the standard decontamination
  step before training). Candidate generation joins on the n-gram itself
  — the bucketed, never-all-pairs shape — after dropping n-grams too
  common to be evidence (a stop-gram document-frequency cap, which also
  removes the skewed hot keys from the join).

Reference parity: the reference pipeline has no curation layer (it ends
at dbt marts; dbt/models/marts/fct_requests_hourly.sql is the terminal
transform) — this module is part of the beyond-reference LLM-pipeline
surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.functions.text import (
    quality_score,
    text_or_empty,
    token_count,
    ws_tokens,
)
from mini_log_lakehouse_spark.operators.textstats import SQL_QUALITY
from mini_log_lakehouse_spark.sources.registry import load_table

#: train/val/test percentage boundaries over the 0..99 hash bucket.
SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 95  # 90-94 val, 95-99 test

#: Per-language keep-rate (percent) for the stratified sample: halve the
#: dominant language, keep the rest — the "rebalance the corpus" shape.
STRATA_KEEP_PCT = {"en": 50}
STRATA_DEFAULT_PCT = 100

#: Tokens per packed context window.
PACK_BUDGET = 64

#: Contamination: shared distinct word n-grams of this size (3 suits the
#: short synthetic docs; real pipelines use 8-13-gram spans) ...
CONTAM_NGRAM = 3
#: ... at least this many distinct shared n-grams to flag a pair ...
CONTAM_MIN_SHARED = 2
#: ... ignoring n-grams appearing in more than this many documents
#: (stop-grams: too common to be evidence, and the skewed join keys).
CONTAM_MAX_DF = 20


def _hash_bucket(col, salt: str, mod: int = 100):
    """Deterministic uniform bucket in [0, mod): first 12 hex digits of
    md5(salt || key) as an integer, mod ``mod``. Identical in DuckDB as
    ('0x' || substr(md5(concat(salt, key)), 1, 12))::BIGINT % mod, so
    oracles verify row membership exactly. 48 bits ≫ any mod used here
    (percent buckets and 2^30 shuffle keys alike)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % mod


def _sql_bucket(expr: str, salt: str, mod: int = 100) -> str:
    return f"(('0x' || substr(md5('{salt}' || CAST({expr} AS VARCHAR)), 1, 12))::BIGINT % {mod})"


def assign_split(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Add a deterministic ``split`` column (train/val/test) keyed on a
    hashed row key — the library-surface form."""
    bucket = _hash_bucket(F.col(key), "split:")
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


def pack_documents(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per-source concat-and-chunk packing (library-surface form): one
    row per (source, pack_id) with document counts and fill stats.
    See doc_pack_sequences for the plan-shape discussion."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = token_count(text_or_empty())
    sized = docs.select("doc_id", "source", toks.alias("n_tokens"))
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")  # exclusive prefix sum
    packed = sized.select(
        "source",
        "n_tokens",
        F.floor(offset / budget).cast("long").alias("pack_id"),
        (
            F.floor(offset / budget)
            != F.floor((F.sum("n_tokens").over(w) - 1) / budget)
        ).cast("int").alias("straddles"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.sum("straddles").cast("long").alias("n_straddling"),
    )


def doc_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by hashed doc_id;
    returns per (split, lang) counts + token totals. Map-only bucket
    assignment, then a tiny aggregate — at 100 TB the split column is
    computed inline in the scan stage."""
    d = load_table(spark, sf_dir, "documents")
    return (
        assign_split(d)
        .select(
            "split",
            "lang",
            token_count(text_or_empty()).alias("_t"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").cast("long").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample (en halved, rest kept):
    keep rows whose salted hash bucket falls under the language's
    keep-rate. Returns the sampled rows themselves (doc_id, lang,
    source) so the oracle verifies exact membership. Pure filter —
    no shuffle at all until the display sort."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"), "strat:")
    rate = F.lit(STRATA_DEFAULT_PCT)
    for lang, pct in sorted(STRATA_KEEP_PCT.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (
        d.filter(bucket < rate)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each source shard,
    documents are concatenated in doc_id order and cut every
    PACK_BUDGET tokens; pack = floor(exclusive running token offset /
    budget). Emits per-pack document counts and fill statistics.

    The window partitions by ``source``: each shard packs independently
    (the real 100 TB layout — packing is per input shard, there is no
    global order), so the sort is a per-partition sort, not a global
    one, and shards parallelize across executors."""
    d = load_table(spark, sf_dir, "documents")
    return pack_documents(d).orderBy("source", "pack_id")


#: Fixed sample size per source for the reservoir-style sample.
RESERVOIR_K = 10


def doc_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample (K docs) per source: rank rows
    within each source by a salted hash of doc_id and keep the first K —
    the reproducible analog of per-stratum reservoir sampling (same
    sample on every run, backfill, and partial retry, unlike an actual
    reservoir's arrival-order dependence).

    Scale shape: one window per source shard (parallel across shards,
    K ≪ shard size so the shuffle carries only rank candidates after
    partial TopK pushdown via WindowGroupLimit in Spark 3.5+/4.x)."""
    d = load_table(spark, sf_dir, "documents")
    order = _hash_bucket(F.col("doc_id"), "res:", 1 << 30)
    w = Window.partitionBy("source").orderBy(order.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", "lang")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("source", "rk", "doc_id", "lang")
        .orderBy("source", "rk")
    )


def doc_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global training order: every epoch's document order
    is a pure function of (salt, doc_id) — rank by salted hash. Returns
    the first 50 positions (the head of the epoch-0 order).

    At 100 TB you never materialize a total order: the same hash is the
    *sort key within each output shard* (repartitionByRange on it gives
    a globally shuffled sharding); the total-order rank here exists to
    make the semantics oracle-checkable."""
    d = load_table(spark, sf_dir, "documents")
    order = _hash_bucket(F.col("doc_id"), "epoch0:", 1 << 30)
    w = Window.orderBy(order.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", order.alias("shuffle_key"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .filter(F.col("position") <= 50)
        .select("position", "doc_id", "shuffle_key")
        .orderBy("position")
    )


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int, salt: str = "epoch0:"
) -> None:
    """The pipeline's OUTPUT stage: write the corpus as ``n_shards``
    globally-shuffled training shards (Hive dirs ``_shard=0..N-1``).
    Shard assignment and intra-shard order are both PURE functions of
    (salt, doc_id): shard = hash-key DIV ceil(2³⁰/N) — fixed arithmetic
    range-splitting, deliberately NOT repartitionByRange, whose sampled
    boundaries depend on the run's reservoir sample and input layout
    and would move boundary documents between shards across reruns.
    Reading dirs 0..N-1 sequentially yields exactly the salted-hash
    global order of doc_global_shuffle, yet no global sort ever runs.

    Scale shape: one hash shuffle clustering each shard into one task
    (so each ``_shard=`` dir gets one sorted file), per-shard
    independent writes. Rerunning with the same salt reproduces
    identical shard membership and order — the property backfills and
    resumable training loops need. Shard sizes are balanced by the
    uniformity of the md5 hash, not by sampling."""
    key = _hash_bucket(F.col("doc_id"), salt, 1 << 30)
    width = -((1 << 30) // -n_shards)  # ceil; max shard id = n_shards-1
    (
        docs.withColumn("_shuffle_key", key)
        .withColumn("_shard", F.expr(f"_shuffle_key DIV {width}"))
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_shuffle_key", "doc_id")
        .drop("_shuffle_key")
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(path)
    )


def _doc_ngrams(d: DataFrame) -> DataFrame:
    """doc_id -> exploded distinct word CONTAM_NGRAM-grams. Documents
    shorter than CONTAM_NGRAM tokens yield zero grams (matching the
    oracle's range()) — the short-doc case needs an explicit empty
    branch because sequence(1, 0) produces the DESCENDING [1, 0] (Spark
    defaults to step -1 when start > stop) and slice(toks, 0, n)
    throws."""
    toks = ws_tokens(F.col("text"))
    n = F.array_size(toks)
    starts = F.when(
        n >= CONTAM_NGRAM, F.sequence(F.lit(1), n - (CONTAM_NGRAM - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i, CONTAM_NGRAM))
    )
    return d.select("doc_id", F.explode(F.array_distinct(grams)).alias("ngram"))


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check: training docs sharing ≥ CONTAM_MIN_SHARED
    distinct CONTAM_NGRAM-grams with the held-out benchmark set
    (doc_id % 97 == 0 stands in for the eval suite).

    Plan shape at 100 TB: explode distinct n-grams (map-only), drop
    stop-grams whose document frequency exceeds CONTAM_MAX_DF (kills
    both false evidence and join-key skew), then join train↔benchmark
    *on the n-gram* — candidates are generated per shared-gram bucket,
    never all-pairs — and aggregate pair overlap. The benchmark side is
    tiny (1/97 of docs) and broadcastable; Spark's AQE picks that up
    from its size estimate."""
    d = load_table(spark, sf_dir, "documents")
    grams = _doc_ngrams(d)
    is_bench = F.col("doc_id") % 97 == 0
    # stop-gram removal: document frequency over the full corpus, as a
    # COUNT window per n-gram instead of the old aggregate + self-join —
    # the r15 plan evaluated the tokenize/shingle explode TWICE (once
    # under the df aggregate, once under the kept side of the join;
    # DataFrame plans share no CTEs). The window form explodes once:
    # one exchange on ngram, the window's sort doubles as the
    # sort-merge order for the train⋈bench self-join below, and the two
    # join inputs differ only in a filter ABOVE the shared exchange, so
    # ReusedExchange serves both sides (guide §1.2/§2.4; plan evidence
    # plans/r16/benchmark_contamination_{before,after}.txt). df ≤ cap
    # keeps exactly the same grams: count over the ngram partition IS
    # the document frequency (grams are distinct per doc).
    kept = (
        grams.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("ngram"))
        )
        .filter(F.col("_df") <= CONTAM_MAX_DF)
        .drop("_df")
    )
    train = kept.filter(~is_bench).withColumnRenamed("doc_id", "train_doc")
    bench = kept.filter(is_bench).withColumnRenamed("doc_id", "bench_doc")
    return (
        train.join(bench, "ngram")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= CONTAM_MIN_SHARED)
        .orderBy("train_doc", "bench_doc")
    )


#: Temperature-mixture sampling: per-language weight ∝ count^MIXTURE_ALPHA
#: (α = 0.5 → sqrt), the multilingual rebalancing rule of mT5/XLM-R-style
#: corpora (upweight low-resource languages relative to their raw share).
MIXTURE_BUDGET = 200
#: Per-source document cap for the domain-capping operator (RefinedWeb-style
#: "no single domain dominates" rule): keep the CAP highest-quality docs.
DOMAIN_CAP = 15


def doc_lang_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted multilingual mixture sample: each language
    gets a slice of MIXTURE_BUDGET proportional to sqrt(its doc count)
    (α = 0.5 temperature sampling — low-resource languages are
    upweighted relative to raw share), then that many documents are
    drawn deterministically per language by salted-hash rank. Returns
    the sampled rows themselves so the oracle verifies exact membership.

    Exactness across engines: the only floating step is
    floor(sqrt(n)·10⁶) — sqrt is IEEE correctly-rounded in both Spark
    and DuckDB, the multiply is one IEEE op, and floor snaps to an
    integer, so ``w_micro`` is bit-identical; everything downstream
    (total, per-language target = BUDGET·w DIV total) is integer
    arithmetic.

    Shape at 100 TB: language weights are language-grain (dozens of
    rows — broadcast), so the only corpus-scale work is one window per
    language partition ranking docs by salted hash. The per-language
    target is data-dependent, so no WindowGroupLimit pushes here; the
    production shortcut when an *exact* budget isn't required is a
    hash-threshold filter (keep if hash < rate·2⁴⁸ — map-only, no
    window), which this operator intentionally trades for an exact
    fixed budget."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    weights = counts.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1e6))
        .cast("long")
        .alias("w_micro"),
    )
    total = weights.agg(F.sum("w_micro").alias("total_micro"))
    targets = (
        weights.crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.expr(
                f"CAST(({MIXTURE_BUDGET} * w_micro) DIV total_micro AS LONG)"
            ).alias("target_docs"),
        )
    )
    order = _hash_bucket(F.col("doc_id"), "mix:", 1 << 30)
    w = Window.partitionBy("lang").orderBy(order.asc(), F.col("doc_id").asc())
    ranked = (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rk") <= F.col("target_docs"))
        .select("lang", "target_docs", "rk", "doc_id")
        .orderBy("lang", "rk")
    )


def doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: keep at most DOMAIN_CAP documents per source,
    preferring the highest quality_score (doc_id tiebreak) — the
    "no single domain dominates the corpus" curation rule. Returns the
    kept rows with their per-source quality rank.

    quality_score is the shared rational-arithmetic heuristic
    (functions/text.quality_score ↔ textstats.SQL_QUALITY), already
    hash-verified bit-identical cross-engine by doc_quality_scores, so
    ranking on it is deterministic. The literal rank ≤ CAP predicate
    pushes a WindowGroupLimit (each task keeps CAP rows per source
    before the exchange), so at 100 TB the shuffle carries ~CAP rows
    per domain, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    q = quality_score(text_or_empty())
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        d.select("doc_id", "source", q.alias("quality"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("source", "rk", "doc_id", "quality")
        .orderBy("source", "rk")
    )


_TOKS = "string_split(COALESCE(text, ''), ' ')"  # NULL text = empty doc
_NTOK = f"len({_TOKS})"
_SPLIT_BUCKET = _sql_bucket("doc_id", "split:")
#: The one SQL statement of assign_split — shared with the curation
#: oracle so split-boundary logic cannot drift between the two.
SQL_SPLIT_CASE = (
    f"CASE WHEN {_SPLIT_BUCKET} < {SPLIT_TRAIN_PCT} THEN 'train' "
    f"WHEN {_SPLIT_BUCKET} < {SPLIT_VAL_PCT} THEN 'val' "
    f"ELSE 'test' END"
)
_STRAT_BUCKET = _sql_bucket("doc_id", "strat:")
_STRAT_RATE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in sorted(STRATA_KEEP_PCT.items())
) + f" ELSE {STRATA_DEFAULT_PCT} END"

ORACLES: dict[str, str] = {
    "doc_lang_mixture": f"""
        WITH weights AS (
            SELECT lang,
                   CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
                       AS w_micro
            FROM documents GROUP BY 1
        ), targets AS (
            SELECT lang,
                   CAST(({MIXTURE_BUDGET} * w_micro)
                        // (SELECT SUM(w_micro) FROM weights) AS BIGINT)
                       AS target_docs
            FROM weights
        ), ranked AS (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY {_sql_bucket("doc_id", "mix:", 1 << 30)} ASC,
                                doc_id ASC
                   ) AS rk
            FROM documents
        )
        SELECT r.lang, t.target_docs, CAST(r.rk AS BIGINT) AS rk, r.doc_id
        FROM ranked r JOIN targets t USING (lang)
        WHERE r.rk <= t.target_docs
        ORDER BY r.lang, r.rk
    """,
    "doc_domain_cap": f"""
        SELECT source, rk, doc_id, quality FROM (
            SELECT source, doc_id, {SQL_QUALITY} AS quality,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {SQL_QUALITY} DESC, doc_id ASC
                   ) AS rk
            FROM documents
        )
        WHERE rk <= {DOMAIN_CAP}
        ORDER BY source, rk
    """,
    "doc_train_test_split": f"""
        SELECT {SQL_SPLIT_CASE} AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM({_NTOK}) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "doc_stratified_sample": f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_STRAT_BUCKET} < {_STRAT_RATE}
        ORDER BY doc_id
    """,
    "doc_pack_sequences": f"""
        WITH sized AS (
            SELECT doc_id, source, {_NTOK} AS n_tokens FROM documents
        ), packed AS (
            SELECT source, n_tokens,
                   (SUM(n_tokens) OVER w - n_tokens) // {PACK_BUDGET} AS pack_id,
                   CASE WHEN (SUM(n_tokens) OVER w - n_tokens) // {PACK_BUDGET}
                             <> (SUM(n_tokens) OVER w - 1) // {PACK_BUDGET}
                        THEN 1 ELSE 0 END AS straddles
            FROM sized
            WINDOW w AS (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT source,
               CAST(pack_id AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               CAST(SUM(straddles) AS BIGINT) AS n_straddling
        FROM packed
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "doc_reservoir_per_source": f"""
        SELECT source, rk, doc_id, lang FROM (
            SELECT source, doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {_sql_bucket("doc_id", "res:", 1 << 30)} ASC, doc_id ASC
                   ) AS rk
            FROM documents
        )
        WHERE rk <= {RESERVOIR_K}
        ORDER BY source, rk
    """,
    "doc_global_shuffle": f"""
        SELECT position, doc_id, shuffle_key FROM (
            SELECT doc_id,
                   {_sql_bucket("doc_id", "epoch0:", 1 << 30)} AS shuffle_key,
                   ROW_NUMBER() OVER (
                       ORDER BY {_sql_bucket("doc_id", "epoch0:", 1 << 30)} ASC, doc_id ASC
                   ) AS position
            FROM documents
        )
        WHERE position <= 50
        ORDER BY position
    """,
    "benchmark_contamination": f"""
        WITH grams AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest({_NTOK} - {CONTAM_NGRAM - 1}, 0) + 1),
                       i -> array_to_string(list_slice({_TOKS}, i, i + {CONTAM_NGRAM - 1}), ' ')
                   ))) AS ngram
            FROM documents
        ), kept AS (
            SELECT doc_id, ngram FROM grams
            QUALIFY COUNT(*) OVER (PARTITION BY ngram) <= {CONTAM_MAX_DF}
        )
        SELECT t.doc_id AS train_doc,
               b.doc_id AS bench_doc,
               COUNT(*) AS shared_ngrams
        FROM kept t
        JOIN kept b USING (ngram)
        WHERE t.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
        GROUP BY 1, 2
        HAVING COUNT(*) >= {CONTAM_MIN_SHARED}
        ORDER BY 1, 2
    """,
}

QUERIES = {
    "doc_lang_mixture": doc_lang_mixture,
    "doc_domain_cap": doc_domain_cap,
    "doc_train_test_split": doc_train_test_split,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_reservoir_per_source": doc_reservoir_per_source,
    "doc_global_shuffle": doc_global_shuffle,
    "benchmark_contamination": benchmark_contamination,
}
