"""Hybrid retrieval: reciprocal-rank fusion (RRF) of the sparse
lexical tier (textstats.sparse_scores — inverted-index BM25-family)
and the dense tier (exact cosine over the embeddings table) — the
standard two-tower search shape (Cormack et al. 2009's RRF is what
production hybrid search ships because it needs no score calibration
between incommensurable scoring scales).

The documents and embeddings testdata tables are parallel (doc_id ≡
vec_id, same row count at every sf), so vec_id IS the document's
embedding id — the usual "embedding column materialized to a side
table" layout.

Exactness: both input rankings are deterministic total orders (exact
integer lexical scores; cosine rounded once to 6 decimals, both with
id tie-breaks), and the RRF term 10⁶ DIV (K + rank) is truncating
integer division — so the fused ranking is bit-identical cross-engine
and the driver hash-checks it end to end.

Scale shape at 100 TB: each tier reduces to its top-RRF_CAND via
TakeOrderedAndProject (distributed top-K — a global window over the
corpus-scale score sets would be a single-partition sort and never
appears here); ranks are then assigned on the RRF_CAND-row candidate
lists, and the fusion is a candidate-list × candidate-list full outer
join — trivially broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mini_log_lakehouse_spark.functions.vector import cosine
from mini_log_lakehouse_spark.operators.textstats import (
    SPARSE_QUERY_DOC,
    SQL_SPARSE_SCORED,
    sparse_scores,
)
from mini_log_lakehouse_spark.sources.registry import load_table

#: RRF smoothing constant (the k=60 of the original paper — large
#: enough that rank 1 vs 2 doesn't dominate, small enough that depth
#: still matters), candidate depth per tier, and fused result depth.
RRF_K = 60
RRF_CAND = 50
RRF_TOP = 10


def rrf_fuse(ranked_lists: dict[str, DataFrame], k: int = RRF_K) -> DataFrame:
    """Fuse named candidate lists — each (doc_id, <name>_rank) with
    ranks 1..n — into (doc_id, <name>_rank..., rrf_micro) where
    rrf_micro = Σ 10⁶ DIV (k + rank) over the lists containing the doc
    (missing ⇒ the term is 0). Pure integer arithmetic."""
    fused = None
    for name, df in ranked_lists.items():
        fused = df if fused is None else fused.join(df, "doc_id", "full")
    terms = [
        f"coalesce(1000000 DIV ({k} + {name}_rank), 0)" for name in ranked_lists
    ]
    return fused.withColumn(
        "rrf_micro", F.expr(" + ".join(terms)).cast("long")
    )


def _top_ranked(df: DataFrame, order_cols, rank_name: str, n: int) -> DataFrame:
    """Distributed top-n (TakeOrderedAndProject) then rank the n
    survivors with a window — the window only ever sees n rows."""
    top = df.orderBy(*order_cols).limit(n)
    return top.select(
        "doc_id",
        F.row_number().over(W.orderBy(*order_cols)).cast("long").alias(rank_name),
    )


def doc_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: hybrid search for SPARSE_QUERY_DOC — top-RRF_CAND
    lexical candidates (exact integer BM25-family scores) rank-fused
    with top-RRF_CAND dense candidates (exact cosine, rounded once),
    reporting the top-RRF_TOP fused docs with both per-tier ranks
    (NULL when a doc surfaced in only one tier)."""
    lex = _top_ranked(
        sparse_scores(spark, sf_dir),
        [F.desc("score_milli"), F.asc("doc_id")],
        "lex_rank",
        RRF_CAND,
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == SPARSE_QUERY_DOC).select(
        F.col("embedding").alias("qvec")
    )
    dense_scored = (
        e.filter(F.col("vec_id") != SPARSE_QUERY_DOC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
        )
    )
    dense = _top_ranked(
        dense_scored, [F.desc("cos_sim"), F.asc("doc_id")], "dense_rank", RRF_CAND
    )
    return (
        rrf_fuse({"lex": lex, "dense": dense})
        .orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
        .limit(RRF_TOP)
        .select("doc_id", "lex_rank", "dense_rank", "rrf_micro")
    )


ORACLES: dict[str, str] = {
    "doc_hybrid_search": f"""
        WITH {SQL_SPARSE_SCORED},
        lexc AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id ASC)
                        AS BIGINT) AS lex_rank
            FROM (SELECT * FROM sparse_scored
                  ORDER BY score_milli DESC, doc_id ASC LIMIT {RRF_CAND})
        ), densec AS (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC)
                        AS BIGINT) AS dense_rank
            FROM (
                SELECT e.vec_id AS doc_id,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                            WHERE vec_id = {SPARSE_QUERY_DOC})), 6) AS cos_sim
                FROM embeddings e
                WHERE e.vec_id <> {SPARSE_QUERY_DOC}
                ORDER BY cos_sim DESC, doc_id ASC LIMIT {RRF_CAND}
            )
        )
        SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank,
               d.dense_rank,
               CAST(COALESCE(1000000 // ({RRF_K} + l.lex_rank), 0)
                    + COALESCE(1000000 // ({RRF_K} + d.dense_rank), 0)
                    AS BIGINT) AS rrf_micro
        FROM lexc l FULL OUTER JOIN densec d ON l.doc_id = d.doc_id
        ORDER BY rrf_micro DESC, doc_id ASC
        LIMIT {RRF_TOP}
    """,
}

QUERIES = {
    "doc_hybrid_search": doc_hybrid_search,
}
