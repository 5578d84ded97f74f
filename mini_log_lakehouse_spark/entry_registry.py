"""Central registry assembling (queries, oracles) pairs from operator
modules for the driver contract (__spark_entry__.py).

Every Spark query lives next to its DuckDB oracle SQL in the defining
module; this module only merges and sanity-checks the dicts.
"""

from __future__ import annotations

from mini_log_lakehouse_spark.operators import (
    curation,
    dedup,
    events,
    extensions,
    funnels,
    layout,
    multimodal,
    relational,
    retrieval,
    sampling,
    sessions,
    similarity,
    skew,
    spans,
    temporal,
    textstats,
    vocab,
)
from mini_log_lakehouse_spark.sources import jsonl as sources_jsonl
from mini_log_lakehouse_spark.streaming import ingest as streaming_ingest
from mini_log_lakehouse_spark.streaming import joins as streaming_joins
from mini_log_lakehouse_spark.streaming import sessions as streaming_sessions
from mini_log_lakehouse_spark.streaming import state_v2 as streaming_state_v2

# Module merge order (names within a module keep that module's order);
# the driver-facing ordering is then overridden by _FIRST_WINDOW below.
_MODULES = (
    sampling,
    sessions,
    multimodal,
    extensions,
    temporal,
    vocab,
    streaming_ingest,
    streaming_sessions,
    streaming_state_v2,
    streaming_joins,
    funnels,
    similarity,
    skew,
    sources_jsonl,
    relational,
    events,
    textstats,
    retrieval,
    curation,
    dedup,
    layout,
    spans,
)

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    ORACLES.update(getattr(_m, "ORACLES", {}))

# Oracles must reference declared queries (the reverse is allowed: a query
# without an oracle gets the driver's weaker rows-only check).
_unknown = set(ORACLES) - set(QUERIES)
if _unknown:
    raise ValueError(f"oracles without queries: {sorted(_unknown)}")

# The verification driver samples the FIRST 50 registry entries per round,
# so this explicit window decides which queries get a driver-side
# CORRECTNESS row. Round-6 priority (VERDICT r5 ask 7): (1) entries NEW
# or with a changed implementation/oracle this round — the two new
# operators (PageRank, SemDeDup), the newly-oracled BPE merge table, the
# bucket-capped co-occurrence graph, the refactor-touched kmeans oracle,
# and the guard-gaining p95 entry; (2) EVERY entry whose latest green
# driver row predates r3 (29 entries — after this round no green
# evidence is older than two rounds); (3) rows-only-by-design entries
# kept visible (their `err: no_oracle` rows should appear, not silently
# vanish); (4) cross-family anchors (bench-measured every round);
# (5) the remaining operators NEW this round. The r3-green pool
# (tpch_q1, top3, multimodal, asof, ...) yields its backfill slots to
# them: everything past position 50 stays covered by the identical
# local DuckDB hash-compare in tests/test_entry_contract.py.
_FIRST_WINDOW = (
    # (1) new or changed this round
    "user_pagerank",
    "user_communities",
    "dedup_semantic_pairs",
    "doc_bpe_merge_table",
    "user_cooccurrence_triangles",
    "session_attribution",
    "event_burst_runs",
    "tpch_integrity_audit",
    # (2) latest green row is r1/r2 — refresh all 29
    "available_days",
    "dedup_cluster_representatives",
    "dedup_clusters",
    "dedup_exact_summary",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dim_event_type",
    "doc_bpe_token_counts",
    "doc_chunks",
    "doc_curation_summary",
    "doc_fingerprints",
    "doc_lang_id",
    "doc_normalized_fingerprints",
    "doc_pii_signals",
    "doc_quality_scores",
    "doc_repetition_stats",
    "doc_word_histogram",
    "errors_by_type",
    "fct_events_hourly",
    "hourly_trend",
    "kpi_totals",
    "orders_rollup_status_priority",
    "props_k_histogram",
    "stg_events",
    "top_event_types",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "value_stats_by_type",
    # (3) rows-only by design — keep the no_oracle rows visible
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_rp_topk",
    "approx_distinct_users",
    "doc_bpe_encode",
    # (4) cross-family anchor (bench-measured every round; kmeans,
    # p95 and knn rotate out this round — all have r5 driver-green rows
    # and semantically unchanged oracles)
    "dedup_minhash_pairs",
    # (5) the rest of the round's new operators. TEN new entries did
    # NOT fit the 50-slot window and carry only the local
    # tests/test_entry_contract.py hash evidence this round:
    # events_dow_seasonality, user_clustering_coefficient,
    # user_bfs_reach, events_state_enrichment, event_interarrival_stats,
    # user_pagerank_weighted, events_rolling_wau, user_kcore,
    # cooc_degree_histogram, doc_length_histogram — rotate them in next
    # round (ten total).
    "embedding_pq_codes",
    "doc_hybrid_search",
    "events_cusum_changepoints",
    "user_decayed_activity",
    "event_trigram_paths",
    "streaming_daily_active_users",
)

_missing = [n for n in _FIRST_WINDOW if n not in QUERIES]
if _missing:
    raise ValueError(f"_FIRST_WINDOW names unknown queries: {_missing}")
if len(set(_FIRST_WINDOW)) != len(_FIRST_WINDOW):
    raise ValueError("_FIRST_WINDOW has duplicates")
# the driver samples EXACTLY the first 50 — an unbalanced rotation that
# silently pushes the tail past position 50 must fail at import time
if len(_FIRST_WINDOW) != 50:
    raise ValueError(
        f"_FIRST_WINDOW must hold exactly 50 names, has {len(_FIRST_WINDOW)}"
    )

QUERIES = {n: QUERIES[n] for n in _FIRST_WINDOW} | {
    n: f for n, f in QUERIES.items() if n not in set(_FIRST_WINDOW)
}
