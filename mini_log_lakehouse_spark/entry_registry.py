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
# CORRECTNESS row. Round-8 priority (VERDICT r7 ask 2, computed from the
# committed CORRECTNESS_r*.json artifacts — tests/test_rotation.py
# re-derives the same staleness table and fails if this window drifts):
# (1) the 6 entries whose latest driver row is r3 — already past
# ROTATION_MAX_AGE, the round-7 rotation breach; (2) all 17 entries
# last sampled in r4 — they cross the age bar the moment
# CORRECTNESS_r08.json lands, so sampling them now is what keeps r9
# schedulable; (3) entries NEW this round (no driver row ever — the
# rotation test forces them in — 9 slots: 5 early-round entries plus
# the 4 late-round operators); (4) fill from the 44-entry r5 pool,
# oldest-exposure-first (the ~26 r5 entries left over are next round's
# due load, which fits r9's 50 slots alongside the r6 pool's lead
# edge). Everything past position 50 stays covered by the identical
# local DuckDB hash-compare in tests/test_entry_contract.py.
_FIRST_WINDOW = (
    # (1) latest driver row r3 — overdue now
    "customers_with_orders",
    "customers_without_orders",
    "setop_except_nations",
    "setop_intersect_nations",
    "setop_union_all_counts",
    "setop_union_nations",
    # (2) latest driver row r4 — due before r9
    "doc_bpe_first_merge",
    "doc_domain_cap",
    "doc_tfidf_top_terms",
    "doc_unigram_lm_scores",
    "documents_jsonl_roundtrip",
    "embedding_int8_quantize",
    "embedding_label_centroids",
    "events_column_profile",
    "events_daily_trend",
    "events_heavy_hitters",
    "events_retention_cohorts",
    "lakehouse_change_feed",
    "part_fuzzy_name_pairs",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "user_hourly_gapfilled",
    # (3) new or newly-oracled this round (rows must reflect the new gate)
    "ann_recall_report",
    "doc_bpe_encode",
    "multimodal_wav_features",
    "user_sssp_weighted",
    "user_wcc",
    "dedup_substring_spans",
    "user_link_prediction",
    "user_event_salsa",
    "multimodal_bmp_features",
    # (4) r5 pool fill, oldest-exposure-first
    "ann_knn_join",
    "dedup_embedding_cosine",
    "dedup_incremental_batch",
    "doc_sparse_search",
    "doc_token_stats",
    "embedding_kmeans_clusters",
    "embedding_random_projection",
    "events_funnel",
    "session_funnel",
    "setop_except_all_nation_keys",
    "streaming_hourly_fact_p95",
    "streaming_user_sessions",
    "streaming_user_totals",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipment_priority",
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
