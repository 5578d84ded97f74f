"""Central registry assembling (queries, oracles) pairs from operator
modules for the driver contract (__spark_entry__.py).

Every Spark query lives next to its DuckDB oracle SQL in the defining
module; this module only merges and sanity-checks the dicts.
"""

from __future__ import annotations

from mini_log_lakehouse_spark.operators import (
    bloom,
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
from mini_log_lakehouse_spark.sources import archives as sources_archives
from mini_log_lakehouse_spark.sources import formats as sources_formats
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
    sources_formats,
    sources_archives,
    relational,
    bloom,
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
# CORRECTNESS row. Round-11 priority (computed from the committed
# CORRECTNESS_r*.json artifacts — tests/test_rotation.py re-derives the
# same staleness table and fails if this window drifts):
# (1) all 49 entries whose latest driver row is r7 — they cross
# ROTATION_MAX_AGE=4 the moment CORRECTNESS_r11.json lands. This set
# includes the four ANN tiers: ann_lsh_topk / ann_ivf_topk /
# ann_ivfpq_topk rotate in for the first time since gaining per-tier
# DuckDB oracles (ann_tier_topk_sql — VERDICT r10 ask 1), so they are
# now hash-gated rows, not no_oracle. approx_distinct_users, r6-stale
# in r10's window, is RETIRED from the registry entirely (VERDICT r10
# ask 2: engine-private HLL can never hash-match; its quality gate
# approx_distinct_quality_report carries the driver surface).
# (2) fill the remaining 1 slot from the pool, oldest-exposure-first
# (prior-round sample count, ties in registry order): every pool entry
# with a single lifetime sample is a multimodal codec from r8+;
# multimodal_wav_features (1 sample, r8, earliest in registry order)
# takes the slot. r11 adds NO new entries, so the 49+1 fits exactly;
# any r12 additions are new-entry-forced and must displace pool fills.
# Everything past position 50 stays covered by the identical local
# DuckDB hash-compare in tests/test_entry_contract.py.
_FIRST_WINDOW = (
    # (1) latest driver row r7 — due before r12
    "doc_train_test_split",
    "doc_stratified_sample",
    "doc_pack_sequences",
    "doc_reservoir_per_source",
    "doc_global_shuffle",
    "benchmark_contamination",
    "user_sessions",
    "user_session_summary",
    "multimodal_byte_features",
    "multimodal_media_features",
    "multimodal_frame_stats",
    "daily_distinct_users",
    "orders_cube_status_priority",
    "scalar_function_battery",
    "events_hour_pivot",
    "grouping_sets_status_day",
    "user_last_event",
    "asof_error_attribution",
    "incident_window_events",
    "streaming_hourly_fact",
    "streaming_sliding_fact",
    "streaming_session_window",
    "streaming_error_followups",
    "streaming_static_enrichment",
    "user_pagerank_weighted",
    "user_clustering_coefficient",
    "user_bfs_reach",
    "user_kcore",
    "cooc_degree_histogram",
    "events_dow_seasonality",
    "events_rolling_wau",
    "event_interarrival_stats",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "events_hot_bucket_join",
    "tpch_q1_pricing_summary",
    "lineitem_price_quantiles",
    "region_customer_rollup",
    "top_customers_by_revenue",
    "nation_customer_counts",
    "orders_with_prompt_lines",
    "top3_customers_per_nation",
    "daily_order_lag",
    "orders_running_share",
    "orders_rolling_quarter",
    "customer_balance_quartiles",
    "doc_length_histogram",
    # (2) pool fill, oldest-exposure-first
    "multimodal_wav_features",
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
