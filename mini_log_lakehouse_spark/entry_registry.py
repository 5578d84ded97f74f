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
# CORRECTNESS row. Round-7 priority (VERDICT r6 ask 1): (1) the TEN
# round-6 entries that have never received a driver row; (2) entries
# NEW this round; (3) the three ANN tiers whose retrieval mechanism
# changed this round (md5-parity SRP planes, integer-lattice IVF
# quantizer) — their rows-only rows must reflect the new code; (4) the
# stalest previously-green pool (latest green row = r3; 31 of 43 fit —
# the 12 left over are ≤4 rounds stale and tests/test_rotation.py
# forces them into the r8 window). Everything past position 50 stays
# covered by the identical local DuckDB hash-compare in
# tests/test_entry_contract.py, and tests/test_rotation.py enforces
# the no-entry-older-than-4-rounds invariant mechanically.
_FIRST_WINDOW = (
    # (1) never driver-sampled (added r6, rotated in per VERDICT r6 #1)
    "user_pagerank_weighted",
    "user_kcore",
    "user_bfs_reach",
    "user_clustering_coefficient",
    "cooc_degree_histogram",
    "doc_length_histogram",
    "event_interarrival_stats",
    "events_dow_seasonality",
    "events_rolling_wau",
    "events_state_enrichment",
    # (2) new this round (slots swapped in as entries land)
    "grouping_sets_status_day",
    "customer_balance_quartiles",
    "daily_distinct_users",
    "daily_order_lag",
    "region_customer_rollup",
    "nation_customer_counts",
    # (3) rows-only tiers whose mechanism changed this round
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    # (4) stalest green pool — latest driver row is r3
    "ann_cosine_topk",
    "asof_error_attribution",
    "benchmark_contamination",
    "doc_global_shuffle",
    "doc_pack_sequences",
    "doc_reservoir_per_source",
    "doc_stratified_sample",
    "doc_train_test_split",
    "events_hot_bucket_join",
    "events_hour_pivot",
    "incident_window_events",
    "lineitem_price_quantiles",
    "multimodal_byte_features",
    "multimodal_frame_stats",
    "multimodal_media_features",
    "orders_cube_status_priority",
    "orders_rolling_quarter",
    "orders_running_share",
    "orders_with_prompt_lines",
    "scalar_function_battery",
    "streaming_error_followups",
    "streaming_hourly_fact",
    "streaming_session_window",
    "streaming_sliding_fact",
    "streaming_static_enrichment",
    "top3_customers_per_nation",
    "top_customers_by_revenue",
    "tpch_q1_pricing_summary",
    "user_last_event",
    "user_session_summary",
    "user_sessions",
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
