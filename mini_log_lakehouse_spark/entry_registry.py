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
# CORRECTNESS row. Round-9 priority (VERDICT r8 ask 1, computed from the
# committed CORRECTNESS_r*.json artifacts — tests/test_rotation.py
# re-derives the same staleness table and fails if this window drifts):
# (1) all 26 entries whose latest driver row is r5 — they cross
# ROTATION_MAX_AGE=4 the moment CORRECTNESS_r09.json lands, so sampling
# them now is what keeps the schedule intact; (2) entries NEW this round
# (no driver row ever — the rotation test forces them in — 8 slots: the
# PNG/GIF/TIFF codecs, the baseline-JPEG entropy layer, the G.711
# mu-law expansion, the HLL quality gate, the append- and update-mode
# streaming contracts); (3) fill the remaining 16 slots from the 46-entry r6 pool,
# oldest-exposure-first (prior-round sample count, ties in registry
# order — the 30 r6 leftovers are r10's load, comfortably inside its 50
# slots before the r7 pool comes due at r11). Everything past position
# 50 stays covered by the identical local DuckDB hash-compare in
# tests/test_entry_contract.py.
_FIRST_WINDOW = (
    # (1) latest driver row r5 — due before r10
    "doc_lang_mixture",
    "events_cms_user_counts",
    "events_hour_unpivot",
    "orders_window_battery",
    "events_daily_anomalies",
    "event_transition_counts",
    "user_state_scd2",
    "events_bigram_lm_scores",
    "customers_without_urgent_orders",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_stock_suppliers",
    "tpch_q21_waiting_orders",
    "tpch_q22_lapsed_customers",
    "props_variant_stats",
    "doc_lm_quality_gate",
    "source_lang_drift",
    "events_zorder_pruned",
    "doc_frequent_ngrams",
    "doc_ngram_novelty",
    "doc_boilerplate_share",
    # (2) new this round (no driver row ever)
    "multimodal_png_features",
    "multimodal_gif_features",
    "approx_distinct_quality_report",
    "streaming_append_hourly",
    "streaming_update_hourly",
    "multimodal_jpeg_dc_features",
    "multimodal_tiff_features",
    "multimodal_mulaw_features",
    # (3) r6 pool fill, oldest-exposure-first
    "session_attribution",
    "event_burst_runs",
    "streaming_daily_active_users",
    "user_pagerank",
    "user_communities",
    "events_cusum_changepoints",
    "user_decayed_activity",
    "event_trigram_paths",
    "embedding_pq_codes",
    "tpch_integrity_audit",
    "doc_hybrid_search",
    "dedup_semantic_pairs",
    "orders_rollup_status_priority",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
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
