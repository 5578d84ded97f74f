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
# CORRECTNESS row. Round-13 priority (computed from the committed
# CORRECTNESS_r*.json artifacts — tests/test_rotation.py re-derives the
# same staleness table and fails if this window drifts):
# (1) 48 of the 50 entries whose latest driver row is r9 — they sit at
# age 4 (the ROTATION_MAX_AGE boundary) when CORRECTNESS_r13 lands.
# (2) the two r12-registered incrementals (incremental_minhash_pairs,
# incremental_ann_ivf_topk — VERDICT r12 ask 3): their first-row
# deadline is r14, but r14 could not fit them beside all 50 r9-latest
# entries (52 > 50), so two R9 ENTRIES ARE DEFERRED INSTEAD —
# tpch_q3_shipping_priority and tpch_q4_order_priority, chosen as the
# lowest-risk deferrals (classic relational analogs, hash-green in
# every sampled round since r3, code untouched for 9 rounds). The
# deferral is legal under the rotation contract (age 4 == MAX_AGE, not
# beyond) and they MUST lead the r14 window (age 5 forces them;
# r14 = those 2 + the 48 r10-latest entries = exactly 50).
# Everything past position 50 stays covered by the identical local
# DuckDB hash-compare in tests/test_entry_contract.py.
_FIRST_WINDOW = (
    "approx_distinct_quality_report",
    "customers_without_urgent_orders",
    "dedup_semantic_pairs",
    "doc_boilerplate_share",
    "doc_frequent_ngrams",
    "doc_hybrid_search",
    "doc_lang_mixture",
    "doc_lm_quality_gate",
    "doc_ngram_novelty",
    "embedding_pq_codes",
    "event_burst_runs",
    "event_transition_counts",
    "event_trigram_paths",
    "events_bigram_lm_scores",
    "events_cms_user_counts",
    "events_cusum_changepoints",
    "events_daily_anomalies",
    "events_hour_unpivot",
    "events_zorder_pruned",
    "multimodal_gif_features",
    "multimodal_jpeg_dc_features",
    "multimodal_mulaw_features",
    "multimodal_png_features",
    "multimodal_tiff_features",
    "orders_rollup_status_priority",
    "orders_window_battery",
    "props_variant_stats",
    "session_attribution",
    "source_lang_drift",
    "streaming_append_hourly",
    "streaming_daily_active_users",
    "streaming_update_hourly",
    "tpch_integrity_audit",
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
    "tpch_q5_local_supplier_volume",
    "user_communities",
    "user_decayed_activity",
    "user_pagerank",
    "user_state_scd2",
    "incremental_minhash_pairs",
    "incremental_ann_ivf_topk",
)

#: Entries that have shipped but never received a driver CORRECTNESS row,
#: mapped to the round they were registered in. tests/test_rotation.py
#: enforces a hard first-row deadline: a registered entry may sit out at
#: most NEW_ENTRY_MAX_WAIT build rounds after its registration round and
#: is then FORCED into the window of round
#: ``registered + NEW_ENTRY_MAX_WAIT + 1`` (registered r12, WAIT=1 →
#: r12 and r13 may be saturated, the r14 window must carry it); an
#: unregistered never-sampled entry is overdue IMMEDIATELY (the strict
#: r6 rule is unchanged for the undocumented case). Once an entry has a
#: driver row, remove it from this dict.
ENTRY_REGISTERED: dict[str, int] = {
    # The two r12-registered incrementals are scheduled in the r13
    # window above, which satisfies the rotation contract directly (a
    # never-sampled entry passes by being in the window); keeping them
    # here would trip test_registration_ledger_is_tidy the moment
    # CORRECTNESS_r13 lands with their first rows.
    # incremental_dedup_clusters (r13): the third leg of the incremental
    # dedup loop; its first-row deadline is the r15 window, whose
    # forcing set (the 50 r11-latest entries) will need one documented
    # deferral to fit it — same precedent as this round's two.
    "incremental_dedup_clusters": 13,
}

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
