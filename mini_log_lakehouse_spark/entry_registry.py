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
# CORRECTNESS row. Round-4 priority: (1) the 18 TPC-H analogs never
# driver-sampled before this round; (2) entries whose oracles are new this
# round; (3) rows-only-by-design entries kept visible (approximate HLL and
# ANN tiers — their `err: no_oracle` rows should appear, not silently
# vanish); (4) queries whose implementation changed this round; (2b) the
# round's newly-built operators (mixture/capping/incremental-dedup/LM-gate/
# BPE-encode/JL/CMS/JSONL/funnels/quantize/window-battery/gap-fill/trend/
# VARIANT/sparse-search/profiler/fuzzy-linkage); (5) one cross-family
# anchor. Entries past position 50 (including this round's late additions
# session_funnel, source_lang_drift, embedding_kmeans_clusters, ann_rp_topk)
# stay covered by the identical local DuckDB hash-compare in
# tests/test_entry_contract.py and rotate into the window next round.
_FIRST_WINDOW = (
    # (1) never driver-sampled TPC-H analogs
    "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipment_priority",
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
    # (2) oracles new this round
    "streaming_user_sessions",
    "doc_bpe_first_merge",
    "doc_unigram_lm_scores",
    "doc_tfidf_top_terms",
    "events_heavy_hitters",
    "embedding_label_centroids",
    "lakehouse_change_feed",
    # (3) rows-only by design — keep their no_oracle rows visible
    # (doc_bpe_merge_table rotated out in favor of doc_sparse_search:
    # it collected rows-only driver rows in r1-r3 and its closed-form
    # first iteration is oracle-checked via doc_bpe_first_merge)
    "approx_distinct_users",
    # streaming_hourly_fact_p95 rotated out (rows-only; had its r3 row)
    # for the oracle-checked state-v2 counters:
    "streaming_user_totals",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # (4) implementation touched this round (top_customers_by_revenue
    # rotated out: green r1/r2, bench-measured every round, and its
    # round-4 change is warm-mode-only — the driver's cold correctness
    # path is unchanged)
    "dedup_minhash_pairs",
    "doc_token_stats",
    "events_column_profile",
    # (events_hot_bucket_join rotated out: green r3, unchanged since)
    "part_fuzzy_name_pairs",
    # (2b) operators new this round, never driver-sampled: temperature
    # mixture sampling, domain capping, incremental cross-corpus dedup,
    # unigram-LM quality gate (all oracle-checked) and the BPE corpus
    # encoder (rows-only: iterative merge table; token-for-token local
    # behavioral test instead)
    "doc_lang_mixture",
    "doc_domain_cap",
    "dedup_incremental_batch",
    "doc_lm_quality_gate",
    "doc_bpe_encode",
    "embedding_random_projection",
    "events_cms_user_counts",
    "documents_jsonl_roundtrip",
    "events_funnel",
    "events_retention_cohorts",
    "embedding_int8_quantize",
    "orders_window_battery",
    "user_hourly_gapfilled",
    "events_daily_trend",
    "props_variant_stats",
    "doc_sparse_search",
    # (5) cross-family anchor (also bench-measured every round)
    "ann_knn_join",
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
