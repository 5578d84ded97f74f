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
# CORRECTNESS row. Round-14 priority (computed from the committed
# CORRECTNESS_r*.json artifacts — tests/test_rotation.py re-derives the
# same staleness table and fails if this window drifts):
# (1) tpch_q3_shipping_priority and tpch_q4_order_priority LEAD: their
# latest driver row is r9 (age 5 > ROTATION_MAX_AGE=4) — they were the
# two documented r13 deferrals that made room for the r12-registered
# incrementals (both incrementals got green first rows in
# CORRECTNESS_r13), and the rotation contract now forces them.
# (2) the 48 registry entries whose latest driver row is r10 — they sit
# at age 4 (the ROTATION_MAX_AGE boundary) when CORRECTNESS_r14 lands.
# (49 entries have an r10-latest row in the artifacts; the 49th,
# approx_distinct_users, was retired from the registry in r11.)
# 2 + 48 = exactly 50, so the r14 window needs NO deferral.
# Everything past position 50 stays covered by the identical local
# DuckDB hash-compare in tests/test_entry_contract.py.
_FIRST_WINDOW = (
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "approx_percentile_quality_report",
    "available_days",
    "dedup_cluster_representatives",
    "dedup_clusters",
    "dedup_exact_summary",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_sorted_neighborhood",
    "dim_event_type",
    "doc_blocklist_hits",
    "doc_bpe_merge_table",
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
    "documents_csv_roundtrip",
    "documents_orc_roundtrip",
    "documents_zip_roundtrip",
    "errors_by_type",
    "event_association_rules",
    "events_holt_forecast",
    "events_state_enrichment",
    "fct_events_hourly",
    "hourly_trend",
    "kpi_totals",
    "lineitem_kmv_distinct_orders",
    "multimodal_adpcm_features",
    "multimodal_alaw_features",
    "multimodal_avi_features",
    "multimodal_flac_features",
    "multimodal_jpeg_pixel_features",
    "multimodal_mp4_features",
    "orders_bloom_prefilter_revenue",
    "orders_kmv_set_report",
    "orders_skyline",
    "props_k_histogram",
    "stg_events",
    "top_event_types",
    "user_cooccurrence_triangles",
    "user_sequence_patterns",
    "value_stats_by_type",
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
    # incremental_dedup_clusters (r13): the third leg of the incremental
    # dedup loop; its first-row deadline is the r15 window. r15's
    # forcing set is the 50 r11-latest entries, which is over-full by
    # one once this entry is added (51 > 50), so ONE r11 ENTRY IS
    # PRE-ANNOUNCED AS THE r15 DEFERRAL: nation_customer_counts —
    # chosen as the lowest-risk deferral (a plain dim⋈fact count
    # aggregate, hash-green in every sampled round, body untouched
    # since its introduction — git log -L on relational.py shows the
    # original driver-contract commit). The deferral is legal under
    # the rotation contract
    # (age 4 == ROTATION_MAX_AGE at r15, not beyond) and it MUST lead
    # the r16 window (age 5 forces it; same precedent as the r13
    # deferral of tpch_q3/q4, which led the r14 window above).
    # r15 window = incremental_dedup_clusters + the other 49 r11-latest
    # entries = exactly 50.
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
