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
# CORRECTNESS row. Round-10 priority (computed from the committed
# CORRECTNESS_r*.json artifacts — tests/test_rotation.py re-derives the
# same staleness table and fails if this window drifts):
# (1) all 30 entries whose latest driver row is r6 — they cross
# ROTATION_MAX_AGE=4 the moment CORRECTNESS_r10.json lands; (2) entries
# NEW this round (no driver row ever — the rotation test forces them
# in — 19 slots: the KMV distinct sketch + its set-algebra report,
# the Bloom prefilter join, the G.711 A-law expansion, the full JPEG
# pixel decode, the AVI/MJPEG and MP4/ISO-BMFF video pipelines, the
# approx-percentile quality gate, the sorted-neighborhood dedup, the
# Aho-Corasick blocklist scan, the association-rule miner, the IMA
# ADPCM predictive-codec decode, the Holt forecaster, the ORC and
# RFC-4180 CSV roundtrips, the two-phase skyline, the distributed ZIP
# expansion, the FLAC lossless-compression decode, the sequential-
# pattern miner); (3) fill the remaining 1 slot from the 50-entry r7
# pool, oldest-exposure-first (prior-round sample count, ties in
# registry order — the 49 r7 leftovers are r11's load, inside its 50
# slots; r11 therefore has ONE spare slot, so new-entry additions in
# r11 must be at most one or the r7 tail slips a round).
# Everything past position 50 stays covered by the identical local
# DuckDB hash-compare in tests/test_entry_contract.py.
_FIRST_WINDOW = (
    # (1) latest driver row r6 — due before r11
    "approx_distinct_users",
    "doc_bpe_merge_table",
    "user_cooccurrence_triangles",
    "ann_rp_topk",
    "stg_events",
    "fct_events_hourly",
    "errors_by_type",
    "top_event_types",
    "available_days",
    "kpi_totals",
    "hourly_trend",
    "dim_event_type",
    "props_k_histogram",
    "value_stats_by_type",
    "doc_word_histogram",
    "doc_bpe_token_counts",
    "doc_fingerprints",
    "doc_quality_scores",
    "doc_lang_id",
    "doc_chunks",
    "doc_repetition_stats",
    "doc_pii_signals",
    "doc_normalized_fingerprints",
    "doc_curation_summary",
    "dedup_exact_summary",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_cluster_representatives",
    # (2) new this round (no driver row ever)
    "lineitem_kmv_distinct_orders",
    "orders_kmv_set_report",
    "event_association_rules",
    "orders_bloom_prefilter_revenue",
    "multimodal_alaw_features",
    "multimodal_jpeg_pixel_features",
    "multimodal_avi_features",
    "multimodal_mp4_features",
    "approx_percentile_quality_report",
    "dedup_sorted_neighborhood",
    "doc_blocklist_hits",
    "multimodal_adpcm_features",
    "events_holt_forecast",
    "documents_orc_roundtrip",
    "documents_csv_roundtrip",
    "orders_skyline",
    "documents_zip_roundtrip",
    "multimodal_flac_features",
    "user_sequence_patterns",
    # (3) r7 pool fill, oldest-exposure-first
    "events_state_enrichment",
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
