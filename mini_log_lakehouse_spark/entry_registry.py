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
    multimodal,
    relational,
    sampling,
    sessions,
    similarity,
    skew,
    temporal,
    textstats,
    vocab,
)
from mini_log_lakehouse_spark.streaming import ingest as streaming_ingest
from mini_log_lakehouse_spark.streaming import joins as streaming_joins
from mini_log_lakehouse_spark.streaming import sessions as streaming_sessions

# Ordered so the driver's first-50 correctness sample rotates across rounds:
# families that have not yet received a driver-side CORRECTNESS row come
# first (sampling/sessions/multimodal/extensions/temporal/vocab/streaming
# plus similarity's LSH/IVF entries), followed by relational (new TPC-H
# queries land there), with the long-green events/textstats/dedup families
# last — those stay covered by the identical local DuckDB hash-compare in
# tests/test_entry_contract.py.
_MODULES = (
    sampling,
    sessions,
    multimodal,
    extensions,
    temporal,
    vocab,
    streaming_ingest,
    streaming_sessions,
    streaming_joins,
    similarity,
    skew,
    relational,
    events,
    textstats,
    curation,
    dedup,
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
