"""Skew-mitigation utilities: explicit key salting for joins whose hot
keys overwhelm a single reducer.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins and after a shuffle exists; explicit salting is the
portable fallback — and the only option for aggregations feeding a
skewed key. The trade: the small side is replicated ``salt`` times, so
pick salt ≈ (hot-key rows / target partition rows), not "big".

``salted_join`` implements the classic scheme:

- big side: append a uniform random-ish salt in [0, salt) derived
  deterministically from a row-unique column (so results are stable
  run-to-run — ``rand()`` would break the engine's determinism contract);
- small side: explode each row into all ``salt`` replicas;
- equi-join on (key, salt) — the hot key's rows now spread over
  ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key load spread
    over ``salt`` reducers. ``salt_source``: a row-unique big-side column
    used to derive the deterministic salt (defaults to the key itself
    combined with every column via xxhash64 — pass an id column when you
    have one, it's cheaper)."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    # The small side is exploded into `salt` replicas, so any join form
    # that preserves unmatched SMALL rows would emit them salt times.
    # Big-preserving forms are safe: unmatched big rows match nothing
    # regardless of salt, and semi/anti see a replica for every salt
    # value iff the key exists at all.
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only ({sorted(allowed)}); "
            f"'{how}' would duplicate unmatched small-side rows per salt replica"
        )
    src = (
        F.xxhash64(F.col(salt_source))
        if salt_source is not None
        else F.xxhash64(*[F.col(c) for c in big.columns])
    )
    b = big.withColumn("_salt", F.pmod(src, F.lit(salt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")
