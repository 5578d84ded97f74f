"""Cross-engine deterministic hashing.

Spark's native hash functions (``xxhash64``, ``hash``) are fast but
engine-private: a DuckDB oracle cannot reproduce them, so any operator
keyed on them is limited to rows-only verification. The portable
alternative used across this repo is the **md5-prefix integer hash**:
interpret the first 12 hex digits of ``md5(x)`` as a 48-bit integer.
md5 of a UTF-8 string is bit-identical in every engine, so

- Spark:  ``conv(substr(md5(x), 1, 12), 16, 10)`` cast to long
- DuckDB: ``('0x' || substr(md5(x), 1, 12))::BIGINT``

yield the same value for the same input — which is what lets the
MinHash/SimHash dedup pipelines (operators/dedup.py) and the
split/sample/shuffle operators (operators/sampling.py) publish exact
relational oracles instead of rows-only checks.

48 bits (not 64) because 12 hex digits always fit a signed BIGINT in
both engines with no overflow/sign edge cases, and because downstream
arithmetic (affine MinHash folds, mod-bucket draws) stays comfortably
below 2^63.

md5 costs ~10× an xxhash64 per call; per-shingle hashing is one map
pass over the corpus, so at 100 TB this is a bounded constant-factor
trade for cross-engine verifiability. Operators whose keys never need
external reproduction should keep using ``F.xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Width of the portable hash in bits (12 hex digits).
PORTABLE_HASH_BITS = 48

#: md5 yields 128 portable bits = 32 hex digits; ``word`` selects a
#: disjoint 12-digit segment, so up to 2 independent 48-bit hashes per
#: md5 call (the 96-bit SimHash uses both).
def portable_hash48(col, word: int = 0) -> Column:
    """48-bit md5-segment hash of a string column (non-negative long)."""
    if word not in (0, 1):
        raise ValueError(f"md5 yields 2 disjoint 12-hex-digit words, got word={word}")
    return F.conv(F.substring(F.md5(col), 1 + word * 12, 12), 16, 10).cast("long")


def sql_portable_hash48(expr: str, word: int = 0) -> str:
    """DuckDB twin of :func:`portable_hash48` over a SQL expression."""
    if word not in (0, 1):
        raise ValueError(f"md5 yields 2 disjoint 12-hex-digit words, got word={word}")
    return f"(('0x' || substr(md5({expr}), {1 + word * 12}, 12))::BIGINT)"
