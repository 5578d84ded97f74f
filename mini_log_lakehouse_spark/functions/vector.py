"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions (zip_with / aggregate), computed in double.

Sequential left-fold over array elements is deterministic and matches
DuckDB's list_* functions element order, so cosine similarities are
bit-comparable across engines (after a defensive round).

For the 100 TB path the same math is also available vectorized via numpy
inside mapInPandas (see operators/similarity.py) — batch-matrix products
beat per-row folds when k × dim gets large.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return col.cast("array<double>")


def dot(a, b) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity with DuckDB's zero-norm semantics: DuckDB's
    ``list_cosine_similarity`` returns **-1.0** when either vector has
    zero norm (measured, and pinned in tests/test_adversarial_corpora.py)
    — a direction-less embedding ranks "farthest from everything".
    Mirrored here with an explicit branch so ANSI mode never raises
    DIVIDE_BY_ZERO on a zero vector and both engines rank such rows
    identically (last, ties broken by id in every consumer's ORDER BY).
    """
    denom = norm(a) * norm(b)
    return F.when(denom == F.lit(0.0), F.lit(-1.0)).otherwise(dot(a, b) / denom)
