"""Z-order (Morton) clustering expressions — multi-dimensional data
layout for file-level min/max skipping.

The reference has no layout optimization (its whole warehouse is one
DuckDB file); this is part of the managed-lakehouse extension surface
(SURVEY.md §4 suggests clustering the warehouse by date). Lexicographic
clustering (``compact(cluster_by=...)``) only prunes on the leading
key; Z-ordering interleaves the bits of several keys so files stay
range-compact in EVERY ordered dimension at once — the same trade
Delta's ``OPTIMIZE ZORDER BY`` makes.

Pipeline (mirrors Delta's implementation shape):

1. **Range-bucket each key** into ``2^bits`` quantile buckets. The
   boundaries come from ``approxQuantile`` — a sample-based, driver-side
   computation, exactly how ``RangePartitioner`` picks its bounds, so
   the cost is O(sample) no matter the corpus size. Bucketing by
   *quantile* (not min/max linear scaling) makes every bucket hold
   ~equal row counts, so skew in the key distribution cannot collapse
   the Z-curve onto a few codes.
2. **Interleave the bucket bits** into a single long (Morton code) with
   shift/mask arithmetic — pure codegen, no UDF.
3. ``repartitionByRange`` on the code + sort within partitions, so each
   written file covers a compact Z-range ⇒ a compact rectangle in key
   space ⇒ tight per-file min/max on every key.

The per-row bucket lookup is a balanced ``CASE WHEN`` binary-search
tree over the boundary literals: O(bits) comparisons per row inside
whole-stage codegen (Delta uses an equivalent native
``range_partition_id`` expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension. 8 bits = 256 quantile buckets per key: file-level
#: pruning only needs enough resolution that one FILE spans few buckets;
#: with ~thousands of files per table, 256 buckets/key already gives
#: near-minimal false-positive reads, and 2 keys fit in 16 bits of code.
DEFAULT_BITS = 8


def quantile_boundaries(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> dict[str, list[float]]:
    """Per-column sorted cut points splitting the value range into
    ``2^bits`` equal-frequency buckets.

    Driver-side and sample-based (``approxQuantile`` keeps an epsilon-
    bounded sketch per column); at 100 TB this is the same O(sample)
    step every range partitioner performs. Non-numeric orderable types
    (timestamp/date) are bucketed on their epoch value.
    """
    n = (1 << bits) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    numeric = df.select(
        *[_as_numeric(df, c).alias(c) for c in cols]
    )
    # one multi-column approxQuantile call: all per-column sketches are
    # collected in a single scan (a per-column loop would re-read the
    # snapshot once per Z-order key)
    all_bs = numeric.stat.approxQuantile(list(cols), probs, 0.001)
    out: dict[str, list[float]] = {}
    for c, bs in zip(cols, all_bs):
        # Deduplicate plateaus (heavy hitters produce repeated cut
        # points); the search tree only needs the distinct ascents.
        dedup: list[float] = []
        for b in bs:
            if not dedup or b > dedup[-1]:
                dedup.append(b)
        out[c] = dedup
    return out


def _as_numeric(df: DataFrame, col: str) -> Column:
    """The column as a double for quantile/boundary comparison (epoch
    seconds for timestamps — order-preserving, which is all Z-ordering
    needs)."""
    dtype = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if dtype.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if dtype == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    return c.cast("double")


def range_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket index of ``col`` = number of boundaries <= col, as a
    balanced binary-search CASE tree (O(log B) codegen comparisons).
    NULLs take bucket 0 (NULLS FIRST ordering) — guarded explicitly,
    because inside the tree a NULL comparison is falsy and would
    otherwise slide down the right spine into the TOP bucket."""

    def search(lo: int, hi: int) -> Column | int:
        # counts boundaries[lo:hi] <= col, plus lo (those already known <=)
        if lo >= hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(col < F.lit(boundaries[mid]), search(lo, mid)).otherwise(
            search(mid + 1, hi)
        )

    return F.when(col.isNull(), F.lit(0)).otherwise(
        search(0, len(boundaries))
    )


def interleave_bits(
    buckets: list[Column], bits: int | list[int] = DEFAULT_BITS
) -> Column:
    """Morton code with MSB alignment: level i of the output takes the
    i-th MOST significant bit of every dimension that still has one, so
    all dimensions advance together even when their effective bit widths
    differ (a low-cardinality key — 15 distinct users at the smallest
    test corpus — fills fewer buckets than a continuous one; naive
    LSB-indexed interleaving would zero its high bits and let the wider
    key dominate the whole ordering). ``bits`` is one shared width or a
    per-dimension list. The terms address disjoint bit positions, so
    integer addition composes them — pure long arithmetic, codegen."""
    k = len(buckets)
    widths = [bits] * k if isinstance(bits, int) else list(bits)
    slots = [
        (level, j)
        for level in range(max(widths))
        for j in range(k)
        if level < widths[j]
    ]
    total = len(slots)
    terms: list[Column] = []
    for idx, (level, j) in enumerate(slots):
        src = widths[j] - 1 - level  # the level-th MSB of dimension j
        dst = total - 1 - idx
        bit = F.shiftright(buckets[j].cast("long"), src).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(bit, dst))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """The full Z-value expression for ``cols`` (boundaries computed from
    ``df`` itself). Callers clustering a table they will re-cluster
    repeatedly should compute boundaries once and reuse them.

    Each dimension interleaves at its EFFECTIVE width — the bits its
    deduplicated boundary count actually fills — so low-cardinality keys
    keep equal weight in the curve (see interleave_bits)."""
    bounds = quantile_boundaries(df, cols, bits)
    widths = [
        max(1, (len(bounds[c])).bit_length()) for c in cols
    ]
    return interleave_bits(
        [range_bucket(_as_numeric(df, c), bounds[c]) for c in cols], widths
    )
