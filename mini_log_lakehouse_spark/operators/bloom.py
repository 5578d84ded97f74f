"""Bloom-filter semi-join reduction: prefilter a huge fact against a
fixed-size bitmap of the dim-side join keys before the exact join.

The 100 TB problem this solves: a selective dim (say 100 M surviving
keys after its filter) is too big to broadcast as raw keys, so the fact
side — billions of rows, most of which will NOT match — must shuffle in
full for a sort-merge join. A Bloom filter of the dim keys is a few KB
to MB regardless of key count (m bits, k salted hashes), broadcasts for
free, and eliminates the non-matching fact rows map-side; only the
surviving sliver pays the exact-join shuffle. False positives are
harmless (the exact join removes them); false negatives are impossible
(every dim key sets all k of its bits). Spark's own runtime filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects the same
trick automatically for shapes its heuristics recognize; this module is
the explicit, plan-visible form — the build, broadcast and membership
test are ordinary DataFrame ops, so the technique composes with any
join and shows up in .explain for the tests to pin.

Geometry: BLOOM_BITS = 2^16 (an 8 KB bitmap of 1024 longs) with
BLOOM_SALTS = 3 hash functions gives fp ≈ (1 − e^(−kn/m))^k ≈ 0.3% at
n = 3 000 keys (the sf0.1 segment dim). At production scale size
m ≈ −n·ln(p)/ln²2 for target fp rate p — the bitmap grows only with
the KEY COUNT you filter by, never with the fact.

Membership testing uses only md5-derived integer hashes shared with the
DuckDB oracle family (sampling._hash_bucket), but the oracle for the
driver entry is just the PLAIN join — the Bloom layer must be
semantically invisible, which is exactly what the hash gate checks.

Reference parity: none — the reference (single-process Pandas/DuckDB,
SURVEY.md §4) never joins at a scale where shuffle elimination means
anything. This module exists for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators.relational import _cents_sum
from mini_log_lakehouse_spark.operators.sampling import _hash_bucket
from mini_log_lakehouse_spark.sources.registry import load_table

#: Bitmap size in bits (power of two; 2^16 bits = 1024 longs = 8 KB).
BLOOM_BITS = 1 << 16
#: Hash-function salts (k = 3): each key sets/tests k bit positions.
BLOOM_SALTS = ("bf0:", "bf1:", "bf2:")


def bloom_bitmap(keys: DataFrame, col: str) -> DataFrame:
    """(word, bits) Bloom bitmap of ``keys[col]``: every key hashes to
    k = len(BLOOM_SALTS) positions in [0, BLOOM_BITS); positions pack
    into 64-bit words via a bit_or aggregate. The result is at most
    BLOOM_BITS/64 rows — broadcastable no matter how many keys went in.

    Scale shape: the explode is map-side (k narrow rows per key), the
    groupBy partial-aggregates each task to ≤ 1024 words before the
    exchange — the per-task bitmaps ARE the mergeable sketch, merged by
    bitwise OR exactly as per-executor Bloom filters would be."""
    pos = F.explode(
        F.array(*[_hash_bucket(F.col(col), s, BLOOM_BITS) for s in BLOOM_SALTS])
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("CAST(pos % 64 AS INT)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("bits"))
    )


def bloom_prefilter(
    fact: DataFrame, key: str, dim_keys: DataFrame, dim_col: str
) -> DataFrame:
    """Rows of ``fact`` whose ``key`` MIGHT appear in ``dim_keys[dim_col]``
    — a superset of the true matches (false positives pass, false
    negatives cannot happen), with the same schema as ``fact``.

    Physical shape: one broadcast hash join per salt against the ≤1024-row
    bitmap (the fact side never shuffles — all k membership tests fuse
    into the fact's scan stage under whole-stage codegen), each followed
    by a bit-test filter. A fact row whose word is absent from the bitmap
    (no dim key set any bit there) drops at the join itself — an all-zero
    word can't contain its bit."""
    bitmap = bloom_bitmap(dim_keys, dim_col)  # one build, all k salts
    out = fact
    for i, s in enumerate(BLOOM_SALTS):
        pos = _hash_bucket(F.col(key), s, BLOOM_BITS)
        out = (
            out.withColumn(f"_bfp{i}", pos)
            .withColumn(f"_bfw{i}", F.expr(f"_bfp{i} DIV 64"))
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word").alias(f"_bfw{i}"),
                        F.col("bits").alias(f"_bfb{i}"),
                    )
                ),
                f"_bfw{i}",
            )
            .filter(
                F.expr(
                    f"(_bfb{i} & shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(_bfp{i} % 64 AS INT))) != 0"
                )
            )
        )
    return out.drop(*[c for c in out.columns if c.startswith("_bf")])


#: Segment the driver entry filters the dim by (selectivity ~1/5 of
#: customers, so ~4/5 of orders are Bloom-eliminated before the join).
BLOOM_SEGMENT = "BUILDING"


def orders_bloom_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: order count + exact revenue per priority for the
    BUILDING-segment customers, with the orders fact Bloom-prefiltered
    by the segment's custkeys before the exact semi join. The oracle is
    the PLAIN join — the Bloom layer is pure physical optimization and
    must not change a single row (the hash gate proves it: false
    positives die in the semi join, false negatives are structurally
    impossible)."""
    orders = load_table(spark, sf_dir, "orders")
    seg = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    cand = bloom_prefilter(orders, "o_custkey", seg, "c_custkey")
    matched = cand.join(
        F.broadcast(seg),
        cand["o_custkey"] == seg["c_custkey"],
        "left_semi",
    )
    return (
        matched.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("orders"),
            _cents_sum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("priority")
    )


ORACLES: dict[str, str] = {
    "orders_bloom_prefilter_revenue": """
        SELECT o.o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS orders,
               CAST(FLOOR(SUM(CAST(o.o_totalprice AS DECIMAL(28,10))) * 100 + 0.5)
                    AS DOUBLE) / 100 AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1
        ORDER BY 1
    """,
}

QUERIES = {
    "orders_bloom_prefilter_revenue": orders_bloom_prefilter_revenue,
}
