"""Property-based tests for the round-10 operators: the Aho-Corasick
automaton against a naive all-occurrence counter on arbitrary
pattern/text draws, and the Bloom prefilter's no-false-negative
guarantee on arbitrary key sets.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mini_log_lakehouse_spark.operators import textstats

texts = st.text(alphabet="ab ", min_size=0, max_size=60)
patterns = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=4),
    min_size=1,
    max_size=4,
    unique=True,
)


def _naive_count(text: str, pat: str) -> int:
    return sum(1 for i in range(len(text)) if text.startswith(pat, i))


@given(pats=patterns, text=texts)
@settings(max_examples=200, deadline=None)
def test_aho_corasick_equals_naive_all_occurrence_count(pats, text):
    """For ANY pattern set — overlapping, nested, prefix-of-another —
    the automaton's per-pattern counts equal the brute-force
    all-occurrence scan. This is the general contract; the gated
    blocklist's border-free restriction only matters for the oracle's
    replace() arithmetic, not for the scanner."""
    pats_t = tuple(pats)
    goto, fail, out = textstats.build_aho_corasick(pats_t)
    got = textstats.ac_count(text, goto, fail, out, len(pats_t))
    assert got == [_naive_count(text, p) for p in pats_t]


_BLOOM_SETTINGS = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(
    fact_keys=st.lists(st.integers(0, 5000), min_size=1, max_size=200),
    dim_keys=st.sets(st.integers(0, 5000), min_size=1, max_size=50),
)
@_BLOOM_SETTINGS
def test_bloom_prefilter_never_drops_a_true_match(spark, fact_keys, dim_keys):
    """False negatives are structurally impossible for ANY key sets:
    every fact row whose key is in the dim survives the prefilter."""
    from pyspark.sql import functions as F

    from mini_log_lakehouse_spark.operators import bloom

    fact = spark.createDataFrame([(k,) for k in fact_keys], "k long")
    dim = spark.createDataFrame([(k,) for k in dim_keys], "d long")
    cand = {
        r["k"]
        for r in bloom.bloom_prefilter(fact, "k", dim, "d").collect()
    }
    true_matches = {k for k in fact_keys if k in dim_keys}
    assert true_matches <= cand
    # and the bitmap stays bounded regardless of the draw
    assert (
        bloom.bloom_bitmap(dim.select(F.col("d")), "d").count()
        <= bloom.BLOOM_BITS // 64
    )


points = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 8)),
    min_size=0,
    max_size=40,
)


def _naive_skyline(pts):
    """Definitional O(n²) dominance — mirrors the DuckDB oracle."""
    sky = [
        p
        for p in pts
        if not any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
    ]
    out = {}
    for p in sky:
        out[p] = out.get(p, 0) + 1
    return out


def _two_phase_skyline(pts):
    """Pure-python mirror of orders_skyline's reduction: per-x max,
    then a descending-x running-max scan."""
    per_x: dict[int, int] = {}
    for x, y in pts:
        per_x[x] = max(per_x.get(x, -1), y)
    later_max = -1
    keep = set()
    for x in sorted(per_x, reverse=True):
        if per_x[x] > later_max:
            keep.add((x, per_x[x]))
            later_max = per_x[x]
    out = {}
    for p in pts:
        if p in keep:
            out[p] = out.get(p, 0) + 1
    return out


@given(pts=points)
@settings(max_examples=300, deadline=None)
def test_two_phase_skyline_equals_definitional_dominance(pts):
    """For ANY point multiset — ties on either or both axes included —
    the distributive two-phase reduction produces exactly the
    definitional Pareto frontier with tie counts."""
    assert _two_phase_skyline(pts) == _naive_skyline(pts)


def test_orders_skyline_matches_bruteforce(spark, sf_dir):
    """The Spark plan agrees with the definitional dominance check on
    the real corpus, and its invariants hold: strictly increasing
    price as day decreases, one row per surviving day."""
    from pyspark.sql import functions as F

    from mini_log_lakehouse_spark.operators import relational
    from mini_log_lakehouse_spark.sources.registry import load_table

    got = relational.orders_skyline(spark, sf_dir).collect()
    pts = [
        (r["day"].toordinal(), r["pc"])
        for r in load_table(spark, sf_dir, "orders")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).alias("pc"),
        )
        .collect()
    ]
    want = _naive_skyline(pts)
    assert {
        (r["day"].toordinal(), r["price_cents"]): r["n_orders"] for r in got
    } == want
    days = [r["day"] for r in got]
    assert days == sorted(days) and len(set(days)) == len(days)
    prices = [r["price_cents"] for r in got]
    assert prices == sorted(prices, reverse=True)


seqs = st.lists(st.sampled_from("abcde"), min_size=0, max_size=14)


def _naive_subseq_triples(seq):
    """Definitional ∃ i<j<k — mirrors the DuckDB oracle."""
    n = len(seq)
    return {
        (seq[i], seq[j], seq[k])
        for i in range(n)
        for j in range(i + 1, n)
        for k in range(j + 1, n)
    }


def _greedy_subseq_triples(seq):
    """Pure-python mirror of user_sequence_patterns' reduction: first
    t2 after the FIRST t1, then any t3 after that."""
    mi: dict[str, int] = {}
    ma: dict[str, int] = {}
    for i, t in enumerate(seq):
        mi.setdefault(t, i)
        ma[t] = i
    out = set()
    for t1, m1 in mi.items():
        fb: dict[str, int] = {}
        for j in range(m1 + 1, len(seq)):
            fb.setdefault(seq[j], j)
        for t2, j in fb.items():
            for t3, m3 in ma.items():
                if m3 > j:
                    out.add((t1, t2, t3))
    return out


@given(seq=seqs)
@settings(max_examples=400, deadline=None)
def test_greedy_triple_reduction_equals_subsequence_definition(seq):
    """For ANY sequence — repeated types (t1 = t2 = t3 included), all
    gaps — the first-after-first reduction finds exactly the ordered
    triples present as subsequences. The greedy step is sound because
    taking the FIRST t1 and then the FIRST t2 after it only loosens
    the constraint on t3."""
    assert _greedy_subseq_triples(seq) == _naive_subseq_triples(seq)
