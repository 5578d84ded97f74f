"""Property-based invariants for the curation operators (hypothesis):
packing conserves tokens and split assignment partitions the corpus —
for arbitrary corpora, not just the fixture tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators.sampling import (
    PACK_BUDGET,
    assign_split,
    pack_documents,
)

# (doc_id, source, n_tokens) corpora; text is synthesized as n_tokens words.
corpora = st.lists(
    st.tuples(st.integers(0, 10_000), st.sampled_from(["s0", "s1", "s2"]), st.integers(1, 200)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _df(spark, corpus):
    rows = [(i, s, " ".join(["w"] * n)) for i, s, n in corpus]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


@given(corpus=corpora)
@_SETTINGS
def test_packing_conserves_tokens_and_docs(spark, corpus):
    docs = _df(spark, corpus)
    packs = pack_documents(docs).collect()
    total_by_source: dict[str, int] = {}
    docs_by_source: dict[str, int] = {}
    for i, s, n in corpus:
        total_by_source[s] = total_by_source.get(s, 0) + n
        docs_by_source[s] = docs_by_source.get(s, 0) + 1
    got_tokens: dict[str, int] = {}
    got_docs: dict[str, int] = {}
    for r in packs:
        got_tokens[r["source"]] = got_tokens.get(r["source"], 0) + r["pack_tokens"]
        got_docs[r["source"]] = got_docs.get(r["source"], 0) + r["n_docs"]
        assert r["n_straddling"] <= r["n_docs"]
        assert 0 <= r["pack_id"] <= total_by_source[r["source"]] // PACK_BUDGET
    assert got_tokens == total_by_source  # packing never drops or dupes a token
    assert got_docs == docs_by_source


@given(corpus=corpora)
@_SETTINGS
def test_split_partitions_corpus_deterministically(spark, corpus):
    docs = _df(spark, corpus)
    s1 = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    s2 = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    assert s1 == s2  # rerun-stable
    assert set(s1) == {i for i, _, _ in corpus}  # every doc, exactly once
    assert set(s1.values()) <= {"train", "val", "test"}


def test_split_proportions_at_sf(spark, sf_dir):
    from mini_log_lakehouse_spark.sources.registry import load_table

    d = assign_split(load_table(spark, sf_dir, "documents"))
    counts = {r["split"]: r["n"] for r in d.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    # 90/5/5 within generous tolerance at 500 docs
    assert counts.get("train", 0) / n > 0.8
    assert 0 < counts.get("val", 0) / n < 0.12
    assert 0 < counts.get("test", 0) / n < 0.12


# --- LSH pairing-strategy equivalence (dedup) --------------------------------

# Small corpora with deliberate duplicates/near-duplicates: words drawn
# from a tiny alphabet so shingle collisions (shared bands) actually occur.
_lsh_corpora = st.lists(
    st.tuples(
        st.integers(0, 1_000),
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=6, max_size=12),
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(corpus=_lsh_corpora)
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_lsh_pair_strategies_match_band_definition(spark, corpus):
    """For arbitrary corpora, BOTH candidate-pairing strategies
    (broadcast band self-join and group-and-pair) must emit exactly the
    pair set the LSH definition prescribes: unordered doc pairs sharing
    at least one identical signature band. The definition is computed
    here independently, from the signatures themselves."""
    from mini_log_lakehouse_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in corpus], ["doc_id", "text"]
    )
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id", dedup.minhash_signature(F.col("text")).alias("sig")
        ).collect()
    }
    R, B = dedup.MINHASH_ROWS, dedup.MINHASH_BANDS
    expected = set()
    ids = sorted(sigs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if any(
                sigs[a][i * R : (i + 1) * R] == sigs[b][i * R : (i + 1) * R]
                for i in range(B)
            ):
                expected.add((a, b))
    for small in (True, False):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup._minhash_pairs_direct(
                docs, "doc_id", "text", None, small=small
            ).collect()
        }
        assert got == expected, f"strategy small={small} diverged"


@given(
    # p/q stays inside _ratio6's documented domain (p/q < ~9.2e12, the
    # BIGINT bound of Spark's DIV); q up to 1e6, p up to 1e12*q-ish.
    pairs=st.lists(
        st.tuples(st.integers(0, 10**12), st.integers(1, 10**6)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_ratio6_matches_fraction_ground_truth(spark, pairs):
    """textstats._ratio6 (exact half-up micro-quantization of p/q) must
    equal round-half-up computed in exact rational arithmetic — for
    arbitrary magnitudes including the boundary ties that make
    ROUND(double) engine-dependent."""
    from fractions import Fraction

    from mini_log_lakehouse_spark.operators.textstats import _ratio6

    df = spark.createDataFrame(pairs, ["p", "q"])
    got = {
        (r["p"], r["q"]): r["r"]
        for r in df.select("p", "q", _ratio6("p", "q").alias("r")).collect()
    }
    for p, q in pairs:
        micro = (2 * Fraction(p) * 10**6 + q) // (2 * q)  # floor((p/q)*1e6 + 1/2)
        assert got[(p, q)] == int(micro) / 1e6, (p, q)


# --- BPE encode (vocab.py) ---------------------------------------------------

words = st.text(alphabet="abcd", min_size=0, max_size=24)
merge_tables = st.lists(
    st.tuples(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        st.text(alphabet="abcd", min_size=1, max_size=3),
    ),
    max_size=8,
)


@given(word=words, merges=merge_tables)
@settings(max_examples=200, deadline=None)
def test_encode_word_is_lossless_for_any_merge_table(word, merges):
    """Pure property (no Spark): whatever the merge table, encoding
    concatenates back to the word, and no token is empty."""
    from mini_log_lakehouse_spark.operators.vocab import encode_word

    toks = encode_word(word, merges)
    assert "".join(toks) == word
    assert all(toks), toks


@given(word=words, merges=merge_tables)
@settings(max_examples=200, deadline=None)
def test_merge_pair_pass_is_left_to_right_non_overlapping(word, merges):
    """After applying merge (a, b), the output may not contain the
    adjacent pair (a, b) anywhere EXCEPT where the right element was
    itself produced by this same pass (aab -> [ab? no: a, ab] keeps
    (a, ab), not (a, b)) — i.e. scanning the output must find no
    adjacent (a, b) with both sides untouched originals."""
    from mini_log_lakehouse_spark.operators.vocab import _merge_pair

    syms = list(word)
    for a, b in merges:
        out = _merge_pair(syms, a, b)
        assert "".join(out) == "".join(syms)
        merged = a + b
        for x, y in zip(out, out[1:]):
            # a remaining adjacent (a, b) is only legal if one side is a
            # freshly merged token (equal to a+b but longer than a or b)
            if x == a and y == b:
                assert a == merged or b == merged
        syms = out


# --- funnel (funnels.py) -----------------------------------------------------

event_logs = st.lists(
    st.tuples(
        st.integers(1, 6),             # user
        st.integers(0, 40),            # minute
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=1,
    max_size=60,
)


@given(log=event_logs)
@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_funnel_matches_bruteforce(spark, log):
    import datetime

    from mini_log_lakehouse_spark.operators.funnels import (
        FUNNEL_STEPS,
        funnel_counts,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(minutes=m), t) for u, m, t in log
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["step"]: r["users_reached"]
        for r in funnel_counts(ev, FUNNEL_STEPS).collect()
    }
    # brute force: first ts per (user, step), strict ordering
    firsts: dict[tuple[int, str], datetime.datetime] = {}
    for u, ts, t in rows:
        k = (u, t)
        if k not in firsts or ts < firsts[k]:
            firsts[k] = ts
    expect = dict.fromkeys(FUNNEL_STEPS, 0)
    for u in {u for u, _, _ in rows}:
        prev = None
        for step in FUNNEL_STEPS:
            t = firsts.get((u, step))
            if t is None or (prev is not None and t <= prev):
                break
            expect[step] += 1
            prev = t
    assert got == expect, (got, expect)


# --- mixture + domain cap (sampling.py) ---------------------------------------

mix_corpora = st.lists(
    st.tuples(st.integers(0, 5000), st.sampled_from(["en", "fr", "zh"])),
    min_size=3,
    max_size=50,
    unique_by=lambda t: t[0],
)


@given(corpus=mix_corpora)
@settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_mixture_targets_respect_budget_and_weights(spark, corpus):
    """For arbitrary language distributions: per-language sample counts
    equal min(target, available), targets sum to <= MIXTURE_BUDGET, and
    membership is the deterministic salted-hash rank prefix."""
    import math
    from unittest import mock

    from mini_log_lakehouse_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, lang, "t") for i, lang in corpus], ["doc_id", "lang", "text"]
    )
    with mock.patch.object(
        sampling, "load_table", lambda _s, _d, _n: docs
    ):
        rows = sampling.doc_lang_mixture(spark, "ignored").collect()
    n_by_lang: dict[str, int] = {}
    for _i, lang in corpus:
        n_by_lang[lang] = n_by_lang.get(lang, 0) + 1
    w = {l: math.floor(math.sqrt(n) * 1_000_000) for l, n in n_by_lang.items()}
    total = sum(w.values())
    expect_target = {
        l: (sampling.MIXTURE_BUDGET * w[l]) // total for l in n_by_lang
    }
    got_by_lang: dict[str, int] = {}
    for r in rows:
        got_by_lang[r["lang"]] = got_by_lang.get(r["lang"], 0) + 1
        assert r["target_docs"] == expect_target[r["lang"]]
    for lang, n in n_by_lang.items():
        assert got_by_lang.get(lang, 0) == min(expect_target[lang], n)
    assert sum(expect_target.values()) <= sampling.MIXTURE_BUDGET


def test_training_shards_cover_corpus_and_are_deterministic(spark, tmp_path):
    """write_training_shards: shards partition the corpus exactly, the
    concatenated shard order equals the salted-hash global order, and a
    rewrite reproduces identical membership."""
    from mini_log_lakehouse_spark.operators.sampling import (
        _hash_bucket,
        write_training_shards,
    )
    from mini_log_lakehouse_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, p1, n_shards=4)
    write_training_shards(docs, p2, n_shards=4)
    back = spark.read.parquet(p1)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in docs.collect()
    }
    # global order: reading shard dirs 0..N-1 yields the salted order
    import os

    def shard_dirs(p):
        return sorted(
            (d for d in os.listdir(p) if d.startswith("_shard=")),
            key=lambda d: int(d.split("=")[1]),
        )

    dirs1 = shard_dirs(p1)
    assert [int(d.split("=")[1]) for d in dirs1] == [0, 1, 2, 3]
    order = []
    for d in dirs1:
        rows = spark.read.parquet(os.path.join(p1, d)).collect()
        order.extend(r["doc_id"] for r in rows)
    expected = [
        r["doc_id"]
        for r in docs.select(
            "doc_id", _hash_bucket(F.col("doc_id"), "epoch0:", 1 << 30).alias("k")
        )
        .orderBy("k", "doc_id")
        .collect()
    ]
    assert order == expected
    # determinism across rewrites: same membership and order per shard
    for d in dirs1:
        a = [r["doc_id"] for r in spark.read.parquet(os.path.join(p1, d)).collect()]
        b = [r["doc_id"] for r in spark.read.parquet(os.path.join(p2, d)).collect()]
        assert a == b
