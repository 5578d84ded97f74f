"""Repeated-span curation (operators/spans.py): boilerplate n-gram
mining oracles and the generic segment-dedup operator on multi-line
fixtures where it does real work."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators import spans


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("name", sorted(spans.ORACLES))
def test_span_queries_match_oracle(spark, sf_dir, con, name):
    got = sorted(map(tuple, spans.QUERIES[name](spark, sf_dir).collect()))
    want = sorted(map(tuple, con.execute(spans.ORACLES[name]).fetchall()))
    assert got == want


BOILER = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def lined_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text=f"alpha beta\n{BOILER}\ngamma delta"),
            Row(doc_id=1, text=f"{BOILER}\nunique line one"),
            Row(doc_id=2, text=f"unique line two\n{BOILER}\nepsilon"),
            Row(doc_id=3, text="entirely original\ncontent here"),
            Row(doc_id=4, text=BOILER),  # nothing survives
        ]
    )


def test_remove_duplicated_segments_drops_all_occurrences(lined_docs):
    out = {
        r.doc_id: r
        for r in spans.remove_duplicated_segments(lined_docs, min_count=2).collect()
    }
    assert out[0].text == "alpha beta\ngamma delta"
    assert out[0].n_segments == 3 and out[0].n_removed == 1
    assert out[1].text == "unique line one"
    assert out[2].text == "unique line two\nepsilon"
    assert out[3].text == "entirely original\ncontent here"
    assert out[3].n_removed == 0
    # the all-boilerplate doc stays as a row, with empty text
    assert out[4].text == "" and out[4].n_removed == 1


def test_remove_duplicated_segments_preserves_order_and_columns(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="z last\ncommon\na first"),
            Row(doc_id=1, lang="de", text="common"),
        ]
    )
    out = {r.doc_id: r for r in spans.remove_duplicated_segments(docs).collect()}
    # surviving segments keep original order (not sorted text order)
    assert out[0].text == "z last\na first"
    assert out[0].lang == "en" and out[1].lang == "de"


def test_remove_duplicated_segments_noop_without_delimiter(spark, sf_dir):
    from mini_log_lakehouse_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = spans.remove_duplicated_segments(docs)
    joined = docs.select("doc_id", F.col("text").alias("orig")).join(
        out.select("doc_id", "text"), "doc_id"
    )
    assert joined.count() == 50
    assert joined.filter("orig != text").count() == 0  # exact pass-through
    assert out.filter("n_removed != 0").count() == 0


def test_min_count_threshold(lined_docs):
    # with min_count=4 the 4x boilerplate line still goes, nothing else
    out = spans.remove_duplicated_segments(lined_docs, min_count=4)
    assert out.filter("n_removed > 0").count() == 4
    out5 = spans.remove_duplicated_segments(lined_docs, min_count=5)
    assert out5.filter("n_removed > 0").count() == 0


def test_frequent_ngrams_nonzero_share(spark, sf_dir):
    """The tuned (N_GRAM, MIN_DOC_FREQ) must stay non-degenerate on the
    driver corpus: some boilerplate grams exist at sf0.01+ — at the
    smallest smoke corpus just assert the query runs and counts are
    consistent."""
    rows = spans.doc_boilerplate_share(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.boilerplate_grams <= r.total_grams


def test_segment_dedup_delim_is_literal_not_regex(spark):
    """A regex-metachar delimiter ('.') must split on the literal dot —
    not on the any-char regex, which would shatter every document."""
    from mini_log_lakehouse_spark.operators.spans import remove_duplicated_segments

    docs = spark.createDataFrame(
        [(1, "keep me.shared part"), (2, "other text.shared part")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_segments(docs, delim=".", min_count=2).collect()
    }
    assert out[1]["n_segments"] == 2
    assert out[1]["n_removed"] == 1
    assert out[1]["text"] == "keep me"
    assert out[2]["text"] == "other text"


def test_substring_spans_known_overlap(spark):
    """Doc 20 embeds tokens w5..w16 of doc 10 (12 tokens): the 5
    consecutive 8-token windows of that span match on one diagonal, so
    n_matches = 5 and the reassembled longest span is exactly 12
    tokens; the unrelated doc 30 pairs with nobody."""
    d1 = " ".join(f"w{i}" for i in range(1, 21))
    d2 = "x1 x2 " + " ".join(f"w{i}" for i in range(5, 17)) + " y1 y2"
    d3 = " ".join(f"z{i}" for i in range(1, 21))
    docs = spark.createDataFrame(
        [Row(doc_id=10, text=d1), Row(doc_id=20, text=d2), Row(doc_id=30, text=d3)]
    )
    rows = spans.substring_spans(docs).collect()
    assert [tuple(r) for r in rows] == [(10, 20, 5, 12)]


def test_substring_spans_df_cap_drops_boilerplate(spark):
    """A window present in more docs than max_df is boilerplate and
    must not produce pairs (the quadratic guard is semantic, not just
    an optimization)."""
    body = " ".join(f"b{i}" for i in range(1, 9))
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"u{i} " + body) for i in range(3)]
    )
    assert spans.substring_spans(docs, max_df=2).collect() == []
    got = spans.substring_spans(docs, max_df=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 1), (0, 2), (1, 2)}


def test_substring_spans_short_docs_emit_nothing(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="a b c")]
    )
    assert spans.substring_spans(docs).collect() == []
