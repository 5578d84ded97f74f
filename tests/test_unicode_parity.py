"""Cross-engine oracle parity on a unicode-hostile corpus.

The driver's hash gate runs on the generated testdata, whose text is
ASCII-ish — it can never catch a Spark/DuckDB divergence that only
shows on hard text. The two engines disagree by construction at the
string-representation level (Java strings are UTF-16 code units,
DuckDB is UTF-8 bytes), so every character-level operator — BPE
character splits, shingle hashing, n-gram extraction, length counts,
regex tokenization, the pure-python CSV/JSONL/ZIP codecs — is exposed
to a silent parity break on astral-plane characters (emoji are
surrogate PAIRS in UTF-16), combining marks, RTL scripts, zero-width
joiners, and CJK.

This suite runs EVERY documents-driven registry entry through the
exact driver-style compare (row count + columns + exact values)
against its DuckDB oracle on a corpus built from precisely those
shapes, including exact duplicates of multi-script docs so the dedup
paths exercise non-trivial classes. A failure here means the hash
gate's green on the driver corpus is narrower than it looks.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

SOURCE_SF_DIR = "/root/testdata/sf0.001"

#: valid UTF-8 throughout (lone surrogates can't round-trip Arrow);
#: docs 14/15 are exact duplicates of 0/2 so dedup sees real classes
HOSTILE_TEXTS = (
    "the quick brown fox jumps over the lazy dog",
    "naïve café résumé coöperate façade",
    "日本語のテキスト処理は難しいが重要である 漢字 かな カナ",
    "emoji test 🤖🚀 family 👨‍👩‍👧‍👦 flags 🇺🇸🇯🇵 skin 👍🏽 done",
    "مرحبا بالعالم هذا نص عربي من اليمين إلى اليسار",
    "עברית טקסט מימין לשמאל עם מילים",
    "combining áéíóú marks ñ",
    "zero\u200bwidth\u200bspace and non\u00a0breaking\u00a0space",  # ZWSP + NBSP
    "Ω≈ç√∫˜µ≤≥÷ mathematical ∑∏π∂∆ symbols",
    "ᚠᚢᚦᚨᚱᚲ runes and ༀ tibetan ॐ devanagari क्षत्रिय",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕄𝕒𝕥𝕙 𝒮𝒸𝓇𝒾𝓅𝓉 astral letters",
    "mixed 日本 english العربية and 🤖 all together now",
    "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",
    "tab\tseparated\tand\nnewline embedded text",
    "the quick brown fox jumps over the lazy dog",
    "日本語のテキスト処理は難しいが重要である 漢字 かな カナ",
)

#: every registry entry that reads the documents table (character-level
#: or codec paths) — kept as an explicit derivation, not a frozen list,
#: so new doc operators are covered the round they land
UNICODE_ENTRIES = sorted(
    n
    for n in ORACLES
    if n.startswith(
        ("doc_", "dedup_", "documents_", "benchmark_", "incremental_minhash",
         "incremental_dedup")
    )
    or n in ("source_lang_drift", "multimodal_byte_features")
)


@pytest.fixture(scope="session")
def uni_sf_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_unicode"))
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "embeddings",
    ):
        shutil.copy(
            os.path.join(SOURCE_SF_DIR, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    rows = [
        {
            "doc_id": i,
            "text": s,
            "lang": ("en", "ja", "ar", "he", "xx")[i % 5],
            "source": f"src{i % 3}",
            "n_chars": len(s),
        }
        for i, s in enumerate(HOSTILE_TEXTS)
    ]
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))
    return out


def test_hostile_corpus_is_actually_hostile():
    joined = "".join(HOSTILE_TEXTS)
    assert any(ord(c) > 0xFFFF for c in joined), "no astral-plane chars"
    assert any(0x0590 <= ord(c) <= 0x06FF for c in joined), "no RTL"
    assert "\u200b" in joined and "\u00a0" in joined, "no ZW/NBSP"
    assert len(HOSTILE_TEXTS) != len(set(HOSTILE_TEXTS)), "no exact dups"


@pytest.mark.parametrize("name", UNICODE_ENTRIES)
def test_doc_entry_matches_oracle_on_unicode(spark, uni_sf_dir, name):
    compare(QUERIES[name](spark, uni_sf_dir), ORACLES[name], uni_sf_dir, name)
