"""Golden + property tests: Spark chunking expressions vs the
pure-Python reference-semantics oracle, on literal fixtures that
exercise newlines, punctuation, NBSP, and boundary geometry the
driver corpus lacks (FIXTURES.md §B)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX
from document_vector_indexer_spark.operators.chunking import chunk_array
from tests import reference_semantics as REF

FIXTURES = [
    "",
    "   ",
    "plain text with no structure at all",
    "one.two",
    "First sentence. Second one! Third?   Fourth ends without punct",
    "Tabs\t\tand  runs   of\tspaces with NBSP",
    "para one line a\npara one line b\n\npara two\n\n\n\n\npara three after many blanks",
    "  leading and trailing whitespace  \n\n  second para  ",
    "Sentence one is fairly long and wordy. Two! Three? Four. " * 8,
    "abcdefghij" * 25,  # exact multiples for fixed windows
    "x" * 99,
    "x" * 100,
    "x" * 101,
    "a. " + "b" * 300 + ". c! d? e.",
    "word " * 120,
    ". . . !",
    "\n\n\n\n",
    "ends exactly at boundary!" * 10,
]

GEOMETRIES = [(100, 20), (100, 0), (50, 49), (1, 0), (1200, 200), (200, 150)]


def _run_chunk_expr(spark, texts: list[str], strategy: str, chunk_size: int, overlap: int) -> list[list[str]]:
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    arr = chunk_array(F.col("text"), strategy, chunk_size, overlap)
    rows = df.select("id", arr.alias("chunks")).orderBy("id").collect()
    return [r.chunks for r in rows]


@pytest.mark.parametrize("chunk_size,overlap", GEOMETRIES)
def test_fixed_windows_golden(spark, chunk_size, overlap):
    got = _run_chunk_expr(spark, FIXTURES, "fixed", chunk_size, overlap)
    for text, chunks in zip(FIXTURES, got):
        assert chunks == REF.fixed_windows(text, chunk_size, overlap), (
            f"fixed({chunk_size},{overlap}) on {text[:40]!r}"
        )


@pytest.mark.parametrize("chunk_size", [1200, 200, 250, 300, 10])
def test_sentence_grouping_golden(spark, chunk_size):
    got = _run_chunk_expr(spark, FIXTURES, "sentence", chunk_size, 0)
    for text, chunks in zip(FIXTURES, got):
        want = REF.group_sentences(REF.split_sentences(text), chunk_size)
        assert chunks == want, f"sentence({chunk_size}) on {text[:40]!r}"


def test_paragraph_golden(spark):
    got = _run_chunk_expr(spark, FIXTURES, "paragraph", 0, 0)
    for text, chunks in zip(FIXTURES, got):
        assert chunks == REF.split_paragraphs(text), f"paragraph on {text[:40]!r}"


def test_clean_text_golden(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], "id long, text string"
    )
    rows = df.select("id", TX.clean_text("text").alias("c")).orderBy("id").collect()
    for text, row in zip(FIXTURES, rows):
        assert row.c == REF.clean_text(text), f"clean on {text[:40]!r}"


# --- properties (reference invariants, SURVEY.md §5.2) ---------------------

text_strategy = st.text(
    alphabet=st.sampled_from(list("ab .!?\n\tx") + [" "]), max_size=400
)


@settings(max_examples=30, deadline=None)
@given(texts=st.lists(text_strategy, min_size=1, max_size=30))
def test_fixed_windows_property(spark, texts):
    got = _run_chunk_expr(spark, texts, "fixed", 37, 11)
    for text, chunks in zip(texts, got):
        want = REF.fixed_windows(text, 37, 11)
        assert chunks == want
        assert all(c == c.strip() and c for c in chunks)


@settings(max_examples=30, deadline=None)
@given(texts=st.lists(text_strategy, min_size=1, max_size=30))
def test_sentence_grouping_property(spark, texts):
    got = _run_chunk_expr(spark, texts, "sentence", 43, 0)
    for text, chunks in zip(texts, got):
        assert chunks == REF.group_sentences(REF.split_sentences(text), 43)


def test_unicode_codepoint_parity(spark):
    """Spark's UTF8String length/substring count CODE POINTS (not
    UTF-16 code units like java.lang.String), so chunk boundaries match
    Python exactly even for astral-plane characters — verified, not
    assumed (functions/text.py documents this)."""
    astral = "ab" + "\U0001d11e" * 3 + "cd" * 30  # musical symbol G clef
    bmp = "ab" + "中" * 3 + "cd" * 30
    for text in (astral, bmp):
        [chunks] = _run_chunk_expr(spark, [text], "fixed", 10, 2)
        assert chunks == REF.fixed_windows(text, 10, 2), repr(text[:12])


def test_overlap_invariant(spark):
    """Mid-document consecutive fixed chunks of whitespace-free text
    share exactly `overlap` chars (index_documents.py:100)."""
    text = "abcdefghij" * 40
    [chunks] = _run_chunk_expr(spark, [text], "fixed", 100, 30)
    for a, b in zip(chunks, chunks[1:]):
        assert a[-30:] == b[:30]
