"""Literal-fixture tests for text-analysis operators: the corpus is
same-vocabulary word soup, so behavioral richness (multilingual text,
real PII, punctuation) must come from unit fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_vector_indexer_spark.operators import textanalysis as TA


def _one(spark, text: str, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("out")).collect()[0].out


@pytest.mark.parametrize(
    "text,expected",
    [
        ("the cat sat on the mat and it is fine to nap", "en"),
        ("der hund und die katze das ist gut und schön", "de"),
        ("le chat et la souris est dans les jardins", "fr"),
        ("el perro y los gatos es un animal", "es"),
        ("这是一个中文句子 with some english words", "zh"),
        ("日本語のテキストです", "zh"),  # CJK range folds JP into the CJK bucket
        ("completely neutral wordsoup alpha beta gamma", "en"),
    ],
)
def test_lang_id_fixtures(spark, text, expected):
    assert _one(spark, text, TA.lang_id(F.col("text"))) == expected


@pytest.mark.parametrize(
    "text,expected",
    [
        ("write to a.b+tag@sub.example.co.uk today", "write to [EMAIL] today"),
        ("ssn 123-45-6789 leaked", "ssn [SSN] leaked"),
        ("host 10.255.0.17 down", "host [IPV4] down"),
        ("call +1 (555) 123-4567 now", "call [PHONE] now"),
        ("nothing sensitive here", "nothing sensitive here"),
        (
            "mail x@y.io ssn 111-22-3333 ip 1.2.3.4 tel 555-123-9876",
            "mail [EMAIL] ssn [SSN] ip [IPV4] tel [PHONE]",
        ),
    ],
)
def test_redact_fixtures(spark, text, expected):
    assert _one(spark, text, TA.redact(F.col("text"))) == expected


def test_redaction_counts(spark):
    text = "a@b.co and c@d.org, ip 8.8.8.8, ssn 000-11-2222"
    counts = TA.redaction_counts(F.col("text"))
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(*[v.alias(k) for k, v in counts.items()]).collect()[0]
    assert (row.EMAIL, row.IPV4, row.SSN) == (2, 1, 1)


def test_quality_score_ordering(spark):
    """A fluent sentence must outscore single-word spam of equal length."""
    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river in the morning light of a clear day for a while longer")
    spam = "buy " * 33
    s_good = _one(spark, good, TA.quality_score(F.col("text")))
    s_spam = _one(spark, spam, TA.quality_score(F.col("text")))
    assert s_good > s_spam


def test_fingerprint_order_sensitivity(spark):
    a = _one(spark, "alpha beta gamma", TA.fingerprint(F.col("text")))
    b = _one(spark, "gamma beta alpha", TA.fingerprint(F.col("text")))
    assert a != b  # rolling hash is order-sensitive, unlike a bag hash


def test_dup_substring_stats_semantics(spark):
    """Short docs report zero windows (not a crash, not a missing row);
    identical long docs are 100% mutually duplicated."""
    from document_vector_indexer_spark.operators.dedup import dup_substring_stats

    df = spark.createDataFrame(
        [
            (1, "only three words"),
            (2, "a b c d e f g h i j"),
            (3, "a b c d e f g h i j"),
            (4, "k l m n o p q r s t"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_substring_stats(df, k=8).collect()}
    assert len(out) == 4
    assert out[1].n_windows == 0 and out[1].dup_ppm == 0
    assert out[2].n_windows == 3  # 10 words, k=8 -> 3 windows
    assert out[2].n_dup_windows == 3 and out[3].n_dup_windows == 3
    assert out[2].dup_ppm == 1_000_000
    assert out[4].n_dup_windows == 0  # unique doc untouched


def test_collocations_pmi_finds_the_collocation(spark):
    """A bigram that always co-occurs must outscore bigrams built from
    independent filler words."""
    from document_vector_indexer_spark.operators.textanalysis import (
        collocations_pmi,
    )

    rows = [
        (i, f"w{i % 3} new york w{(i + 1) % 5} w{(i + 2) % 7} w{i % 11}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = collocations_pmi(df, min_count=5, topk=5).collect()
    assert top, "no collocations found"
    assert (top[0].w1, top[0].w2) == ("new", "york"), [
        (r.w1, r.w2, r.pmi_q) for r in top
    ]
