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
