"""Property tests: vector column expressions vs a numpy oracle, and
text fingerprints vs an independent pure-Python fold — randomized
inputs via hypothesis (SURVEY.md §5.2)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import vector as V

finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)
vec_pairs = st.integers(min_value=1, max_value=16).flatmap(
    lambda d: st.tuples(
        st.lists(finite, min_size=d, max_size=d),
        st.lists(finite, min_size=d, max_size=d),
    )
)


@settings(max_examples=25, deadline=None)
@given(pairs=st.lists(vec_pairs, min_size=1, max_size=10))
def test_vector_math_matches_numpy(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "id long, a array<float>, b array<float>",
    )
    rows = (
        df.select(
            "id",
            V.dot("a", "b").alias("dot"),
            V.l2_norm("a").alias("na"),
            V.l2_distance("a", "b").alias("dist"),
        )
        .orderBy("id")
        .collect()
    )
    for r, (a, b) in zip(rows, pairs):
        # float32 storage: numpy oracle uses the same f32-rounded inputs
        a32 = np.array(a, dtype=np.float32).astype(np.float64)
        b32 = np.array(b, dtype=np.float32).astype(np.float64)
        assert r.dot == pytest.approx(float(a32 @ b32), rel=1e-9, abs=1e-9)
        assert r.na == pytest.approx(float(np.sqrt(a32 @ a32)), rel=1e-9, abs=1e-9)
        assert r.dist == pytest.approx(
            float(np.sqrt(((a32 - b32) ** 2).sum())), rel=1e-9, abs=1e-9
        )


def test_cosine_identities(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    rows = emb.select(
        V.cosine("embedding", "embedding").alias("self_cos"),
        V.l2_norm(V.l2_normalize("embedding")).alias("unit_norm"),
    ).collect()
    for r in rows:
        assert r.self_cos == pytest.approx(1.0, abs=1e-12)
        assert r.unit_norm == pytest.approx(1.0, abs=1e-12)


def _py_fingerprint(text: str) -> int:
    # independent fold (not the Spark expression): same declared spec
    fp = 0
    for w in text.split():
        if w:
            fp = (fp * 31 + len(w) * 17 + ord(w[0])) % 1_000_000_007
    return fp


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("abcdef ")), min_size=0, max_size=80),
        min_size=1,
        max_size=10,
    )
)
def test_fingerprint_matches_python(spark, texts):
    from document_vector_indexer_spark.operators.textanalysis import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select("id", fingerprint(F.col("text")).alias("fp")).orderBy("id").collect()
    for r, t in zip(rows, texts):
        assert r.fp == _py_fingerprint(t), repr(t)


def test_simhash_expression_and_df_agree(spark):
    """The column-expression SimHash and the one-pass DataFrame SimHash
    implement the same spec — they must agree bit for bit."""
    from document_vector_indexer_spark.operators.dedup import simhash, simhash_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    expr = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", simhash(F.col("text")).alias("sh")).collect()
    }
    dfed = {r.doc_id: r.simhash for r in simhash_df(docs).collect()}
    assert expr == dfed


def test_embed_portable_contract_and_plan(spark):
    """embed_portable_tf shares the model tier's dim/count contract
    (embedding.validate_dim) and its components are exact vocab term
    frequencies (pure-Python cross-check); the plan is pure map-side —
    zero Exchanges, zero Python workers."""
    from document_vector_indexer_spark.operators.embedding import (
        PORTABLE_VOCAB,
        embed_portable_tf,
        validate_dim,
    )
    from tests.parity_util import formatted_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    emb = embed_portable_tf(docs)
    # shared dim/count contract (reference index_documents.py:181-185)
    assert validate_dim(emb, dim=len(PORTABLE_VOCAB)).count() == 0
    assert emb.count() == docs.count()

    for r in emb.limit(8).collect():
        toks = r.text.split()
        expect = [float(toks.count(w)) for w in PORTABLE_VOCAB]
        assert list(r.embedding) == expect, r.doc_id

    plan = formatted_plan(spark, emb)
    assert "Exchange" not in plan, "portable embedder must not shuffle"
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_embed_portable_null_text_yields_zero_vector(spark):
    """Review finding (r5): NULL text must embed as the zero vector
    (16 zero-tf rows in the exploded query), matching the oracle's
    LEFT JOIN/coalesce(0) — not vanish via posexplode(NULL)."""
    from document_vector_indexer_spark.operators.embedding import (
        PORTABLE_VOCAB,
        embed_portable_tf,
    )

    df = spark.createDataFrame(
        [(1, "join the hash join"), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: list(r.embedding)
            for r in embed_portable_tf(df).collect()}
    assert rows[2] == [0.0] * len(PORTABLE_VOCAB)
    assert rows[1][PORTABLE_VOCAB.index("join")] == 2.0
