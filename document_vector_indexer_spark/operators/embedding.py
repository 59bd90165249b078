"""Embedding operators.

The reference embeds chunks through a remote API in sequential batches
of 32 with in-call retry/backoff and count/dim validation
(/root/reference/index_documents.py:142-194,291-306). Spark-natively:

- ``embed_local`` — default, offline, deterministic: MLlib
  Tokenizer -> HashingTF -> IDF, bridged back to ``array<float>``.
  Distributed model fit (one pass for document frequencies) +
  distributed transform; no network, so tests and the oracle driver
  never depend on an external service.
- ``embed_api_map_in_pandas`` — the parity-mode operator: batches rows
  per Arrow batch inside ``mapInPandas`` and calls a pluggable
  ``embed_fn`` with the reference's exact retry/validation contract
  (1 output per input in order, every vector exactly ``dim`` floats,
  exponential backoff capped at 16 s, 5 attempts). The default
  ``embed_fn`` is a deterministic local fake — this container has no
  network/model libs, so the remote call itself stays stubbed; the
  Spark-side plumbing (batching, retry, validation, schema) is real
  and tested.

Retry lives *inside* the UDF because Spark task retry is too coarse:
a task failure would re-embed an entire partition (SURVEY.md §4.1).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import vector as V

DEFAULT_DIM = 64


def fit_local_embedder(
    df: DataFrame, text_col: str = "chunk_text", dim: int = DEFAULT_DIM
):
    """Fit the TF-IDF embedding model (Tokenizer -> HashingTF -> IDF)
    on a corpus. Returns a PipelineModel that can be persisted with
    ``model.save(path)`` and reloaded with ``PipelineModel.load`` — the
    query path must embed with the SAME fitted model the index used.

    Quality note: ``dim`` doubles as HashingTF's feature count, so hash
    collisions bound retrieval quality — at dim<=64 unrelated terms
    collide noticeably (observed: a cooking doc outranking the on-topic
    doc at dim 32). Use >=256 for real corpora, or swap in a learned
    embedder via embed_api_map_in_pandas for semantic similarity."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_words"),
            HashingTF(inputCol="_words", outputCol="_tf", numFeatures=dim),
            IDF(inputCol="_tf", outputCol="_emb"),
        ]
    )
    return pipe.fit(df)


def embed_with_model(
    model, df: DataFrame, out_col: str = "embedding"
) -> DataFrame:
    """Apply a fitted embedding PipelineModel -> array<float> column."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df)
    return out.withColumn(
        out_col, vector_to_array(F.col("_emb")).cast("array<float>")
    ).drop("_words", "_tf", "_emb")


def embed_local(
    df: DataFrame,
    text_col: str = "chunk_text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """TF-IDF embeddings as ``array<float>`` of fixed ``dim`` (fit +
    transform in one step; use fit_local_embedder/embed_with_model when
    the model must be persisted for a later query path)."""
    return embed_with_model(
        fit_local_embedder(df, text_col=text_col, dim=dim), df, out_col=out_col
    )


def fit_word2vec_embedder(
    df: DataFrame,
    text_col: str = "chunk_text",
    dim: int = DEFAULT_DIM,
    seed: int = 42,
    min_count: int = 1,
):
    """Seeded Word2Vec pipeline (Tokenizer -> Word2Vec): dense learned
    embeddings at exactly ``dim`` — no hashing collisions, and
    out-of-corpus query terms degrade gracefully (averaged known
    vectors) instead of colliding. Heavier to fit than TF-IDF (iterative
    distributed SGD) but dimension-for-dimension better retrieval on
    real text; same persistable PipelineModel contract."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import Tokenizer, Word2Vec

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_words"),
            Word2Vec(
                inputCol="_words",
                outputCol="_emb",
                vectorSize=dim,
                seed=seed,
                minCount=min_count,
            ),
        ]
    )
    return pipe.fit(df)


# Pinned vocabulary for the portable embedder: literal in the Spark
# plan AND in the DuckDB oracle (the IVF/PQ pinned-literal trick
# applied to the embedding tier, R9). 16 corpus-domain words -> dim 16.
PORTABLE_VOCAB: tuple[str, ...] = (
    "join", "hash", "row", "batch", "scan", "column", "filter", "merge",
    "order", "vector", "data", "table", "key", "stream", "window", "query",
)


def embed_portable_tf(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    vocab: Sequence[str] = PORTABLE_VOCAB,
) -> DataFrame:
    """Library-free deterministic embedder: component ``i`` is the
    exact term frequency of pinned ``vocab[i]`` (cast float — the
    repo's embedding-column convention). Integer counts over literal
    words reproduce bit-for-bit in any engine, so this is the ORACLED
    sibling of the model-backed tiers (``embed_local`` MLlib TF-IDF,
    ``embed_api_map_in_pandas``), sharing their dim/count contract
    (``validate_dim`` passes vacuously; row count preserved).

    Scale shape: ONE ``aggregate`` fold over the token array per row —
    the token split is the HOF *input* (evaluated once per row, not
    per element; the lambda body references only the accumulator, the
    current word, and literals, so the lambda-boundary CSE trap does
    not apply). Pure map-side: zero shuffles, zero Python, no fitted
    state to broadcast."""
    from document_vector_indexer_spark.functions import text as TX

    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    zeros = F.array_repeat(F.lit(0).cast("long"), len(vocab))
    # NULL text -> empty token array -> all-zero embedding (NOT a NULL
    # vector): keeps the dim contract and matches the oracle's
    # LEFT-JOIN/coalesce-0 shape, which emits zero rows for every doc
    counts = F.aggregate(
        F.coalesce(
            TX.word_tokens(F.col(text_col)), F.array().cast("array<string>")
        ),
        zeros,
        lambda acc, w: F.zip_with(
            acc,
            vocab_arr,
            lambda c, v: c + F.when(w == v, 1).otherwise(0),
        ),
    )
    return df.withColumn(
        out_col, F.transform(counts, lambda c: c.cast("float"))
    )


def deterministic_fake_embed(texts: Sequence[str], dim: int) -> list[list[float]]:
    """Offline stand-in for the remote embedding API: a seeded hash of
    the text drives a tiny LCG per component. Deterministic, so
    pipeline outputs are stable across runs/retries."""
    out: list[list[float]] = []
    for t in texts:
        state = (len(t) * 2654435761 + sum(ord(c) for c in t[:64])) % (2**31 - 1) or 1
        vec = []
        for _ in range(dim):
            state = (state * 48271) % (2**31 - 1)
            vec.append((state / (2**31 - 1)) * 2.0 - 1.0)
        out.append(vec)
    return out


def embed_api_map_in_pandas(
    df: DataFrame,
    text_col: str = "chunk_text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    batch_size: int = 32,
    max_retries: int = 5,
    embed_fn: Callable[[Sequence[str], int], list[list[float]]] | None = None,
    sleep_fn: Callable[[float], None] | None = None,
) -> DataFrame:
    """Arrow-batched embedding with the reference's retry/validation
    contract. ``embed_fn(texts, dim) -> vectors`` is the pluggable
    remote call; defaults to the deterministic local fake. ``sleep_fn``
    injects the backoff sleep (tests pass a no-op); production uses
    ``time.sleep``."""
    import pandas as pd

    from pyspark.sql import types as T

    fn = embed_fn or deterministic_fake_embed
    do_sleep = sleep_fn or time.sleep
    # NB: StructType.add mutates in place — never call it on df.schema.
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts = pdf[text_col].tolist()
            vectors: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                chunk = texts[i : i + batch_size]
                last_err: Exception | None = None
                for attempt in range(max_retries):
                    try:
                        got = fn(chunk, dim)
                        if len(got) != len(chunk):
                            raise RuntimeError(
                                f"embedding count mismatch: {len(got)} != {len(chunk)}"
                            )
                        bad = [len(v) for v in got if len(v) != dim]
                        if bad:
                            raise RuntimeError(
                                f"embedding dim mismatch: expected {dim}, got {bad[:5]}"
                            )
                        vectors.extend(got)
                        break
                    except Exception as e:  # noqa: BLE001 — mirror reference retry-all
                        last_err = e
                        # unconditional exponential backoff after every
                        # failure (1,2,4,...,16 s) — the reference's
                        # sleep(min(2**attempt, 16)) contract exactly
                        # (index_documents.py:191); an earlier revision
                        # skipped the first sleep (round-2 ADVICE)
                        do_sleep(min(2**attempt, 16))
                else:
                    raise RuntimeError(
                        f"embedding failed after {max_retries} retries: {last_err}"
                    )
            pdf[out_col] = vectors
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def validate_dim(df: DataFrame, vec_col: str = "embedding", dim: int = DEFAULT_DIM) -> DataFrame:
    """Relational form of the reference's dim check
    (index_documents.py:181-185): rows failing the contract."""
    return df.filter(~V.dim_check(F.col(vec_col), dim))
