"""Document chunking as a distributed DataFrame operator.

Re-expresses the reference's three strategies
(``/root/reference/index_documents.py:67-134``: fixed / sentence /
paragraph) Spark-first: per-document arrays built with pure column
expressions (functions.text), then ``posexplode`` into a chunk table.

Scale design:
- The chunk array is built row-local (no shuffle); ``posexplode`` is a
  narrow transformation. The only shuffle in the whole chunking path is
  the optional deterministic-id window at the end.
- Chunk ordinal (``chunk_pos``) comes from ``posexplode`` — free and
  deterministic. A *global* dense id (the reference's SERIAL column,
  index_documents.py:217) requires a total order; we derive it with
  ``operators.ranking.global_id`` over ``(doc order, chunk_pos)`` —
  the sample-boundaries two-pass form, never an empty-partitionBy
  window (single-task at scale), only applied when the caller asks
  (``with_global_id=True``). Never ``monotonically_increasing_id`` in
  checked output (unstable across retries/partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX

STRATEGIES = ("fixed", "sentence", "paragraph")


def chunk_array(
    text_col: Column | str,
    strategy: str,
    chunk_size: int = 1200,
    overlap: int = 200,
) -> Column:
    """array<string> of chunks for one document's text column.

    Dispatch mirrors ``split_to_chunks`` (index_documents.py:106-134),
    including its parameter validation (index_documents.py:83-86) and
    unknown-strategy error (index_documents.py:134).
    """
    if strategy == "paragraph":
        return TX.split_paragraphs(text_col)
    if strategy == "sentence":
        return TX.group_sentences(TX.split_sentences(text_col), chunk_size)
    if strategy == "fixed":
        return TX.fixed_windows(text_col, chunk_size, overlap)
    raise ValueError(f"Unknown strategy: {strategy}")


def chunk_documents(
    df: DataFrame,
    strategy: str = "fixed",
    chunk_size: int = 1200,
    overlap: int = 200,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    with_global_id: bool = False,
) -> DataFrame:
    """documents -> chunk table ``(id_cols..., chunk_pos, chunk_text,
    split_strategy)`` with one row per chunk, document order preserved
    in ``chunk_pos`` (0-based).
    """
    arr = chunk_array(F.col(text_col), strategy, chunk_size, overlap)
    out = (
        df.select(*id_cols, F.posexplode(arr).alias("chunk_pos", "chunk_text"))
        .withColumn("split_strategy", F.lit(strategy))
    )
    if with_global_id:
        from document_vector_indexer_spark.operators.ranking import global_id

        out = global_id(out, [*id_cols, "chunk_pos"], "id")
        out = out.withColumn("id", F.col("id").cast("long"))
    return out
