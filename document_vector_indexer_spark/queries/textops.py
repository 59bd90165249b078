"""Text-pipeline queries: the reference's clean/chunk surface, oracle-checked.

The flagship (``flagship_chunk_topk``) is the reference's whole reason
to exist done Spark-natively: clean (index_documents.py:58-63) ->
fixed-overlap chunk (index_documents.py:79-103) -> chunk table ->
join back to documents -> top-k longest chunks per language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from document_vector_indexer_spark.functions import text as TX
from document_vector_indexer_spark.io import load_table
from document_vector_indexer_spark.operators.chunking import chunk_documents
from document_vector_indexer_spark.queries.base import QuerySpec

# Chunk geometry used by the oracle-checked chunk queries. The corpus
# documents are 78-540 chars, so the reference defaults (1200/200) would
# produce one chunk per doc; 180/30 exercises multi-window behavior.
CHUNK_SIZE = 180
OVERLAP = 30
STEP = CHUNK_SIZE - OVERLAP

# DuckDB fragment: the reference clean_text (index_documents.py:58-63).
# NOTE DuckDB regexp_replace needs the 'g' flag (Spark is global by default).
SQL_CLEAN = (
    "regexp_replace(regexp_replace(regexp_replace(replace({col}, chr(160), ' '),"
    " '[ \t]+', ' ', 'g'), '\\n{{3,}}', e'\\n\\n', 'g'), '^\\s+|\\s+$', '', 'g')"
)

# DuckDB CTE producing the fixed-overlap chunk table at (CHUNK_SIZE, OVERLAP):
# start positions 0, STEP, 2*STEP, ... up to the first window reaching the
# end (index_documents.py:91-103); strip each window, drop empties,
# re-index chunk_pos after the drop (posexplode parity).
SQL_FIXED_CHUNKS = f"""
cleaned AS (
  SELECT doc_id, lang, source, {SQL_CLEAN.format(col='text')} AS t
  FROM documents
),
wins AS (
  SELECT doc_id, lang, source, t,
         unnest(range(0, (CASE WHEN length(t) <= {CHUNK_SIZE} THEN 0
                ELSE CAST(ceil((length(t) - {CHUNK_SIZE}) / {STEP}.0) AS BIGINT)
                END) + 1)) * {STEP} AS win_start
  FROM cleaned
),
chunks0 AS (
  SELECT doc_id, lang, source, win_start,
         regexp_replace(substr(t, win_start + 1, {CHUNK_SIZE}), '^\\s+|\\s+$', '', 'g') AS chunk_text
  FROM wins
),
chunks AS (
  SELECT doc_id, lang, source, chunk_text,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY win_start) - 1 AS INTEGER) AS chunk_pos
  FROM chunks0 WHERE chunk_text <> ''
)
"""


def _chunks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", TX.clean_text("text")
    )
    return chunk_documents(
        docs,
        strategy="fixed",
        chunk_size=CHUNK_SIZE,
        overlap=OVERLAP,
        id_cols=("doc_id", "lang", "source"),
    )


def flagship_chunk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 longest chunks per language; deterministic tiebreaks."""
    chunks = _chunks_df(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.length("chunk_text").desc(), F.col("doc_id"), F.col("chunk_pos")
    )
    return (
        chunks.withColumn("chunk_chars", F.length("chunk_text").cast("long"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "doc_id", "chunk_pos", "chunk_text", "chunk_chars", "rk")
    )


SQL_FLAGSHIP = f"""
WITH {SQL_FIXED_CHUNKS}
SELECT lang, doc_id, chunk_pos, chunk_text,
       CAST(length(chunk_text) AS BIGINT) AS chunk_chars,
       CAST(row_number() OVER (PARTITION BY lang
            ORDER BY length(chunk_text) DESC, doc_id, chunk_pos) AS BIGINT) AS rk
FROM chunks
QUALIFY rk <= 5
"""


def chunk_fixed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) chunk counts + char totals over the full chunk
    table — verifies the whole fixed-chunker output, not just top-k."""
    chunks = _chunks_df(spark, sf_dir)
    return (
        chunks.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.length("chunk_text")).cast("long").alias("total_chars"),
            F.max(F.length("chunk_text")).cast("long").alias("max_chars"),
            F.max("chunk_pos").cast("long").alias("max_pos"),
        )
        .select("lang", "source", "n_chunks", "total_chars", "max_chars", "max_pos")
    )


SQL_CHUNK_FIXED_STATS = f"""
WITH {SQL_FIXED_CHUNKS}
SELECT lang, source, count(*) AS n_chunks,
       CAST(sum(length(chunk_text)) AS BIGINT) AS total_chars,
       CAST(max(length(chunk_text)) AS BIGINT) AS max_chars,
       CAST(max(chunk_pos) AS BIGINT) AS max_pos
FROM chunks
GROUP BY lang, source
"""


QUERIES: dict[str, QuerySpec] = {
    "flagship_chunk_topk": QuerySpec(
        flagship_chunk_topk,
        SQL_FLAGSHIP,
        "clean -> fixed-overlap chunk -> explode -> top-5 longest per lang",
    ),
    "q_chunk_fixed": QuerySpec(
        chunk_fixed_stats,
        SQL_CHUNK_FIXED_STATS,
        "full fixed-chunker output verified via per-(lang,source) aggregates",
    ),
}
