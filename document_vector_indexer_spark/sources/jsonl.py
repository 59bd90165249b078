"""JSONL source/sink — the interchange format of LLM corpus tooling.

The reference ingests PDF/DOCX files and exports to Postgres
(index_documents.py:38-55, 198-249); real pretraining corpora move as
newline-delimited JSON. Spark's native json reader/writer is fully
distributed (one file per partition on write, splittable on read when
uncompressed), so both directions scale with the cluster.

Reads always take an EXPLICIT schema (io.SCHEMAS policy — no inference
in core: schema inference is a full extra pass over 100 TB and can
mis-type sparse fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as newline-delimited JSON (one object per row).
    Spark JSON output is lossless for string/number/array/struct
    columns (newlines and quotes inside strings are escaped)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.
    ``mode=FAILFAST`` so corrupt lines surface instead of silently
    becoming nulls (flip to PERMISSIVE + corrupt-record column for
    salvage pipelines)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)
