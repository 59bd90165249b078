"""CSV source/sink — the remaining interchange format (parquet, JSONL,
binary docs, and the pgvector sink cover the rest of the surface).

CSV is the format where corpus text actually breaks round-trips:
embedded newlines, quotes, and delimiter characters inside a ``text``
column. The writer therefore always quotes-and-escapes (Spark's
univocity writer doubles quote chars per RFC 4180), and the reader
always runs ``multiLine`` so quoted embedded newlines reassemble —
without it, a single document containing ``\\n`` silently becomes two
corrupt rows.

Scale note: ``multiLine`` CSV is NOT splittable (a file must be parsed
as one unit because record boundaries can sit inside quotes), so the
write side controls parallelism — one file per partition, each sized
by the upstream ``repartition``. That is the standard trade-off for
text-bearing CSV at scale; for machine-generated CSV known to be
newline-free, ``multi_line=False`` restores splittable reads.

Reads take an EXPLICIT schema (io.SCHEMAS policy — no inference in
core: inference is a full extra pass over 100 TB and mis-types sparse
fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as RFC-4180-quoted CSV with a header row. Embedded
    quotes are doubled, embedded newlines/delimiters ride inside
    quotes; nulls are distinguishable from empty strings via the
    explicit ``nullValue`` sentinel.

    Known sentinel collision (pinned in tests/test_io_schemas.py): a
    cell whose literal content IS the sentinel (``\\N``) reads back as
    NULL — the univocity parser applies ``nullValue`` after
    unquoting, so quoting cannot protect it. This is inherent to
    sentinel-based CSV (Hive/MySQL ``\\N`` behaves identically); data
    that may legitimately contain the sentinel belongs in JSONL or
    parquet, not CSV."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')  # RFC 4180 doubled quotes, not backslash
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multi_line: bool = True,
) -> DataFrame:
    """Read header CSV with an explicit schema. ``multiLine`` on by
    default so quoted embedded newlines round-trip; ``FAILFAST`` so
    malformed rows surface instead of silently nulling out."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", str(multi_line).lower())
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("mode", "FAILFAST")
        .csv(path)
    )
