"""Pure column-expression libraries (no UDFs, JVM-side, codegen-friendly)."""

from document_vector_indexer_spark.functions import text, vector  # noqa: F401
