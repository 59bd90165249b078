"""Raw-document source: PDF/DOCX at scale (reference R1/R2,
/root/reference/index_documents.py:38-55).

Spark shape: ``spark.read.format("binaryFile")`` scans the files
distributed (path, modificationTime, length, content[binary]), then a
``mapInPandas`` kernel extracts text per file on executors — no file
ever passes through the driver, extraction parallelism == executor
count, and downstream is the ordinary documents schema.

Extraction kernels are tiered: pymupdf / python-docx (the reference's
libs) when installed, else the pure-stdlib extractors in
``sources/minidoc.py`` (literal/FlateDecode PDF streams, ECMA-376 DOCX
containers) — so R1/R2 run for real even in this container. Files
beyond the fallback tier's documented scope (encrypted PDFs, exotic
filters) surface as error rows, never silent empty text.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("extract_error", T.StringType()),
    ]
)


def read_binary_documents(
    spark: SparkSession, path: str, glob: str = "*.{pdf,docx,txt}"
) -> DataFrame:
    """Distributed binary scan of a document tree."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _extract_one(filename: str, content: bytes) -> tuple[str, str | None]:
    """Per-file text extraction, mirroring the reference's dispatch on
    extension (index_documents.py:270-274). Returns (text, error)."""
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".pdf":
        try:
            import fitz  # noqa: F401  (pymupdf — reference R1 kernel)
        except ImportError:
            # pure-stdlib fallback tier (sources/minidoc.py): literal +
            # FlateDecode streams, standard encoding — real extraction,
            # raises (-> error row) on files beyond its documented scope
            from document_vector_indexer_spark.sources.minidoc import (
                extract_pdf_text,
            )

            return extract_pdf_text(content), None
        doc = fitz.open(stream=content, filetype="pdf")
        try:
            return "\n".join(
                doc.load_page(i).get_text("text") for i in range(len(doc))
            ), None
        finally:
            doc.close()
    if ext == ".docx":
        try:
            import io

            from docx import Document  # reference R2 kernel
        except ImportError:
            from document_vector_indexer_spark.sources.minidoc import (
                extract_docx_text,
            )

            return extract_docx_text(content), None
        d = Document(io.BytesIO(content))
        return "\n".join(p.text for p in d.paragraphs if p.text), None
    if ext == ".txt":
        return content.decode("utf-8", errors="replace"), None
    return "", f"unsupported extension: {ext}"


def extract_text(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows -> extracted documents (executor-side kernels)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fname = os.path.basename(r.path)
                try:
                    text, err = _extract_one(fname, bytes(r.content))
                except Exception as e:  # corrupt file must not kill the job
                    text, err = "", f"extract failed: {e}"
                rows.append((r.path, fname, len(r.content), text, err))
            yield pd.DataFrame(
                rows, columns=["path", "filename", "n_bytes", "text", "extract_error"]
            )

    return binary_df.select("path", "content").mapInPandas(
        run, schema=EXTRACTED_SCHEMA
    )


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """One-call source: binary scan + extraction, failed files filtered
    into the error column (inspect before dropping)."""
    return extract_text(read_binary_documents(spark, path)).withColumn(
        "ok", F.col("extract_error").isNull()
    )
