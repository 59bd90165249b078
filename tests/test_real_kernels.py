"""Real extraction kernels (reference R1/R2) — optional-dependency
tests that run the day pymupdf / python-docx appear in the
environment and skip cleanly until then (round-3 VERDICT item 5:
binary_docs must stop being faith-based once a real kernel exists).

Each test GENERATES a real document with the same library the kernel
uses (fitz / docx), drops it in a directory, and drives the full
distributed path: binaryFile scan -> mapInPandas extraction ->
documents frame (sources/binary_docs.read_documents; reference
contract index_documents.py:38-55).
"""

from __future__ import annotations

import pytest


def test_pdf_extraction_real_kernel(spark, tmp_path):
    fitz = pytest.importorskip("fitz")

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    sentence = "Spark extracts this sentence from a real PDF page."
    doc = fitz.open()
    page = doc.new_page()
    page.insert_text((72, 72), sentence)
    pdf_path = tmp_path / "one_page.pdf"
    doc.save(str(pdf_path))
    doc.close()

    out = read_documents(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.ok, f"extraction failed: {row.extract_error}"
    assert row.filename == "one_page.pdf"
    # pymupdf may wrap/pad; the sentence must survive verbatim
    assert sentence in row.text


def test_docx_extraction_real_kernel(spark, tmp_path):
    docx = pytest.importorskip("docx")

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    d = docx.Document()
    d.add_paragraph("First paragraph of a real docx.")
    d.add_paragraph("")  # empty paragraphs are dropped (reference :51-55)
    d.add_paragraph("Second paragraph.")
    docx_path = tmp_path / "two_paras.docx"
    d.save(str(docx_path))

    out = read_documents(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.ok, f"extraction failed: {row.extract_error}"
    assert row.text == "First paragraph of a real docx.\nSecond paragraph."


def test_pdf_without_kernel_reports_stub_error(spark, tmp_path):
    """Inverse guard, always runs: with pymupdf ABSENT a .pdf row must
    come back ok=False with the stub message — never a silent empty
    text with ok=True."""
    try:
        import fitz  # noqa: F401

        pytest.skip("pymupdf installed — stub path not reachable")
    except ImportError:
        pass

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    (tmp_path / "real.pdf").write_bytes(b"%PDF-1.4 not really parseable")
    out = read_documents(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert not out[0].ok
    assert "pymupdf not installed" in out[0].extract_error
