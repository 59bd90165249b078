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


def test_pdf_without_kernel_reports_error_not_empty_text(spark, tmp_path):
    """Inverse guard, always runs: with pymupdf ABSENT an unparseable
    .pdf row must come back ok=False with a clear error from the
    pure-Python fallback tier — never a silent empty text with
    ok=True."""
    try:
        import fitz  # noqa: F401

        pytest.skip("pymupdf installed — fallback path not reachable")
    except ImportError:
        pass

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    (tmp_path / "real.pdf").write_bytes(b"%PDF-1.4 not really parseable")
    out = read_documents(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert not out[0].ok
    assert "pdf:" in out[0].extract_error


# --- pure-Python fallback kernels (round-4 VERDICT item 7) -----------
#
# These ALWAYS run in this container: the fixtures are valid documents
# built from the public specs with the standard library (correct xref
# offsets for the PDF, a real ECMA-376 zip for the DOCX), and the
# extraction is sources/minidoc.py — a real parse, not a fake.


def _build_pdf(text_ops: bytes, compress: bool) -> bytes:
    """A valid single-page PDF around ``text_ops`` (a content-stream
    body), with a correct xref table; optionally FlateDecode."""
    import zlib

    body = text_ops
    extra = b""
    if compress:
        body = zlib.compress(text_ops)
        extra = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), extra, body),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, obj)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def _build_docx(paragraphs: list[str]) -> bytes:
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    paras = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{p}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    document = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{paras}</w:body></w:document>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
        'relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("word/document.xml", document)
    return buf.getvalue()


def test_pdf_extraction_pure_python_kernel(spark, tmp_path):
    """R1 runs end-to-end in-container: two valid generated PDFs (one
    plain, one FlateDecode), full distributed path, exact text."""
    ops = (
        b"BT /F1 12 Tf 72 720 Td (Spark reads a real) Tj "
        b"T* (PDF \\(escaped parens\\) and) Tj "
        b"T* [(ker) -120 (ned TJ arrays)] TJ "
        b"T* <53706172 6b21> Tj ET"
    )
    (tmp_path / "plain.pdf").write_bytes(_build_pdf(ops, compress=False))
    (tmp_path / "flate.pdf").write_bytes(_build_pdf(ops, compress=True))

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    rows = {r.filename: r for r in read_documents(spark, str(tmp_path)).collect()}
    assert set(rows) == {"plain.pdf", "flate.pdf"}
    expect = (
        "Spark reads a real\nPDF (escaped parens) and\nkerned TJ arrays\nSpark!"
    )
    for name, r in rows.items():
        assert r.ok, f"{name}: {r.extract_error}"
        assert r.text == expect, (name, r.text)


def test_docx_extraction_pure_python_kernel(spark, tmp_path):
    """R2 runs end-to-end in-container on a generated ECMA-376 zip."""
    payload = _build_docx(
        ["First paragraph of a real docx.", "", "Second paragraph."]
    )
    (tmp_path / "two_paras.docx").write_bytes(payload)

    from document_vector_indexer_spark.sources.binary_docs import read_documents

    out = read_documents(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.ok, f"extraction failed: {row.extract_error}"
    # empty paragraphs dropped (reference index_documents.py:51-55)
    assert row.text == "First paragraph of a real docx.\nSecond paragraph."


def test_minidoc_rejects_out_of_scope_files():
    """Scope limits raise (-> error rows), never return empty text."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import (
        extract_docx_text,
        extract_pdf_text,
    )

    with _pytest.raises(ValueError, match="missing %PDF header"):
        extract_pdf_text(b"not a pdf at all")
    with _pytest.raises(ValueError, match="no readable text"):
        extract_pdf_text(b"%PDF-1.4\nnothing else")
    with _pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(b"%PDF-1.4\n/Encrypt 1 0 R")
    with _pytest.raises(ValueError, match="not a DOCX container"):
        extract_docx_text(b"PK\x03\x04 broken zip")


# --- property-based round-trip for the stdlib PDF parser --------------

from hypothesis import example, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _pdf_escape(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1"):
        if ch in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([ch])
        else:
            out.append(ch)
    return bytes(out)


def _pdf_escape_octal(s: str) -> bytes:
    # every byte as \ddd — exercises the octal-unescape path end-to-end
    return b"".join(b"\\%03o" % ch for ch in s.encode("latin-1"))


_line = (
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=255),
        min_size=1,
        max_size=40,
    )
    .map(lambda s: s.rstrip())  # extractor rstrips each line
    .filter(lambda s: s)
)


@settings(max_examples=60, deadline=None)
@given(lines=st.lists(_line, min_size=1, max_size=6), flate=st.booleans(),
       octal=st.booleans())
@example(
    lines=['2',
     'W\x83',
     '01²µó',
     '017G\x82\x91\x97\x9cáâëñø',
     '017G\x82\x91\x97\x9cáâëñø'],
    flate=True,
    octal=True,
).via('discovered failure')
def test_pdf_text_round_trips(lines, flate, octal):
    """For arbitrary latin-1 text lines: build a valid PDF (one Tj per
    line, T* line moves; plain or FlateDecode; literal or all-octal
    string encoding) -> extract_pdf_text returns the exact text."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    esc = _pdf_escape_octal if octal else _pdf_escape
    ops = b"BT /F1 12 Tf 72 720 Td " + b" T* ".join(
        b"(" + esc(l) + b") Tj" for l in lines
    ) + b" ET"
    pdf = _build_pdf(ops, compress=flate)
    assert extract_pdf_text(pdf) == "\n".join(lines)


def test_pdf_dict_in_content_stream_and_bad_escapes():
    """Review findings (r5): a BDC property dict's '<<' inside a
    content stream must not read as a hex string, and invalid \\8/\\9
    escapes drop the backslash (spec: ignore) instead of aborting."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = (
        b"/P <</MCID 0>> BDC BT /F1 12 Tf 0 0 Td "
        b"(Hello \\8world\\9) Tj ET EMC"
    )
    pdf = _build_pdf(ops, compress=False)
    assert extract_pdf_text(pdf) == "Hello 8world9"


def test_pdf_cid_fonts_raise_not_mojibake():
    """Composite/CID fonts (Identity-H/Type0) store glyph indices —
    the stdlib tier must raise (-> error row), never return latin-1
    mojibake with ok=True."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0048004F> Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/Subtype /Type0 /BaseFont /AAAAAA+Font /Encoding /Identity-H",
    )
    with _pytest.raises(ValueError, match="composite/CID"):
        extract_pdf_text(pdf)


# --- round-6: stream-boundary + /Differences coverage -----------------


# a latin-1 text whose one-line content stream compresses to zlib bytes
# ending in 0x0d — the exact shape of the round-5 verdict bug (the
# writer's \n separator made the old single-guess EOL-strip remove a
# real data byte and truncate the stream)
_CR_FINAL_TEXT = bytes(
    [214, 235, 244, 210, 112, 248, 108, 220, 103, 239, 244, 32,
     242, 221, 199, 193, 246, 104, 226, 249]
).decode("latin-1")


def test_pdf_flate_stream_with_cr_final_compressed_byte():
    """Deterministic pin of the round-5 verdict bug: a FlateDecode
    stream whose COMPRESSED bytes end in 0x0d must still extract."""
    import zlib

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = (
        b"BT /F1 12 Tf 72 720 Td ("
        + _CR_FINAL_TEXT.encode("latin-1")
        + b") Tj ET"
    )
    assert zlib.compress(ops).endswith(b"\r"), "fixture drifted"
    pdf = _build_pdf(ops, compress=True)
    assert extract_pdf_text(pdf) == _CR_FINAL_TEXT


def test_pdf_indirect_length_falls_back_to_scan_with_retry():
    """With /Length given as an indirect reference the exact-slice path
    is unavailable; the endstream scan + decompress-retry must still
    recover a CR-final compressed stream."""
    import re as _re

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = (
        b"BT /F1 12 Tf 72 720 Td ("
        + _CR_FINAL_TEXT.encode("latin-1")
        + b") Tj ET"
    )
    pdf = _build_pdf(ops, compress=True)
    mangled = _re.sub(rb"/Length \d+", b"/Length 9 0 R", pdf, count=1)
    assert b"/Length 9 0 R" in mangled
    assert extract_pdf_text(mangled) == _CR_FINAL_TEXT


def test_pdf_differences_encoding_applied():
    """A simple font's /Encoding /Differences map (pdfTeX-style) is
    applied: remapped byte codes decode through the Adobe-Glyph-List
    table, sequential codes increment, unmapped bytes stay latin-1."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 72 720 Td (Xab YZ) Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /ABCDEF+Custom "
        b"/Encoding << /Type /Encoding /Differences "
        b"[ 88 /quoteright /adieresis 90 /fi ] >> >>",
    )
    # X(88)->quoteright, Y(89)->adieresis (sequential), Z(90)->fi
    assert extract_pdf_text(pdf) == "’ab äﬁ"


def test_pdf_differences_unknown_glyph_raises():
    """Glyph names outside the table must raise (error row), never
    decode as latin-1 mojibake with ok=True (ADVICE r5)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 72 720 Td (Xab) Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/BaseFont /Sub+F /Encoding << /Differences [ 88 /g42 ] >>",
    )
    with _pytest.raises(ValueError, match="glyph table"):
        extract_pdf_text(pdf)


def test_pdf_differences_conflicting_maps_raise():
    """Two fonts remapping the same code differently cannot be merged
    without per-font Tf tracking — must raise, not guess."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 72 720 Td (XX) Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/BaseFont /Sub+F /Encoding << /Differences [ 88 /quoteright ] >>",
    )
    pdf += b"\n6 0 obj\n<< /Encoding << /Differences [ 88 /emdash ] >> >>\nendobj\n"
    with _pytest.raises(ValueError, match="conflicting /Differences"):
        extract_pdf_text(pdf)


def test_pdf_uni_glyph_names_decode():
    """uniXXXX / uXXXXXX glyph names decode via their code point."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 72 720 Td (AB) Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/BaseFont /Sub+F /Encoding "
        b"<< /Differences [ 65 /uni0416 66 /u1F600 ] >>",
    )
    assert extract_pdf_text(pdf) == "Ж\U0001f600"


# --- round-6: Type0/CID fonts via /ToUnicode CMaps ---------------------


def _cmap_pdf(text_ops: bytes, cmap_body: bytes, compress_cmap: bool = False) -> bytes:
    """_build_pdf output with the font swapped to Type0/Identity-H and
    a /ToUnicode CMap stream object appended (the linear scan finds it
    without xref entries, like real incremental-update objects)."""
    import zlib as _zlib

    pdf = _build_pdf(text_ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/Subtype /Type0 /BaseFont /AAAAAA+Font /Encoding /Identity-H "
        b"/ToUnicode 6 0 R",
    )
    body, extra = cmap_body, b""
    if compress_cmap:
        body, extra = _zlib.compress(cmap_body), b" /Filter /FlateDecode"
    obj = b"6 0 obj\n<< /Length %d%s >>\nstream\n%s\nendstream\nendobj\n" % (
        len(body),
        extra,
        body,
    )
    at = pdf.rindex(b"xref\n")
    return pdf[:at] + obj + pdf[at:]


_CMAP_PREAMBLE = (
    b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
    b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
)


def test_pdf_type0_tounicode_bfchar_and_ranges():
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"2 beginbfchar\n<0001> <0048>\n<0002> <0065>\nendbfchar\n"
        # scalar range: 0x10..0x12 -> l, m, n
        b"2 beginbfrange\n<0010> <0012> <006C>\n"
        # array range: 0x20..0x21 -> '!', '?'
        b"<0020> <0021> [<0021> <003F>]\nendbfrange\nendcmap\n"
    )
    # hex show string + TJ array with kerning numbers between strings
    ops = (
        b"BT /F1 12 Tf 0 0 Td <00010002> Tj "
        b"[<0010> -120 <00110012>] TJ "
        b"<00200021> Tj ET"
    )
    assert extract_pdf_text(_cmap_pdf(ops, cmap)) == "Helmn!?"


def test_pdf_type0_tounicode_flate_cmap_and_literal_string():
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"3 beginbfchar\n<0003> <0057>\n<0004> <006F>\n"
        # multi-char target: one code expands to a ligature's parts
        b"<0005> <006600660069>\nendbfchar\nendcmap\n"
    )
    # literal-string show: raw 2-byte codes inside (...)
    ops = b"BT /F1 12 Tf 0 0 Td (\x00\x03\x00\x04\x00\x05) Tj ET"
    assert (
        extract_pdf_text(_cmap_pdf(ops, cmap, compress_cmap=True)) == "Woffi"
    )


def test_pdf_type0_tounicode_surrogate_pair():
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"1 beginbfchar\n<0007> <D83DDE00>\nendbfchar\nendcmap\n"
    )
    ops = b"BT /F1 12 Tf 0 0 Td <0007> Tj ET"
    assert extract_pdf_text(_cmap_pdf(ops, cmap)) == "\U0001f600"


def test_pdf_type0_unmapped_code_raises():
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + b"1 beginbfchar\n<0001> <0048>\nendbfchar\nendcmap\n"
    ops = b"BT /F1 12 Tf 0 0 Td <00010099> Tj ET"
    with _pytest.raises(ValueError, match="missing from the ToUnicode"):
        extract_pdf_text(_cmap_pdf(ops, cmap))


def test_pdf_type0_odd_length_show_string_raises():
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + b"1 beginbfchar\n<0001> <0048>\nendbfchar\nendcmap\n"
    ops = b"BT /F1 12 Tf 0 0 Td <000100> Tj ET"
    with _pytest.raises(ValueError, match="code width"):
        extract_pdf_text(_cmap_pdf(ops, cmap))


def test_pdf_type0_conflicting_cmaps_raise():
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"2 beginbfchar\n<0001> <0048>\n<0001> <0058>\nendbfchar\nendcmap\n"
    )
    ops = b"BT /F1 12 Tf 0 0 Td <0001> Tj ET"
    with _pytest.raises(ValueError, match="conflicting ToUnicode"):
        extract_pdf_text(_cmap_pdf(ops, cmap))


def test_pdf_type0_mixed_with_differences_raises():
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + b"1 beginbfchar\n<0001> <0048>\nendbfchar\nendcmap\n"
    ops = b"BT /F1 12 Tf 0 0 Td <0001> Tj ET"
    pdf = _cmap_pdf(ops, cmap).replace(
        b"/Type /Page ",
        b"/Type /Page /X << /Encoding << /Differences [65 /aacute] >> >> ",
    )
    with _pytest.raises(ValueError, match="mixed Type0"):
        extract_pdf_text(pdf)


def test_pdf_type0_without_tounicode_still_raises():
    """The original guard survives: glyph indices with NO map stay
    native-kernel territory (error row, never mojibake)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0048004F> Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/Subtype /Type0 /BaseFont /AAAAAA+Font /Encoding /Identity-H",
    )
    with _pytest.raises(ValueError, match="without a /ToUnicode"):
        extract_pdf_text(pdf)


# --- round-6 review fixes: CID/Differences decode boundaries -----------


def test_pdf_differences_with_default_encoded_font_raises():
    """A /Differences map from one font must NOT silently remap bytes
    shown by a second, default-encoded font ('(café)' extracting as
    'cafä' with ok=True) — the mixed case raises (error row)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 72 720 Td (caf\xe9) Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        b"endobj\n7 0 obj\n<< /Type /Font /Subtype /TrueType "
        b"/BaseFont /ABCDEF+Sub /Encoding << /Differences "
        b"[ 233 /adieresis ] >> >>",
    )
    with _pytest.raises(ValueError, match="not on every font"):
        extract_pdf_text(pdf)


def test_pdf_differences_shared_basefont_name_raises():
    """Two font DICTIONARIES sharing one /BaseFont name (one with
    /Differences, one default-encoded) must still trip the guard —
    counting distinct BaseFont names collapses them to 1 and the merged
    map silently remaps the default font's bytes ('(café)' -> 'cafä'
    with ok=True; r7 ADVICE medium). Fonts are counted as dictionaries
    (/Type /Font occurrences), not names."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 72 720 Td (caf\xe9) Tj ET"
    pdf = _build_pdf(ops, compress=False).replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        b"endobj\n7 0 obj\n<< /Type /Font /Subtype /TrueType "
        b"/BaseFont /Helvetica /Encoding << /Differences "
        b"[ 233 /adieresis ] >> >>",
    )
    with _pytest.raises(ValueError, match="not on every font"):
        extract_pdf_text(pdf)


def test_pdf_cid_nonshow_string_not_decoded():
    """Strings that no show operator consumes (BDC /ActualText values)
    must not reach the CID decoder — eager decoding turned decodable
    Type0 files into error rows on width-unaligned property strings."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"2 beginbfchar\n<0001> <0048>\n<0002> <0069>\nendbfchar\nendcmap\n"
    )
    ops = (
        b"BT /Span << /ActualText (odd) >> BDC "
        b"<00010002> Tj EMC ET"
    )
    assert extract_pdf_text(_cmap_pdf(ops, cmap)) == "Hi"


def test_pdf_bfrange_overflow_raises():
    """bfrange increments only the last UTF-16 code unit and must not
    wrap past U+FFFF into U+0000 garbage (spec 9.10.3)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"1 beginbfrange\n<0001> <0003> <FFFE>\nendbfrange\nendcmap\n"
    )
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    with _pytest.raises(ValueError, match="past U"):
        extract_pdf_text(_cmap_pdf(ops, cmap))


def test_pdf_bfrange_hi_width_mismatch_raises():
    """A bfrange hi token narrower than lo (<0001> <FF> ...) reads as a
    smaller code and silently truncates the range — width is checked on
    BOTH endpoints, mirroring the bfchar path (r7 ADVICE)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    cmap = _CMAP_PREAMBLE + (
        b"1 beginbfrange\n<0001> <FF> <0041>\nendbfrange\nendcmap\n"
    )
    ops = b"BT /F1 12 Tf 0 0 Td <0001> Tj ET"
    with _pytest.raises(ValueError, match="mixed source code widths"):
        extract_pdf_text(_cmap_pdf(ops, cmap))


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_pdf_type0_tounicode_round_trips(data):
    """Property: ANY code->text map expressible as bfchar entries
    round-trips exactly through a Type0 PDF (hex show strings, Flate
    or plain CMap stream)."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    n = data.draw(st.integers(1, 12))
    codes = data.draw(
        st.lists(
            st.integers(1, 0xFFFF), min_size=n, max_size=n, unique=True
        )
    )
    # BMP text only, excluding surrogates and the chars the extractor
    # normalizes away at line level (\r treated as text char is fine;
    # avoid \n which the parser emits for line moves, and NULs which
    # rstrip keeps — keep it printable-ish)
    texts = data.draw(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x21,
                    max_codepoint=0xD700,
                ),
                min_size=1,
                max_size=4,
            ),
            min_size=n,
            max_size=n,
        )
    )
    flate = data.draw(st.booleans())
    bfchars = b"".join(
        b"<%04X> <%s>\n" % (c, t.encode("utf-16-be").hex().upper().encode())
        for c, t in zip(codes, texts)
    )
    cmap = _CMAP_PREAMBLE + (
        b"%d beginbfchar\n%s endbfchar\nendcmap\n" % (len(codes), bfchars)
    )
    shown = data.draw(
        st.lists(st.sampled_from(codes), min_size=1, max_size=20)
    )
    ops = b"BT /F1 12 Tf 0 0 Td <%s> Tj ET" % (
        "".join(f"{c:04X}" for c in shown).encode()
    )
    expected = "".join(dict(zip(codes, texts))[c] for c in shown).rstrip()
    got = extract_pdf_text(_cmap_pdf(ops, cmap, compress_cmap=flate))
    assert got == expected


# --- round-8: Type0/CID without /ToUnicode via the embedded font's
# own 'cmap' table (sfnt) ----------------------------------------------


def _mini_ttf(char_to_gid: "dict[str, int]", fmt: int = 4) -> bytes:
    """A minimal sfnt container holding ONLY a cmap table (format 4 or
    12, one (3,1)/(3,10) subtable) — the exact surface the stdlib
    tier's unicode-cmap inversion reads."""
    import math
    import struct

    cps = sorted(ord(c) for c in char_to_gid)
    if fmt == 4:
        segs = [(cp, cp, char_to_gid[chr(cp)]) for cp in cps]
        segcount = len(segs) + 1  # + required 0xFFFF terminator
        ends = b"".join(struct.pack(">H", e) for _, e, _ in segs)
        ends += b"\xff\xff"
        starts = b"".join(struct.pack(">H", s) for s, _, _ in segs)
        starts += b"\xff\xff"
        deltas = b"".join(
            struct.pack(">H", (g - s) & 0xFFFF) for s, _, g in segs
        ) + struct.pack(">H", 1)
        ros = b"\x00\x00" * segcount
        sel = int(math.log2(segcount))
        header = struct.pack(
            ">HHHHHHH",
            4,
            16 + 8 * segcount,  # length
            0,
            segcount * 2,
            (1 << sel) * 2,
            sel,
            segcount * 2 - (1 << sel) * 2,
        )
        sub = header + ends + b"\x00\x00" + starts + deltas + ros
        plat_enc = (3, 1)
    elif fmt == 12:
        groups = [(cp, cp, char_to_gid[chr(cp)]) for cp in cps]
        body = b"".join(
            struct.pack(">III", s, e, g) for s, e, g in groups
        )
        sub = struct.pack(
            ">HHIII", 12, 0, 16 + len(body), 0, len(groups)
        ) + body
        plat_enc = (3, 10)
    else:  # pragma: no cover - test helper misuse
        raise AssertionError(fmt)
    cmap_table = (
        struct.pack(">HH", 0, 1)
        + struct.pack(">HHI", *plat_enc, 12)
        + sub
    )
    sfnt = b"\x00\x01\x00\x00" + struct.pack(">HHHH", 1, 16, 0, 0)
    sfnt += b"cmap" + struct.pack(">III", 0, 12 + 16, len(cmap_table))
    return sfnt + cmap_table


def _fontfile_pdf(
    text_ops: bytes,
    ttf: bytes,
    compress_font: bool = True,
    cid_to_gid: bytes = b"/Identity",
    second_ttf: "bytes | None" = None,
) -> bytes:
    """_build_pdf output with the font swapped to Type0/Identity-H, NO
    /ToUnicode, and an embedded /FontFile2 sfnt stream appended (found
    by the linear scan, like real incremental-update objects)."""
    import zlib as _zlib

    pdf = _build_pdf(text_ops, compress=False).replace(
        b"/BaseFont /Helvetica",
        b"/Subtype /Type0 /BaseFont /AAAAAA+Font /Encoding /Identity-H "
        b"/DescendantFonts [7 0 R]",
    )
    body, extra = ttf, b""
    if compress_font:
        body, extra = _zlib.compress(ttf), b" /Filter /FlateDecode"
    objs = (
        b"7 0 obj\n<< /Type /Font /Subtype /CIDFontType2 "
        b"/CIDToGIDMap " + cid_to_gid + b" /FontDescriptor 8 0 R >>\n"
        b"endobj\n"
        b"8 0 obj\n<< /Type /FontDescriptor /FontFile2 9 0 R >>\nendobj\n"
    )
    objs += b"9 0 obj\n<< /Length %d /Length1 %d%s >>\nstream\n%s\nendstream\nendobj\n" % (
        len(body),
        len(ttf),
        extra,
        body,
    )
    if second_ttf is not None:
        # a SECOND fully-chained Type0 font (obj 10 -> 11 -> 12 -> 13):
        # attribution ignores unreferenced programs, so conflict tests
        # need two fonts that each RESOLVE to their own program
        b2 = _zlib.compress(second_ttf)
        objs += (
            b"10 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont "
            b"/BBBBBB+Font /Encoding /Identity-H /DescendantFonts "
            b"[11 0 R] >>\nendobj\n"
            b"11 0 obj\n<< /Type /Font /Subtype /CIDFontType2 "
            b"/CIDToGIDMap /Identity /FontDescriptor 12 0 R >>\nendobj\n"
            b"12 0 obj\n<< /Type /FontDescriptor /FontFile2 13 0 R >>\n"
            b"endobj\n"
        )
        objs += (
            b"13 0 obj\n<< /Length %d /Length1 %d /Filter /FlateDecode "
            b">>\nstream\n%s\nendstream\nendobj\n"
            % (len(b2), len(second_ttf), b2)
        )
    at = pdf.rindex(b"xref\n")
    return pdf[:at] + objs + pdf[at:]


def _loose_sfnt_pdf(text_ops: bytes, referenced: bytes, loose: bytes) -> bytes:
    """A Type0 PDF whose font chain resolves to ``referenced`` while an
    UNREFERENCED sfnt stream (``loose``) also sits in the file — the r8
    review's wrong-font-attribution shape."""
    import zlib as _zlib

    pdf = _fontfile_pdf(text_ops, referenced)
    b2 = _zlib.compress(loose)
    obj = (
        b"20 0 obj\n<< /Length %d /Length1 %d /Filter /FlateDecode "
        b">>\nstream\n%s\nendstream\nendobj\n" % (len(b2), len(loose), b2)
    )
    at = pdf.rindex(b"xref\n")
    return pdf[:at] + obj + pdf[at:]


def test_pdf_type0_fontfile_cmap_round_trip():
    """No /ToUnicode, but an embedded TrueType program whose cmap maps
    the shown gids: the stdlib tier decodes through the inverted font
    cmap (reference parity: pymupdf reaches the same table)."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "e": 4, "l": 5, "o": 6, "é": 7})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004000500050006 0007> Tj ET"
    for compress in (False, True):
        pdf = _fontfile_pdf(ops, ttf, compress_font=compress)
        assert extract_pdf_text(pdf) == "Helloé"


def test_pdf_type0_fontfile_cmap_format12():
    """Format-12 (UCS-4) subtables decode too — incl. non-BMP text."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"A": 11, "\U0001f600": 12}, fmt=12)
    ops = b"BT /F1 12 Tf 0 0 Td <000B000C> Tj ET"
    assert extract_pdf_text(_fontfile_pdf(ops, ttf)) == "A\U0001f600"


def test_pdf_type0_fontfile_unified_glyph_smallest_codepoint():
    """Two code points sharing one glyph (space/nbsp unification)
    invert to the SMALLEST code point, deterministically."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"X": 3, " ": 4, " ": 4, "Y": 5})
    ops = b"BT /F1 12 Tf 0 0 Td <000300040005> Tj ET"
    assert extract_pdf_text(_fontfile_pdf(ops, ttf)) == "X Y"


def test_pdf_type0_fontfile_unmapped_gid_raises():
    """A shown gid absent from the font cmap raises (error row) —
    never emits a placeholder."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <00030099> Tj ET"
    with _pytest.raises(ValueError, match="missing from the ToUnicode"):
        extract_pdf_text(_fontfile_pdf(ops, ttf))


def test_pdf_type0_fontfile_non_identity_cidtogid_raises():
    """A stream-based /CIDToGIDMap means gids != show-string codes —
    native-kernel territory, must raise."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf, cid_to_gid=b"11 0 R")
    with _pytest.raises(ValueError, match="CIDToGIDMap"):
        extract_pdf_text(pdf)


def test_pdf_type0_fontfile_conflicting_programs_raise():
    """Two embedded programs mapping one gid to different text raise
    (per-font Tf tracking is native-kernel territory)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(
        ops,
        _mini_ttf({"H": 3}),
        second_ttf=_mini_ttf({"Z": 3}),
    )
    with _pytest.raises(ValueError, match="conflicting glyph maps"):
        extract_pdf_text(pdf)


def test_pdf_type0_fontfile_named_cmap_encoding_raises():
    """A registered (non-Identity) CMap name means show-string codes
    are CIDs in a character collection, not gids — must raise."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf).replace(
        b"/Encoding /Identity-H", b"/Encoding /UniJIS-UCS2-H"
    )
    with _pytest.raises(ValueError, match="named CMap encodings"):
        extract_pdf_text(pdf)


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_pdf_type0_fontfile_round_trips(data):
    """Property: ANY char->gid map expressible as a format-4 cmap
    round-trips exactly through a /ToUnicode-less Type0 PDF."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    n = data.draw(st.integers(1, 10))
    chars = data.draw(
        st.lists(
            st.characters(min_codepoint=0x21, max_codepoint=0xD700),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    gids = data.draw(
        st.lists(
            st.integers(1, 0xFFFE), min_size=n, max_size=n, unique=True
        )
    )
    mapping = dict(zip(chars, gids))
    flate = data.draw(st.booleans())
    shown = data.draw(st.lists(st.sampled_from(chars), min_size=1, max_size=20))
    ops = b"BT /F1 12 Tf 0 0 Td <%s> Tj ET" % (
        "".join(f"{mapping[c]:04X}" for c in shown).encode()
    )
    pdf = _fontfile_pdf(ops, _mini_ttf(mapping), compress_font=flate)
    assert extract_pdf_text(pdf) == "".join(shown).rstrip()


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_pdf_type0_objstm_packing_preserves_decode(data):
    """Property (r9): packing ANY subset of the Type0 font-dict chain
    {font dict 5, descendant 7, descriptor 8} into a /ObjStm container
    never changes the decoded text — the synthesized object space must
    be observationally identical to the top-level layout."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    n = data.draw(st.integers(1, 6))
    chars = data.draw(
        st.lists(
            st.characters(min_codepoint=0x21, max_codepoint=0xD700),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    gids = data.draw(
        st.lists(st.integers(1, 0xFFFE), min_size=n, max_size=n, unique=True)
    )
    mapping = dict(zip(chars, gids))
    shown = data.draw(st.lists(st.sampled_from(chars), min_size=1, max_size=8))
    subset = data.draw(
        st.lists(st.sampled_from([5, 7, 8]), min_size=1, max_size=3, unique=True)
    )
    ops = b"BT /F1 12 Tf 0 0 Td <%s> Tj ET" % (
        "".join(f"{mapping[c]:04X}" for c in shown).encode()
    )
    base = _fontfile_pdf(ops, _mini_ttf(mapping))
    want = extract_pdf_text(base)
    assert extract_pdf_text(_pack_objstm(base, sorted(subset))) == want


@settings(max_examples=120, deadline=None)
@given(tail=st.binary(min_size=0, max_size=300), magic=st.sampled_from(
    [b"\x00\x01\x00\x00", b"true", b"OTTO"]))
def test_pdf_type0_fontfile_fuzz_raises_valueerror_only(tail, magic):
    """Hostile/truncated font programs must surface as ValueError
    (-> error row), never IndexError/struct.error/KeyError leaks."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, magic + tail, compress_font=True)
    try:
        out = extract_pdf_text(pdf)
        assert isinstance(out, str)
    except ValueError:
        pass


def test_pdf_type0_fontfile_unreferenced_program_is_ignored():
    """r8 review repro: an embedded sfnt referenced by NO font dict
    must not decode the Type0 font's gids — <0009000A> through a loose
    program mapping 9/10 to 'Z'/'Q' previously extracted 'ZQ' with
    ok=True. With attribution, the referenced program (which lacks
    those gids) governs and the unmapped gids raise (error row)."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0009000A> Tj ET"
    pdf = _loose_sfnt_pdf(
        ops,
        referenced=_mini_ttf({"H": 3}),
        loose=_mini_ttf({"Z": 9, "Q": 10}),
    )
    with _pytest.raises(ValueError, match="missing from the ToUnicode"):
        extract_pdf_text(pdf)
    # and the referenced program still decodes its own gids
    ok_ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf2 = _loose_sfnt_pdf(
        ok_ops,
        referenced=_mini_ttf({"H": 3}),
        loose=_mini_ttf({"Z": 9, "Q": 10}),
    )
    assert extract_pdf_text(pdf2) == "H"


def test_pdf_type0_dict_beyond_scan_window_raises():
    """r9 regression (r8 ADVICE): a Type0 font dict whose '<<' sits
    beyond the resolver's 64-byte scan window after 'N 0 obj' (legal
    whitespace/comments) was invisible to BOTH the resolver and its
    seen-counter — its gids then decoded through the OTHER resolved
    fonts' merged cmap with ok=True. The all-or-nothing accounting now
    counts raw '/Subtype /Type0' tokens, so the hidden font forces an
    error row instead."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    hidden = (
        b"30 0 obj\n% " + b"x" * 80 + b"\n"
        b"<< /Type /Font /Subtype /Type0 /BaseFont /CCCCCC+Font "
        b"/Encoding /Identity-H /DescendantFonts [31 0 R] >>\nendobj\n"
    )
    at = pdf.rindex(b"xref\n")
    pdf = pdf[:at] + hidden + pdf[at:]
    with _pytest.raises(ValueError, match="only some Type0 fonts"):
        extract_pdf_text(pdf)


def _pack_objstm(pdf: bytes, nums: "list[int]", objstm_num: int = 40) -> bytes:
    """Move the given top-level objects into a FlateDecode /ObjStm
    container (PDF 1.5 §7.5.7: header of ``num offset`` int pairs, then
    the bare object bodies), removing their raw definitions."""
    import re as _re
    import zlib as _zlib

    bodies: "list[tuple[int, bytes]]" = []
    for num in nums:
        m = _re.search(
            rb"(?<![0-9])%d 0 obj\n(.*?)\nendobj\n" % num, pdf, _re.S
        )
        assert m is not None, num
        bodies.append((num, m.group(1)))
        pdf = pdf[: m.start()] + pdf[m.end() :]
    payload, header, off = b"", b"", 0
    for num, body in bodies:
        header += b"%d %d " % (num, off)
        payload += body + b"\n"
        off = len(payload)
    raw = header + payload
    comp = _zlib.compress(raw)
    obj = (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (objstm_num, len(bodies), len(header), len(comp), comp)
    )
    at = pdf.rindex(b"xref\n")
    return pdf[:at] + obj + pdf[at:]


def test_pdf_type0_objstm_packed_font_chain_decodes():
    """r9 (r8 VERDICT stretch): font dicts packed inside a /ObjStm
    container — descendant + descriptor, and then the Type0 dict itself
    — now resolve through the synthesized object space and decode via
    the embedded program's cmap (this exact shape raised 'inside object
    streams' before). The font PROGRAM stays top-level: streams may not
    live in an ObjStm, so the stdlib tier never needs to."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    base = _fontfile_pdf(ops, ttf)
    assert extract_pdf_text(_pack_objstm(base, [7, 8])) == "Hi"
    assert extract_pdf_text(_pack_objstm(base, [5, 7, 8])) == "Hi"


def test_pdf_objstm_malformed_header_raises():
    """A short or non-integer ObjStm header must raise (error row),
    never skip the container — a skipped Type0 dict would decode
    through other fonts' maps."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import (
        _objstm_synthesized,
        extract_pdf_text,
    )
    import re as _re
    import zlib as _zlib

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _pack_objstm(_fontfile_pdf(ops, ttf), [7, 8])
    # corrupt: claim one more object than the header carries
    m = _re.search(rb"/Type /ObjStm /N (\d+)", pdf)
    bad = pdf[: m.start(1)] + b"9" + pdf[m.end(1) :]
    with _pytest.raises(ValueError, match="object stream"):
        extract_pdf_text(bad)
    # descending offsets
    raw = b"7 10 8 0 " + b"x" * 64
    comp = _zlib.compress(raw)
    doc = (
        b"%%PDF-1.5\n40 0 obj\n<< /Type /ObjStm /N 2 /First 9 /Length "
        b"%d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    with _pytest.raises(ValueError, match="ascending"):
        _objstm_synthesized(doc)
    # a stream dict whose preceding bytes hold an unrelated '/N <int>'
    # dict (annotation appearance) must not be misparsed as the ObjStm's
    # own /N (r9 review: the regex span can cover earlier dicts)
    good = b"5 0 " + b"<< /X 1 >>\n"
    comp2 = _zlib.compress(good)
    doc2 = (
        b"%%PDF-1.5\n30 0 obj\n<< /AP << /N 3 0 R >> >>\nendobj\n"
        b"40 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length %d "
        b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp2), comp2)
    )
    synth = _objstm_synthesized(doc2)
    assert b"5 0 obj" in synth


@settings(max_examples=120, deadline=None)
@given(
    body=st.binary(min_size=0, max_size=200),
    n=st.integers(min_value=0, max_value=5),
    first=st.integers(min_value=0, max_value=300),
    flate=st.booleans(),
)
def test_pdf_objstm_fuzz_raises_valueerror_only(body, n, first, flate):
    """Hostile ObjStm containers (arbitrary bodies, lying /N //First)
    must surface as ValueError (-> error row) or a clean synthesis —
    never IndexError/UnicodeDecodeError leaks, never an exception class
    the caller's error-row contract doesn't catch."""
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import (
        _objstm_synthesized,
    )

    payload = _zlib.compress(body) if flate else body
    filt = b" /Filter /FlateDecode" if flate else b""
    doc = (
        b"%%PDF-1.5\n40 0 obj\n<< /Type /ObjStm /N %d /First %d "
        b"/Length %d%s >>\nstream\n%s\nendstream\nendobj\n"
        % (n, first, len(payload), filt, payload)
    )
    try:
        out = _objstm_synthesized(doc)
        assert isinstance(out, bytes)
    except ValueError:
        pass


def test_pdf_objstm_duplicate_definition_raises():
    """An object defined BOTH at top level and inside an ObjStm needs
    the xref stream to know which is live — must raise, not pick."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _pack_objstm(_fontfile_pdf(ops, ttf), [7, 8])
    # re-add a stale raw definition of object 7
    at = pdf.rindex(b"xref\n")
    stale = b"7 0 obj\n<< /Type /Font /Subtype /CIDFontType2 >>\nendobj\n"
    with _pytest.raises(ValueError, match="more than once"):
        extract_pdf_text(pdf[:at] + stale + pdf[at:])


def test_pdf_objstm_instring_angle_brackets_parse_correctly():
    """r9 (passes 5 and 10): '<<'/'>>' inside a string literal in the
    ObjStm's own dict must not confuse the dict parser — originally the
    balance walk silently SKIPPED the container; the string-aware
    parser now reads the dict correctly and the container synthesizes
    (never silence, and no longer even an error row)."""
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import (
        _objstm_synthesized,
    )

    comp = _zlib.compress(b"5 0 << /X 1 >>\n")
    doc = (
        b"%%PDF-1.5\n40 0 obj\n<< /Type /ObjStm /Producer (x << y) "
        b"/N 1 /First 4 /Length %d /Filter /FlateDecode >>\nstream\n"
        b"%s\nendstream\nendobj\n" % (len(comp), comp)
    )
    assert b"5 0 obj" in _objstm_synthesized(doc)


def test_pdf_plain_stream_with_instring_angles_still_decodes():
    """r9 review repro: a NON-ObjStm stream whose dict holds '>>' inside
    a string must not abort extraction — the (briefly shipped) backward
    balance walk ran for every stream and raised 'unbalanced' on files
    that previously decoded fine."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    extra = (
        b"25 0 obj\n<< /Length 4 /T (a >> b) >>\nstream\nABCD\n"
        b"endstream\nendobj\n"
    )
    at = pdf.rindex(b"xref\n")
    assert extract_pdf_text(pdf[:at] + extra + pdf[at:]) == "H"


def test_pdf_dictless_object_before_container_not_double_parsed():
    """r9 review repro: a dict-less object (indirect integer, small
    array) sitting within 64 bytes of the next object let the scan
    window reach THAT object's dict — the container was parsed twice,
    every packed object was falsely flagged ambiguous, and the file
    raised. Must decode."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    pdf = _pack_objstm(_fontfile_pdf(ops, ttf), [7, 8])
    # insert a dict-less object IMMEDIATELY before the ObjStm object
    at = pdf.rindex(b"40 0 obj")
    pdf = pdf[:at] + b"39 0 obj\n123\nendobj\n" + pdf[at:]
    assert extract_pdf_text(pdf) == "Hi"
    # and before the Type0 font dict (object 5) — same pattern in the
    # font resolver's own scan
    pdf2 = _pack_objstm(_fontfile_pdf(ops, ttf), [7, 8])
    at5 = pdf2.index(b"5 0 obj")
    pdf2 = pdf2[:at5] + b"39 0 obj\n123\nendobj\n" + pdf2[at5:]
    assert extract_pdf_text(pdf2) == "Hi"


def test_pdf_comment_header_token_cannot_spoof_dict_ownership():
    """r9 review repro (pass 4): a '%' comment containing '12 0 obj'
    between a real font header and its dict must neither block the true
    owner (the file still decodes) nor claim the dict under the spoofed
    number — with object 5 duplicated across containers, the ambiguity
    check must still fire on 5, not silently pass on 12."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"

    def with_comment(pdf: bytes) -> bytes:
        at = pdf.index(b"5 0 obj\n")
        ins = at + len(b"5 0 obj\n")
        return pdf[:ins] + b"% see 12 0 obj\n" + pdf[ins:]

    # harmless comment: still decodes
    assert extract_pdf_text(with_comment(_fontfile_pdf(ops, ttf))) == "Hi"
    # object 5 duplicated raw+packed: ambiguity must still raise
    pdf = _pack_objstm(with_comment(_fontfile_pdf(ops, ttf)), [7, 8])
    at = pdf.rindex(b"xref\n")
    stale = (
        b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /EEEEEE+F "
        b"/Encoding /Identity-H /DescendantFonts [7 0 R] >>\nendobj\n"
    )
    pdf2 = _pack_objstm(pdf[:at] + stale + pdf[at:], [5], objstm_num=41)
    with _pytest.raises(ValueError, match="more than once"):
        extract_pdf_text(pdf2)


def test_pdf_comment_dict_in_object_body_not_resolved():
    """r9 review repro (pass 5): a %-comment containing a decoy dict
    between an object's header and its REAL dict must not be resolved
    as the object's value — '% << /FontFile2 99 0 R >>' before the real
    FontDescriptor previously decoded through the decoy program with
    ok=True ('ZQ' instead of 'Hi')."""
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    pdf = pdf.replace(
        b"8 0 obj\n<< /Type /FontDescriptor",
        b"8 0 obj\n% << /FontFile2 99 0 R >>\n<< /Type /FontDescriptor",
    )
    decoy = _zlib.compress(_mini_ttf({"Z": 3, "Q": 4}))
    at = pdf.rindex(b"xref\n")
    obj99 = (
        b"99 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\n"
        b"endstream\nendobj\n" % (len(decoy), decoy)
    )
    assert extract_pdf_text(pdf[:at] + obj99 + pdf[at:]) == "Hi"


def test_pdf_comment_containing_dict_open_does_not_block_owner():
    """r9 review (pass 5): a comment whose TEXT contains '<<' between a
    Type0 header and its real dict must not block resolution — the
    value lexer skips the whole comment."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    at = pdf.index(b"5 0 obj\n") + len(b"5 0 obj\n")
    pdf = pdf[:at] + b"% dict follows <<\n" + pdf[at:]
    assert extract_pdf_text(pdf) == "H"


def test_pdf_string_percent_does_not_break_resolution():
    """r9 review repro (pass 5): a legal '%' inside a string on the
    same line as a later object header must not make that header
    invisible (the line-based comment heuristic misread it, breaking
    files the previous release decoded AND un-flagging duplicates)."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    # put a string object with '%' on the SAME line as the descriptor's
    # header
    pdf = pdf.replace(
        b"8 0 obj\n<< /Type /FontDescriptor",
        b"31 0 obj (50% off) endobj 8 0 obj\n<< /Type /FontDescriptor",
    )
    assert extract_pdf_text(pdf) == "Hi"


def test_pdf_comment_header_token_cannot_hijack_obj_region():
    """A trailing '% 8 0 obj' comment must not win last-definition-wins
    object resolution — the FontDescriptor must still resolve to the
    real object 8, so the file keeps decoding."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    at = pdf.rindex(b"xref\n")
    decoy = b"% 8 0 obj\n30 0 obj\n<< /Decoy true >>\nendobj\n"
    assert extract_pdf_text(pdf[:at] + decoy + pdf[at:]) == "H"


def test_pdf_objstm_nonzero_generation_container_raises():
    """A container the gen-0 object scan cannot locate ('9 1 obj') must
    trip the parsed-vs-raw-token guard — its packed objects would stay
    silently unresolved otherwise."""
    import pytest as _pytest
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import (
        _objstm_synthesized,
    )

    comp = _zlib.compress(b"5 0 << /X 1 >>\n")
    doc = (
        b"%%PDF-1.5\n9 1 obj\n<< /Type /ObjStm /N 1 /First 4 /Length %d "
        b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    with _pytest.raises(ValueError, match="could not be located"):
        _objstm_synthesized(doc)


def test_pdf_objstm_conflicting_packed_copies_raise():
    """r9 review repro (pass 7): one object packed DIFFERENTLY in two
    containers — container order carries no liveness, so resolution
    must raise, never pick the last container's copy."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _pack_objstm(_fontfile_pdf(ops, ttf), [8])
    # second container packs a CONFLICTING copy of the FontDescriptor
    import zlib as _zlib

    body = b"8 0 " + b"<< /Type /FontDescriptor /FontFile2 13 0 R >>\n"
    comp = _zlib.compress(body)
    obj = (
        b"41 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length %d "
        b"/Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    at = pdf.rindex(b"xref\n")
    with _pytest.raises(ValueError, match="more than once"):
        extract_pdf_text(pdf[:at] + obj + pdf[at:])


def test_pdf_live_redefinition_invalidates_stale_font_object():
    """r9 review repro (pass 7): an incremental update that REPLACES a
    font object with a non-dict/streamless value must not leave the
    stale copy decodable — last definition governs, wrong type means
    unresolvable (error row), never 'H' from dead bytes."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    base = _fontfile_pdf(ops, ttf)
    for update in (
        b"9 0 obj\nnull\nendobj\n",  # program replaced by null
        b"8 0 obj\n<< /Type /Replaced >>\nendobj\n",  # descriptor gutted
        b"5 0 obj\nnull\nendobj\n",  # the Type0 dict itself nulled
        # the Type0 dict redefined as a non-Type0 font (r9 pass 8: the
        # stale Type0 copy must not govern past a live redefinition)
        b"5 0 obj\n<< /Subtype /Type1 /Replaced true >>\nendobj\n",
    ):
        with _pytest.raises(ValueError):
            extract_pdf_text(base + update)


def test_pdf_header_tokens_in_prose_do_not_poison_resolution():
    """r9 review repros (passes 8-9): header-shaped tokens that are not
    WELL-FORMED indirect objects (value + endobj/stream terminator) are
    not definitions — prose continuations ('in rev2', 'twice',
    '(fixed)') and even a dict-shaped comment payload without a
    terminator must neither poison nor redirect resolution of the real
    object."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    import pytest as _pytest

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    base = _fontfile_pdf(ops, ttf)
    # prose that cannot start a PDF value: not a claim at all — decode
    for tail in (
        b"% edited 8 0 obj in rev2\n",
        b"30 0 obj\n(see 8 0 obj)\nendobj\n",
    ):
        assert extract_pdf_text(base + tail) == "H", tail
    # value-LIKE prose ('twice' starts like 'true'; '(fixed)' is a full
    # string value with no endobj): MALFORMED claims — these poison the
    # object and raise (error row) rather than vanish, because
    # vanishing would let a stale copy silently win over a live
    # redefinition the grammar tier cannot read (r9 pass 10)
    for tail in (
        b"% edited 8 0 obj twice\n",
        b"% edited 8 0 obj (fixed)\n",
    ):
        with _pytest.raises(ValueError, match="could not be parsed"):
            extract_pdf_text(base + tail)


def test_pdf_comment_dict_payload_cannot_redirect_font_chain():
    """r9 review repro (pass 9): '% note: 8 0 obj << /FontFile2 20 0 R
    >>' — a header token in a comment followed by a dict-shaped payload
    — previously became object 8's last raw definition and silently
    redirected the font chain to a decoy program ('Z' with ok=True).
    Without an endobj terminator it is a MALFORMED claim: the file
    becomes an error row (never 'Z'; suffix-spoofed terminators like
    'streamlined'/'endobjective' and a bare 'stream' with no EOL are
    equally non-terminators, r9 pass 10)."""
    import pytest as _pytest
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    decoy = _zlib.compress(_mini_ttf({"Z": 3}))
    at = pdf.rindex(b"xref\n")
    head = (
        b"20 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\n"
        b"endstream\nendobj\n" % (len(decoy), decoy)
    )
    for suffix in (
        b">>\n",
        b">> streamlined junk\n",
        b">> endobjective\n",
        b">> stream",  # truly bare: no EOL after the keyword
        b">> stream\n",  # EOL but no /Length, so no verifiable body
    ):
        extra = (
            head
            + b"%% note: 8 0 obj << /Type /FontDescriptor /FontFile2 20 0 R "
            + suffix
        )
        with _pytest.raises(ValueError, match="could not be parsed"):
            extract_pdf_text(pdf[:at] + extra + pdf[at:])
    # ordering variant (r9 pass 11): the decoy stream AFTER the comment
    # payload — its own endstream must not certify the spoofed claim
    extra2 = (
        b"%% note: 8 0 obj << /Type /FontDescriptor /FontFile2 20 0 R "
        b">> stream\n" + head
    )
    with _pytest.raises(ValueError, match="could not be parsed"):
        extract_pdf_text(pdf[:at] + extra2 + pdf[at:])


def test_pdf_stream_claim_verification_edges():
    """r9 review (pass 12): three stream-claim edges — a spoofed
    comment payload WITH its own /Length+body+endstream but no endobj
    raises (never 'Z'); '/Length 1' inside a string does not shadow
    the real key; an INDIRECT /Length resolves through its integer
    object and stays well-formed."""
    import pytest as _pytest
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import (
        _object_defs,
        extract_pdf_text,
    )

    # 1. /Length-carrying spoof without endobj: malformed -> raise
    ttf = _mini_ttf({"H": 3})
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    decoy = _zlib.compress(_mini_ttf({"Z": 3}))
    at = pdf.rindex(b"xref\n")
    extra = (
        b"20 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\n"
        b"endstream\nendobj\n"
        b"%% note: 8 0 obj << /Type /FontDescriptor /FontFile2 20 0 R "
        b"/Length 4 >> stream\nABCD\nendstream\n" % (len(decoy), decoy)
    )
    with _pytest.raises(ValueError, match="could not be parsed"):
        extract_pdf_text(pdf[:at] + extra + pdf[at:])

    # 2. '/Length 1' inside a string must not shadow the real key
    doc = (
        b"5 0 obj\n<< /Note (/Length 1) /Length 4 >>\nstream\nABCD\n"
        b"endstream\nendobj\n"
    )
    assert _object_defs(doc) == [(5, 8, True)]

    # 3. indirect /Length resolves through the integer object
    doc2 = (
        b"5 0 obj\n<< /Length 6 0 R >>\nstream\nABCD\nendstream\nendobj\n"
        b"6 0 obj\n4\nendobj\n"
    )
    assert (5, 8, True) in _object_defs(doc2)
    # 3b. '+4' is a legal non-negative integer (r9 pass 14)
    assert (5, 8, True) in _object_defs(doc2.replace(b"\n4\n", b"\n+4\n"))
    # 3c. an EARLIER non-integer claim on the length object must not
    # poison a later honest integer redefinition (last claim governs)
    doc3 = b"6 0 obj\n<< /Old 1 >>\nendobj\n" + doc2
    assert (5, 36, True) in _object_defs(doc3)


def test_pdf_stream_claim_hardening_pass13():
    """r9 review (pass 13): a NEGATIVE indirect /Length must not verify
    a stream claim (expect pointed backwards/wrapped); a claim that
    tunes its /Length to borrow the NEXT object's endstream poisons
    BOTH claims (each endstream terminates exactly one object); and
    '(/Length 2)' inside a string must not shadow the real length at
    the DECODE tier either."""
    from document_vector_indexer_spark.sources.minidoc import (
        _body_candidates,
        _object_defs,
    )

    # negative indirect length -> malformed
    doc = (
        b"5 0 obj\n<< /Length 6 0 R /A endstream endobj >>\n"
        b"stream\nGARBAGE"
        b"6 0 obj\n-27\nendobj\n"
    )
    assert all(not ok for n, v, ok in _object_defs(doc) if n == 5)

    # borrowed endstream: both claims poisoned. Tune 8's /Length so
    # its expect lands EXACTLY on object 9's endstream (r9 pass 14:
    # the first cut used a mis-tuned 21 and never exercised the
    # uniqueness loop) — compute the offset instead of hand-counting.
    body = b"ABCDEFGH"
    inner = (
        b"9 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(body), body)
    )
    tuned = inner.index(b"\nendstream")  # 8's body = everything before
    doc2 = (
        b"8 0 obj\n<< /Length %d >>\nstream\n" % tuned
    ) + inner
    got = {n: ok for n, v, ok in _object_defs(doc2)}
    assert got.get(8) is not True
    assert got.get(9) is not True  # the borrowed terminator poisons 9 too

    # string-shadowed /Length at the decode tier
    sdict = b"<< /Note (/Length 2) /Length 4 >>"
    data = b"X" * 10 + b"ABCD\nendstream\n"
    cands = _body_candidates(sdict, data, 10)
    assert cands[0] == b"ABCD"


def test_pdf_compact_hex_string_in_dict_parses():
    """r9 review (pass 11): the compact form '<</ID<FEFF>>>' — a hex
    string's closing '>' directly abutting the dict's '>>' — must parse
    to the full dict, not truncate one byte short (which marked legal
    objects malformed under the poison policy)."""
    from document_vector_indexer_spark.sources.minidoc import (
        _balanced_dict,
        _object_defs,
    )

    assert _balanced_dict(b"<</ID<FEFF>>>", 0) == b"<</ID<FEFF>>>"
    defs = _object_defs(b"8 0 obj\n<</ID<FEFF>>>\nendobj\n")
    assert defs == [(8, 8, True)]


def test_pdf_objstm_comment_before_stream_keyword_parses():
    """r9 review (pass 11): a %-comment between the container dict and
    the stream keyword is legal between tokens — the container must
    still synthesize (the grammar tier certified it; the synthesizer's
    own stream match must agree)."""
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import (
        _objstm_synthesized,
    )

    comp = _zlib.compress(b"5 0 << /X 1 >>\n")
    doc = (
        b"%%PDF-1.5\n40 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length "
        b"%d /Filter /FlateDecode >> %% see rev2\nstream\n%s\nendstream\n"
        b"endobj\n" % (len(comp), comp)
    )
    assert b"5 0 obj" in _objstm_synthesized(doc)


def test_pdf_redefined_away_font_raises_not_merged_map_decode():
    """r9 review repro (pass 9): with TWO embedded fonts whose gid
    spaces collide, an incremental update nulling the second font must
    RAISE — its show strings may still reference the dead font's gids,
    which would otherwise decode through the surviving font's merged
    map with ok=True."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(
        ops, _mini_ttf({"H": 3}), second_ttf=_mini_ttf({"Z": 3})
    )
    # sanity: both alive -> conflicting maps raise already
    with _pytest.raises(ValueError, match="conflicting glyph maps"):
        extract_pdf_text(pdf)
    # second font redefined away: must STILL raise, never decode 'H'
    with _pytest.raises(ValueError, match="redefined away"):
        extract_pdf_text(pdf + b"10 0 obj\nnull\nendobj\n")


def test_pdf_identical_duplicate_type0_still_decodes():
    """r9 review repro (pass 7): an incremental update appending a
    byte-identical copy of the Type0 font object (resources rewritten
    unchanged) must keep decoding."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    pdf = _fontfile_pdf(ops, ttf)
    import re as _re

    m = _re.search(rb"5 0 obj\n.*?\nendobj\n", pdf, _re.S)
    assert extract_pdf_text(pdf + m.group(0)) == "Hi"


def test_pdf_objstm_unrelated_duplicate_still_decodes():
    """The standard incremental-update shape — a stale top-level copy of
    an object whose live version is ObjStm-packed — must NOT abort the
    file when font resolution never touches that object (r9 review: the
    eager duplicate raise regressed files that decoded fine before)."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "i": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    pdf = _pack_objstm(_fontfile_pdf(ops, ttf), [7, 8])
    # object 3 (the page dict) gets a second, packed copy: duplicated,
    # but irrelevant to the font chain
    at = pdf.rindex(b"xref\n")
    stale = b"3 0 obj\n<< /Type /Page /Stale true >>\nendobj\n"
    # pack the stale copy into a SECOND ObjStm so 3 is raw+packed
    pdf2 = _pack_objstm(pdf[:at] + stale + pdf[at:], [3], objstm_num=41)
    # _pack_objstm removed the FIRST raw definition of 3; the original
    # page object is still present, so 3 is defined raw AND packed
    assert extract_pdf_text(pdf2) == "Hi"


def test_pdf_type0_fontfile_indirect_encoding_raises():
    """r8 review repro: '/Encoding 12 0 R' (an embedded-CMap stream,
    the standard non-Identity form) previously slipped the literal-
    name guard and decoded as if Identity-H — must raise."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ttf = _mini_ttf({"H": 3, "e": 4})
    ops = b"BT /F1 12 Tf 0 0 Td <00030004> Tj ET"
    pdf = _fontfile_pdf(ops, ttf).replace(
        b"/Encoding /Identity-H", b"/Encoding 12 0 R"
    )
    with _pytest.raises(ValueError, match="literal Identity CMap"):
        extract_pdf_text(pdf)


def test_pdf_type0_fontfile_hostile_cmap_budget_per_iteration():
    """r8 review repro: a format-4 table whose entries all resolve to
    gid 0 (skipped) must still consume budget — otherwise a ~2 KB
    compressed font spins unbounded CPU. Must raise promptly."""
    import struct
    import time

    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    # 32 segments × 8192 codes, idRangeOffset -> zeroed glyphIdArray:
    # every lookup yields gid 0 and maps nothing
    seg_n = 33  # 32 + terminator
    ends, starts, deltas, ros = b"", b"", b"", b""
    for i in range(32):
        s = i * 2000
        ends += struct.pack(">H", s + 1999)
        starts += struct.pack(">H", s)
        deltas += struct.pack(">H", 0)
        # point every segment's range reads at the shared zero block
        ros += struct.pack(">H", 2 * (seg_n - i) + 2)
    ends += b"\xff\xff"
    starts += b"\xff\xff"
    deltas += struct.pack(">H", 1)
    ros += b"\x00\x00"
    zeros = b"\x00\x00" * 4200
    sub = (
        struct.pack(">HHHHHHH", 4, 0, 0, seg_n * 2, 2, 0, 0)
        + ends + b"\x00\x00" + starts + deltas + ros + zeros
    )
    cmap_table = (
        struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    )
    sfnt = b"\x00\x01\x00\x00" + struct.pack(">HHHH", 1, 16, 0, 0)
    sfnt += b"cmap" + struct.pack(">III", 0, 28, len(cmap_table))
    sfnt += cmap_table
    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    t0 = time.monotonic()
    with _pytest.raises(ValueError, match="size bound|missing from"):
        extract_pdf_text(_fontfile_pdf(ops, sfnt))
    assert time.monotonic() - t0 < 5.0


def test_pdf_type0_fontfile_partial_resolution_raises():
    """A file where ONE Type0 font resolves to its program while a
    second Type0 font has no resolvable chain must raise — the
    unresolved font's gids would otherwise decode through the wrong
    font's map whenever the gid spaces collide."""
    import pytest as _pytest

    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, _mini_ttf({"H": 3}))
    # a second Type0 font object with NO DescendantFonts chain
    extra = (
        b"30 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont "
        b"/CCCCCC+Font /Encoding /Identity-H >>\nendobj\n"
    )
    at = pdf.rindex(b"xref\n")
    pdf = pdf[:at] + extra + pdf[at:]
    with _pytest.raises(ValueError, match="only some Type0 fonts"):
        extract_pdf_text(pdf)


def test_pdf_type0_fontfile_incremental_update_uses_last_object():
    """Incremental updates append the LIVE object after the stale one;
    resolution must read the last definition (here the stale
    FontDescriptor points at a gid-3='Z' program, the appended update
    at the real gid-3='H' one)."""
    from document_vector_indexer_spark.sources.minidoc import extract_pdf_text

    import zlib as _zlib

    ops = b"BT /F1 12 Tf 0 0 Td <0003> Tj ET"
    pdf = _fontfile_pdf(ops, _mini_ttf({"Z": 3}))
    # incremental update: re-define object 9 with the corrected font
    new_ttf = _mini_ttf({"H": 3})
    b2 = _zlib.compress(new_ttf)
    update = (
        b"9 0 obj\n<< /Length %d /Length1 %d /Filter /FlateDecode "
        b">>\nstream\n%s\nendstream\nendobj\n" % (len(b2), len(new_ttf), b2)
    )
    pdf = pdf + update  # appended after %%EOF, like real updates
    assert extract_pdf_text(pdf) == "H"


def test_pdf_objstm_duplicate_offset_raises_eagerly():
    """r10 (ADVICE): EQUAL adjacent ObjStm offsets must hit the eager
    'not strictly ascending' raise — the old `offs != sorted(offs)`
    check accepted duplicates, synthesizing a zero-length first value
    (its bytes attributed wholly to the next object) that degraded to a
    vague downstream unresolved-font failure."""
    import pytest as _pytest
    import zlib as _zlib

    from document_vector_indexer_spark.sources.minidoc import (
        _objstm_synthesized,
    )

    # two objects claiming the SAME offset 0
    comp = _zlib.compress(b"5 0 6 0 << /X 1 >>\n")
    doc = (
        b"%%PDF-1.5\n40 0 obj\n<< /Type /ObjStm /N 2 /First 8 /Length "
        b"%d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    with _pytest.raises(ValueError, match="strictly ascending"):
        _objstm_synthesized(doc)


def test_pdf_length_key_followed_by_comment_resolves():
    """r10 (ADVICE): a %-comment between /Length and its integer is a
    legal token separator (ISO 32000-1 §7.2.4) — the stripper now emits
    a space for comment spans so the /Length regexes still match; the
    NUL placeholder stays only for string spans where it guards against
    '/Length (x) 4' token joining."""
    from document_vector_indexer_spark.sources.minidoc import (
        _strip_strings_comments,
        _stream_length,
    )

    sdict = b"<< /Length % revised in rev2\n42 /Note (/Length 1) >>"
    toks = _strip_strings_comments(sdict)
    assert _stream_length(b"", [], sdict, 0) == 42
    # the string span stays NUL-masked (token-join guard intact)
    assert b"\x00" in toks and b"/Length 1" not in toks
