"""Pure-stdlib document text extractors — the fallback tier under the
native kernels (reference R1/R2, /root/reference/index_documents.py:
38-55). When pymupdf / python-docx are absent (as in this container),
these run R1/R2 for REAL instead of stubbing: both formats are public
specifications implementable with the standard library alone.

Scope (documented, raise-on-exceed — a failed file must surface as an
error row, never as silent empty text):

- PDF (ISO 32000): literal content streams, uncompressed or
  FlateDecode (stdlib zlib). Text-showing operators Tj ' \" TJ with
  literal ``(...)`` strings (full escape table: \\n \\r \\t \\b \\f
  \\( \\) \\\\, octal \\ddd, line continuations) and hex ``<...>``
  strings; newline on Td/TD/T*/ET and the '/\" operators. Byte-to-text
  via latin-1 (identity map) — correct for the standard-encoding ASCII
  range; custom font /Encoding and CID maps are native-kernel
  territory, NOT re-implemented here.
- DOCX (ECMA-376): ``word/document.xml`` out of the zip container,
  paragraphs = ``w:p``, runs' ``w:t`` text plus tab/br elements —
  mirroring python-docx's paragraph iteration so both kernel tiers
  produce the same join (binary_docs joins non-empty paragraphs with
  a newline, reference index_documents.py:51-55).

Encrypted PDFs, non-Flate filters (DCT/LZW/...), and object streams
raise ``ValueError`` with the reason.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ElementTree
import zipfile
import zlib

_STREAM_DICT_RE = re.compile(rb"<<(.*?)>>\s*stream(?:\r\n|\n|\r)", re.S)

# PDF literal-string escapes (ISO 32000-1 §7.3.4.2)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _content_streams(data: bytes) -> list[bytes]:
    """Every decodable stream body in the file. Cross-reference tables
    are deliberately not consulted: a linear scan finds the same
    streams and also survives mildly damaged files."""
    out: list[bytes] = []
    for m in _STREAM_DICT_RE.finditer(data):
        sdict = m.group(1)
        start = m.end()
        end = data.find(b"endstream", start)
        if end == -1:
            continue
        raw = data[start:end]
        # spec: EOL before the endstream keyword is not stream data
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        if b"/FlateDecode" in sdict:
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"pdf: broken FlateDecode stream: {e}") from e
        elif b"/Filter" in sdict:
            # some other filter (DCTDecode images, LZW, ...) — not a
            # text content stream we can read; skip, don't fail: the
            # page text may live in a plain/Flate stream alongside
            continue
        out.append(raw)
    return out


def _unescape_literal(body: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = body[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt in (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
            # octal digits only — \8 / \9 are invalid escapes some
            # generators emit; they fall to the ignore branch below
            # (spec: drop the reverse solidus) instead of aborting
            j = i + 1
            while (
                j < len(body)
                and j < i + 4
                and body[j] in b"01234567"
            ):
                j += 1
            out.append(int(body[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
            if nxt == b"\r" and body[i : i + 1] == b"\n":
                i += 1
        else:  # lone backslash: drop it (spec: ignore)
            i += 1
    return bytes(out)


def _parse_text_ops(stream: bytes) -> list[str]:
    """One linear scan of a content stream, collecting the strings fed
    to text-showing operators and newlines for line-moving ones."""
    pieces: list[str] = []
    pending: list[str] = []
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c == b"(":
            depth, j = 1, i + 1
            buf = bytearray()
            while j < n and depth:
                ch = stream[j : j + 1]
                if ch == b"\\":
                    buf += stream[j : j + 2]
                    j += 2
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                    if not depth:
                        break
                buf += ch
                j += 1
            pending.append(_unescape_literal(bytes(buf)).decode("latin-1"))
            i = j + 1
        elif c == b"<" and stream[i + 1 : i + 2] == b"<":
            i += 2  # dictionary opener (BDC/DP property lists) — skip
            # atomically so its second '<' can't read as a hex string
        elif c == b"<":
            j = stream.find(b">", i)
            if j == -1:
                break
            hexbody = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hexbody) % 2:
                hexbody += b"0"
            try:
                pending.append(
                    bytes.fromhex(hexbody.decode("ascii")).decode("latin-1")
                )
            except (ValueError, UnicodeDecodeError):
                pass  # not a hex string after all — skip, don't abort
            i = j + 1
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and stream[j : j + 1] not in b" \t\r\n()<>[]/%":
                j += 1
            op = stream[i:j]
            if op in (b"Tj", b"TJ"):
                pieces.extend(pending)
            elif op in (b"'", b'"'):
                pieces.append("\n")
                pieces.extend(pending)
            elif op in (b"Td", b"TD", b"T*", b"ET"):
                pieces.append("\n")
            pending.clear()
            i = j if j > i else i + 1
        else:
            i += 1
    return pieces


def extract_pdf_text(content: bytes) -> str:
    """Text of all readable content streams, lines normalized (per-line
    rstrip, outer blank lines dropped). Raises ValueError when the file
    is not a readable PDF — the caller records an error row."""
    if not content.startswith(b"%PDF-"):
        raise ValueError("pdf: missing %PDF header")
    if b"/Encrypt" in content:
        raise ValueError("pdf: encrypted documents are not supported")
    if b"/Identity-H" in content or b"/Type0" in content:
        # composite/CID fonts store GLYPH INDICES in their show
        # strings — latin-1 decoding them would return mojibake with
        # ok=True, violating the error-rows-never-silent-garbage
        # contract. Native kernels (pymupdf) handle these.
        raise ValueError(
            "pdf: composite/CID font encodings (Identity-H/Type0) are "
            "not supported by the stdlib tier"
        )
    pieces: list[str] = []
    for stream in _content_streams(content):
        if b"BT" not in stream:
            continue
        pieces.extend(_parse_text_ops(stream))
    if not pieces:
        raise ValueError("pdf: no readable text content streams")
    lines = [ln.rstrip() for ln in "".join(pieces).split("\n")]
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx_text(content: bytes) -> str:
    """Paragraph text of word/document.xml, non-empty paragraphs joined
    with newlines — the same shape python-docx's paragraph loop yields
    (reference index_documents.py:51-55)."""
    try:
        with zipfile.ZipFile(io.BytesIO(content)) as z:
            xml_bytes = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError(f"docx: not a DOCX container: {e}") from e
    try:
        root = ElementTree.fromstring(xml_bytes)
    except ElementTree.ParseError as e:
        raise ValueError(f"docx: broken document.xml: {e}") from e
    paras: list[str] = []
    for p in root.iter(_W + "p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == _W + "t":
                parts.append(node.text or "")
            elif node.tag == _W + "tab":
                parts.append("\t")
            elif node.tag in (_W + "br", _W + "cr"):
                parts.append("\n")
        text = "".join(parts)
        if text:
            paras.append(text)
    return "\n".join(paras)
