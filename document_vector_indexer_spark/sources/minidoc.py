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
  range. Stream bodies are sliced by the dict's direct ``/Length``
  when present (exact even when the data ends in EOL bytes), else by
  an ``endstream`` scan with a decompress-retry over the ambiguous
  EOL-strip variants. Simple-font ``/Encoding /Differences`` maps are
  APPLIED when every glyph name is in the public Adobe-Glyph-List
  subset below and the maps don't conflict across fonts; otherwise
  the file raises (error row, never mojibake). Composite/CID (Type0,
  Identity-H) fonts are decoded through the writer's embedded
  ``/ToUnicode`` CMap (ISO 32000-1 §9.10.3: bfchar/bfrange to
  UTF-16BE) under the same policy — one consistent merged map, every
  code used must be mapped; mixed code widths or Type0+Differences
  files raise. Type0 WITHOUT a ToUnicode CMap stays native-kernel
  territory (the bytes are arbitrary glyph indices).
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
import unicodedata
import xml.etree.ElementTree as ElementTree
import zipfile
import zlib
from typing import Callable, Optional

_STREAM_DICT_RE = re.compile(rb"<<(.*?)>>\s*stream(?:\r\n|\n|\r)", re.S)

# direct /Length only — "/Length 5 0 R" (indirect reference) must fall
# back to the endstream scan
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")

# PDF literal-string escapes (ISO 32000-1 §7.3.4.2)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


# --- simple-font /Encoding /Differences support (round-6) -------------
#
# pdfTeX/LaTeX subset fonts remap byte codes via /Encoding <<
# /Differences [code /name ...] >>. Decoding those bytes as latin-1 is
# silent mojibake, so the tier either APPLIES the map (glyph names it
# knows, one consistent map per file) or RAISES (unknown glyph names,
# or conflicting per-font maps — per-font Tf tracking is native-kernel
# territory). Glyph names per the public Adobe Glyph List.

def _build_glyph_table() -> dict[str, str]:
    t: dict[str, str] = {
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
        "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
        "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
        "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
        "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
        "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
        "backslash": "\\", "bracketright": "]", "asciicircum": "^",
        "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~",
        # typographic / latin-1 punctuation and symbols
        "quoteleft": "‘", "quoteright": "’",
        "quotedblleft": "“", "quotedblright": "”",
        "quotesinglbase": "‚", "quotedblbase": "„",
        "endash": "–", "emdash": "—", "bullet": "•",
        "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
        "guillemotleft": "«", "guillemotright": "»",
        "guilsinglleft": "‹", "guilsinglright": "›",
        "exclamdown": "¡", "questiondown": "¿",
        "cent": "¢", "sterling": "£", "currency": "¤",
        "yen": "¥", "brokenbar": "¦", "section": "§",
        "dieresis": "¨", "copyright": "©",
        "ordfeminine": "ª", "logicalnot": "¬",
        "registered": "®", "macron": "¯", "degree": "°",
        "plusminus": "±", "twosuperior": "²",
        "threesuperior": "³", "acute": "´", "micro": "µ",
        "mu": "µ", "paragraph": "¶", "periodcentered": "·",
        "cedilla": "¸", "onesuperior": "¹",
        "ordmasculine": "º", "onequarter": "¼",
        "onehalf": "½", "threequarters": "¾",
        "multiply": "×", "divide": "÷", "Euro": "€",
        "florin": "ƒ", "trademark": "™", "minus": "−",
        "fraction": "⁄", "perthousand": "‰",
        "circumflex": "ˆ", "tilde": "˜", "caron": "ˇ",
        "breve": "˘", "dotaccent": "˙", "ring": "˚",
        "ogonek": "˛", "hungarumlaut": "˝",
        # letters with no accent-compose name
        "germandbls": "ß", "ae": "æ", "AE": "Æ",
        "oe": "œ", "OE": "Œ", "oslash": "ø",
        "Oslash": "Ø", "eth": "ð", "Eth": "Ð",
        "thorn": "þ", "Thorn": "Þ", "dotlessi": "ı",
        "lslash": "ł", "Lslash": "Ł",
        # ligatures (pdfTeX subset fonts)
        "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ",
        "ffi": "ﬃ", "ffl": "ﬄ",
    }
    for ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
        t[ch] = ch
    accents = {
        "grave": "\u0300", "acute": "\u0301", "circumflex": "\u0302",
        "tilde": "\u0303", "macron": "\u0304", "breve": "\u0306",
        "dotaccent": "\u0307", "dieresis": "\u0308", "ring": "\u030a",
        "hungarumlaut": "\u030b", "caron": "\u030c",
        "cedilla": "\u0327", "ogonek": "\u0328",
    }
    for base in (
        "AaEeIiOoUuYyNnCcSsZzGgKkLlRrTtDdHhWw"
    ):
        for acc, comb in accents.items():
            composed = unicodedata.normalize("NFC", base + comb)
            if len(composed) == 1:
                t[base + acc] = composed
    return t


_GLYPHS = _build_glyph_table()
_DIFF_RE = re.compile(rb"/Differences\s*\[([^\]]*)\]")
_DIFF_TOKEN_RE = re.compile(rb"(\d+)|/([A-Za-z0-9._]+)")


def _glyph_to_char(name: str) -> Optional[str]:
    if name in _GLYPHS:
        return _GLYPHS[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else None
    return None


def _differences_map(scan: bytes) -> dict[int, str]:
    """One merged code->char map from every /Differences array found in
    the raw file AND its decompressed streams (so encodings hidden in
    object streams are still seen). Raises rather than guess: unknown
    glyph names or two fonts remapping the same code differently would
    both be silent mojibake under a merged map."""
    mapping: dict[int, str] = {}
    for dm in _DIFF_RE.finditer(scan):
        code: Optional[int] = None
        for tok in _DIFF_TOKEN_RE.finditer(dm.group(1)):
            if tok.group(1) is not None:
                code = int(tok.group(1))
                continue
            if code is None or not 0 <= code <= 255:
                raise ValueError(
                    "pdf: malformed /Differences array (glyph name "
                    "without a preceding in-range code)"
                )
            name = tok.group(2).decode("ascii")
            ch = _glyph_to_char(name)
            if ch is None:
                raise ValueError(
                    f"pdf: /Differences glyph /{name} is outside the "
                    "stdlib tier's glyph table (native-kernel territory)"
                )
            prev = mapping.get(code)
            if prev is not None and prev != ch:
                raise ValueError(
                    "pdf: conflicting /Differences maps across fonts — "
                    "per-font encoding tracking is native-kernel territory"
                )
            mapping[code] = ch
            code += 1
    return mapping


# --- Type0/CID fonts via /ToUnicode CMaps (round-6) -------------------
#
# Composite fonts (Identity-H) store GLYPH CODES in their show strings;
# the bytes mean nothing without a map. When the writer embedded a
# /ToUnicode CMap (ISO 32000-1 §9.10.3 — pdfTeX, LibreOffice, Chrome
# print-to-PDF all do), the map IS the public decoding: bfchar/bfrange
# entries from code to UTF-16BE text. Same merged-map policy as
# /Differences: one consistent map per file, every code used must be
# mapped, or raise — never silent garbage. Files with Type0 fonts and
# NO ToUnicode stay native-kernel territory.

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_TOKEN_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>|(\[)|(\])")


def _utf16be(hexbody: bytes) -> str:
    raw = bytes.fromhex(re.sub(rb"\s", b"", hexbody).decode("ascii"))
    if len(raw) % 2:
        raise ValueError("pdf: odd-length UTF-16BE value in ToUnicode CMap")
    return raw.decode("utf-16-be")


def _tounicode_map(scan: bytes) -> "tuple[dict[int, str], int]":
    """(merged code->text map, source code width in bytes) from every
    bfchar/bfrange section in the raw file and its decompressed
    streams. Raises on conflicting entries, mixed code widths, or
    malformed sections — each would decode to wrong text silently."""
    mapping: dict[int, str] = {}
    width: Optional[int] = None

    def note_width(hexbody: bytes) -> int:
        nonlocal width
        digits = len(re.sub(rb"\s", b"", hexbody))
        if digits == 0 or digits % 2:
            raise ValueError("pdf: malformed hex code in ToUnicode CMap")
        w = digits // 2
        if width is None:
            width = w
        elif width != w:
            raise ValueError(
                "pdf: mixed source code widths across ToUnicode CMaps — "
                "per-font decoding is native-kernel territory"
            )
        return w

    def put(code: int, text: str) -> None:
        prev = mapping.get(code)
        if prev is not None and prev != text:
            raise ValueError(
                "pdf: conflicting ToUnicode maps across fonts — "
                "per-font decoding is native-kernel territory"
            )
        mapping[code] = text

    for sec in _BFCHAR_RE.finditer(scan):
        toks = [
            t.group(1)
            for t in _CMAP_TOKEN_RE.finditer(sec.group(1))
            if t.group(1) is not None
        ]
        if len(toks) % 2:
            raise ValueError("pdf: malformed bfchar section (odd token count)")
        for k in range(0, len(toks), 2):
            note_width(toks[k])
            put(int(toks[k], 16), _utf16be(toks[k + 1]))

    for sec in _BFRANGE_RE.finditer(scan):
        toks = [
            t.group(1) if t.group(1) is not None else t.group(0)
            for t in _CMAP_TOKEN_RE.finditer(sec.group(1))
        ]
        i = 0
        while i < len(toks):
            if i + 2 >= len(toks) or toks[i] in (b"[", b"]") or toks[i + 1] in (b"[", b"]"):
                raise ValueError("pdf: malformed bfrange section")
            note_width(toks[i])
            note_width(toks[i + 1])  # hi must match lo's width — a
            # narrower hi token reads as a smaller code and silently
            # truncates the range (bfchar-path strictness, r7 ADVICE)
            lo, hi = int(toks[i], 16), int(toks[i + 1], 16)
            if hi < lo:
                raise ValueError("pdf: malformed bfrange (hi < lo)")
            dst = toks[i + 2]
            if dst == b"[":  # one explicit value per code
                j = i + 3
                code = lo
                while j < len(toks) and toks[j] != b"]":
                    put(code, _utf16be(toks[j]))
                    code += 1
                    j += 1
                if j >= len(toks) or code != hi + 1:
                    raise ValueError(
                        "pdf: bfrange array length does not match range"
                    )
                i = j + 1
            else:
                # scalar start value: consecutive codes increment the
                # LAST UTF-16 code unit (spec §9.10.3) and shall not
                # overflow it — wrapping would silently map trailing
                # codes to U+0000.. (raise-never-guess)
                base_raw = bytes.fromhex(
                    re.sub(rb"\s", b"", dst).decode("ascii")
                )
                if len(base_raw) % 2:
                    raise ValueError(
                        "pdf: odd-length UTF-16BE value in ToUnicode CMap"
                    )
                last = int.from_bytes(base_raw[-2:], "big")
                if last + (hi - lo) > 0xFFFF:
                    raise ValueError(
                        "pdf: bfrange increments past U+FFFF (spec "
                        "§9.10.3 forbids overflowing the last code unit)"
                    )
                for off in range(hi - lo + 1):
                    raw = base_raw[:-2] + (last + off).to_bytes(2, "big")
                    put(lo + off, raw.decode("utf-16-be"))
                i += 3
    return mapping, (width or 0)


# --- Type0/CID fonts WITHOUT /ToUnicode: the embedded font's own
# 'cmap' table (round-8). An Identity-H Type0 font's show strings
# carry GLYPH IDS (CID == GID when /CIDToGIDMap is Identity); when the
# writer embedded the TrueType/OpenType font program (/FontFile2, an
# sfnt container — also found via an /ObjStm-free linear scan since
# sfnt magic starts the stream body), the font's own unicode cmap
# (OpenType 'cmap' table, subtable formats 4/12/6/0) maps
# unicode -> gid, and its inverse is the decoding the reference
# reaches through pymupdf's font machinery (index_documents.py:38-47).
# Same merged-map never-silent-garbage policy as /Differences and
# /ToUnicode: guards raise for non-Identity CIDToGIDMap, named CMap
# encodings beyond Identity-H/V, conflicting glyph maps across
# multiple embedded programs, and unmapped gids at decode time.
# Glyphs reachable from several code points (space/nbsp-style
# unification) invert to the SMALLEST code point, deterministically —
# the single normalization every text extractor must make.

_SFNT_MAGIC = (b"\x00\x01\x00\x00", b"true", b"OTTO")
_SFNT_CMAP_BUDGET = 1 << 17  # mapped-codepoint cap for hostile fonts


def _sfnt_cmap_unicode_to_gid(font: bytes) -> dict[int, int]:
    """unicode code point -> glyph id from an sfnt font program's best
    unicode 'cmap' subtable. Raises on missing/era-exotic subtables or
    malformed/oversized tables — never guesses."""
    import struct

    def u16(o: int) -> int:
        return struct.unpack_from(">H", font, o)[0]

    def u32(o: int) -> int:
        return struct.unpack_from(">I", font, o)[0]

    try:
        cmap_off = None
        for i in range(u16(4)):
            rec = 12 + 16 * i
            if font[rec : rec + 4] == b"cmap":
                cmap_off = u32(rec + 8)
                break
        if cmap_off is None:
            raise ValueError("pdf: embedded font program has no cmap table")
        best, best_rank = None, 0
        for i in range(u16(cmap_off + 2)):
            rec = cmap_off + 4 + 8 * i
            plat, enc = u16(rec), u16(rec + 2)
            # unicode subtables only; full-repertoire first
            rank = {
                (3, 10): 4, (0, 6): 4, (0, 4): 4,  # UCS-4
                (3, 1): 3, (0, 3): 3,              # BMP
                (0, 0): 2, (0, 1): 2, (0, 2): 2,   # legacy unicode
            }.get((plat, enc), 0)
            if rank > best_rank:
                best_rank, best = rank, cmap_off + u32(rec + 4)
        if best is None:
            raise ValueError(
                "pdf: embedded font cmap has no unicode subtable — "
                "symbol-encoded fonts are native-kernel territory"
            )
        fmt = u16(best)
        out: dict[int, int] = {}
        budget = _SFNT_CMAP_BUDGET

        def add(cp: int, gid: int) -> None:
            # budget charges per ITERATION, not per kept entry — a
            # hostile table whose entries all skip (gid 0, surrogate,
            # out-of-range) would otherwise spin unbounded CPU from a
            # ~2 KB compressed font (r8 review)
            nonlocal budget
            budget -= 1
            if budget < 0:
                raise ValueError(
                    "pdf: embedded font cmap exceeds the stdlib tier's "
                    "size bound"
                )
            if gid == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                return
            out[cp] = gid

        if fmt == 4:
            segx2 = u16(best + 6)
            seg = segx2 // 2
            starts_base = best + 16 + segx2  # past endCodes + reservedPad
            ro_base = starts_base + 2 * segx2  # past startCodes + idDeltas
            for i in range(seg):
                end = u16(best + 14 + 2 * i)
                start = u16(starts_base + 2 * i)
                delta = struct.unpack_from(
                    ">h", font, starts_base + segx2 + 2 * i
                )[0]
                ro = u16(ro_base + 2 * i)
                for c in range(start, end + 1):
                    if c == 0xFFFF:
                        continue
                    if ro == 0:
                        gid = (c + delta) & 0xFFFF
                    else:
                        gid = u16(ro_base + 2 * i + ro + 2 * (c - start))
                        if gid:
                            gid = (gid + delta) & 0xFFFF
                    add(c, gid)
        elif fmt == 12:
            for g in range(u32(best + 12)):
                go = best + 16 + 12 * g
                sc, ec, sg = u32(go), u32(go + 4), u32(go + 8)
                if ec < sc or ec - sc > _SFNT_CMAP_BUDGET:
                    raise ValueError(
                        "pdf: malformed embedded font cmap group"
                    )
                for k in range(ec - sc + 1):
                    add(sc + k, sg + k)
        elif fmt == 6:
            first, cnt = u16(best + 6), u16(best + 8)
            for k in range(cnt):
                add(first + k, u16(best + 10 + 2 * k))
        elif fmt == 0:
            for c in range(256):
                add(c, font[best + 6 + c])
        else:
            raise ValueError(
                f"pdf: embedded font cmap subtable format {fmt} is "
                "native-kernel territory"
            )
        return out
    except (struct.error, IndexError) as e:
        raise ValueError("pdf: malformed embedded font program") from e


_REF_RE = re.compile(rb"(\d+)\s+0\s+R\b")


def _skip_string(data: bytes, i: int) -> int:
    """Index just past the ``(...)`` literal string starting at ``i``
    (escape- and nesting-aware, ISO 32000-1 §7.3.4.2). Raises on an
    unterminated string."""
    depth, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0x5C:  # backslash escape
            i += 2
            continue
        if b == 0x28:
            depth += 1
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("pdf: unterminated string")


def _balanced_dict(data: bytes, start: int) -> bytes:
    """The ``<<...>>`` dict bytes beginning at ``start`` (nesting-,
    string- and comment-aware: ``>>`` inside a ``(...)`` string or a
    %-comment does not close the dict — r9 review pass 10). Raises on
    unbalanced input — resolution then fails toward an error row,
    never a guess."""
    if data[start : start + 2] != b"<<":
        raise ValueError("pdf: expected dictionary")
    depth, i, n = 0, start, len(data)
    while i < n - 1:
        c = data[i]
        if c == 0x28:
            i = _skip_string(data, i)
            continue
        if c == 0x25:  # comment to EOL (legal between tokens)
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        elif c == 0x3C:  # single '<': hex string — its '>' must not
            j = data.find(b">", i + 1, i + 65536)  # pair with a dict
            if j == -1:  # closer ('<</ID<FEFF>>>', r9 review pass 11)
                raise ValueError("pdf: unterminated hex string")
            i = j + 1
        else:
            i += 1
    raise ValueError("pdf: unterminated dictionary")


# --- object resolution: claims-based by design (r9) -------------------
#
# A sound top-level object index needs the xref table/stream — native-
# kernel territory. The linear header scan below is a heuristic, so it
# is built on one provable invariant instead of comment-classification
# heuristics (three adversarial review passes showed every variant of
# classifying '%' in raw byte space to be unsound — strings may contain
# '%', stream bodies may contain anything):
#
#   Each object VALUE offset is claimed by the EARLIEST header token
#   that reaches it through whitespace/comments only (the value lexer).
#   If a later token also reaches the same value, that token must
#   itself sit inside a comment of the first claimant's prefix — any
#   real token would have terminated the first claimant's lexer scan —
#   so the first claimant is the true owner.
#
# Among one number's claimed values, the LAST definition wins (real
# PDF semantics: incremental updates append the live object after the
# stale one). A '<<'-starting value that does not balance RAISES
# instead of being skipped — swallowing it would let a stale parseable
# definition win over a live corrupted one (r9 review pass 6).

_AMBIGUOUS_DEF_MSG = (
    "pdf: object defined more than once with conflicting values — the "
    "xref names the live one (native-kernel territory)"
)


def _value_extent(data: bytes, v: int) -> "Optional[int]":
    """End offset of the single PDF value starting at ``v``, or None
    when the bytes do not form one (ISO 32000-1 §7.3: dict, hex or
    literal string, array, name, number, indirect reference,
    null/true/false). String-, comment- and NUL-whitespace-aware (r9
    review pass 10); bounded scans."""
    c = data[v : v + 1]
    if c == b"<":
        if data[v : v + 2] == b"<<":
            try:
                return v + len(_balanced_dict(data, v))
            except ValueError:
                return None
        m = re.match(rb"<[0-9A-Fa-f\x00\t\n\x0c\r ]*>", data[v : v + 65536])
        return v + m.end() if m else None
    if c == b"[":
        depth, i, limit = 0, v, min(len(data), v + 65536)
        while i < limit:
            b = data[i]
            if b == 0x28:
                try:
                    i = _skip_string(data, i)
                except ValueError:
                    return None
                continue
            if b == 0x25:
                while i < limit and data[i] not in (0x0A, 0x0D):
                    i += 1
                continue
            if b == 0x5B:
                depth += 1
            elif b == 0x5D:
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        return None
    if c == b"(":
        try:
            return _skip_string(data, v)
        except ValueError:
            return None
    if c == b"/":
        m = re.match(
            rb"/[^\x00\t\n\x0c\r \[\]()<>/%]*", data[v : v + 4096]
        )
        return v + m.end() if m else None
    m = re.match(rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R\b", data[v : v + 64])
    if m:
        return v + m.end()
    m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", data[v : v + 64])
    if m:
        return v + m.end()
    for kw in (b"null", b"true", b"false"):
        if data[v : v + len(kw)] == kw and not re.match(
            rb"[A-Za-z0-9]", data[v + len(kw) : v + len(kw) + 1]
        ):
            return v + len(kw)
    return None


_STREAM_KW_RE = re.compile(rb"stream(?:\r\n|\n|\r)")


def _stream_kw_at(data: bytes, pos: int) -> "Optional[re.Match[bytes]]":
    """Match for the stream keyword reached from ``pos`` through
    whitespace/comments, or None — shared by the ObjStm synthesizer
    and the stream resolver (the claims tier matches ``_STREAM_KW_RE``
    at its own precomputed, BOUNDED terminator offset)."""
    t = _object_value_at(data, pos, len(data))
    if t is None:
        return None
    return _STREAM_KW_RE.match(data, t)


def _strip_strings_comments(dct: bytes) -> bytes:
    """Dict bytes with ``(...)`` string spans and %-comments removed,
    so token searches (e.g. /Length) cannot match inside them (r9
    review pass 12: '/Length 1' inside a /Note string shadowed the
    real key)."""
    out: list[bytes] = []
    i, n = 0, len(dct)
    while i < n:
        c = dct[i]
        if c == 0x28:
            try:
                i = _skip_string(dct, i)
            except ValueError:
                break
            out.append(b"\x00")  # placeholder: spans must not JOIN the
            continue  # surrounding tokens ('/Length (x) 4', r9 pass 14)
        pair = dct[i : i + 2]
        if pair in (b"<<", b">>"):  # dict brackets pass through whole
            out.append(pair)
            i += 2
            continue
        if c == 0x3C:
            # hex-string span: '%' or '(' bytes inside it must not
            # derail the stripper (mirrors _balanced_dict, r9 pass 13)
            j = dct.find(b">", i + 1, i + 65536)
            if j == -1:
                break
            i = j + 1
            out.append(b"\x00")
            continue
        if c == 0x25:
            while i < n and dct[i] not in (0x0A, 0x0D):
                i += 1
            # comments are pure token separators (ISO 32000-1 §7.2.4), so
            # a space keeps '/Length % note\n42' resolvable; strings keep
            # the NUL placeholder — there it is load-bearing against
            # '/Length (x) 4' token joining (r9 pass 14)
            out.append(b" ")
            continue
        out.append(dct[i : i + 1])
        i += 1
    return b"".join(out)


def _object_defs(data: bytes) -> "list[tuple[int, int, bool]]":
    """File-ordered (object number, value offset, well_formed) claims,
    one owner per value offset (first claimant wins, see the invariant
    above). Three tiers (r9 review passes 7-12):

    - NOT A CLAIM (skipped): the lexed "value" is the next object's
      header, or starts with a byte no legal PDF value can start with
      (prose after a header-shaped token inside a comment or string —
      '% edited 8 0 obj in rev2', '(see 8 0 obj)').
    - WELL-FORMED (ok=True): the value parses as one legal PDF value
      and is followed, through whitespace/comments, by ``endobj``
      (word-bounded) — or, for stream objects, by a VERIFIED stream:
      the keyword + EOL, a /Length that is direct or resolves through
      an integer object, ``endstream`` at exactly that offset, and
      ``endobj`` after it. Any later endstream belongs to another
      object; accepting it let a '>> stream' comment payload spoof a
      definition (r9 passes 11-12).
    - MALFORMED (ok=False): value-like but ill-formed. These POISON
      resolution (the resolvers raise), never vanish — vanishing
      resurrects a stale earlier copy SILENTLY, raising costs only an
      error row. The residual boundary: a comment containing a
      COMPLETE well-formed definition is indistinguishable without
      the xref and affects only files crafted to contain one."""
    claimed: set[int] = set()
    cands: list[tuple[int, int, "Optional[int]"]] = []
    for m in re.finditer(rb"(\d+)\s+0\s+obj\b", data):
        v = _object_value_at(data, m.end(), m.end() + 256)
        if v is None or v in claimed:
            continue
        claimed.add(v)
        if re.match(rb"\d+\s+\d+\s+obj\b", data[v : v + 64]):
            continue
        if data[v] not in _VALUE_START_BYTES:
            continue
        cands.append((int(m.group(1)), v, _value_extent(data, v)))

    def _terminator_at(end: int) -> "Optional[int]":
        """Offset of the token after the value (bounded ws/comment
        skip), or None."""
        return _object_value_at(data, end, min(end + 65536, len(data)))

    # integer objects first: stream claims with an INDIRECT /Length
    # (legal and common, e.g. Ghostscript) resolve their length here
    # instead of hard-failing (r9 pass 12). LAST claim governs, like
    # _resolve_last: a number is usable only when its governing claim
    # is a well-terminated NON-NEGATIVE integer ('+27' counts, r9 pass
    # 14); a negative length let `expect` point backwards or wrap (r9
    # pass 13), and an earlier non-integer claim must not poison a
    # later honest integer redefinition.
    int_objs: dict[int, "Optional[int]"] = {}
    for num, v, end in cands:
        val: "Optional[int]" = None
        txt = data[v:end] if end is not None else b""
        if end is not None and re.fullmatch(rb"\+?\d+", txt):
            t = _terminator_at(end)
            if t is not None and re.match(rb"endobj\b", data[t : t + 8]):
                val = int(txt)
        int_objs[num] = val  # last claim overwrites

    defs: list[tuple[int, int, bool]] = []
    stream_claims: dict[int, list[int]] = {}
    for num, v, end in cands:
        ok = False
        if end is not None:
            t = _terminator_at(end)
            if t is not None:
                if re.match(rb"endobj\b", data[t : t + 8]) is not None:
                    ok = True
                else:
                    sm = _STREAM_KW_RE.match(data, t)
                    if sm is not None:
                        toks = _strip_strings_comments(data[v:end])
                        length: "Optional[int]" = None
                        lm = _LENGTH_RE.search(toks)
                        if lm is not None:
                            length = int(lm.group(1))
                        else:
                            im = re.search(
                                rb"/Length\s+(\d+)\s+0\s+R\b", toks
                            )
                            if im is not None:
                                length = int_objs.get(int(im.group(1)))
                        if length is not None and length >= 0:
                            expect = sm.end() + length
                            em = re.match(
                                rb"(?:\r\n|\n|\r)?\s*endstream",
                                data[expect : expect + 16],
                            )
                            if em is not None:
                                t2 = _terminator_at(expect + em.end())
                                if t2 is not None and re.match(
                                    rb"endobj\b", data[t2 : t2 + 8]
                                ):
                                    es_off = expect + em.end() - 9
                                    stream_claims.setdefault(
                                        es_off, []
                                    ).append(len(defs))
                                    ok = True
        defs.append((num, v, ok))
    # each endstream terminates exactly ONE object: two stream claims
    # verifying against the same endstream mean one of them borrowed
    # the other's terminator by tuning its /Length (r9 pass 13) —
    # geometry cannot say which, so both poison (fail-closed; honest
    # files never share one)
    for idxs in stream_claims.values():
        if len(idxs) > 1:
            for i in idxs:
                num, v, _ok = defs[i]
                defs[i] = (num, v, False)
    return defs


# Bytes a legal PDF object value can start with: dict/hex-string '<',
# array '[', literal string '(', name '/', numbers/refs,
# null/true/false.
_VALUE_START_BYTES = frozenset(b"<[(/+-.0123456789ntf")


def _defs_for(
    defs: "list[tuple[int, int, bool]]", num: int
) -> "list[tuple[int, bool]]":
    return [(v, ok) for n, v, ok in defs if n == num]


def _resolve_last(
    data: bytes,
    defs: "list[tuple[int, int, bool]]",
    num: int,
    raw_len: int,
    parse,
):
    """The LAST raw-side claim GOVERNS (real incremental-update
    semantics); if it is malformed, or parses to the wrong type only
    when a malformed claim shadows nothing — see below — the object
    resolves accordingly:

    - last raw claim well-formed: parse it (wrong type → None — a live
      redefinition is never shadowed by a stale copy).
    - last raw claim MALFORMED: raise — it may be a live redefinition
      the grammar tier cannot read; falling back to an earlier copy
      would be silent staleness (r9 review pass 10).
    - packed side (synthesized /ObjStm sections): container order
      carries no liveness, so ALL packed claims must be well-formed
      and parse identically, and must agree with the raw side when
      both exist — otherwise raise."""
    raw = [(v, ok) for v, ok in _defs_for(defs, num) if v < raw_len]
    packed = [(v, ok) for v, ok in _defs_for(defs, num) if v >= raw_len]
    results = []
    if raw:
        v, ok = raw[-1]
        if not ok:
            raise ValueError(
                "pdf: an object definition could not be parsed — "
                "native-kernel territory"
            )
        results.append(parse(v))
    if packed:
        if not all(ok for _v, ok in packed):
            raise ValueError(
                "pdf: a packed object definition could not be parsed "
                "— native-kernel territory"
            )
        packed_vals = [parse(v) for v, _ok in packed]
        if any(x != packed_vals[0] for x in packed_vals):
            raise ValueError(_AMBIGUOUS_DEF_MSG)
        results.append(packed_vals[0])
    if not results:
        return None
    if len(results) == 2 and results[0] != results[1]:
        raise ValueError(_AMBIGUOUS_DEF_MSG)
    return results[0]


def _claimed_dicts(
    data: bytes, defs: "Optional[list[tuple[int, int, bool]]]" = None
) -> "list[tuple[int, int, bytes]]":
    """WELL-FORMED claimed dict values in file order as (object number,
    value offset, dict bytes). Overlapping dict spans raise after the
    scan (sorted adjacent check): real top-level values never overlap,
    while a pseudo-dict opened inside a comment or string either nests
    inside or spans a real one — geometry cannot say which is bogus,
    so the file is ambiguous (r9 review passes 6-7)."""
    out: list[tuple[int, int, bytes]] = []
    spans: list[tuple[int, int]] = []
    for num, at, ok in (defs if defs is not None else _object_defs(data)):
        if not ok or data[at : at + 2] != b"<<":
            continue
        dct = _balanced_dict(data, at)
        out.append((num, at, dct))
        spans.append((at, at + len(dct)))
    spans.sort()
    for (_a1, b1), (a2, _b2) in zip(spans, spans[1:]):
        if a2 < b1:
            raise ValueError(
                "pdf: overlapping object value regions — native-kernel "
                "territory"
            )
    return out


def _obj_dict(
    data: bytes,
    defs: "list[tuple[int, int, bool]]",
    num: int,
    raw_len: int,
) -> "Optional[bytes]":
    """Dict value of object ``num`` under the ``_resolve_last`` policy;
    a governing non-dict value yields None (the object is not a dict in
    the live revision)."""

    def parse(v: int) -> "Optional[bytes]":
        if data[v : v + 2] != b"<<":
            return None
        return _balanced_dict(data, v)

    return _resolve_last(data, defs, num, raw_len, parse)


def _obj_array(
    data: bytes,
    defs: "list[tuple[int, int, bool]]",
    num: int,
    raw_len: int,
) -> "Optional[bytes]":
    """``[...]`` value of object ``num`` under the ``_resolve_last``
    policy. Used for indirect /DescendantFonts."""

    def parse(v: int) -> "Optional[bytes]":
        if data[v : v + 1] != b"[":
            return None
        end = _value_extent(data, v)
        if end is None:
            raise ValueError("pdf: unterminated array value")
        return data[v:end]

    return _resolve_last(data, defs, num, raw_len, parse)


def _obj_stream_body(
    data: bytes,
    defs: "list[tuple[int, int, bool]]",
    num: int,
    raw_len: int,
) -> "Optional[bytes]":
    """Decoded stream body of object ``num`` under the
    ``_resolve_last`` policy; the governing definition's body must
    decode (an unreadable live body raises rather than silently
    yielding a stale one). The dict is taken BALANCED from the value
    lexer (the loose ``_STREAM_DICT_RE`` group can span unrelated
    preceding bytes)."""

    def parse(v: int) -> "Optional[bytes]":
        if data[v : v + 2] != b"<<":
            return None
        sdict = _balanced_dict(data, v)
        sm = _stream_kw_at(data, v + len(sdict))
        if sm is None:
            return None
        # direct-first /Length, indirect resolved through the SAME
        # per-side policy — the decode tier slices the exact body the
        # claims tier verified instead of endstream-guessing (r9
        # passes 13-14)
        body = _decoded_body(
            sdict, data, sm.end(), _stream_length(data, defs, sdict, raw_len)
        )
        if body is None:
            raise ValueError(
                "pdf: unreadable stream body for a font object"
            )
        return body

    return _resolve_last(data, defs, num, raw_len, parse)


def _ref_after(dct: bytes, key: bytes) -> "Optional[int]":
    m = re.search(key + rb"\s*(\d+)\s+0\s+R\b", dct)
    return int(m.group(1)) if m else None


# Budget for /ObjStm headers: a real writer packs at most a few
# thousand objects per stream; anything larger is hostile input.
_OBJSTM_MAX_OBJECTS = 50_000


# PDF whitespace bytes (ISO 32000-1 §7.2.2)
_PDF_WS = b"\x00\t\n\x0c\r "

# The only legal tokens between an object header and its value are
# whitespace and %-comments, so a forward micro-lexer over that prefix
# is SOUND comment classification — unlike line-based backward scans,
# which misread '%' inside same-line strings and raw stream bytes (r9
# review pass 5: both directions produced verified wrong behavior —
# a legal '(50% off)' string broke resolution of the header after it,
# and a '%'-line heuristic let a stale packed font decode silently).
def _object_value_at(
    data: bytes, start: int, limit: int
) -> "Optional[int]":
    """Offset of the first byte of the object VALUE after ``start``
    (skipping whitespace and %-comments), or None when nothing but
    whitespace/comments appears before ``limit``."""
    i, n = start, min(limit, len(data))
    while i < n:
        c = data[i]
        if c == 0x25:  # '%' — comment to end of line
            j = i
            while j < n and data[j] not in (0x0A, 0x0D):
                j += 1
            i = j
        elif c in _PDF_WS:
            i += 1
        else:
            return i
    return None


def _stream_length(
    data: bytes,
    defs: "list[tuple[int, int, bool]]",
    sdict: bytes,
    raw_len: int,
) -> "Optional[int]":
    """The stream dict's /Length: DIRECT first (matching the claims
    tier's priority — a dict carrying both a direct and an indirect
    key must not decode with a different length than the one geometry
    verification approved, r9 pass 14), else the indirect integer
    resolved through the per-side policy."""
    toks = _strip_strings_comments(sdict)
    lm = _LENGTH_RE.search(toks)
    if lm is not None:
        return int(lm.group(1))
    im = re.search(rb"/Length\s+(\d+)\s+0\s+R\b", toks)
    if im is None:
        return None

    def parse_int(iv: int) -> "Optional[int]":
        mnum = re.match(rb"\+?\d+", data[iv : iv + 20])
        return int(mnum.group(0)) if mnum else None

    return _resolve_last(data, defs, int(im.group(1)), raw_len, parse_int)


def _decoded_body(
    sdict: bytes,
    data: bytes,
    start: int,
    length: "Optional[int]" = None,
) -> "Optional[bytes]":
    """Decoded stream body following ``start`` (plain or FlateDecode per
    ``sdict``), or None — the candidates/decompress-retry loop shared
    by ``_obj_stream_body`` and ``_objstm_synthesized``
    (``_content_streams`` keeps its own loop: its EOL-ambiguity retry
    order is round-6 behavior pinned by the chunker golden tests).
    ``length`` carries a resolved indirect /Length so the exact slice
    is preferred over the endstream-scan guess (r9 pass 13)."""
    cands = _body_candidates(sdict, data, start, length)
    if not cands:
        return None
    if b"/FlateDecode" in sdict:
        for c in cands:
            try:
                return zlib.decompress(c)
            except zlib.error:
                continue
        return None
    return cands[0]


def _objstm_synthesized(content: bytes) -> bytes:
    """Every object packed inside a /Type /ObjStm container (PDF 1.5
    object streams, ISO 32000-1 §7.5.7) re-serialized as top-level
    ``N 0 obj ... endobj`` sections, or b"" when the file has none.
    Appending the sections to the raw bytes lets the linear object
    resolver see packed font dicts (streams themselves may not live in
    an ObjStm, so font PROGRAMS are always top-level). The reference
    reaches the same objects through pymupdf (index_documents.py:38-47).

    Duplicate definitions need no bookkeeping here: a number defined
    both raw and packed (or packed twice) simply yields several
    definitions in the augmented bytes, and the resolvers are
    distinct-or-raise — identical copies resolve, conflicting copies
    raise, and duplicates the font chain never touches are ignored
    (the incremental-update shape with a duplicated PAGE object keeps
    decoding). Malformed containers — indirect or missing /N //First,
    short or non-integer header, non-ascending or out-of-range offsets
    — raise eagerly: a skipped container would leave its Type0 dicts
    unattributed.

    Containers are discovered by the OBJECT scan (``N 0 obj`` → value
    lexer → balanced dict → /Type /ObjStm), never by reading values
    out of a loose stream-regex span that can cover earlier unrelated
    dicts (r9 review: an annotation's '/N 3 0 R' was parsed as a
    container's /N). The accounting guard at the end compares parsed
    containers against the RAW '/Type /ObjStm' token count, so a
    container the scan cannot locate (non-zero generation, value past
    the lexer window) RAISES instead of silently leaving its objects
    unresolved; over-counting (the token inside a string) also fails
    toward an error row."""
    out: list[bytes] = []
    total_objstm = len(re.findall(rb"/Type\s*/ObjStm\b", content))
    if total_objstm == 0:
        return b""
    parsed_objstm = 0
    defs = _object_defs(content)
    for _num, at, sdict in _claimed_dicts(content, defs):
        if re.search(rb"/Type\s*/ObjStm\b", sdict) is None:
            continue
        sm = _stream_kw_at(content, at + len(sdict))
        if sm is None:
            raise ValueError("pdf: object stream container has no stream")
        parsed_objstm += 1
        n_m = re.search(rb"/N\s+(\d+)\b", sdict)
        first_m = re.search(rb"/First\s+(\d+)\b", sdict)
        if n_m is None or first_m is None:
            raise ValueError(
                "pdf: object stream without direct /N and /First — "
                "native-kernel territory"
            )
        n, first = int(n_m.group(1)), int(first_m.group(1))
        if n > _OBJSTM_MAX_OBJECTS:
            raise ValueError("pdf: object stream header exceeds budget")
        body = _decoded_body(
            sdict,
            content,
            sm.end(),
            _stream_length(content, defs, sdict, len(content)),
        )
        if body is None:
            raise ValueError("pdf: unreadable object stream body")
        if first > len(body):
            raise ValueError("pdf: object stream /First beyond its body")
        toks = body[:first].split()
        if len(toks) != 2 * n or not all(t.isdigit() for t in toks):
            raise ValueError("pdf: malformed object stream header")
        pairs = [(int(toks[2 * i]), int(toks[2 * i + 1])) for i in range(n)]
        offs = [o for _, o in pairs]
        if (
            any(b <= a for a, b in zip(offs, offs[1:]))
            or (offs and first + offs[-1] > len(body))
        ):
            # strictly ascending: a DUPLICATED offset would synthesize a
            # zero-length value for the first object (its bytes attributed
            # wholly to the next) and degrade to a vague downstream
            # unresolved-font failure instead of this eager raise
            raise ValueError(
                "pdf: object stream offsets not strictly ascending in-range"
            )
        for i, (num, off) in enumerate(pairs):
            end = first + offs[i + 1] if i + 1 < n else len(body)
            out.append(
                b"%d 0 obj\n%s\nendobj\n" % (num, body[first + off : end])
            )
    if parsed_objstm < total_objstm:
        raise ValueError(
            "pdf: an object stream container could not be located by "
            "the object scan — its packed objects would stay "
            "unresolved (native-kernel territory)"
        )
    return b"\n".join(out)


def _fontprogram_gid_map(
    content: bytes, raw_len: "Optional[int]" = None
) -> "Optional[dict[int, str]]":
    """Merged gid -> text map built from the font program each Type0
    font ACTUALLY REFERENCES (/DescendantFonts -> /FontDescriptor ->
    /FontFile2), or None when no Type0 font resolves to an embedded
    sfnt program. Unreferenced sfnt streams in the file are ignored —
    decoding one font's gids through another font's cmap is silent
    garbage (r8 review: an unrelated embedded program decoded
    <0009000A> as 'ZQ' with ok=True). Per-font guards raise for
    indirect or non-Identity /Encoding, non-Identity /CIDToGIDMap,
    and conflicting maps across fonts — each is per-font state the
    merged-map tier cannot track. Every indirect reference resolves
    with the per-side policy of ``_resolve_last`` (see the
    object-resolution block above), so conflicting re-definitions raise
    the moment the font chain touches them, while duplicated objects
    the chain never touches (the incremental-update shape) stay
    ignored."""
    # The accounting denominator is the RAW token count, not the number
    # of dicts the object scan managed to parse: a Type0 dict whose
    # '<<' sits beyond the scan window (legal whitespace/comments after
    # 'N 0 obj') would otherwise be invisible to both the resolver and
    # the counter, and its gids would decode through OTHER fonts'
    # merged cmap — the silent-garbage class the all-or-nothing guard
    # exists for (r8 ADVICE). Over-counting (the token inside a string
    # or uncompressed stream) fails toward an error row, never toward
    # mojibake.
    total_type0 = len(re.findall(rb"/Subtype\s*/Type0\b", content))
    resolved_type0 = 0
    merged: dict[int, str] = {}
    if raw_len is None:
        raw_len = len(content)
    defs = _object_defs(content)
    # Any object number with a claimed Type0 dict is a CANDIDATE; its
    # GOVERNING definition then comes from _obj_dict (the per-side
    # last-definition/agreement policy of _resolve_last), and only
    # candidates whose governing dict is still a Type0 dict count as
    # fonts — a live redefinition to null/a non-Type0 dict removes the
    # font instead of leaving the stale copy decodable (r9 review pass
    # 8; byte-identical duplicates keep decoding, conflicting copies
    # raise inside _resolve_last).
    seen_type0 = 0
    candidates: "list[int]" = []
    for num, _at, dct in _claimed_dicts(content, defs):
        if re.search(rb"/Subtype\s*/Type0\b", dct) is None:
            continue
        seen_type0 += 1
        if num not in candidates:
            candidates.append(num)
    if seen_type0 < total_type0:
        # a Type0 token with no locatable claimed dict (hidden in an
        # opaque stream, value past the lexer window, corrupt dict):
        # its gids would decode through OTHER fonts' merged cmap
        raise ValueError(
            "pdf: a Type0 font dict could not be located by the "
            "object scan — native-kernel territory"
        )
    governing: "list[bytes]" = []
    for num in candidates:
        g = _obj_dict(content, defs, num, raw_len)
        if g is None or re.search(rb"/Subtype\s*/Type0\b", g) is None:
            # redefined away by a later revision — but its show strings
            # may still be in the content streams, and the merged-map
            # tier cannot know whether they reference the dead font's
            # gid space (r9 review pass 9: dropping it silently decoded
            # the dead font's gids through the SURVIVING fonts' map)
            raise ValueError(
                "pdf: a Type0 font was redefined away by a later "
                "revision — its show strings cannot be attributed "
                "(native-kernel territory)"
            )
        governing.append(g)
    for dct in governing:
        resolved_this = False
        enc = re.search(rb"/Encoding\s*(/[A-Za-z0-9\-]+|\d+\s+0\s+R)", dct)
        if enc is None or enc.group(1) not in (
            b"/Identity-H",
            b"/Identity-V",
        ):
            raise ValueError(
                "pdf: Type0 /Encoding is not a literal Identity CMap "
                "(named or embedded-CMap encodings map codes to CIDs, "
                "not gids) — native-kernel territory"
            )
        dfm = re.search(
            rb"/DescendantFonts\s*(\[[^\]]*\]|\d+\s+0\s+R)", dct
        )
        if dfm is None:
            continue  # no descendant: nothing to resolve for this font
        dfv = dfm.group(1)
        if not dfv.startswith(b"["):
            arr = _obj_array(
                content, defs, int(_REF_RE.match(dfv).group(1)), raw_len
            )
            if arr is None:
                continue
            dfv = arr
        for ref in _REF_RE.finditer(dfv):
            desc = _obj_dict(content, defs, int(ref.group(1)), raw_len)
            if desc is None:
                continue
            c2g = re.search(
                rb"/CIDToGIDMap\s*(/[A-Za-z0-9]+|\d+\s+0\s+R)", desc
            )
            if c2g is not None and c2g.group(1) != b"/Identity":
                raise ValueError(
                    "pdf: non-Identity /CIDToGIDMap — the gid "
                    "indirection stream is native-kernel territory"
                )
            fd_num = _ref_after(desc, rb"/FontDescriptor")
            if fd_num is None:
                continue
            fd = _obj_dict(content, defs, fd_num, raw_len)
            if fd is None:
                continue
            ff_num = _ref_after(fd, rb"/FontFile2")
            if ff_num is None:
                continue
            body = _obj_stream_body(content, defs, ff_num, raw_len)
            if body is None or body[:4] not in _SFNT_MAGIC:
                continue
            u2g = _sfnt_cmap_unicode_to_gid(body)
            inv: dict[int, str] = {}
            for cp in sorted(u2g):  # smallest code point, deterministic
                inv.setdefault(u2g[cp], chr(cp))
            resolved_this = True
            for gid, ch in inv.items():
                prev = merged.get(gid)
                if prev is not None and prev != ch:
                    raise ValueError(
                        "pdf: conflicting glyph maps across embedded "
                        "font programs — per-font decoding is "
                        "native-kernel territory"
                    )
                merged[gid] = ch
        if resolved_this:
            resolved_type0 += 1
    if resolved_type0 == 0:
        return None
    if resolved_type0 < len(governing):
        # one font resolved, another didn't (no program, bare CFF,
        # unresolvable descendant chain...): the unresolved font's gids
        # would decode through the WRONG font's map whenever the gid
        # spaces collide — the same silent-garbage class as consuming
        # unreferenced programs. All-or-nothing over DISTINCT fonts
        # (unlocatable Type0 tokens already raised above).
        raise ValueError(
            "pdf: only some Type0 fonts resolve to an embedded font "
            "program — per-font decoding is native-kernel territory"
        )
    return merged


def _cid_decoder(cmap: dict[int, str], width: int) -> Callable[[bytes], str]:
    def decode(bs: bytes) -> str:
        if len(bs) % width:
            raise ValueError(
                "pdf: CID show string length is not a multiple of the "
                f"{width}-byte code width"
            )
        out: list[str] = []
        for k in range(0, len(bs), width):
            code = int.from_bytes(bs[k : k + width], "big")
            text = cmap.get(code)
            if text is None:
                raise ValueError(
                    f"pdf: code {code:#06x} missing from the ToUnicode "
                    "map — decoding would be silent garbage"
                )
            out.append(text)
        return "".join(out)

    return decode


def _body_candidates(
    sdict: bytes, data: bytes, start: int, length: "Optional[int]" = None
) -> list[bytes]:
    """Possible stream bodies at ``start``, most-trustworthy first.

    Primary: slice exactly /Length bytes when the dict carries a direct
    length (searched over string/comment-stripped tokens — '/Length 1'
    inside a /Note string must not shadow the real key, r9 pass 13),
    or when the caller passes a resolved ``length`` (indirect /Length),
    AND ``endstream`` really follows (after at most one EOL) — exact
    even when the stream data itself ends in EOL bytes.
    Fallback: scan to ``endstream`` and guess-strip the separator EOL.
    The guess is ambiguous when the data's own last byte is 0x0d or
    0x0a (≈1/128 of compressed streams), so the less-stripped variants
    are kept as lower-priority candidates for a decompress-retry — the
    zlib checksum arbitrates (round-5 verdict bug: the single-guess
    version truncated valid FlateDecode streams ending in 0x0d)."""
    cands: list[bytes] = []
    if length is None:
        lm = _LENGTH_RE.search(_strip_strings_comments(sdict))
        if lm:
            length = int(lm.group(1))
    if length is not None and length >= 0:
        end = start + length
        tail = data[end : end + 11]
        if tail[:2] == b"\r\n":
            tail = tail[2:]
        elif tail[:1] in (b"\n", b"\r"):
            tail = tail[1:]
        if tail.startswith(b"endstream"):
            cands.append(data[start:end])
    end = data.find(b"endstream", start)
    if end != -1:
        raw = data[start:end]
        stripped = raw
        # spec: EOL before the endstream keyword is not stream data
        if raw.endswith(b"\r\n"):
            stripped = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            stripped = raw[:-1]
        for c in (stripped, raw[:-1] if len(raw) > len(stripped) + 1 else raw, raw):
            if c not in cands:
                cands.append(c)
    return cands


def _content_streams(data: bytes) -> list[bytes]:
    """Every decodable stream body in the file. Cross-reference tables
    are deliberately not consulted: a linear scan finds the same
    streams and also survives mildly damaged files."""
    out: list[bytes] = []
    for m in _STREAM_DICT_RE.finditer(data):
        sdict = m.group(1)
        cands = _body_candidates(sdict, data, m.end())
        if not cands:
            continue
        if b"/FlateDecode" in sdict:
            body = None
            last_err: Exception | None = None
            for c in cands:
                try:
                    body = zlib.decompress(c)
                    break
                except zlib.error as e:
                    last_err = e
            if body is None:
                raise ValueError(
                    f"pdf: broken FlateDecode stream: {last_err}"
                ) from last_err
        elif b"/Filter" in sdict:
            # some other filter (DCTDecode images, LZW, ...) — not a
            # text content stream we can read; skip, don't fail: the
            # page text may live in a plain/Flate stream alongside
            continue
        else:
            body = cands[0]
        out.append(body)
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


def _latin1(bs: bytes) -> str:
    return bs.decode("latin-1")


def _parse_text_ops(
    stream: bytes, decode: Callable[[bytes], str] = _latin1
) -> list[str]:
    """One linear scan of a content stream, collecting the strings fed
    to text-showing operators and newlines for line-moving ones.

    Strings stay RAW until a show operator consumes them: non-show
    string operands (BDC /ActualText values, Tf names' neighbors, ...)
    are cleared, never decoded — eager decoding fed them to the CID
    decoder, which rightly raises on non-width-aligned bytes and
    turned decodable Type0 files into error rows (r6 review)."""
    pieces: list[str] = []
    pending: list[bytes] = []
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
            pending.append(_unescape_literal(bytes(buf)))
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
                raw = bytes.fromhex(hexbody.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                raw = None  # not a hex string after all — skip, don't
                # abort (decode() errors at SHOW time DO propagate: a
                # CID decoder raising on unmapped codes is the
                # error-row contract, not a malformed token)
            if raw is not None:
                pending.append(raw)
            i = j + 1
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and stream[j : j + 1] not in b" \t\r\n()<>[]/%":
                j += 1
            op = stream[i:j]
            if op in (b"Tj", b"TJ"):
                pieces.extend(decode(p) for p in pending)
            elif op in (b"'", b'"'):
                pieces.append("\n")
                pieces.extend(decode(p) for p in pending)
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
    streams = _content_streams(content)
    # guards + encoding discovery run over the raw bytes AND every
    # decompressed stream body, so fonts serialized inside object
    # streams (PDF 1.5 /ObjStm) are still seen by the linear scan
    scan = b"\n".join([content, *streams])
    if b"/Identity-H" in scan or b"/Type0" in scan:
        # composite/CID fonts store GLYPH CODES in their show strings —
        # latin-1 decoding them would return mojibake with ok=True,
        # violating the error-rows-never-silent-garbage contract. The
        # writer's embedded /ToUnicode CMap, when present and complete,
        # IS the public decoding (ISO 32000-1 §9.10.3); without one
        # the file stays native-kernel territory.
        cmap, cid_width = _tounicode_map(scan)
        if not cmap:
            # no writer-supplied ToUnicode: fall back to the unicode
            # cmap of the font program each Type0 font REFERENCES
            # (gids == show-string codes only under Identity encodings
            # with an Identity CIDToGIDMap — anything else raises,
            # never guesses). Object resolution runs over the raw file
            # AUGMENTED with the re-serialized contents of /ObjStm
            # containers (r9), so font dicts packed into object streams
            # resolve too; a malformed container raises inside the
            # synthesizer instead of leaving fonts unattributed.
            for g in re.finditer(rb"/CIDToGIDMap\s*(/?[A-Za-z0-9]*)", scan):
                if g.group(1) != b"/Identity":
                    raise ValueError(
                        "pdf: non-Identity /CIDToGIDMap — the gid "
                        "indirection stream is native-kernel territory"
                    )
            for g in re.finditer(rb"/Encoding\s*/([A-Za-z0-9\-]+)", scan):
                if g.group(1) not in (b"Identity-H", b"Identity-V"):
                    raise ValueError(
                        "pdf: named CMap encodings beyond Identity are "
                        "native-kernel territory"
                    )
            aug = content
            extra = _objstm_synthesized(content)
            if extra:
                aug = content + b"\n" + extra
            gid_map = _fontprogram_gid_map(aug, raw_len=len(content))
            if gid_map is None:
                raise ValueError(
                    "pdf: composite/CID font encodings (Identity-H/"
                    "Type0) without a /ToUnicode CMap or a resolvable "
                    "embedded sfnt font program are not supported by "
                    "the stdlib tier"
                )
            # any Type0 dict visible in decompressed streams but NOT in
            # the augmented object space (e.g. serialized inside a
            # non-ObjStm stream) is invisible to the resolver above —
            # its gids would decode through the resolved fonts' maps
            if len(re.findall(rb"/Subtype\s*/Type0\b", scan)) > len(
                re.findall(rb"/Subtype\s*/Type0\b", aug)
            ):
                raise ValueError(
                    "pdf: Type0 fonts visible only inside opaque "
                    "streams cannot be attributed to their programs — "
                    "native-kernel territory"
                )
            cmap, cid_width = gid_map, 2
        if _differences_map(scan):
            raise ValueError(
                "pdf: mixed Type0 and /Differences simple fonts — "
                "per-font decoding is native-kernel territory"
            )
        decode = _cid_decoder(cmap, cid_width)
    else:
        diff_map = _differences_map(scan)
        if diff_map:
            # the merged map is applied file-wide, which is only sound
            # when EVERY font carries a /Differences encoding — a
            # default-encoded font alongside one would have its
            # latin-1 bytes silently remapped (r6 review: '(café)' in
            # a second font extracting as 'cafä' with ok=True).
            # Per-font Tf tracking is native-kernel territory, so the
            # mixed case raises instead. Count font DICTIONARIES, not
            # distinct /BaseFont names: two font objects sharing one
            # BaseFont (one /Differences-encoded, one default) would
            # collapse to a single name and slip the guard, remapping
            # the default font's bytes (r7 ADVICE: '(café)' in the
            # shared-name second font extracting as 'cafä' with
            # ok=True). max() of both counters fails toward raising —
            # an over-count can only turn silent garbage into an error
            # row, never the reverse.
            n_fonts = max(
                len(re.findall(rb"/Type\s*/Font\b", scan)),
                len(re.findall(rb"/BaseFont\s*/", scan)),
            )
            n_diff = len(_DIFF_RE.findall(scan))
            if n_fonts > n_diff:
                raise ValueError(
                    "pdf: /Differences present but not on every font — "
                    "per-font encoding tracking is native-kernel "
                    "territory (a merged map would silently remap the "
                    "default-encoded fonts' text)"
                )
            decode = lambda bs: "".join(  # noqa: E731
                diff_map.get(b, chr(b)) for b in bs
            )
        else:
            decode = _latin1
    pieces: list[str] = []
    for stream in streams:
        if b"BT" not in stream:
            continue
        pieces.extend(_parse_text_ops(stream, decode))
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
