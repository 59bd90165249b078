"""Stdlib-only image decoding for the multimodal kernels.

Same tier policy as ``sources/minidoc.py`` (the stdlib PDF/DOCX tier):
implement the PUBLIC specs with nothing but the standard library, and
NEVER emit silent garbage — anything outside the supported profile
raises ``ValueError`` so it surfaces as an error/null row instead of
wrong pixels. Formats (all from their published specifications; no
code from any image library):

- **PNG** (ISO/IEC 15948 / W3C PNG spec): 8-bit depth, color types
  0 (grayscale), 2 (truecolor), 3 (indexed/PLTE), 4 (gray+alpha),
  6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth);
  IDAT via ``zlib``. Rejected: 1/2/4/16-bit depths, Adam7 interlace,
  missing/short IDAT — raise, never guess.
- **BMP** (Windows BITMAPINFOHEADER, public MSDN/ECMA documentation):
  uncompressed BI_RGB 24/32-bit, bottom-up or top-down. Rejected:
  RLE/bitfield compression, palettized depths.
- **PNM** (Netpbm public formats): binary P5 (PGM) and P6 (PPM),
  maxval ≤ 255.

Output contract: ``(width, height, pixels)`` where ``pixels`` is a
row-major list of 8-bit **grayscale** intensities — color converts via
integer ITU-R BT.601 luma ``(299r + 587g + 114b + 500) // 1000``
(deterministic integer arithmetic: identical on every executor).
Alpha is ignored (decode, don't composite: features want intensity).

Reference parity: the reference pipeline has no image path at all —
this extends the engine's multimodal surface (SURVEY §2B) the same way
``minidoc`` extended R1's document path: a real in-container kernel
behind the exact mapInPandas signature the fake kernel pinned in
``tests/golden/multimodal_golden.json``.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["decode_image", "sniff_format", "encode_png", "encode_bmp", "encode_pnm"]


# --------------------------------------------------------------------
# sniffing
# --------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str | None:
    """'png' | 'bmp' | 'pnm' by magic bytes, else None (not an image
    this tier knows — callers treat None as not-decodable, not error)."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM") and len(data) >= 26:
        return "bmp"
    if data[:2] in (b"P5", b"P6") and len(data) >= 3 and data[2:3] in b" \t\r\n#":
        return "pnm"
    return None


def decode_image(data: bytes) -> tuple[int, int, list[int]]:
    """Decode PNG/BMP/PNM bytes to (width, height, grayscale pixels).

    Raises ``ValueError`` on anything outside the supported profile —
    the multimodal operators catch it and emit a null-feature row
    (corrupt media must never kill a 100 TB job)."""
    kind = sniff_format(data)
    if kind == "png":
        return _decode_png(data)
    if kind == "bmp":
        return _decode_bmp(data)
    if kind == "pnm":
        return _decode_pnm(data)
    raise ValueError("not a PNG/BMP/PNM image (stdlib tier)")


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b + 500) // 1000


# --------------------------------------------------------------------
# PNG (ISO/IEC 15948): chunks -> IDAT zlib -> per-scanline unfilter
# --------------------------------------------------------------------

# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# per-image pixel cap for every format: the decoders build Python int
# lists (~28 B/pixel PER CHANNEL, so an RGB image costs ~84 B/pixel,
# and mapInPandas batches hold SEVERAL rows' lists concurrently), so a
# declared-huge header must raise (-> null row) instead of exhausting
# executor memory. 16 MP keeps the worst batch-resident footprint near
# ~1.3 GB/row-in-flight instead of the ~5 GB the old 64 MP cap allowed
# (r7 ADVICE); it still covers any plausible document image — a real
# media pipeline swaps in a native kernel long before this matters.
_MAX_PIXELS = 1 << 24


def _png_chunks(data: bytes):
    pos = len(_PNG_SIG)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG chunk truncated")
        yield ctype, body
        pos += 12 + length  # len + type + body + CRC (CRC not verified)
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(data: bytes) -> tuple[int, int, list[int]]:
    width = height = -1
    bit_depth = color_type = interlace = -1
    idat = bytearray()
    plte: bytes | None = None
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("PNG bad IHDR")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            plte = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width <= 0 or height <= 0:
        raise ValueError("PNG missing/invalid IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG bit depth {bit_depth} unsupported (8 only)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color_type} unsupported")
    if interlace != 0:
        raise ValueError("PNG Adam7 interlace unsupported")
    if color_type == 3 and (plte is None or len(plte) % 3):
        raise ValueError("PNG indexed image missing/bad PLTE")
    ch = _PNG_CHANNELS[color_type]
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"PNG {width}x{height} exceeds the stdlib tier's "
            f"{_MAX_PIXELS}-pixel cap"
        )
    stride = width * ch
    expected = (stride + 1) * height
    # bounded inflate: a corrupt/adversarial IDAT must raise ValueError
    # (-> null-feature row), never allocate unbounded memory and OOM
    # the executor ("corrupt media must never kill a 100 TB job")
    d = zlib.decompressobj()
    try:
        # max_length = expected + 1: an overlong stream shows up as one
        # extra byte instead of a multi-GB allocation
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:  # truncated/corrupt IDAT
        raise ValueError(f"PNG broken IDAT stream: {e}") from e
    if len(raw) != expected:
        raise ValueError("PNG decompressed size mismatch")

    # unfilter scanlines (spec §9: filters operate on the raw bytes of
    # the PREVIOUS pixel/scanline, bpp = channels at 8-bit depth)
    prev = bytearray(stride)
    out: list[int] = []
    pos = 0
    for _y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"PNG unknown filter type {ftype}")
        prev = line
        if color_type == 0:
            out.extend(line)
        elif color_type == 4:
            out.extend(line[0::2])
        elif color_type == 2:
            for i in range(0, stride, 3):
                out.append(_luma(line[i], line[i + 1], line[i + 2]))
        elif color_type == 6:
            for i in range(0, stride, 4):
                out.append(_luma(line[i], line[i + 1], line[i + 2]))
        else:  # indexed
            assert plte is not None
            for idx in line:
                base = idx * 3
                if base + 3 > len(plte):
                    raise ValueError("PNG palette index out of range")
                out.append(_luma(plte[base], plte[base + 1], plte[base + 2]))
    return width, height, out


# --------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB 24/32-bit)
# --------------------------------------------------------------------


def _decode_bmp(data: bytes) -> tuple[int, int, list[int]]:
    if len(data) < 54:
        raise ValueError("BMP header truncated")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported (BITMAPINFOHEADER+)")
    width, raw_h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1:
        raise ValueError("BMP planes != 1")
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if bpp not in (24, 32):
        raise ValueError(f"BMP {bpp}-bit unsupported (24/32 only)")
    if width <= 0 or raw_h == 0:
        raise ValueError("BMP invalid dimensions")
    height = abs(raw_h)
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"BMP {width}x{height} exceeds the stdlib tier's "
            f"{_MAX_PIXELS}-pixel cap"
        )
    top_down = raw_h < 0
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3  # rows pad to 4-byte boundary
    if pixel_off + stride * height > len(data):
        raise ValueError("BMP pixel data truncated")
    out = [0] * (width * height)
    for row in range(height):
        src_y = row if top_down else height - 1 - row
        base = pixel_off + src_y * stride
        dst = row * width
        for x in range(width):
            o = base + x * nbytes
            b, g, r = data[o], data[o + 1], data[o + 2]  # stored BGR(A)
            out[dst + x] = _luma(r, g, b)
    return width, height, out


# --------------------------------------------------------------------
# PNM (Netpbm P5/P6 binary)
# --------------------------------------------------------------------


def _pnm_tokens(data: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace/comment-separated integer tokens."""
    vals: list[int] = []
    i = start
    n = len(data)
    while len(vals) < count:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i] == 0x23:  # '#' comment to EOL
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("PNM header truncated")
        try:
            vals.append(int(data[i:j]))
        except ValueError as e:
            raise ValueError("PNM non-integer header token") from e
        i = j
    return vals, i


def _decode_pnm(data: bytes) -> tuple[int, int, list[int]]:
    magic = data[:2]
    (w_h_max, pos) = _pnm_tokens(data, 2, 3)
    width, height, maxval = w_h_max
    if width <= 0 or height <= 0:
        raise ValueError("PNM invalid dimensions")
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"PNM {width}x{height} exceeds the stdlib tier's "
            f"{_MAX_PIXELS}-pixel cap"
        )
    if not (0 < maxval <= 255):
        raise ValueError(f"PNM maxval {maxval} unsupported (1..255)")
    if data[pos : pos + 2] == b"\r\n":
        # spec: exactly ONE whitespace byte after maxval, so a CRLF
        # writer's \n would silently decode as the first pixel —
        # reject the ambiguity instead of guessing
        raise ValueError("PNM CRLF after maxval is ambiguous (spec: one byte)")
    pos += 1  # exactly ONE whitespace byte after maxval (spec)
    ch = 1 if magic == b"P5" else 3
    need = width * height * ch
    body = data[pos : pos + need]
    if len(body) != need:
        raise ValueError("PNM pixel data truncated")
    # integer round-half-up scaling: (v*255)/maxval with no float in
    # the path — bit-identical on every executor/platform
    def scale(v: int) -> int:
        return (v * 510 + maxval) // (2 * maxval)

    if ch == 1:
        if maxval == 255:
            return width, height, list(body)
        return width, height, [scale(v) for v in body]
    out = [0] * (width * height)
    for p in range(width * height):
        r, g, b = body[p * 3], body[p * 3 + 1], body[p * 3 + 2]
        if maxval != 255:
            r, g, b = scale(r), scale(g), scale(b)
        out[p] = _luma(r, g, b)
    return width, height, out


# --------------------------------------------------------------------
# encoders — test/fixture support (round-trip property tests need a
# writer that is NOT the decoder's inverse-by-construction: PNG gets
# an explicit per-line filter choice to exercise every unfilter path)
# --------------------------------------------------------------------


def encode_png(
    width: int,
    height: int,
    pixels: list[int] | list[tuple[int, int, int]],
    color_type: int = 0,
    filter_type: int = 0,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Minimal PNG writer (8-bit; color types 0/2/3/4/6). ``pixels`` is
    grayscale ints for types 0/3/4 (alpha synthesized 255) or RGB(A to
    255) tuples for 2/6. ``filter_type`` applies to EVERY scanline —
    the filters are exactly invertible, so any choice round-trips."""
    ch = _PNG_CHANNELS[color_type]
    rows: list[bytes] = []
    stride = width * ch
    flat = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            p = pixels[y * width + x]
            if color_type == 0 or color_type == 3:
                line.append(p)  # type: ignore[arg-type]
            elif color_type == 4:
                line.extend((p, 255))  # type: ignore[misc]
            elif color_type == 2:
                line.extend(p)  # type: ignore[arg-type]
            else:  # 6
                line.extend((*p, 255))  # type: ignore[misc]
        rows.append(bytes(line))
    prev = bytes(stride)
    for line in rows:
        filt = bytearray()
        for i in range(stride):
            cur = line[i]
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if filter_type == 0:
                v = cur
            elif filter_type == 1:
                v = cur - left
            elif filter_type == 2:
                v = cur - up
            elif filter_type == 3:
                v = cur - ((left + up) >> 1)
            elif filter_type == 4:
                v = cur - _paeth(left, up, ul)
            else:
                raise ValueError(f"filter {filter_type}")
            filt.append(v & 0xFF)
        flat.append(filter_type)
        flat.extend(filt)
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    parts = [_PNG_SIG, chunk(b"IHDR", ihdr)]
    if color_type == 3:
        if palette is None:
            palette = [(i, i, i) for i in range(256)]
        parts.append(chunk(b"PLTE", b"".join(bytes(c) for c in palette)))
    parts.append(chunk(b"IDAT", zlib.compress(bytes(flat))))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)


def encode_bmp(
    width: int,
    height: int,
    rgb: list[tuple[int, int, int]],
    bpp: int = 24,
    top_down: bool = False,
) -> bytes:
    """Minimal BI_RGB BMP writer (24/32-bit) for fixtures."""
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3
    body = bytearray()
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(width):
            r, g, b = rgb[y * width + x]
            row.extend((b, g, r) if bpp == 24 else (b, g, r, 255))
        row.extend(b"\x00" * (stride - len(row)))
        body.extend(row)
    raw_h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, raw_h, 1, bpp, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return hdr + info + bytes(body)


def encode_pnm(
    width: int,
    height: int,
    pixels: list[int] | list[tuple[int, int, int]],
    gray: bool = True,
    maxval: int = 255,
) -> bytes:
    """Minimal binary P5/P6 writer for fixtures."""
    magic = b"P5" if gray else b"P6"
    hdr = magic + b"\n# miniimage fixture\n%d %d\n%d\n" % (width, height, maxval)
    body = bytearray()
    for p in pixels:
        if gray:
            body.append(p)  # type: ignore[arg-type]
        else:
            body.extend(p)  # type: ignore[arg-type]
    return hdr + bytes(body)
