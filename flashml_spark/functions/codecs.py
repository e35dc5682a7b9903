"""Dependency-free media codecs: uncompressed 24-bit BMP and 16-bit PCM
WAV, implemented with ``struct`` only.

Purpose: the multimodal operators' ``fake=False`` paths previously
required PIL / soundfile, which this environment cannot install — so
the REAL decode path was never exercisable.  BMP and WAV are simple,
fully-public container formats that need no external library, which
makes the real path testable end-to-end: generate a payload, ship it
through the Arrow-batched ``mapInPandas`` pipeline, decode it for real,
and assert pixel- / sample-exact results.

These are not toy formats: BMP is what OpenCV/PIL emit for lossless
interchange, WAV/PCM is the standard ASR ingestion format.  The
decoders validate headers and fail loudly on anything they don't
support (compressed BMP, non-PCM WAV) — a production pipeline would
route those to a full codec; the *plumbing* is identical.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24-bit uncompressed, the common denominator)

_BMP_FILE_HDR = "<2sIHHI"  # magic, file size, res, res, pixel offset
_BMP_INFO_HDR = "<IiiHHIIiiII"


def encode_bmp(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode RGB pixel rows (top-down, row-major) as a 24-bit BMP."""
    height = len(rows)
    width = len(rows[0]) if height else 0
    if any(len(r) != width for r in rows):
        raise ValueError("ragged pixel rows")
    pad = (-(width * 3)) % 4
    body = bytearray()
    for row in reversed(rows):  # BMP stores bottom-up
        for r, g, b in row:
            body += bytes((b, g, r))  # BGR on disk
        body += b"\x00" * pad
    info = struct.pack(
        _BMP_INFO_HDR, 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    hdr = struct.pack(
        _BMP_FILE_HDR, b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    )
    return hdr + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a 24-bit uncompressed BMP to (width, height, top-down RGB
    rows).  Honors the header's pixel-data offset and top-down (negative
    height) images; rejects other bit depths / compressions."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = struct.unpack_from(_BMP_FILE_HDR, payload, 0)
    (
        hdr_size,
        width,
        height,
        _planes,
        bitcount,
        compression,
        *_rest,
    ) = struct.unpack_from(_BMP_INFO_HDR, payload, 14)
    if hdr_size < 40 or bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size}, bpp={bitcount}, comp={compression})"
        )
    top_down = height < 0
    height = abs(height)
    stride = width * 3 + ((-(width * 3)) % 4)
    rows: list[list[tuple[int, int, int]]] = []
    for y in range(height):
        base = offset + y * stride
        row = [
            (
                payload[base + 3 * x + 2],
                payload[base + 3 * x + 1],
                payload[base + 3 * x],
            )
            for x in range(width)
        ]
        rows.append(row)
    if not top_down:
        rows.reverse()  # disk order is bottom-up; return top-down
    return width, height, rows


def bmp_grayscale(rows: list[list[tuple[int, int, int]]]) -> list[list[int]]:
    """ITU-R 601-ish integer luma (the PIL convert("L") formula)."""
    return [
        [(r * 299 + g * 587 + b * 114) // 1000 for r, g, b in row]
        for row in rows
    ]


def nearest_resize(grid: list[list[int]], w: int, h: int) -> list[list[int]]:
    """Nearest-neighbor resample of a 2-D grid to (w, h)."""
    sh, sw = len(grid), len(grid[0])
    return [
        [grid[(y * sh) // h][(x * sw) // w] for x in range(w)]
        for y in range(h)
    ]


def average_hash(gray: list[list[int]]) -> str:
    """8x8 average hash (aHash) of a grayscale grid, as 16 hex chars —
    bit i set when cell i (row-major) >= the 64-cell mean."""
    cells = [v for row in nearest_resize(gray, 8, 8) for v in row]
    avg = sum(cells) / 64.0
    bits = 0
    for i, v in enumerate(cells):
        if v >= avg:
            bits |= 1 << i
    return f"{bits:016x}"


# --------------------------------------------------------------------------
# PNG (8/16-bit gray(+alpha) / RGB(+alpha) / 8-bit paletted with
# PLTE+tRNS, non-interlaced or Adam7; stdlib zlib — no PIL needed)
#
# PNG's only compression is DEFLATE, which the zlib module already used
# by x200/x233 provides; everything else is struct parsing plus the five
# scanline filters (r8 VERDICT item 5).  r10 added paletted (PLTE/tRNS)
# and Adam7 interlaced layouts plus 16-bit and grayscale(+alpha)
# decode; r11 adds gray/RGB tRNS color keys and sub-byte (1/2/4-bit)
# gray/paletted depths — the full PNG depth/color matrix except the
# never-generated combinations the spec itself forbids.  Only foreign
# containers (WebP/TIFF) remain rejected loudly — see decode_png's
# IHDR gate and operators/multimodal.py.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


# Adam7 pass grids: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_passes(width: int, height: int, interlace: bool):
    """The scanline layout as pass grids: one full-frame pass when
    non-interlaced, the 7 non-empty Adam7 grids otherwise."""
    if not interlace:
        return [(0, 0, 1, 1)]
    return [
        (x0, y0, dx, dy)
        for x0, y0, dx, dy in _ADAM7
        if x0 < width and y0 < height
    ]


def _filter_scanlines(lines: list[bytes], bpp: int, filter_type: int) -> bytearray:
    """Apply ONE PNG filter to a pass's scanlines (prev starts zero)."""
    raw = bytearray()
    prev = bytes(len(lines[0])) if lines else b""
    for line in lines:
        filt = bytearray([filter_type])
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if filter_type == 0:
                filt.append(line[i])
            elif filter_type == 1:
                filt.append((line[i] - a) & 0xFF)
            elif filter_type == 2:
                filt.append((line[i] - b) & 0xFF)
            elif filter_type == 3:
                filt.append((line[i] - (a + b) // 2) & 0xFF)
            elif filter_type == 4:
                filt.append((line[i] - _paeth(a, b, c)) & 0xFF)
            else:
                raise ValueError(f"unknown filter type {filter_type}")
        raw += filt
        prev = bytes(line)
    return raw


def _png_assemble(
    ihdr: bytes, raw: bytes, idat_split: int | None, extra: bytes = b""
) -> bytes:
    import zlib

    comp = zlib.compress(bytes(raw))
    if idat_split and idat_split < len(comp):
        idats = b"".join(
            _png_chunk(b"IDAT", comp[i : i + idat_split])
            for i in range(0, len(comp), idat_split)
        )
    else:
        idats = _png_chunk(b"IDAT", comp)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + idats
        + _png_chunk(b"IEND", b"")
    )


def encode_png(
    rows: list[list[tuple[int, ...]]],
    alpha: bool = False,
    filter_type: int = 0,
    idat_split: int | None = None,
    interlace: bool = False,
    depth: int = 8,
    trns_key: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode RGB(A) pixel rows (top-down, row-major) as an 8- or
    16-bit PNG (16-bit samples are 0..65535, big-endian on disk).
    ``filter_type`` applies ONE filter (0=None, 1=Sub, 2=Up, 3=Average,
    4=Paeth) to every scanline so the decoder's unfilter path for that
    type is exercised pixel-exactly; ``idat_split`` splits the
    compressed stream across multiple IDAT chunks (spec-legal, and a
    decode path real PNGs hit); ``interlace`` writes the Adam7 pass
    layout (each pass filtered independently, per spec); ``trns_key``
    writes a color-type-2 tRNS transparent-color chunk (spec §11.3.2:
    three 16-bit samples, at the image's sample scale) — spec-illegal
    with ``alpha``."""
    if depth not in (8, 16):
        raise ValueError(f"depth must be 8 or 16, got {depth}")
    if trns_key is not None and alpha:
        raise ValueError("tRNS is prohibited for alpha color types 4/6")
    height = len(rows)
    width = len(rows[0]) if height else 0
    if any(len(r) != width for r in rows):
        raise ValueError("ragged pixel rows")
    ns = 4 if alpha else 3
    for row in rows:
        for px in row:
            if len(px) != ns:
                raise ValueError(f"expected {ns}-tuples, got {px!r}")

    def pack(px: tuple[int, ...]) -> bytes:
        if depth == 8:
            return bytes(px)
        return struct.pack(f">{ns}H", *px)

    bpp = ns * (depth // 8)
    raw = bytearray()
    for x0, y0, dx, dy in _png_passes(width, height, interlace):
        lines = [
            b"".join(pack(px) for px in rows[y][x0::dx])
            for y in range(y0, height, dy)
        ]
        raw += _filter_scanlines(lines, bpp, filter_type)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, 6 if alpha else 2, 0, 0,
        1 if interlace else 0,
    )
    extra = (
        _png_chunk(b"tRNS", struct.pack(">3H", *trns_key))
        if trns_key is not None
        else b""
    )
    return _png_assemble(ihdr, raw, idat_split, extra)


def encode_png_gray(
    rows: list[list[int]],
    alpha_rows: list[list[int]] | None = None,
    filter_type: int = 0,
    idat_split: int | None = None,
    interlace: bool = False,
    trns_key: int | None = None,
    depth: int = 8,
) -> bytes:
    """Encode grayscale rows as a color-type-0 PNG (or type 4,
    gray+alpha, when ``alpha_rows`` is given) — same filter/Adam7
    machinery as truecolor.  ``trns_key`` writes a color-type-0 tRNS
    transparent-gray chunk (one 16-bit sample) — spec-illegal with
    ``alpha_rows``.  ``depth`` 1/2/4 packs sub-byte samples MSB-first
    (gray only; alpha requires depth 8)."""
    if trns_key is not None and alpha_rows is not None:
        raise ValueError("tRNS is prohibited for alpha color types 4/6")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"gray depth must be 1/2/4/8, got {depth}")
    if depth < 8 and alpha_rows is not None:
        raise ValueError("sub-byte depth is gray-only (no alpha channel)")
    if depth < 8 and any(not 0 <= v < (1 << depth) for r in rows for v in r):
        raise ValueError(f"sample out of range for depth {depth}")
    height = len(rows)
    width = len(rows[0]) if height else 0
    if any(len(r) != width for r in rows):
        raise ValueError("ragged pixel rows")
    if alpha_rows is not None and (
        len(alpha_rows) != height
        or any(len(r) != width for r in alpha_rows)
    ):
        raise ValueError("alpha_rows shape mismatch")
    bpp = 2 if alpha_rows is not None else 1
    raw = bytearray()
    for x0, y0, dx, dy in _png_passes(width, height, interlace):
        lines = []
        for y in range(y0, height, dy):
            if depth < 8:
                lines.append(_pack_bits(rows[y][x0::dx], depth))
            elif alpha_rows is None:
                lines.append(bytes(rows[y][x0::dx]))
            else:
                line = bytearray()
                for v, a in zip(rows[y][x0::dx], alpha_rows[y][x0::dx]):
                    line += bytes((v, a))
                lines.append(bytes(line))
        raw += _filter_scanlines(lines, bpp, filter_type)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth,
        4 if alpha_rows is not None else 0,
        0, 0, 1 if interlace else 0,
    )
    extra = (
        _png_chunk(b"tRNS", struct.pack(">H", trns_key))
        if trns_key is not None
        else b""
    )
    return _png_assemble(ihdr, raw, idat_split, extra)


def encode_png_palette(
    index_rows: list[list[int]],
    palette: list[tuple[int, int, int]],
    trns: list[int] | None = None,
    filter_type: int = 0,
    idat_split: int | None = None,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Encode palette-index rows as a paletted PNG (color type 3):
    PLTE holds up to 256 RGB entries, optional tRNS per-entry alpha;
    same filter/Adam7 machinery as truecolor.  ``depth`` 1/2/4 packs
    sub-byte indices MSB-first (palette must fit: < 2^depth
    entries)."""
    if not 1 <= len(palette) <= 256:
        raise ValueError(f"palette must hold 1..256 entries, got {len(palette)}")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette depth must be 1/2/4/8, got {depth}")
    if depth < 8 and len(palette) > (1 << depth):
        raise ValueError(
            f"palette of {len(palette)} entries does not fit depth {depth}"
        )
    height = len(index_rows)
    width = len(index_rows[0]) if height else 0
    if any(len(r) != width for r in index_rows):
        raise ValueError("ragged index rows")
    for row in index_rows:
        for ix in row:
            if not 0 <= ix < len(palette):
                raise ValueError(f"palette index {ix} out of range")
    if trns is not None and len(trns) > len(palette):
        raise ValueError("tRNS longer than palette")
    raw = bytearray()
    for x0, y0, dx, dy in _png_passes(width, height, interlace):
        lines = [
            _pack_bits(index_rows[y][x0::dx], depth)
            if depth < 8
            else bytes(index_rows[y][x0::dx])
            for y in range(y0, height, dy)
        ]
        raw += _filter_scanlines(lines, 1, filter_type)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, 3, 0, 0, 1 if interlace else 0
    )
    extra = _png_chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    if trns is not None:
        extra += _png_chunk(b"tRNS", bytes(trns))
    return _png_assemble(ihdr, raw, idat_split, extra)


def _pack_bits(vals: list[int], depth: int) -> bytes:
    """Pack sub-byte samples (depth 1/2/4) into a scanline, MSB-first
    with zero padding at the row end (PNG spec §7.2)."""
    out = bytearray((len(vals) * depth + 7) // 8)
    for i, v in enumerate(vals):
        out[(i * depth) // 8] |= v << (8 - depth - (i * depth) % 8)
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): nearest of a/b/c to a+b-c,
    ties broken a, then b, then c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_pass(
    raw: bytes, offset: int, stride: int, h: int, bpp: int
) -> tuple[list[bytearray], int]:
    """Invert the scanline filters of one pass starting at ``offset``;
    ``stride`` is the scanline length in BYTES (= w*bpp at byte
    depths, ceil(w*depth/8) sub-byte — where ``bpp``, the filter
    distance, is 1 per spec §9.2); returns (unfiltered lines, new
    offset)."""
    lines: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(h):
        if offset + 1 + stride > len(raw):
            raise ValueError("PNG pixel data truncated mid-pass")
        ftype = raw[offset]
        line = bytearray(raw[offset + 1 : offset + 1 + stride])
        offset += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
        lines.append(line)
        prev = line
    return lines, offset


def decode_png(
    payload: bytes,
) -> tuple[int, int, list[list[tuple[int, ...]]]]:
    """Decode an 8/16-bit gray / gray+alpha / RGB / RGBA / PALETTED
    PNG — non-interlaced or Adam7 — to (width, height, top-down pixel
    rows).  Pure struct + stdlib zlib: walks chunks (verifying each
    CRC), concatenates every IDAT, inflates, inverts the per-scanline
    filter (None/Sub/Up/Average/Paeth) per pass, scatters Adam7 passes
    into frame position, expands palette indices through PLTE (+tRNS
    alpha when present → RGBA), widens grayscale to RGB(A), and
    surfaces 16-bit samples as their high byte (the 8-bit viewing
    surface, PIL convert semantics).  Sub-byte depths (1/2/4-bit
    gray and paletted) bit-unpack MSB-first before the same filter
    inversion (filter distance 1 byte per spec §9.2), gray samples
    scaling to the 8-bit surface by 255/(2^d-1)."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = bpp = color = None
    interlace = 0
    plte: list[tuple[int, int, int]] | None = None
    trns: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (
                color not in (0, 2, 3, 4, 6)
                or depth not in (1, 2, 4, 8, 16)
                or (color == 3 and depth not in (1, 2, 4, 8))
                or (depth < 8 and color not in (0, 3))
                or interlace not in (0, 1)
            ):
                raise ValueError(
                    "unsupported PNG (depth="
                    f"{depth}, color={color}, interlace={interlace}) — "
                    "8/16-bit gray/RGB(+alpha), or 1/2/4/8-bit "
                    "gray/paletted"
                )
            if comp != 0 or filt != 0:
                raise ValueError("non-standard PNG compression/filter method")
            # bpp is the FILTER distance in BYTES (spec §9.2): one
            # byte at sub-byte depths
            samples = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
            bpp = max(1, samples * (depth // 8))
        elif ctype == b"PLTE":
            if clen % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = [tuple(data[i : i + 3]) for i in range(0, clen, 3)]
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    # tRNS outside palettes (spec §11.3.2): ONE transparent-color key —
    # a 16-bit gray sample (color 0) or 16-bit RGB triple (color 2);
    # matching pixels get alpha 0 (the PIL convert semantics).  The
    # chunk is prohibited for color types 4/6, which carry real alpha.
    trns_key: tuple[int, ...] | None = None
    if trns is not None:
        if color in (4, 6):
            raise ValueError("tRNS is prohibited for alpha color types 4/6")
        if color in (0, 2):
            n_s = 1 if color == 0 else 3
            if len(trns) != 2 * n_s:
                raise ValueError(
                    f"tRNS length {len(trns)} invalid for color type {color}"
                )
            trns_key = struct.unpack(f">{n_s}H", trns)
    raw = zlib.decompress(bytes(idat))

    # collect raw channel rows, pass by pass
    grid: list[list[tuple[int, ...] | None]] = [
        [None] * width for _ in range(height)
    ]
    offset = 0
    for x0, y0, dx, dy in _png_passes(width, height, interlace == 1):
        w_p = (width - x0 + dx - 1) // dx
        h_p = (height - y0 + dy - 1) // dy
        stride = w_p * bpp if depth >= 8 else (w_p * depth + 7) // 8
        lines, offset = _unfilter_pass(raw, offset, stride, h_p, bpp)
        if depth < 8:  # unpack MSB-first sub-byte samples (spec §7.2)
            mask = (1 << depth) - 1
            for j, line in enumerate(lines):
                y = y0 + j * dy
                for i in range(w_p):
                    b = line[(i * depth) // 8]
                    shift = 8 - depth - (i * depth) % 8
                    grid[y][x0 + i * dx] = ((b >> shift) & mask,)
        else:
            for j, line in enumerate(lines):
                y = y0 + j * dy
                for i in range(w_p):
                    grid[y][x0 + i * dx] = tuple(line[i * bpp : (i + 1) * bpp])
    if offset != len(raw):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != consumed {offset}"
        )

    def expand(px: tuple[int, ...]) -> tuple[int, ...]:
        if color == 3:
            ix = px[0]
            if ix >= len(plte):
                raise ValueError(f"palette index {ix} outside PLTE")
            rgb = plte[ix]
            if trns is not None:
                a = trns[ix] if ix < len(trns) else 255
                return (*rgb, a)
            return rgb
        if depth < 8:  # sub-byte gray: scale to the 8-bit surface
            v = px[0]
            g = v * 255 // ((1 << depth) - 1)
            if trns_key is not None:  # key matches the RAW sample
                return (g, g, g, 0 if (v,) == trns_key else 255)
            return (g, g, g)
        alpha = None
        if trns_key is not None:  # color 0/2: match at FULL bit depth
            if depth == 16:
                sample = tuple(
                    (px[2 * i] << 8) | px[2 * i + 1]
                    for i in range(len(px) // 2)
                )
            else:
                sample = tuple(px)
            alpha = 0 if sample == trns_key else 255
        if depth == 16:  # return the high byte of each sample (8-bit surface)
            px = px[::2]
        if color == 0:  # grayscale -> RGB (+tRNS alpha when keyed)
            base = (px[0], px[0], px[0])
            return base if alpha is None else (*base, alpha)
        if color == 4:  # gray + alpha -> RGBA
            return (px[0], px[0], px[0], px[1])
        if alpha is not None:  # color 2 with a tRNS key -> RGBA
            return (*px, alpha)
        return px

    rows = [[expand(px) for px in row] for row in grid]
    return width, height, rows


def png_grayscale(rows: list[list[tuple[int, ...]]]) -> list[list[int]]:
    """ITU-R 601-ish integer luma over RGB(A) pixel rows — alpha, when
    present, is ignored (the PIL convert("L") behavior on RGBA)."""
    return [
        [(px[0] * 299 + px[1] * 587 + px[2] * 114) // 1000 for px in row]
        for row in rows
    ]


# --------------------------------------------------------------------------
# WAV (RIFF, 16-bit PCM)


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Encode interleaved 16-bit PCM samples as a RIFF/WAVE payload."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    block = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, int]:
    """Decode a 16-bit PCM WAV header: (sample_rate, channels,
    n_frames).  Walks RIFF chunks (so extra chunks like LIST are fine);
    rejects non-PCM or non-16-bit encodings."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, ch, block, data_len = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt_code, ch, sr, _br, block, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if sr is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    if not block:
        raise ValueError("WAV fmt declares 0 channels / zero blockalign")
    return sr, ch, data_len // block


def wav_rms(payload: bytes) -> float:
    """Root-mean-square amplitude of a 16-bit PCM WAV's samples —
    the simplest real audio feature (silence/clipping screens)."""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"data":
            n = clen // 2
            vals = struct.unpack_from(f"<{n}h", payload, pos + 8)
            return (sum(v * v for v in vals) / n) ** 0.5 if n else 0.0
        pos += 8 + clen + (clen % 2)
    raise ValueError("WAV missing data chunk")


# --------------------------------------------------------------------------
# Y4M / YUV4MPEG2 (uncompressed video, the mjpegtools interchange format)


def encode_y4m(
    frames: list[list[list[int]]], fps: tuple[int, int] = (30, 1)
) -> bytes:
    """Encode luma-plane frames (each a HxW grid of 0..255) as a
    YUV4MPEG2 stream, C420jpeg with flat gray chroma.  Frame dims must
    be even (4:2:0 chroma is quarter-res)."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = len(frames[0]), len(frames[0][0])
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n".encode()
    )
    chroma = bytes([128]) * ((w // 2) * (h // 2))
    for fr in frames:
        if len(fr) != h or any(len(row) != w for row in fr):
            raise ValueError("ragged frame")
        out += b"FRAME\n"
        for row in fr:
            out += bytes(row)
        out += chroma + chroma  # U then V planes
    return bytes(out)


def decode_y4m_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a YUV4MPEG2 stream header: (width, height, fps_num,
    fps_den).  Only 4:2:0 chroma variants (the default) are supported —
    anything else raises, loudly."""
    nl = payload.find(b"\n")
    if not payload.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = num = den = None
    for tok in payload[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(b":"))
        elif tag == b"C" and not val.startswith(b"420"):
            raise ValueError(f"unsupported Y4M chroma {val.decode()!r}")
    if None in (w, h, num, den):
        raise ValueError("Y4M header missing W/H/F")
    return w, h, num, den


def iter_y4m_frames(payload: bytes, every_n: int = 1):
    """Yield ``(frame_idx, luma_grid)`` for every ``every_n``-th frame of
    a 4:2:0 YUV4MPEG2 stream.  Skipped frames are never materialized —
    the cursor jumps over their bytes, which is what a real frame
    sampler does."""
    w, h, _num, _den = decode_y4m_header(payload)
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    pos = payload.find(b"\n") + 1
    idx = 0
    while pos < len(payload):
        nl = payload.find(b"\n", pos)
        if nl < 0 or not payload[pos : pos + 5] == b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        data_start = nl + 1
        if idx % every_n == 0:
            plane = payload[data_start : data_start + w * h]
            yield idx, [list(plane[y * w : (y + 1) * w]) for y in range(h)]
        pos = data_start + frame_bytes
        idx += 1


def y4m_frame_count(payload: bytes) -> int:
    """Frame count by cursor arithmetic — no plane is ever copied."""
    w, h, _num, _den = decode_y4m_header(payload)
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    pos = payload.find(b"\n") + 1
    n = 0
    while pos < len(payload):
        nl = payload.find(b"\n", pos)
        if nl < 0:
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = nl + 1 + frame_bytes
        n += 1
    return n


def hamming64(a: str, b: str) -> int:
    """Hamming distance between two 16-hex-char (64-bit) hashes."""
    return bin(int(a, 16) ^ int(b, 16)).count("1")


# --------------------------------------------------------------------------
# GIF (87a/89a, palette-based, REAL LZW — stdlib-free like the rest)
#
# Lossless palette images round-trip pixel-exactly, which is what makes
# the codec testable without reference binaries: encode → decode must
# reproduce the exact index grid through the variable-width LZW coder
# (including dictionary growth, the 4096-entry clear/reset, and the
# KwKwK self-reference case).  Multi-frame streams (GIF89a graphics-
# control extensions) cover the frame-sampling path.

_GIF_MAX_CODE = 4096


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width (LSB-first packing),
    CLEAR emitted up front and on dictionary overflow, EOI at the end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for k in indices:
        if not 0 <= k < clear:
            raise ValueError(f"palette index {k} out of range for "
                             f"min_code_size {min_code_size}")
        nbuf = buf + (k,)
        if nbuf in table:
            buf = nbuf
            continue
        emit(table[buf], width)
        table[nbuf] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= _GIF_MAX_CODE:
            emit(clear, width)
            table, next_code, width = fresh()
        buf = (k,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit cursor

    def read(width: int) -> int:
        nonlocal pos
        v = 0
        for i in range(width):
            byte = pos >> 3
            if byte >= len(data):
                raise ValueError("truncated GIF LZW stream")
            v |= ((data[byte] >> (pos & 7)) & 1) << i
            pos += 1
        return v

    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None

    def reset():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # KwKwK
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the frame holds")
    return out


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    """Advance ``pos`` past a GIF sub-block chain (to just after the 0x00
    terminator), raising ValueError — not IndexError — on truncation
    (r9 ADVICE item: malformed input should fail like the rest of the
    codec, with a diagnosable message)."""
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF payload")
        n = payload[pos]
        if n == 0:
            return pos + 1
        if pos + 1 + n > len(payload):
            raise ValueError("truncated GIF payload")
        pos += 1 + n


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes in GIF data sub-blocks (<=255-byte chunks + 0)."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[list[list[int]]],
    palette: list[tuple[int, int, int]],
    delay_cs: int = 10,
) -> bytes:
    """Encode palette-index frames (each HxW, top-down row-major) as a
    GIF89a stream with one global color table; >1 frame adds a
    graphics-control extension per frame (the animation path)."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = len(frames[0]), len(frames[0][0])
    if any(len(f) != h or any(len(r) != w for r in f) for f in frames):
        raise ValueError("ragged frames")
    if not 1 <= len(palette) <= 256:
        # >256 would need bits>8 and overflow the 3-bit color-table-size
        # field in the logical screen descriptor (r9 ADVICE item).
        raise ValueError(f"GIF palette must have 1..256 entries, got {len(palette)}")
    bits = max(2, (max(1, len(palette) - 1)).bit_length())
    size = 1 << bits
    table = bytearray()
    for i in range(size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        table += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((bits - 1) << 4) | (bits - 1))  # global table, size
    out += b"\x00\x00"  # bg index, aspect
    out += table
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
            out += b"\x00\x00"  # transparent index, terminator
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(bits)  # LZW min code size
        idx = [v for row in f for v in row]
        out += _sub_blocks(_lzw_encode(idx, bits))
    out.append(0x3B)
    return bytes(out)


def decode_gif(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[list[list[int]]]]:
    """Decode a GIF87a/89a stream to (width, height, palette, frames of
    palette indices).  Walks extensions, concatenates each image's LZW
    sub-blocks, inflates through the variable-width decoder.  Rejects
    interlaced images and local color tables (the palette pipelines
    this exists for emit neither)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(payload):
            raise ValueError("truncated GIF payload")
        for i in range(size):
            palette.append(
                (payload[pos + 3 * i], payload[pos + 3 * i + 1],
                 payload[pos + 3 * i + 2])
            )
        pos += 3 * size
    frames: list[list[list[int]]] = []
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos = _skip_sub_blocks(payload, pos + 2)
        elif b0 == 0x2C:
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF payload")
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
            fpacked = payload[pos + 9]
            if fpacked & 0x80:
                raise ValueError("local color tables unsupported")
            if fpacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise ValueError("sub-rectangle frames unsupported")
            pos += 10
            if pos >= len(payload):
                raise ValueError("truncated GIF payload")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF payload")
                n = payload[pos]
                if n == 0:
                    break
                if pos + 1 + n > len(payload):
                    raise ValueError("truncated GIF payload")
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, fw * fh)
            if len(idx) != fw * fh:
                raise ValueError(
                    f"GIF frame pixel count {len(idx)} != {fw * fh}"
                )
            frames.append(
                [idx[y * fw : (y + 1) * fw] for y in range(fh)]
            )
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return w, h, palette, frames


def gif_frame_rgb(
    palette: list[tuple[int, int, int]], frame: list[list[int]]
) -> list[list[tuple[int, int, int]]]:
    """Materialize one index frame to RGB rows through the palette."""
    return [[palette[v] for v in row] for row in frame]


def gif_frame_delays(payload: bytes) -> list[int]:
    """Per-frame delays (centiseconds) from GIF89a graphics-control
    extensions, in stream order; empty for a plain GIF87a still."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 13
    packed = payload[10]
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    delays: list[int] = []
    while pos < len(payload) and payload[pos] != 0x3B:
        b0 = payload[pos]
        if b0 == 0x21:
            if pos + 6 > len(payload):
                raise ValueError("truncated GIF payload")
            label = payload[pos + 1]
            if label == 0xF9:
                (d,) = struct.unpack_from("<H", payload, pos + 4)
                delays.append(d)
            pos = _skip_sub_blocks(payload, pos + 2)
        elif b0 == 0x2C:
            if pos + 11 > len(payload):
                raise ValueError("truncated GIF payload")
            pos = _skip_sub_blocks(payload, pos + 11)
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    return delays

# --------------------------------------------------------------------------
# TIFF (baseline 8-bit gray / RGB / paletted; uncompressed or LZW;
# both byte orders; horizontal-differencing predictor — r10 VERDICT
# item 4)
#
# Pure struct+math like the codecs above: an IFD walk (TIFF 6.0 §2),
# per-strip decode, and the TIFF-variant LZW of §13 — MSB-first bit
# packing (GIF's is LSB-first), 8-bit roots with ClearCode 256 /
# EOI 257, and the spec's EARLY code-width change: the encoder widens
# when NextCode reaches 2^w - 1 (511/1023/2047), the decoder one code
# earlier at 2^w - 2 (510/1022/2046) because its table trails the
# encoder's by exactly one entry.  Rejected loudly: bit depths other
# than 8, planar configuration 2, tiled layout, and the compressions
# a production pipeline routes to libtiff (PackBits/CCITT/JPEG/ZIP).


def _tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    """TIFF §13 LZW: MSB-first codes, early width change (see module
    note), table reset on ClearCode; raises on truncation, codes
    beyond the table, or output overrun."""
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        v = 0
        for _ in range(width):
            byte = pos >> 3
            if byte >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            v = (v << 1) | ((data[byte] >> (7 - (pos & 7))) & 1)
            pos += 1
        return v

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes((i,)) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        code = read(width)
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            if code >= 256:
                raise ValueError(f"LZW first code {code} is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        # EARLY change: the decoder's table is one entry behind the
        # encoder's, so it widens at 2^w - 2 (510/1022/2046)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if len(out) > n_expected:
            raise ValueError("TIFF LZW produced more bytes than the strip")
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF §13 LZW encoder (fixture minting): MSB-first, encoder-side
    early change at 2^w - 1 (511/1023/2047), ClearCode emitted up
    front and again whenever NextCode reaches 4094."""
    bits = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_acc
        acc = (acc << width) | code
        n_acc += width
        while n_acc >= 8:
            n_acc -= 8
            bits.append((acc >> n_acc) & 0xFF)

    table: dict[bytes, int] = {}
    next_code = 258
    width = 9

    def reset() -> None:
        nonlocal table, next_code, width
        table = {bytes((i,)): i for i in range(256)}
        next_code = 258
        width = 9

    reset()
    emit(256, width)
    w = b""
    for b in data:
        wc = w + bytes((b,))
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        w = bytes((b,))
        if next_code == 4094:  # spec: clear before the table fills
            emit(table[w], width)
            emit(256, width)
            reset()
            w = b""
    if w:
        emit(table[w], width)
    emit(257, width)
    if n_acc:
        bits.append((acc << (8 - n_acc)) & 0xFF)
    return bytes(bits)


_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def _tiff_read_values(
    payload: bytes, lt: str, vtype: int, count: int, raw: bytes
) -> list[int]:
    """Read an IFD entry's integer values (inline when they fit the
    4-byte field, else at the pointed offset)."""
    if vtype not in _TIFF_TYPE_SIZE:
        raise ValueError(f"unsupported TIFF field type {vtype}")
    size = _TIFF_TYPE_SIZE[vtype] * count
    if size <= 4:
        buf = raw[:size]
    else:
        (off,) = struct.unpack(f"{lt}I", raw)
        buf = payload[off : off + size]
        if len(buf) != size:
            raise ValueError("TIFF value offset out of bounds")
    fmt = {1: "B", 3: "H", 4: "I"}[vtype]
    return list(struct.unpack(f"{lt}{count}{fmt}", buf))


def decode_tiff(
    payload: bytes,
) -> tuple[int, int, list[list[tuple[int, ...]]]]:
    """Decode a baseline TIFF (first IFD) to (width, height, top-down
    pixel rows): 8-bit grayscale (photometric 0/1, WhiteIsZero
    inverted to the 8-bit surface), RGB, or paletted (ColorMap's
    16-bit channels surfaced as their high byte), chunky planar
    config, strips (any RowsPerStrip split), uncompressed or LZW
    (per-strip streams), predictor 1 or 2 (horizontal differencing
    inverted per row per sample)."""
    if payload[:4] == b"II*\x00":
        lt = "<"
    elif payload[:4] == b"MM\x00*":
        lt = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(f"{lt}I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(f"{lt}H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        if base + 12 > len(payload):
            raise ValueError("TIFF IFD truncated")
        tag, vtype, count = struct.unpack_from(f"{lt}HHI", payload, base)
        if vtype not in _TIFF_TYPE_SIZE:
            continue  # RATIONAL/ASCII metadata tags — not needed here
        tags[tag] = _tiff_read_values(
            payload, lt, vtype, count, payload[base + 8 : base + 12]
        )
    try:
        width = tags[256][0]
        height = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    samples = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * samples)
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [2**32 - 1])[0]
    predictor = tags.get(317, [1])[0]
    planar = tags.get(284, [1])[0]
    if planar != 1:
        raise ValueError(f"unsupported TIFF planar configuration {planar}")
    if any(b != 8 for b in bits) or len(bits) != samples:
        raise ValueError(f"unsupported TIFF bit depths {bits}")
    if comp not in (1, 5):
        raise ValueError(
            f"unsupported TIFF compression {comp} — uncompressed or LZW"
        )
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if photo == 2 and samples < 3:
        raise ValueError("RGB TIFF needs >= 3 samples/pixel")
    if photo in (0, 1, 3) and samples != 1:
        raise ValueError("gray/palette TIFF needs 1 sample/pixel")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    cmap: list[tuple[int, int, int]] | None = None
    if photo == 3:
        if 320 not in tags or len(tags[320]) != 3 * 256:
            raise ValueError("paletted TIFF missing 256-entry ColorMap")
        cm = tags[320]
        cmap = [
            (cm[i] >> 8, cm[256 + i] >> 8, cm[512 + i] >> 8)
            for i in range(256)
        ]

    row_bytes = width * samples
    rows: list[list[tuple[int, ...]]] = []
    y = 0
    for off, cnt in zip(offsets, counts):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF strip out of bounds")
        n_rows = min(rows_per_strip, height - y)
        if n_rows <= 0:
            raise ValueError("more strips than image rows")
        if comp == 5:
            strip = _tiff_lzw_decode(strip, n_rows * row_bytes)
        if len(strip) < n_rows * row_bytes:
            raise ValueError("TIFF strip shorter than its rows")
        for r in range(n_rows):
            line = bytearray(strip[r * row_bytes : (r + 1) * row_bytes])
            if predictor == 2:  # horizontal differencing, per sample
                for i in range(samples, row_bytes):
                    line[i] = (line[i] + line[i - samples]) & 0xFF
            if photo == 2:
                row = [
                    tuple(line[i : i + samples][:3])
                    for i in range(0, row_bytes, samples)
                ]
            elif photo == 3:
                row = [cmap[v] for v in line]
            else:
                row = [
                    ((255 - v,) * 3 if photo == 0 else (v,) * 3)
                    for v in line
                ]
            rows.append(row)
            y += 1
    if y != height:
        raise ValueError(f"TIFF strips held {y} rows, header says {height}")
    return width, height, rows


def encode_tiff(
    rows: list[list[tuple[int, ...]]],
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: int = 1,
    gray: bool = False,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Encode top-down RGB (or ``gray`` single-sample, or
    ``palette``-indexed) rows as a baseline TIFF — fixture minting for
    the decoder: chunky strips, uncompressed (1) or LZW (5), optional
    horizontal-differencing predictor, either byte order.  ``palette``
    writes a photometric-3 ColorMap (exactly 256 entries padded with
    black; 16-bit channel values ``v << 8`` so the decoder's high-byte
    surface reads back exactly)."""
    if compression not in (1, 5):
        raise ValueError(f"compression must be 1 or 5, got {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1 or 2, got {predictor}")
    if palette is not None and not gray:
        gray = True  # index rows are single-sample
    lt = ">" if big_endian else "<"
    height = len(rows)
    width = len(rows[0]) if height else 0
    if any(len(r) != width for r in rows):
        raise ValueError("ragged pixel rows")
    samples = 1 if gray else 3
    rps = height if rows_per_strip is None else rows_per_strip
    strips: list[bytes] = []
    for y0 in range(0, height, rps):
        raw = bytearray()
        for row in rows[y0 : y0 + rps]:
            line = bytearray()
            for px in row:
                vals = (px,) if gray and isinstance(px, int) else tuple(px)
                if len(vals) != samples:
                    raise ValueError(f"expected {samples}-sample pixels")
                line += bytes(vals)
            if predictor == 2:
                for i in range(len(line) - 1, samples - 1, -1):
                    line[i] = (line[i] - line[i - samples]) & 0xFF
            raw += line
        strips.append(
            _tiff_lzw_encode(bytes(raw)) if compression == 5 else bytes(raw)
        )

    # layout: header(8) | IFD | values area | strips
    entries: list[tuple[int, int, int, bytes | int]] = []

    def entry(tag: int, vtype: int, values: list[int]) -> None:
        entries.append((tag, vtype, len(values), values))

    entry(256, 4, [width])
    entry(257, 4, [height])
    entry(258, 3, [8] * samples)
    entry(259, 3, [compression])
    entry(262, 3, [3 if palette is not None else (2 if not gray else 1)])
    entry(277, 3, [samples])
    entry(278, 4, [rps])
    if palette is not None:
        if len(palette) > 256:
            raise ValueError("TIFF ColorMap holds at most 256 entries")
        pal = list(palette) + [(0, 0, 0)] * (256 - len(palette))
        entry(
            320, 3,
            [p[0] << 8 for p in pal]
            + [p[1] << 8 for p in pal]
            + [p[2] << 8 for p in pal],
        )
    if predictor == 2:
        entry(317, 3, [predictor])
    n_strip = len(strips)
    # strip offsets filled after sizing
    entry(273, 4, [0] * n_strip)
    entry(279, 4, [len(s) for s in strips])
    entries.sort(key=lambda e: e[0])

    ifd_off = 8
    n = len(entries)
    values_off = ifd_off + 2 + 12 * n + 4
    # first pass: compute out-of-line value area size
    out_of_line: dict[int, int] = {}
    voff = values_off
    for tag, vtype, count, _ in entries:
        size = _TIFF_TYPE_SIZE[vtype] * count
        if size > 4:
            out_of_line[tag] = voff
            voff += size + (size % 2)
    strip0 = voff
    offs = []
    so = strip0
    for s in strips:
        offs.append(so)
        so += len(s) + (len(s) % 2)
    entries = [
        (tag, vtype, count, offs if tag == 273 else vals)
        for tag, vtype, count, vals in entries
    ]

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(f"{lt}I", ifd_off)
    out += struct.pack(f"{lt}H", n)
    fmt = {1: "B", 3: "H", 4: "I"}
    values_area = bytearray()
    for tag, vtype, count, vals in entries:
        size = _TIFF_TYPE_SIZE[vtype] * count
        packed = struct.pack(f"{lt}{count}{fmt[vtype]}", *vals)
        if size <= 4:
            field = packed + b"\x00" * (4 - size)
        else:
            field = struct.pack(f"{lt}I", out_of_line[tag])
            values_area += packed + b"\x00" * (size % 2)
        out += struct.pack(f"{lt}HHI", tag, vtype, count) + field
    out += struct.pack(f"{lt}I", 0)  # next-IFD pointer: none
    out += values_area
    for s in strips:
        out += s + b"\x00" * (len(s) % 2)
    return bytes(out)


def tiff_grayscale(rows: list[list[tuple[int, ...]]]) -> list[list[int]]:
    """Integer luma over decoded TIFF rows (same 299/587/114 weights as
    :func:`png_grayscale`)."""
    return png_grayscale(rows)


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT / SOF0 — the r9 VERDICT item 1)
#
# Pure struct+math, same discipline as the PNG/GIF codecs above: the
# encoder exists to mint spec-complete fixtures (DQT/SOF0/DHT/SOS with
# the ITU-T T.81 Annex-K quantization and Huffman tables), the decoder
# is the production path behind decode_media(fake=False).  Supported:
# 3-component YCbCr at 4:4:4 or 4:2:0 and 1-component grayscale, 8-bit
# precision, optional restart intervals (DRI/RSTn).  Rejected loudly:
# progressive (SOF2), arithmetic coding, 12-bit, other subsamplings —
# a production pipeline routes those to libjpeg-turbo; the *plumbing*
# (Arrow batches, schema, partitioning) is identical either way.
#
# Reference parity note: the reference ships no media codecs at all —
# this exists for the multimodal training-data operators (SURVEY §2
# "beyond the reference" brief), not as a port of anything.

import math

# Zigzag scan order: index i in scan order -> row-major block position.
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.1/K.2 base quantization tables (row-major).
_JPEG_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
_JPEG_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
assert sum(_JPEG_AC_LUMA[0]) == len(_JPEG_AC_LUMA[1]) == 162
assert sum(_JPEG_AC_CHROMA[0]) == len(_JPEG_AC_CHROMA[1]) == 162

# Separable DCT-II basis: _DCT_A[u][x] = 0.5*C(u)*cos((2x+1)u*pi/16),
# so forward G = A g A^T and inverse g = A^T G A.
_DCT_A = [
    [
        0.5 * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _jpeg_scaled_qt(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 1..100 -> per-entry scaled table in 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in base]


def _fdct8x8(block: list[list[float]]) -> list[list[float]]:
    """Forward 8x8 DCT-II via two passes of the separable basis."""
    tmp = [
        [sum(_DCT_A[u][x] * block[x][y] for x in range(8)) for y in range(8)]
        for u in range(8)
    ]
    return [
        [sum(tmp[u][y] * _DCT_A[v][y] for y in range(8)) for v in range(8)]
        for u in range(8)
    ]


def _idct8x8(coef: list[list[float]]) -> list[list[float]]:
    """Inverse 8x8 DCT (DCT-III), the exact adjoint of :func:`_fdct8x8`."""
    tmp = [
        [sum(_DCT_A[u][x] * coef[u][v] for u in range(8)) for v in range(8)]
        for x in range(8)
    ]
    return [
        [sum(tmp[x][v] * _DCT_A[v][y] for v in range(8)) for y in range(8)]
        for x in range(8)
    ]


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _clamp8(v: float) -> int:
    i = int(round(v))
    return 0 if i < 0 else 255 if i > 255 else i


def _ycbcr_to_rgb(y: float, cb: float, cr: float) -> tuple[int, int, int]:
    return (
        _clamp8(y + 1.402 * (cr - 128.0)),
        _clamp8(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
        _clamp8(y + 1.772 * (cb - 128.0)),
    )


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, width: int) -> None:
        self._acc = (self._acc << width) | (code & ((1 << width) - 1))
        self._n += width
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        """Pad the current partial byte with 1-bits (T.81 B.2.1)."""
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)

    def raw(self, data: bytes) -> None:
        """Emit marker bytes verbatim (caller must be byte-aligned)."""
        if self._n:
            raise ValueError("raw() on unaligned writer")
        self.out += data

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (canonical code, length) from a BITS/HUFFVAL spec."""
    table: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, the decoder mirror of the above."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    size = abs(v).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    """Inverse of :func:`_magnitude_bits`."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _plane_block(plane: list[list[float]], bx: int, by: int) -> list[list[float]]:
    """8x8 level-shifted block at (bx*8, by*8), edge-replicated."""
    h, w = len(plane), len(plane[0])
    return [
        [plane[min(by * 8 + y, h - 1)][min(bx * 8 + x, w - 1)] - 128.0 for x in range(8)]
        for y in range(8)
    ]


def _encode_block(
    block: list[list[float]],
    qt: list[int],
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
    pred: int,
    writer: _BitWriter,
) -> int:
    """FDCT + quantize + Huffman-code one block; returns the new DC pred.

    Axis convention: blocks are [y][x] and the first coefficient index
    is therefore the VERTICAL frequency — exactly the T.81 layout where
    the row-major table entry (v*8+u) pairs vertical v with horizontal
    u, so ``qt[pos]`` indexes match the spec with no transposition.
    """
    coef = _fdct8x8(block)
    zz = [0] * 64
    for i, pos in enumerate(_JPEG_ZIGZAG):
        zz[i] = int(round(coef[pos // 8][pos % 8] / qt[pos]))
    diff = zz[0] - pred
    size, mag = _magnitude_bits(diff)
    code, width = dc_tab[size]
    writer.put(code, width)
    if size:
        writer.put(mag, size)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i]:
            last_nz = i
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, width = ac_tab[0xF0]  # ZRL
            writer.put(code, width)
            run -= 16
        size, mag = _magnitude_bits(zz[i])
        code, width = ac_tab[(run << 4) | size]
        writer.put(code, width)
        writer.put(mag, size)
        run = 0
    if last_nz != 63:
        code, width = ac_tab[0x00]  # EOB
        writer.put(code, width)
    return zz[0]


def encode_jpeg(
    rows: list[list[tuple[int, int, int]]],
    quality: int = 75,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down RGB rows as a baseline (SOF0) JFIF/JPEG stream
    with the Annex-K quantization (IJG quality-scaled) and Huffman
    tables.  ``subsample``: '444' (no chroma subsampling) or '420'
    (2x2 box-averaged chroma, the common camera/libjpeg default) or
    '422' (horizontal-only 2x1).  ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (what real encoders
    do for error resilience — and the path that exercises the
    decoder's restart handling)."""
    if subsample not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    h = len(rows)
    w = len(rows[0]) if h else 0
    if h == 0 or w == 0 or any(len(r) != w for r in rows):
        raise ValueError("empty or ragged pixel rows")
    if max(w, h) > 65535:
        raise ValueError("image too large for JPEG dims")
    yp = [[0.0] * w for _ in range(h)]
    cbp = [[0.0] * w for _ in range(h)]
    crp = [[0.0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            yy, cb, cr = _rgb_to_ycbcr(*rows[y][x])
            yp[y][x], cbp[y][x], crp[y][x] = yy, cb, cr
    hs, vs = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
    if hs * vs > 1:
        cw, ch = (w + hs - 1) // hs, (h + vs - 1) // vs
        def box(plane: list[list[float]]) -> list[list[float]]:
            out = [[0.0] * cw for _ in range(ch)]
            for cy in range(ch):
                for cx in range(cw):
                    ys = [min(vs * cy + dy, h - 1) for dy in range(vs)]
                    xs = [min(hs * cx + dx, w - 1) for dx in range(hs)]
                    out[cy][cx] = (
                        sum(plane[a][b] for a in ys for b in xs) / (hs * vs)
                    )
            return out
        cbp, crp = box(cbp), box(crp)

    qt_l = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    qt_c = _jpeg_scaled_qt(_JPEG_QT_CHROMA, quality)
    enc_dc_l = _huff_encode_table(*_JPEG_DC_LUMA)
    enc_ac_l = _huff_encode_table(*_JPEG_AC_LUMA)
    enc_dc_c = _huff_encode_table(*_JPEG_DC_CHROMA)
    enc_ac_c = _huff_encode_table(*_JPEG_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(qt[pos] for pos in _JPEG_ZIGZAG)  # zigzag order on disk
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes((1, (hs << 4) | vs, 0))
    out += bytes((2, 0x11, 1))
    out += bytes((3, 0x11, 1))
    for tc_th, (bits, vals) in (
        (0x00, _JPEG_DC_LUMA), (0x10, _JPEG_AC_LUMA),
        (0x01, _JPEG_DC_CHROMA), (0x11, _JPEG_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x11, 3, 0x11))
    out += bytes((0, 63, 0))

    writer = _BitWriter()
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    pred = [0, 0, 0]
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            m = my * mcus_x + mx
            if restart_interval and m and m % restart_interval == 0:
                writer.align()
                writer.raw(bytes((0xFF, 0xD0 + (n_rst % 8))))
                n_rst += 1
                pred = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    pred[0] = _encode_block(
                        _plane_block(yp, mx * hs + bx, my * vs + by),
                        qt_l, enc_dc_l, enc_ac_l, pred[0], writer,
                    )
            pred[1] = _encode_block(
                _plane_block(cbp, mx, my), qt_c, enc_dc_c, enc_ac_c, pred[1], writer
            )
            pred[2] = _encode_block(
                _plane_block(crp, mx, my), qt_c, enc_dc_c, enc_ac_c, pred[2], writer
            )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    rows: list[list[tuple[int, int, int]]],
    quality: int = 75,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    successive: int = 0,
) -> bytes:
    """Encode top-down RGB rows as a PROGRESSIVE (SOF2) JFIF/JPEG
    stream using spectral selection: one interleaved DC scan, then one
    AC scan per component per ``bands`` entry, with real EOBn
    end-of-band run coding (T.81 §G.1.2.2) so the decoder's EOBRUN
    path is exercised.  ``successive = L > 0`` adds SUCCESSIVE
    APPROXIMATION: the first scans carry the point-transformed
    coefficients (DC arithmetic-shifted, AC truncated toward zero, per
    §G.1.1.2) and L refinement passes (Al = L-1 .. 0) send one
    magnitude bit per scan — DC as raw bits (§G.1.2.1), AC through the
    §G.1.2.3 correction-bit algorithm (newly-significant ±2^Al
    insertions, zero-HISTORY run counts, EOB runs with buffered
    corrections).  Coefficients are bit-complete after the last
    refinement, so the decode equals the baseline 4:4:4 decode
    exactly.  4:4:4 only (all components 1x1), no restart markers."""
    if not bands or bands[0][0] < 1 or bands[-1][1] > 63:
        raise ValueError("bands must cover indices within 1..63")
    lo = 1
    for s, e in bands:
        if s != lo or e < s:
            raise ValueError("bands must be contiguous ascending from 1")
        lo = e + 1
    if lo != 64:
        raise ValueError("bands must end at 63")
    h = len(rows)
    w = len(rows[0]) if h else 0
    if h == 0 or w == 0 or any(len(r) != w for r in rows):
        raise ValueError("empty or ragged pixel rows")
    qt_l = _jpeg_scaled_qt(_JPEG_QT_LUMA, quality)
    qt_c = _jpeg_scaled_qt(_JPEG_QT_CHROMA, quality)

    # quantized zigzag coefficients per component per block
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [[[0.0] * w for _ in range(h)] for _ in range(3)]
    for y in range(h):
        for x in range(w):
            yy, cb, cr = _rgb_to_ycbcr(*rows[y][x])
            planes[0][y][x], planes[1][y][x], planes[2][y][x] = yy, cb, cr
    qblocks: list[list[list[int]]] = []
    for ci, (plane, qt) in enumerate(
        [(planes[0], qt_l), (planes[1], qt_c), (planes[2], qt_c)]
    ):
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                coef = _fdct8x8(_plane_block(plane, bx, by))
                zz = [
                    int(round(coef[p // 8][p % 8] / qt[p]))
                    for p in _JPEG_ZIGZAG
                ]
                blocks.append(zz)
        qblocks.append(blocks)

    enc_dc = [_huff_encode_table(*_JPEG_DC_LUMA),
              _huff_encode_table(*_JPEG_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*_JPEG_AC_LUMA),
              _huff_encode_table(*_JPEG_AC_CHROMA)]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(qt[p] for p in _JPEG_ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    out += bytes((1, 0x11, 0)) + bytes((2, 0x11, 1)) + bytes((3, 0x11, 1))
    for tc_th, (bits, vals) in (
        (0x00, _JPEG_DC_LUMA), (0x10, _JPEG_AC_LUMA),
        (0x01, _JPEG_DC_CHROMA), (0x11, _JPEG_AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    if successive < 0 or successive > 13:
        raise ValueError(f"successive must be in 0..13, got {successive}")
    L = successive

    # scan 1: interleaved DC first pass (Ss=Se=0, Ah=0, Al=L) —
    # DC point transform is an arithmetic shift (§G.1.1.2)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes((1, 0x00, 2, 0x10, 3, 0x10))
    out += bytes((0, 0, L))
    writer = _BitWriter()
    preds = [0, 0, 0]
    for b in range(bw * bh):
        for ci in range(3):
            tab = enc_dc[0 if ci == 0 else 1]
            dc = qblocks[ci][b][0] >> L
            diff = dc - preds[ci]
            preds[ci] = dc
            size, mag = _magnitude_bits(diff)
            code, width = tab[size]
            writer.put(code, width)
            if size:
                writer.put(mag, size)
    out += writer.flush()

    # DC refinement scans: one raw magnitude bit per block per comp
    for al in range(L - 1, -1, -1):
        out += b"\xff\xda" + struct.pack(">HB", 12, 3)
        out += bytes((1, 0x00, 2, 0x00, 3, 0x00))
        out += bytes((0, 0, ((al + 1) << 4) | al))
        writer = _BitWriter()
        for b in range(bw * bh):
            for ci in range(3):
                writer.put((qblocks[ci][b][0] >> al) & 1, 1)
        out += writer.flush()

    # AC band scans: per band, per component (single-component scans).
    # The Annex-K baseline AC tables hold no EOBn symbols (n > 0), so —
    # like real progressive encoders — each scan ships its OWN Huffman
    # table over exactly the symbols it uses (flat equal-length
    # canonical codes: bits[L] = n_syms with 2^L > n_syms keeps the
    # all-ones code unused, per spec).  This also exercises the
    # decoder's between-scan DHT redefinition path.
    def pt(v: int, al: int) -> int:
        """AC point transform: truncation toward zero (§G.1.1.2)."""
        return (abs(v) >> al) if v >= 0 else -(abs(v) >> al)

    def ac_first_tokens(ci: int, s_lo: int, s_hi: int, al: int):
        # ops: ('h', sym) huffman symbol / ('b', value, nbits) raw bits
        ops: list[tuple] = []

        def flush(run: int) -> None:
            while run > 0:
                n = min(14, run.bit_length() - 1)
                chunk = min(run, (1 << (n + 1)) - 1)
                ops.append(("h", n << 4))
                if n:
                    ops.append(("b", chunk - (1 << n), n))
                run -= chunk

        eobrun = 0
        for b in range(bw * bh):
            zz = [pt(v, al) for v in qblocks[ci][b]]
            if not any(zz[k] for k in range(s_lo, s_hi + 1)):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush(eobrun)
                    eobrun = 0
                continue
            flush(eobrun)
            eobrun = 0
            run = 0
            last_nz = max(k for k in range(s_lo, s_hi + 1) if zz[k])
            for k in range(s_lo, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ops.append(("h", 0xF0))
                    run -= 16
                size, mag = _magnitude_bits(zz[k])
                ops.append(("h", (run << 4) | size))
                ops.append(("b", mag, size))
                run = 0
            if last_nz < s_hi:  # trailing zeros in band -> this block EOBs
                eobrun += 1
        flush(eobrun)
        return ops

    def ac_refine_tokens(ci: int, s_lo: int, s_hi: int, al: int):
        """§G.1.2.3 encoder: newly-significant insertions over
        zero-HISTORY run counts, correction bits appended after each
        codeword, EOB runs with the covered blocks' corrections
        buffered behind the EOBn symbol."""
        ops: list[tuple] = []
        eobrun = 0
        eob_corr: list[int] = []

        def flush() -> None:
            nonlocal eobrun, eob_corr
            run = eobrun
            first = True
            while run > 0:
                n = min(14, run.bit_length() - 1)
                chunk = min(run, (1 << (n + 1)) - 1)
                ops.append(("h", n << 4))
                if n:
                    ops.append(("b", chunk - (1 << n), n))
                if first:
                    for bit in eob_corr:
                        ops.append(("b", bit, 1))
                    first = False
                run -= chunk
            eobrun = 0
            eob_corr = []

        for b in range(bw * bh):
            zz = qblocks[ci][b]
            hist = [abs(zz[k]) >> (al + 1) != 0 for k in range(64)]
            newly = [
                not hist[k] and (abs(zz[k]) >> al) == 1 for k in range(64)
            ]
            corr_bit = [(abs(zz[k]) >> al) & 1 for k in range(64)]
            if not any(newly[k] for k in range(s_lo, s_hi + 1)):
                eobrun += 1
                eob_corr.extend(
                    corr_bit[k] for k in range(s_lo, s_hi + 1) if hist[k]
                )
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            # position-accurate emission mirroring the decoder: each
            # ZRL crosses exactly 16 zero-HISTORY slots, so correction
            # bits ride with the codeword whose crossing covers their
            # position — a single buffer flushed per codeword would
            # misplace corrections sitting past a ZRL boundary
            cursor = s_lo
            for k0 in range(s_lo, s_hi + 1):
                if not newly[k0]:
                    continue
                zcount = 0
                pending: list[int] = []
                for k in range(cursor, k0):
                    if hist[k]:
                        pending.append(corr_bit[k])
                    else:
                        zcount += 1
                        if zcount == 16:
                            ops.append(("h", 0xF0))
                            for bit in pending:
                                ops.append(("b", bit, 1))
                            pending = []
                            zcount = 0
                ops.append(("h", (zcount << 4) | 1))
                ops.append(("b", 1 if zz[k0] > 0 else 0, 1))
                for bit in pending:
                    ops.append(("b", bit, 1))
                cursor = k0 + 1
            tail = [
                corr_bit[k] for k in range(cursor, s_hi + 1) if hist[k]
            ]
            if cursor <= s_hi:
                eobrun += 1
                eob_corr.extend(tail)
        flush()
        return ops

    def emit_ac_scan(ci: int, s_lo: int, s_hi: int, ah: int, al: int,
                     ops: list[tuple]) -> None:
        nonlocal out
        syms = sorted({op[1] for op in ops if op[0] == "h"}) or [0x00]
        lvl = 1
        while (1 << lvl) - 1 < len(syms):
            lvl += 1
        dht_bits = [0] * 16
        dht_bits[lvl - 1] = len(syms)
        tab = _huff_encode_table(dht_bits, syms)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(syms), 0x10)
        out += bytes(dht_bits) + bytes(syms)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        # (cid, Td<<4 | Ta): Td unused in AC scans; Ta = 0 (the table
        # redefined just above)
        out += bytes((ci + 1, 0x00))
        out += bytes((s_lo, s_hi, (ah << 4) | al))
        writer = _BitWriter()
        for op in ops:
            if op[0] == "h":
                code, width = tab[op[1]]
                writer.put(code, width)
            else:
                writer.put(op[1], op[2])
        out += writer.flush()

    out = bytearray(out)
    for s_lo, s_hi in bands:
        for ci in range(3):
            emit_ac_scan(
                ci, s_lo, s_hi, 0, L, ac_first_tokens(ci, s_lo, s_hi, L)
            )
    for al in range(L - 1, -1, -1):
        for s_lo, s_hi in bands:
            for ci in range(3):
                emit_ac_scan(
                    ci, s_lo, s_hi, al + 1, al,
                    ac_refine_tokens(ci, s_lo, s_hi, al),
                )

    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over JPEG entropy-coded data: un-stuffs
    0xFF00, byte-aligns at RSTn markers (reported to the caller), and
    raises ValueError on truncation or unexpected markers."""

    def __init__(self, payload: bytes, pos: int) -> None:
        self.payload = payload
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.hit_rst = False

    def _next_byte(self) -> int:
        p = self.payload
        if self.pos >= len(p):
            raise ValueError("truncated JPEG entropy data")
        b = p[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(p):
                raise ValueError("truncated JPEG entropy data")
            m = p[self.pos]
            if m == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= m <= 0xD7:
                raise ValueError("unexpected RST inside coded unit")
            else:
                raise ValueError(f"unexpected marker 0xff{m:02x} in scan")
        return b

    def bit(self) -> int:
        if self._n == 0:
            self._acc = self._next_byte()
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at the current (byte-aligned) cursor."""
        self._n = 0
        p = self.payload
        if self.pos + 1 >= len(p) or p[self.pos] != 0xFF or not (
            0xD0 <= p[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RST marker")
        self.pos += 2

    def at_marker(self) -> bool:
        p = self.payload
        return (
            self.pos + 1 < len(p)
            and p[self.pos] == 0xFF
            and p[self.pos + 1] != 0x00
        )


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _decode_block(
    reader: _BitReader,
    qt: list[int],
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
) -> tuple[list[list[int]], int]:
    """Huffman-decode + dequantize + IDCT one block -> (8x8 samples
    in 0..255, new DC predictor)."""
    size = _huff_decode(reader, dc_tab)
    diff = _extend(reader.bits(size), size) if size else 0
    dc = pred + diff
    zz = [0] * 64
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0x0F
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    coef = [[0.0] * 8 for _ in range(8)]
    for i, pos in enumerate(_JPEG_ZIGZAG):
        coef[pos // 8][pos % 8] = zz[i] * qt[pos]
    spatial = _idct8x8(coef)
    return (
        [[_clamp8(spatial[y][x] + 128.0) for x in range(8)] for y in range(8)],
        dc,
    )


def decode_jpeg(
    payload: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a baseline (SOF0) or PROGRESSIVE (SOF2, spectral
    selection) JFIF/JPEG stream to (width, height, top-down RGB rows).
    Baseline supports 3-component YCbCr at any sampling whose factors
    divide 2x2 (4:4:4, 4:2:0, 4:2:2) plus 1-component grayscale,
    multi-segment DQT/DHT, and restart intervals (DRI/RSTn).
    Progressive (r10) supports 4:4:4 / grayscale spectral-selection
    scans (interleaved DC scan + per-component AC band scans, EOBn run
    decoding) INCLUDING successive-approximation refinement (Ah > 0 —
    DC magnitude bits and the §G.1.2.3 AC correction-bit algorithm);
    subsampled progressive and progressive restarts are rejected
    loudly, as are every other SOF, arithmetic coding and 12-bit
    precision — a production pipeline routes those to libjpeg; the
    Spark-side plumbing is identical."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    w = h = 0
    dri = 0
    sof_seen = False
    progressive = False
    # progressive state: per component, one 64-long zigzag coefficient
    # list per block (frame block grid — all-1x1 sampling is enforced)
    coeffs: list[list[list[int]]] = []
    preds: list[int] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq == 0:
                    vals = list(seg[off : off + 64])
                    off += 64
                else:  # 16-bit entries
                    vals = [
                        struct.unpack_from(">H", seg, off + 2 * i)[0]
                        for i in range(64)
                    ]
                    off += 128
                if len(vals) < 64:
                    raise ValueError("truncated DQT")
                qt = [0] * 64
                for i, zpos in enumerate(_JPEG_ZIGZAG):
                    qt[zpos] = vals[i]
                qts[tq] = qt
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (baseline) or SOF2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            w, h = fw, fh
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof_seen = True
            if marker == 0xC2:
                progressive = True
                if any(c[1] != 1 or c[2] != 1 for c in comps):
                    raise ValueError(
                        "subsampled progressive JPEG unsupported — "
                        "only 4:4:4 / grayscale"
                    )
                bw, bh = (w + 7) // 8, (h + 7) // 8
                coeffs = [
                    [[0] * 64 for _ in range(bw * bh)] for _ in comps
                ]
                preds = [0] * len(comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xff{marker:02x}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if not sof_seen:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if progressive:
                if dri:
                    raise ValueError("progressive restart intervals unsupported")
                scan_comps = []
                for i in range(ns):
                    cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                    ci = next(
                        j for j, c in enumerate(comps) if c[0] == cid
                    )
                    scan_comps.append((ci, tabs >> 4, tabs & 0x0F))
                ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                ah, al = ahl >> 4, ahl & 0x0F
                pos = _decode_progressive_scan(
                    payload, pos + 2 + seg_len, w, h, coeffs, preds,
                    huff, scan_comps, ss, se, ah, al,
                )
                continue
            scan_tabs: dict[int, tuple[int, int]] = {}
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
            data_start = pos + 2 + seg_len
            return _decode_scan(
                payload, data_start, w, h, comps, qts, huff, scan_tabs, dri
            )
        # APPn / COM / anything else: skip
        pos += 2 + seg_len
    if progressive and sof_seen:
        return _progressive_reconstruct(coeffs, comps, qts, w, h)
    raise ValueError("no SOS marker found")


def _decode_progressive_scan(
    payload: bytes,
    pos: int,
    w: int,
    h: int,
    coeffs: list[list[list[int]]],
    preds: list[int],
    huff: dict[tuple[int, int], dict[tuple[int, int], int]],
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode ONE progressive scan into the coefficient store; returns
    the stream position of the next marker.  DC scans (Ss=0) may
    interleave several components; AC scans are single-component with
    EOBn end-of-band runs (T.81 §G.1.2.2).  Ah > 0 scans are
    SUCCESSIVE-APPROXIMATION refinements: DC appends one magnitude bit
    per block (§G.1.2.1), AC runs the correction-bit algorithm
    (§G.1.2.3 — newly-significant ±2^Al insertions with zero-HISTORY
    run counts, correction bits on every nonzero-history coefficient
    crossed, EOB runs carrying the remaining corrections)."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    reader = _BitReader(payload, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        if ah > 0:  # DC refinement: one bit per block per component
            for b in range(bw * bh):
                for ci, _td, _ta in scan_comps:
                    coeffs[ci][b][0] |= reader.bit() << al
        else:
            tabs = {ci: huff.get((0, td)) for ci, td, _ in scan_comps}
            if any(t is None for t in tabs.values()):
                raise ValueError("scan references undefined table")
            for b in range(bw * bh):
                for ci, _td, _ta in scan_comps:
                    size = _huff_decode(reader, tabs[ci])
                    diff = _extend(reader.bits(size), size) if size else 0
                    preds[ci] += diff
                    coeffs[ci][b][0] = preds[ci] << al
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _td, ta = scan_comps[0]
        ac_tab = huff.get((1, ta))
        if ac_tab is None:
            raise ValueError("scan references undefined table")
        eobrun = 0
        if ah > 0:  # AC refinement (§G.1.2.3)
            p1, m1 = 1 << al, -(1 << al)

            def correct(block: list[int], k: int) -> None:
                if reader.bit() and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] > 0 else m1

            for b in range(bw * bh):
                block = coeffs[ci][b]
                if eobrun > 0:
                    eobrun -= 1
                    for k in range(ss, se + 1):
                        if block[k]:
                            correct(block, k)
                    continue
                k = ss
                while k <= se:
                    sym = _huff_decode(reader, ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) + (reader.bits(r) if r else 0)
                            break
                        # ZRL: cross 16 zero-history slots
                    else:
                        if s != 1:
                            raise ValueError(
                                "refinement scan carries multi-bit coefficient"
                            )
                        val = p1 if reader.bit() else m1
                    while k <= se:
                        if block[k]:
                            correct(block, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        block[k] = val
                    k += 1
                if eobrun > 0:
                    # current block completes with corrections only
                    for kk in range(k, se + 1):
                        if block[kk]:
                            correct(block, kk)
                    eobrun -= 1
        else:
            for b in range(bw * bh):
                if eobrun > 0:
                    eobrun -= 1
                    continue
                block = coeffs[ci][b]
                k = ss
                while k <= se:
                    sym = _huff_decode(reader, ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) + (reader.bits(r) if r else 0) - 1
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient outside scan band")
                    block[k] = _extend(reader.bits(s), s) << al
                    k += 1
    # advance to the next marker (skip pad bits / bytes)
    p = reader.pos
    while p + 1 < len(payload) and not (
        payload[p] == 0xFF and payload[p + 1] != 0x00
    ):
        p += 1
    return p


def _progressive_reconstruct(
    coeffs: list[list[list[int]]],
    comps: list[tuple[int, int, int, int]],
    qts: dict[int, list[int]],
    w: int,
    h: int,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Dequantize + IDCT the accumulated coefficient store and finish
    through the shared upsample/color path (all-1x1 sampling)."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = []
    for ci, (_cid, _ch, _cv, tq) in enumerate(comps):
        qt = qts.get(tq)
        if qt is None:
            raise ValueError("frame references undefined quantization table")
        plane = [[0] * (bw * 8) for _ in range(bh * 8)]
        for b, zz in enumerate(coeffs[ci]):
            coef = [[0.0] * 8 for _ in range(8)]
            for i, zpos in enumerate(_JPEG_ZIGZAG):
                coef[zpos // 8][zpos % 8] = zz[i] * qt[zpos]
            spatial = _idct8x8(coef)
            oy, ox = (b // bw) * 8, (b % bw) * 8
            for y in range(8):
                row = plane[oy + y]
                for x in range(8):
                    row[ox + x] = _clamp8(spatial[y][x] + 128.0)
        planes.append(plane)
    return _planes_to_rgb(planes, comps, w, h, 1, 1)


def _decode_scan(
    payload: bytes,
    pos: int,
    w: int,
    h: int,
    comps: list[tuple[int, int, int, int]],
    qts: dict[int, list[int]],
    huff: dict[tuple[int, int], dict[tuple[int, int], int]],
    scan_tabs: dict[int, tuple[int, int]],
    dri: int,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # Per-component sample planes at native (subsampled) resolution.
    planes = [
        [[0] * (mcus_x * 8 * c[1]) for _ in range(mcus_y * 8 * c[2])]
        for c in comps
    ]
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            reader.restart()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            dc_tab = huff.get((0, scan_tabs[cid][0]))
            ac_tab = huff.get((1, scan_tabs[cid][1]))
            qt = qts.get(tq)
            if dc_tab is None or ac_tab is None or qt is None:
                raise ValueError("scan references undefined table")
            for by in range(cv):
                for bx in range(ch):
                    block, preds[ci] = _decode_block(
                        reader, qt, dc_tab, ac_tab, preds[ci]
                    )
                    oy, ox = (my * cv + by) * 8, (mx * ch + bx) * 8
                    plane = planes[ci]
                    for y in range(8):
                        row = plane[oy + y]
                        row[ox : ox + 8] = block[y]
    return _planes_to_rgb(planes, comps, w, h, hmax, vmax)


def _planes_to_rgb(
    planes: list[list[list[int]]],
    comps: list[tuple[int, int, int, int]],
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Upsample component planes to frame resolution and color-convert
    (shared by the baseline and progressive reconstruction paths)."""
    rows: list[list[tuple[int, int, int]]] = []
    if len(comps) == 1:
        plane = planes[0]
        for y in range(h):
            rows.append([(v, v, v) for v in plane[y][:w]])
        return w, h, rows
    _, yh, yv, _ = comps[0]
    for y in range(h):
        row = []
        for x in range(w):
            yy = planes[0][y * yv // vmax][x * yh // hmax]
            cb = planes[1][y * comps[1][2] // vmax][x * comps[1][1] // hmax]
            cr = planes[2][y * comps[2][2] // vmax][x * comps[2][1] // hmax]
            row.append(_ycbcr_to_rgb(float(yy), float(cb), float(cr)))
        rows.append(row)
    return w, h, rows


def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """Header-only (width, height) from the SOF0 segment — no entropy
    decode, for manifest/stat passes that don't need pixels."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: identical payload layout
            _, fh, fw = struct.unpack_from(">BHH", payload, pos + 4)
            return fw, fh
        if marker == 0xDA or marker == 0xD9:
            break
        pos += 2 + seg_len
    raise ValueError("no SOF0/SOF1/SOF2 segment found")


def goertzel_power(vals: "list[int] | tuple[int, ...]", k_bin: int) -> float:
    """Goertzel single-bin DFT power |X_k|^2 over the full sample
    window (N = len(vals)) — the O(N) per-bin spectral probe DSP
    pipelines use when they need a handful of bins, not a full FFT.
    Pure math/struct like the rest of this module."""
    import math

    n = len(vals)
    if n == 0:
        return 0.0
    w = 2.0 * math.pi * k_bin / n
    coeff = 2.0 * math.cos(w)
    s_prev = s_prev2 = 0.0
    for v in vals:
        s = v + coeff * s_prev - s_prev2
        s_prev2, s_prev = s_prev, s
    return s_prev * s_prev + s_prev2 * s_prev2 - coeff * s_prev * s_prev2


def wav_samples(payload: bytes) -> tuple[int, tuple[int, ...]]:
    """(sample_rate, PCM sample tuple) from a 16-bit PCM WAV —
    the decode step :func:`wav_dominant_tone` and feature extractors
    build on; same RIFF chunk walk as :func:`decode_wav`."""
    sr = None
    vals: tuple[int, ...] | None = None
    pos = 12
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt_code, _ch, sr, _br, _block, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            vals = struct.unpack_from(f"<{clen // 2}h", payload, pos + 8)
        pos += 8 + clen + (clen % 2)
    if sr is None or vals is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, vals


def wav_dominant_tone(
    payload: bytes, max_bin: int = 19
) -> tuple[int, int, int, float]:
    """REAL audio feature extraction: decode a 16-bit PCM WAV and
    return ``(sample_rate, n_samples, dominant_bin, rms)`` where
    ``dominant_bin`` is the full-window DFT bin (1..max_bin) with the
    highest Goertzel power — tone/DTMF-style detection, the simplest
    genuinely spectral feature (one step past :func:`wav_rms`)."""
    sr, vals = wav_samples(payload)
    n = len(vals)
    rms = (sum(v * v for v in vals) / n) ** 0.5 if n else 0.0
    best_bin, best_p = 0, -1.0
    for k in range(1, max_bin + 1):
        p = goertzel_power(vals, k)
        if p > best_p:
            best_bin, best_p = k, p
    return sr, n, best_bin, rms
