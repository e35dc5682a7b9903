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
# PNG (non-interlaced 8-bit RGB / RGBA, stdlib zlib — no PIL needed)
#
# PNG's only compression is DEFLATE, which the zlib module already used
# by x200/x233 provides; everything else is struct parsing plus the five
# scanline filters (r8 VERDICT item 5).  Interlaced (Adam7), paletted,
# 16-bit and grayscale images are rejected loudly — a production
# pipeline routes those to a full codec; the *plumbing* is identical.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    rows: list[list[tuple[int, ...]]],
    alpha: bool = False,
    filter_type: int = 0,
    idat_split: int | None = None,
) -> bytes:
    """Encode RGB(A) pixel rows (top-down, row-major) as a non-interlaced
    8-bit PNG.  ``filter_type`` applies ONE filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) to every scanline so the decoder's unfilter path
    for that type is exercised pixel-exactly; ``idat_split`` splits the
    compressed stream across multiple IDAT chunks (spec-legal, and a
    decode path real PNGs hit)."""
    import zlib

    height = len(rows)
    width = len(rows[0]) if height else 0
    if any(len(r) != width for r in rows):
        raise ValueError("ragged pixel rows")
    bpp = 4 if alpha else 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for row in rows:
        line = bytearray()
        for px in row:
            if len(px) != bpp:
                raise ValueError(f"expected {bpp}-tuples, got {px!r}")
            line += bytes(px)
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
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6 if alpha else 2, 0, 0, 0)
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
        + idats
        + _png_chunk(b"IEND", b"")
    )


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


def decode_png(
    payload: bytes,
) -> tuple[int, int, list[list[tuple[int, ...]]]]:
    """Decode a non-interlaced 8-bit RGB/RGBA PNG to (width, height,
    top-down pixel rows).  Pure struct + stdlib zlib: walks chunks
    (verifying each CRC), concatenates every IDAT, inflates, and
    inverts the per-scanline filter (None/Sub/Up/Average/Paeth).
    Rejects other bit depths, color types, and Adam7 interlacing."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = bpp = None
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
            if depth != 8 or color not in (2, 6) or interlace != 0:
                raise ValueError(
                    "unsupported PNG (depth="
                    f"{depth}, color={color}, interlace={interlace}) — "
                    "only non-interlaced 8-bit RGB/RGBA"
                )
            if comp != 0 or filt != 0:
                raise ValueError("non-standard PNG compression/filter method")
            bpp = 4 if color == 6 else 3
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {height * (stride + 1)}"
        )
    rows: list[list[tuple[int, ...]]] = []
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
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
        rows.append(
            [tuple(line[x * bpp : (x + 1) * bpp]) for x in range(width)]
        )
        prev = line
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
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
            fpacked = payload[pos + 9]
            if fpacked & 0x80:
                raise ValueError("local color tables unsupported")
            if fpacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise ValueError("sub-rectangle frames unsupported")
            pos += 10
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                n = payload[pos]
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
            label = payload[pos + 1]
            if label == 0xF9:
                (d,) = struct.unpack_from("<H", payload, pos + 4)
                delays.append(d)
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            pos += 10
            pos += 1  # min code size
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    return delays
