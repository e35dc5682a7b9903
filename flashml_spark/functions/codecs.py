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
