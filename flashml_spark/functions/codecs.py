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
