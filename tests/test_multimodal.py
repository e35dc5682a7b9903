"""Multimodal codec tests.

The fake-codec plumbing is covered by the x12 oracle query; these pin the
REAL codec path (``decode_media(fake=False)``): decodes actual images where
PIL is installed (import-gated — skipped in this container), and fails
loudly with NotImplementedError where it is not.
"""

from __future__ import annotations

import importlib.util

import pytest

from flashml_spark.functions import codecs
from flashml_spark.operators.multimodal import _real_decode, decode_media

HAS_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed in this environment")
def test_real_codec_decodes_png(spark):
    """Real decode returns true dimensions and a 64-bit average-hash that is
    identical for identical images and differs for an inverted one."""
    import io

    from PIL import Image

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png_bytes(32, 16, (255, 0, 0)), "image/png"),
        (2, png_bytes(64, 48, (0, 0, 255)), "image/png"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (32, 16)
    assert (out[2]["width"], out[2]["height"]) == (64, 48)
    assert len(out[1]["phash"]) == 16 and len(out[2]["phash"]) == 16


@pytest.mark.skipif(HAS_PIL, reason="PIL installed — real decode works here")
def test_real_codec_raises_cleanly_without_pil(spark):
    """Without PIL the real path must surface NotImplementedError from the
    executor task, not silently fall back to the fake codec."""
    df = spark.createDataFrame(
        [(1, b"not-an-image", "image/png")],
        "media_id long, payload binary, mime string",
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_media(df, fake=False).collect()


@pytest.mark.skipif(HAS_PIL, reason="PIL installed")
def test_real_decode_driver_side_raises_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        _real_decode(b"payload")


def test_resize_media_fake_contract(spark):
    from flashml_spark.operators.multimodal import documents_as_media, resize_media
    from flashml_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = documents_as_media(docs)
    out = resize_media(media, width=8, height=4).collect()
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(bytes(r["thumb"])) == 32  # w*h grayscale byte contract
    # determinism: same payload -> same thumb bytes
    again = {r["media_id"]: bytes(r["thumb"]) for r in resize_media(media, 8, 4).collect()}
    assert all(bytes(r["thumb"]) == again[r["media_id"]] for r in out)


def test_resize_media_real_raises_without_pil(spark):
    if HAS_PIL:
        pytest.skip("PIL installed; real path covered by decode tests")
    from flashml_spark.operators.multimodal import documents_as_media, resize_media
    from flashml_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(2)
    with pytest.raises(Exception) as exc_info:
        resize_media(documents_as_media(docs), fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_audio_features_fake_deterministic(spark):
    from flashml_spark.operators.multimodal import audio_features, documents_as_media
    from flashml_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = documents_as_media(docs)
    rows = audio_features(media).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["sample_rate"] in {8000, 16000, 24000, 32000, 40000, 48000}
        assert float(r["duration_s"]) == pytest.approx(
            r["n_samples"] / r["sample_rate"], abs=1e-6
        )
    again = {r["media_id"]: r["n_samples"] for r in audio_features(media).collect()}
    assert all(again[r["media_id"]] == r["n_samples"] for r in rows)


# --- dependency-free REAL codecs (BMP / PCM WAV, functions/codecs.py) -------


def test_bmp_roundtrip_all_padding_widths():
    from flashml_spark.functions import codecs

    for w in (1, 2, 3, 5, 8):
        rows = [
            [((x * 7) % 256, (y * 11) % 256, (x + y) % 256) for x in range(w)]
            for y in range(3)
        ]
        payload = codecs.encode_bmp(rows)
        width, height, got = codecs.decode_bmp(payload)
        assert (width, height) == (w, 3)
        assert got == rows  # pixel-exact, any row padding


def test_bmp_decode_rejects_unsupported():
    from flashml_spark.functions import codecs

    with pytest.raises(ValueError, match="not a BMP"):
        codecs.decode_bmp(b"PNG whatever")
    # corrupt the bit depth of a valid file
    payload = bytearray(codecs.encode_bmp([[(0, 0, 0)]]))
    payload[28] = 8  # biBitCount 24 -> 8
    with pytest.raises(ValueError, match="unsupported BMP"):
        codecs.decode_bmp(bytes(payload))


def test_png_roundtrip_every_filter_type_rgb_and_rgba():
    # Encoding with ONE filter type per image forces the decoder's
    # unfilter path for that type; pixel-exact equality proves the
    # inverse transform (r8 VERDICT item 5 — no PIL anywhere).
    from flashml_spark.functions import codecs

    rgb = [
        [((x * 37) % 256, (y * 53) % 256, (x * y + 7) % 256) for x in range(6)]
        for y in range(5)
    ]
    rgba = [
        [((x * 11) % 256, (y * 19) % 256, (x + 2 * y) % 256, (x * y) % 256)
         for x in range(4)]
        for y in range(4)
    ]
    for ft in range(5):
        w, h, got = codecs.decode_png(codecs.encode_png(rgb, filter_type=ft))
        assert (w, h) == (6, 5) and got == rgb, f"RGB filter {ft}"
        w, h, got = codecs.decode_png(
            codecs.encode_png(rgba, alpha=True, filter_type=ft)
        )
        assert (w, h) == (4, 4) and got == rgba, f"RGBA filter {ft}"


def test_png_multiple_idat_chunks_and_1x1():
    from flashml_spark.functions import codecs

    rows = [
        [((x * 3) % 256, (y * 5) % 256, 128) for x in range(16)]
        for y in range(16)
    ]
    # split the deflate stream across many tiny IDAT chunks (spec-legal)
    payload = codecs.encode_png(rows, filter_type=2, idat_split=7)
    assert payload.count(b"IDAT") > 1
    assert codecs.decode_png(payload) == (16, 16, rows)
    assert codecs.decode_png(codecs.encode_png([[(9, 8, 7)]])) == (
        1, 1, [[(9, 8, 7)]],
    )


def test_png_decode_rejects_unsupported_and_corrupt():
    import struct as _struct

    from flashml_spark.functions import codecs

    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"BM not a png")
    good = codecs.encode_png([[(1, 2, 3)]])
    # corrupt IHDR bit depth 8 -> 4 (sub-byte, unsupported) with a
    # recomputed CRC so the *depth* check fires, not the CRC check
    # (paletted/grayscale/16-bit all became SUPPORTED in r10)
    import zlib as _zlib

    ihdr_data = bytearray(good[16:29])
    ihdr_data[8] = 4
    patched = (
        good[:16]
        + bytes(ihdr_data)
        + _struct.pack(
            ">I", _zlib.crc32(b"IHDR" + bytes(ihdr_data[:13])) & 0xFFFFFFFF
        )
        + good[33:]
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        codecs.decode_png(patched)
    # flip one IDAT byte -> CRC mismatch is detected, not garbage pixels
    idat_at = good.index(b"IDAT")
    corrupt = bytearray(good)
    corrupt[idat_at + 4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        codecs.decode_png(bytes(corrupt))


def test_real_decode_png_end_to_end(spark):
    """The REAL codec path (fake=False) with PNG payloads through
    Arrow-batched mapInPandas — same pixel-true assertions as the BMP
    twin, via the stdlib-zlib decode path."""
    from flashml_spark.functions import codecs

    half = [[(0, 0, 0)] * 16 for _ in range(8)] + [
        [(255, 255, 255)] * 16 for _ in range(8)
    ]
    solid_rgba = [[(10, 200, 60, 255)] * 5 for _ in range(7)]
    rows = [
        (1, codecs.encode_png(half, filter_type=4), "image/png"),
        (2, codecs.encode_png(solid_rgba, alpha=True), "image/png"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 16)
    assert out[1]["phash"] == f"{0xFFFFFFFF00000000:016x}"
    assert (out[2]["width"], out[2]["height"]) == (5, 7)
    # solid color: every cell equals the mean -> all bits set (alpha
    # ignored by luma, the convert("L") behavior)
    assert out[2]["phash"] == "f" * 16


def test_real_resize_png_end_to_end(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import resize_media

    q = [
        [(0, 0, 0), (0, 0, 0), (100, 100, 100), (100, 100, 100)],
        [(0, 0, 0), (0, 0, 0), (100, 100, 100), (100, 100, 100)],
        [(200, 200, 200), (200, 200, 200), (250, 250, 250), (250, 250, 250)],
        [(200, 200, 200), (200, 200, 200), (250, 250, 250), (250, 250, 250)],
    ]
    df = spark.createDataFrame(
        [(1, codecs.encode_png(q, filter_type=1), "image/png")],
        "media_id long, payload binary, mime string",
    )
    out = resize_media(df, width=2, height=2, fake=False).collect()[0]
    assert bytes(out["thumb"]) == bytes([0, 100, 200, 250])


def test_png_bmp_phash_agree_on_same_pixels():
    # The two dependency-free image paths must produce the SAME
    # perceptual hash for the same pixel grid — codec-independent
    # downstream dedup keys.
    from flashml_spark.functions import codecs

    rows = [
        [((x * x + y) % 256, (x + y * y) % 256, (3 * x) % 256)
         for x in range(9)]
        for y in range(9)
    ]
    bmp_w, bmp_h, bmp_px = codecs.decode_bmp(codecs.encode_bmp(rows))
    png_w, png_h, png_px = codecs.decode_png(
        codecs.encode_png(rows, filter_type=3)
    )
    assert (bmp_w, bmp_h) == (png_w, png_h)
    assert [list(map(tuple, r)) for r in bmp_px] == png_px
    assert codecs.average_hash(
        codecs.bmp_grayscale(bmp_px)
    ) == codecs.average_hash(codecs.png_grayscale(png_px))


def test_average_hash_half_black_half_white():
    from flashml_spark.functions import codecs

    gray = [[0] * 8 for _ in range(4)] + [[255] * 8 for _ in range(4)]
    # bottom 32 row-major cells >= mean -> high 32 bits set
    assert codecs.average_hash(gray) == f"{0xFFFFFFFF00000000:016x}"


def test_wav_roundtrip_and_rms():
    from flashml_spark.functions import codecs

    samples = [0, 1000, -1000, 2000, -2000, 0]
    payload = codecs.encode_wav(samples, 16000)
    sr, ch, n = codecs.decode_wav(payload)
    assert (sr, ch, n) == (16000, 1, 6)
    expect_rms = (sum(s * s for s in samples) / 6) ** 0.5
    assert codecs.wav_rms(payload) == pytest.approx(expect_rms)


def test_wav_decode_walks_extra_chunks():
    from flashml_spark.functions import codecs
    import struct

    payload = codecs.encode_wav([1, 2, 3], 8000)
    # splice a LIST chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = payload[:12] + extra + payload[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert codecs.decode_wav(spliced) == (8000, 1, 3)


def test_real_decode_bmp_end_to_end(spark):
    """The REAL codec path (fake=False), exercised with no external libs:
    BMP payloads through Arrow-batched mapInPandas, pixel-true results."""
    from flashml_spark.functions import codecs

    half = [[(0, 0, 0)] * 16 for _ in range(8)] + [
        [(255, 255, 255)] * 16 for _ in range(8)
    ]
    solid = [[(10, 200, 60)] * 5 for _ in range(7)]
    rows = [
        (1, codecs.encode_bmp(half), "image/bmp"),
        (2, codecs.encode_bmp(solid), "image/bmp"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 16)
    assert out[1]["phash"] == f"{0xFFFFFFFF00000000:016x}"
    assert (out[2]["width"], out[2]["height"]) == (5, 7)
    # solid color: every cell equals the mean -> all bits set
    assert out[2]["phash"] == "f" * 16


def test_real_resize_bmp_end_to_end(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import resize_media

    # 4x4 quadrant image; nearest-neighbor 2x2 picks each quadrant's
    # top-left pixel
    q = [
        [(0, 0, 0), (0, 0, 0), (100, 100, 100), (100, 100, 100)],
        [(0, 0, 0), (0, 0, 0), (100, 100, 100), (100, 100, 100)],
        [(200, 200, 200), (200, 200, 200), (250, 250, 250), (250, 250, 250)],
        [(200, 200, 200), (200, 200, 200), (250, 250, 250), (250, 250, 250)],
    ]
    df = spark.createDataFrame(
        [(1, codecs.encode_bmp(q), "image/bmp")],
        "media_id long, payload binary, mime string",
    )
    out = resize_media(df, width=2, height=2, fake=False).collect()[0]
    assert bytes(out["thumb"]) == bytes([0, 100, 200, 250])


def test_real_audio_features_wav_end_to_end(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [
            (1, codecs.encode_wav([0] * 16000, 16000), "audio/wav"),
            (2, codecs.encode_wav([5] * 4410, 44100), "audio/wav"),
        ],
        "media_id long, payload binary, mime string",
    )
    out = {r["media_id"]: r for r in audio_features(df, fake=False).collect()}
    assert (out[1]["sample_rate"], out[1]["n_samples"]) == (16000, 16000)
    assert out[1]["duration_s"] == "1.000000"
    assert (out[2]["sample_rate"], out[2]["n_samples"]) == (44100, 4410)
    assert out[2]["duration_s"] == "0.100000"


# --- Y4M video: real container stats + frame sampling + scene cuts ----------


def _gradient_frame(w, h, shift):
    return [[(x * 8 + y * 4 + shift) % 256 for x in range(w)] for y in range(h)]


def test_y4m_roundtrip_and_frame_count():
    from flashml_spark.functions import codecs

    frames = [_gradient_frame(16, 8, s) for s in range(7)]
    payload = codecs.encode_y4m(frames, fps=(25, 1))
    assert codecs.decode_y4m_header(payload) == (16, 8, 25, 1)
    assert codecs.y4m_frame_count(payload) == 7
    got = dict(codecs.iter_y4m_frames(payload, every_n=1))
    assert set(got) == set(range(7))
    assert got[3] == frames[3]  # luma-exact


def test_y4m_sampling_skips_frames():
    from flashml_spark.functions import codecs

    payload = codecs.encode_y4m([_gradient_frame(8, 8, s) for s in range(10)])
    idxs = [i for i, _ in codecs.iter_y4m_frames(payload, every_n=3)]
    assert idxs == [0, 3, 6, 9]


def test_y4m_rejects_non420_and_garbage():
    from flashml_spark.functions import codecs

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        codecs.decode_y4m_header(b"RIFF....")
    hdr = b"YUV4MPEG2 W8 H8 F30:1 C444\n"
    with pytest.raises(ValueError, match="unsupported Y4M chroma"):
        codecs.decode_y4m_header(hdr)


def test_video_stats_real_y4m_end_to_end(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import video_stats

    p1 = codecs.encode_y4m([_gradient_frame(16, 8, s) for s in range(30)], fps=(30, 1))
    p2 = codecs.encode_y4m([_gradient_frame(8, 8, s) for s in range(12)], fps=(24, 1))
    df = spark.createDataFrame(
        [(1, p1, "video/x-y4m"), (2, p2, "video/x-y4m")],
        "media_id long, payload binary, mime string",
    )
    out = {r["media_id"]: r for r in video_stats(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (16, 8, 30)
    assert out[1]["fps"] == "30:1" and out[1]["duration_s"] == "1.000000"
    assert (out[2]["n_frames"], out[2]["duration_s"]) == (12, "0.500000")


def test_video_stats_real_rejects_compressed(spark):
    from flashml_spark.operators.multimodal import video_stats

    df = spark.createDataFrame(
        [(1, b"\x00\x00\x00\x20ftypisom....", "video/mp4")],
        "media_id long, payload binary, mime string",
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        video_stats(df, fake=False).collect()


def test_scene_cuts_detects_black_to_white(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import scene_cuts

    black = [[0] * 16 for _ in range(16)]
    white = [[255] * 16 for _ in range(16)]
    # 10 black frames then 10 white: sampling every 5 sees 0,5,10,15 —
    # the 10 is the cut
    payload = codecs.encode_y4m([black] * 10 + [white] * 10)
    df = spark.createDataFrame(
        [(7, payload, "video/x-y4m")],
        "media_id long, payload binary, mime string",
    )
    rows = sorted(
        scene_cuts(df, every_n=5, threshold=16).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 5, 10, 15]
    # flat black and flat white frames hash IDENTICALLY (aHash is
    # brightness-invariant: every cell >= its own mean) — the cut must
    # come from the mean-luma delta channel, not the hash
    assert [r["is_cut"] for r in rows] == [0, 0, 1, 0]
    assert rows[2]["hamming_prev"] == 0 and rows[2]["dmean_prev"] == 255
    assert rows[1]["hamming_prev"] == 0 and rows[1]["dmean_prev"] == 0
    # structure change with similar brightness: caught by the hash channel
    structured = [_gradient_frame(16, 16, 0)] * 5
    p2 = codecs.encode_y4m([black] * 5 + structured)
    rows2 = sorted(
        scene_cuts(
            spark.createDataFrame(
                [(8, p2, "video/x-y4m")],
                "media_id long, payload binary, mime string",
            ),
            every_n=5,
            threshold=10,
        ).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert rows2[1]["hamming_prev"] >= 10 and rows2[1]["is_cut"] == 1


def test_gif_roundtrip_including_lzw_overflow_and_kwkwk():
    import random

    from flashml_spark.functions import codecs

    rng = random.Random(9)
    pal = [((i * 37) % 256, (i * 59) % 256, (i * 83) % 256) for i in range(16)]
    # random frames exercise dictionary growth; >4096 phrases forces the
    # CLEAR/reset path; run-heavy frames hit the KwKwK self-reference
    for frames in (
        [[[rng.randrange(16) for _ in range(33)] for _ in range(21)]],
        [[[rng.randrange(16) for _ in range(120)] for _ in range(120)]],
        [[[(x // 7) % 4 for x in range(64)] for _ in range(8)]],
        [
            [[rng.randrange(16) for _ in range(10)] for _ in range(6)]
            for _ in range(3)  # animated: 3 frames
        ],
    ):
        payload = codecs.encode_gif(frames, pal)
        w, h, dpal, got = codecs.decode_gif(payload)
        assert (w, h) == (len(frames[0][0]), len(frames[0]))
        assert got == frames  # pixel-index exact through real LZW
        assert dpal[: len(pal)] == pal
    delays = codecs.gif_frame_delays(codecs.encode_gif(frames, pal, delay_cs=7))
    assert delays == [7, 7, 7]


def test_gif_decode_rejects_garbage_and_unsupported():
    from flashml_spark.functions import codecs

    with pytest.raises(ValueError, match="not a GIF"):
        codecs.decode_gif(b"BM whatever")
    pal = [(0, 0, 0), (255, 255, 255)]
    good = bytearray(codecs.encode_gif([[[0, 1], [1, 0]]], pal))
    at = good.index(0x2C)
    good[at + 9] |= 0x40  # interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        codecs.decode_gif(bytes(good))


def test_real_decode_gif_end_to_end(spark):
    """fake=False decode over GIF payloads through mapInPandas — the
    two-tone phash assertions of the BMP/PNG twins, via real LZW."""
    from flashml_spark.functions import codecs

    pal = [(0, 0, 0), (255, 255, 255), (10, 200, 60)]
    half = [[0] * 16 for _ in range(8)] + [[1] * 16 for _ in range(8)]
    solid = [[2] * 5 for _ in range(7)]
    rows = [
        (1, codecs.encode_gif([half], pal), "image/gif"),
        (2, codecs.encode_gif([solid], pal), "image/gif"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 16)
    assert out[1]["phash"] == f"{0xFFFFFFFF00000000:016x}"
    assert (out[2]["width"], out[2]["height"]) == (5, 7)
    assert out[2]["phash"] == "f" * 16


def test_video_stats_real_animated_gif(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import video_stats

    pal = [(i, i, i) for i in range(4)]
    frames = [[[(x + t) % 4 for x in range(6)] for _ in range(4)]
              for t in range(5)]
    df = spark.createDataFrame(
        [(1, codecs.encode_gif(frames, pal, delay_cs=20), "image/gif")],
        "media_id long, payload binary, mime string",
    )
    r = video_stats(df, fake=False).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (6, 4, 5)
    assert r["fps"] == "100:20"
    assert r["duration_s"] == "1.000000"


def test_bmp_png_gif_phash_agree_on_same_pixels():
    # all three dependency-free image paths produce the SAME perceptual
    # hash for the same pixel grid (GIF via an exact palette)
    from flashml_spark.functions import codecs

    pal = [((i * 29) % 256, (i * 47) % 256, (i * 71) % 256) for i in range(8)]
    idx = [[(x * y + x) % 8 for x in range(9)] for y in range(9)]
    rgb = codecs.gif_frame_rgb(pal, idx)
    h_bmp = codecs.average_hash(
        codecs.bmp_grayscale(codecs.decode_bmp(codecs.encode_bmp(rgb))[2])
    )
    h_png = codecs.average_hash(
        codecs.png_grayscale(
            codecs.decode_png(codecs.encode_png(rgb, filter_type=2))[2]
        )
    )
    w, h, dpal, dframes = codecs.decode_gif(codecs.encode_gif([idx], pal))
    h_gif = codecs.average_hash(
        codecs.png_grayscale(codecs.gif_frame_rgb(dpal, dframes[0]))
    )
    assert h_bmp == h_png == h_gif


# --------------------------------------------------------------------------
# JPEG (r10: real baseline SOF0 codec — the last §2 multimodal gap)


def test_jpeg_flat_two_tone_roundtrip_exact():
    """BLOCK-ALIGNED flat halves are DC-only.  Grayscale at 4:4:4 is
    provably pixel-EXACT at q75 (luma DC quant step is 16*50/100 = 8,
    exactly the DCT DC gain of a flat block, so quantization is the
    identity on integers; chroma is flat 128 → zero coefficient);
    color adds at most ±1 per channel from the chroma DC step."""
    gray = [[(20, 20, 20)] * 16 for _ in range(8)] + [
        [(200, 200, 200)] * 16 for _ in range(8)
    ]
    payload = codecs.encode_jpeg(gray, quality=75, subsample="444")
    w, h, dec = codecs.decode_jpeg(payload)
    assert (w, h) == (16, 16)
    assert dec == gray  # pixel-exact
    color = [[(20, 30, 40)] * 16 for _ in range(8)] + [
        [(200, 210, 220)] * 16 for _ in range(8)
    ]
    for ss in ("444", "422", "420"):
        payload = codecs.encode_jpeg(color, quality=75, subsample=ss)
        w, h, dec = codecs.decode_jpeg(payload)
        assert (w, h) == (16, 16)
        maxerr = max(
            abs(a - b)
            for r1, r2 in zip(color, dec)
            for p1, p2 in zip(r1, r2)
            for a, b in zip(p1, p2)
        )
        assert maxerr <= 1, (ss, maxerr)


def test_jpeg_gradient_roundtrip_error_bound():
    """Smooth content roundtrips with small bounded error — the actual
    fidelity contract of a DCT codec (noise is its adversarial case)."""
    w, h = 32, 24
    rows = [
        [(min(x * 8, 255), min(y * 10, 255), min((x + y) * 5, 255)) for x in range(w)]
        for y in range(h)
    ]
    for ss, bound in (("444", 10), ("422", 14), ("420", 18)):
        payload = codecs.encode_jpeg(rows, quality=75, subsample=ss)
        dw, dh, dec = codecs.decode_jpeg(payload)
        assert (dw, dh) == (w, h)
        maxerr = max(
            abs(a - b)
            for r1, r2 in zip(rows, dec)
            for p1, p2 in zip(r1, r2)
            for a, b in zip(p1, p2)
        )
        assert maxerr <= bound, (ss, maxerr)


def test_jpeg_restart_interval_decode_identical():
    """DRI/RSTn streams decode bit-identically to the unrestarted
    encoding of the same pixels (predictor resets + byte alignment)."""
    import random

    rng = random.Random(7)
    rows = [[(rng.randrange(256),) * 3 for _ in range(40)] for _ in range(40)]
    p0 = codecs.encode_jpeg(rows, quality=85, subsample="420")
    p1 = codecs.encode_jpeg(rows, quality=85, subsample="420", restart_interval=2)
    assert b"\xff\xdd" in p1 and b"\xff\xdd" not in p0
    assert any(bytes((0xFF, 0xD0 + k)) in p1 for k in range(8))
    assert codecs.decode_jpeg(p0) == codecs.decode_jpeg(p1)


def test_jpeg_odd_dims_and_1x1():
    """Non-MCU-multiple dims are edge-padded at encode and cropped at
    decode; the SOF0 header dims always win."""
    for (w, h) in [(13, 9), (17, 11), (1, 1), (3, 17)]:
        rows = [[((x * 31) % 256, (y * 17) % 256, 128) for x in range(w)] for y in range(h)]
        for ss in ("444", "420"):
            payload = codecs.encode_jpeg(rows, quality=90, subsample=ss)
            dw, dh, dec = codecs.decode_jpeg(payload)
            assert (dw, dh) == (w, h)
            assert len(dec) == h and len(dec[0]) == w
            assert codecs.jpeg_dims(payload) == (w, h)


def test_jpeg_rejects_unsupported_and_corrupt():
    flat = [[(128, 128, 128)] * 8 for _ in range(8)]
    payload = bytearray(codecs.encode_jpeg(flat))
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="subsampling"):
        codecs.encode_jpeg(flat, subsample="411")
    with pytest.raises(ValueError, match="quality"):
        codecs.encode_jpeg(flat, quality=0)
    with pytest.raises(ValueError, match="ragged|empty"):
        codecs.encode_jpeg([[(1, 2, 3)], [(1, 2, 3), (4, 5, 6)]])
    # SOF2 became SUPPORTED in r10; a baseline full-band scan inside a
    # frame relabeled progressive now trips the DC/AC band-mix check
    prog = bytearray(payload)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        codecs.decode_jpeg(bytes(prog))
    # lossless-sequential (SOF3) stays rejected
    lossless = bytearray(payload)
    lossless[i + 1] = 0xC3
    with pytest.raises(ValueError, match="non-baseline"):
        codecs.decode_jpeg(bytes(lossless))
    # truncated entropy data
    with pytest.raises(ValueError, match="truncated|marker"):
        codecs.decode_jpeg(bytes(payload[: len(payload) // 2]))


def test_jpeg_grayscale_single_component_decode():
    """A handcrafted 1-component (grayscale) SOF0 stream decodes through
    the single-plane path to (v, v, v) rows."""
    import struct as _struct

    qt = codecs._jpeg_scaled_qt(codecs._JPEG_QT_LUMA, 75)
    enc_dc = codecs._huff_encode_table(*codecs._JPEG_DC_LUMA)
    enc_ac = codecs._huff_encode_table(*codecs._JPEG_AC_LUMA)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _struct.pack(">HB", 67, 0)
    out += bytes(qt[pos] for pos in codecs._JPEG_ZIGZAG)
    out += b"\xff\xc0" + _struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes((1, 0x11, 0))
    for tc_th, (bits, vals) in ((0x00, codecs._JPEG_DC_LUMA), (0x10, codecs._JPEG_AC_LUMA)):
        out += b"\xff\xc4" + _struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + _struct.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))
    writer = codecs._BitWriter()
    block = [[176.0 - 128.0] * 8 for _ in range(8)]  # flat luma 176
    codecs._encode_block(block, qt, enc_dc, enc_ac, 0, writer)
    out += writer.flush() + b"\xff\xd9"
    w, h, dec = codecs.decode_jpeg(bytes(out))
    assert (w, h) == (8, 8)
    assert dec[0][0] == dec[7][7]
    v = dec[0][0][0]
    assert abs(v - 176) <= 1 and dec[0][0] == (v, v, v)


def test_real_decode_jpeg_end_to_end(spark):
    """decode_media(fake=False) real-decodes JPEG payloads in the Arrow
    pipeline: true SOF0 dimensions and the two-tone perceptual hash."""
    from flashml_spark.operators.multimodal import decode_media

    def jpeg_bytes(w, h, top, bot, ss):
        rows = [[top] * w for _ in range(h // 2)] + [[bot] * w for _ in range(h // 2)]
        return codecs.encode_jpeg(rows, quality=90, subsample=ss)

    rows = [
        (1, jpeg_bytes(16, 8, (10, 10, 10), (230, 230, 230), "444"), "image/jpeg"),
        (2, jpeg_bytes(12, 6, (240, 240, 240), (20, 20, 20), "420"), "image/jpeg"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 8)
    assert (out[2]["width"], out[2]["height"]) == (12, 6)
    assert out[1]["phash"] == "ffffffff00000000"  # bright bottom half
    assert out[2]["phash"] == "00000000ffffffff"  # bright top half


def test_real_resize_jpeg_end_to_end(spark):
    """resize_media(fake=False) produces real grayscale thumbnails from
    JPEG payloads with the exact length contract."""
    from flashml_spark.operators.multimodal import resize_media

    rows_px = [[(0, 0, 0)] * 16 for _ in range(4)] + [
        [(255, 255, 255)] * 16 for _ in range(4)
    ]
    payload = codecs.encode_jpeg(rows_px, quality=90)
    df = spark.createDataFrame(
        [(1, payload, "image/jpeg")], "media_id long, payload binary, mime string"
    )
    (row,) = resize_media(df, width=8, height=8, fake=False).collect()
    thumb = bytes(row["thumb"])
    assert len(thumb) == 64
    assert max(thumb[:32]) < 64 and min(thumb[32:]) > 192


def test_jpeg_audit_hash_derivation_matches_operator():
    """The x271 oracle arithmetic (dims + hash from id) matches the
    operator's encode→decode output for a dense id sweep — the same
    derivation the DuckDB oracle pins corpus-wide."""
    for i in range(0, 240):
        w = 8 + i % 9
        h = 4 + 2 * (i % 3)
        dark = ((i * 23) % 64, (i * 29) % 64, (i * 31) % 64)
        bright = (192 + (i * 37) % 64, 192 + (i * 41) % 64, 192 + (i * 43) % 64)
        top, bot = (dark, bright) if (i % 4) < 2 else (bright, dark)
        rows = [[top] * w for _ in range(h // 2)] + [[bot] * w for _ in range(h // 2)]
        payload = codecs.encode_jpeg(
            rows, quality=90, subsample="420" if i % 2 == 0 else "444"
        )
        dw, dh, px = codecs.decode_jpeg(payload)
        got = (dw, dh, codecs.average_hash(codecs.png_grayscale(px)))
        exp = (w, h, "00000000ffffffff" if i % 4 >= 2 else "ffffffff00000000")
        assert got == exp, i


def test_gif_encode_rejects_oversize_palette():
    """r9 ADVICE: >256-entry palettes must raise, not emit a corrupt
    logical-screen-descriptor size field."""
    frame = [[0, 1], [1, 0]]
    with pytest.raises(ValueError, match="palette"):
        codecs.encode_gif([frame], [(i % 256, 0, 0) for i in range(300)])
    with pytest.raises(ValueError, match="palette"):
        codecs.encode_gif([frame], [])


def test_gif_truncated_payload_raises_valueerror():
    """r9 ADVICE: truncated GIF streams raise ValueError (like every
    other malformed input), not IndexError/struct.error."""
    pal = [(0, 0, 0), (255, 255, 255)]
    frame = [[0, 1, 0, 1], [1, 0, 1, 0]]
    payload = codecs.encode_gif([frame, frame], pal, delay_cs=5)
    for cut in (len(payload) - 2, len(payload) // 2, 20, 14):
        with pytest.raises(ValueError):
            codecs.decode_gif(payload[:cut])
    with pytest.raises(ValueError):
        codecs.gif_frame_delays(payload[: len(payload) // 2])


def test_goertzel_recovers_planted_bins_and_rejects_leakage():
    import math

    from flashml_spark.functions import codecs

    N = 160
    for k, amp in [(1, 8000), (5, 9000), (12, 12000), (19, 10000)]:
        vals = [round(amp * math.sin(2 * math.pi * k * n / N)) for n in range(N)]
        wav = codecs.encode_wav(vals, 8000)
        sr, n, bin_, rms = codecs.wav_dominant_tone(wav)
        assert (sr, n, bin_) == (8000, N, k)
        # int16 quantization keeps RMS within 1 of amp/sqrt(2)
        assert abs(rms - amp / math.sqrt(2)) < 1.0
        # the planted bin carries essentially all power: every other
        # bin reads at least 1000x weaker
        p_best = codecs.goertzel_power(vals, k)
        for other in range(1, 20):
            if other != k:
                assert codecs.goertzel_power(vals, other) < p_best / 1000
    # silence: rms 0, some bin wins arbitrarily but power is 0
    silent = codecs.encode_wav([0] * N, 8000)
    sr, n, _bin, rms = codecs.wav_dominant_tone(silent)
    assert rms == 0.0


def test_audio_tone_audit_matches_id_arithmetic(spark):
    from flashml_spark.operators import multimodal

    df = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    out = {r["media_id"]: r for r in multimodal.audio_tone_audit(df).collect()}
    classes = [5, 6, 7, 7, 8]
    for i in range(25):
        r = out[i]
        assert r["sample_rate"] == 8000 and r["n_frames"] == 160
        assert r["dominant_bin"] == 3 + i % 10
        assert r["amp_class"] == classes[i % 5]


def test_png_palette_and_adam7_roundtrips_pixel_exact():
    import itertools

    from flashml_spark.functions import codecs

    pal = [(i, 255 - i, (i * 3) % 256) for i in range(0, 256, 16)]
    for ft, inter, use_trns in itertools.product(
        range(5), [False, True], [False, True]
    ):
        for w, h in [(1, 1), (7, 5), (12, 9), (16, 3)]:
            idx = [[(x + y + ft) % len(pal) for x in range(w)] for y in range(h)]
            trns = [255 - 10 * i for i in range(len(pal))] if use_trns else None
            p = codecs.encode_png_palette(
                idx, pal, trns=trns, filter_type=ft, interlace=inter
            )
            width, height, got = codecs.decode_png(p)
            want = [
                [(*pal[i], trns[i]) if use_trns else pal[i] for i in row]
                for row in idx
            ]
            assert (width, height, got) == (w, h, want), (ft, inter, use_trns)
    # truecolor Adam7 with odd dims, all filters, both alphas
    for ft, alpha in itertools.product(range(5), [False, True]):
        bpp = 4 if alpha else 3
        w, h = 13, 7
        rows = [
            [tuple((x * 31 + y * 17 + c * 7 + ft) % 256 for c in range(bpp))
             for x in range(w)]
            for y in range(h)
        ]
        p = codecs.encode_png(rows, alpha=alpha, filter_type=ft, interlace=True)
        assert codecs.decode_png(p) == (w, h, rows)


def test_png_palette_validation_and_missing_plte():
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from flashml_spark.functions import codecs

    with _pytest.raises(ValueError, match="palette index 3 out of range"):
        codecs.encode_png_palette([[0, 3]], [(0, 0, 0), (1, 1, 1)])
    with _pytest.raises(ValueError, match="1..256"):
        codecs.encode_png_palette([[0]], [(0, 0, 0)] * 257)
    with _pytest.raises(ValueError, match="tRNS longer"):
        codecs.encode_png_palette([[0]], [(0, 0, 0)], trns=[1, 2])
    # a paletted payload whose PLTE chunk is stripped must fail loudly
    good = codecs.encode_png_palette([[0, 1], [1, 0]], [(9, 9, 9), (7, 7, 7)])
    at = good.index(b"PLTE") - 4
    (clen,) = _struct.unpack_from(">I", good, at)
    stripped = good[:at] + good[at + 12 + clen:]
    with _pytest.raises(ValueError, match="missing PLTE"):
        codecs.decode_png(stripped)


def test_jpeg_progressive_equals_baseline_pixel_exact():
    from flashml_spark.functions import codecs

    for w, h in [(8, 8), (16, 10), (13, 7), (5, 3)]:
        rows = [
            [((x * 31 + y * 7) % 256, (x * 13 + y * 29) % 256,
              (x * 3 + y * 53) % 256) for x in range(w)]
            for y in range(h)
        ]
        base = codecs.decode_jpeg(
            codecs.encode_jpeg(rows, quality=90, subsample="444")
        )
        prog = codecs.decode_jpeg(codecs.encode_jpeg_progressive(rows, 90))
        assert base == prog, (w, h)
    # multi-band split exercises EOBRUN runs and per-scan DHTs; a flat
    # image makes every AC scan pure EOBRUN
    rows = [
        [(200, 30, 60) if (x + y) % 9 == 0 else (10, 10, 10)
         for x in range(32)]
        for y in range(24)
    ]
    assert codecs.decode_jpeg(
        codecs.encode_jpeg_progressive(
            rows, 85, bands=((1, 1), (2, 9), (10, 35), (36, 63))
        )
    ) == codecs.decode_jpeg(codecs.encode_jpeg(rows, 85, subsample="444"))
    flat = [[(77, 77, 77)] * 16] * 16
    assert codecs.decode_jpeg(
        codecs.encode_jpeg_progressive(flat, 75)
    ) == codecs.decode_jpeg(codecs.encode_jpeg(flat, 75, subsample="444"))


def test_jpeg_progressive_validation():
    import pytest as _pytest

    from flashml_spark.functions import codecs

    rows = [[(9, 9, 9)] * 8] * 8
    with _pytest.raises(ValueError, match="bands"):
        codecs.encode_jpeg_progressive(rows, bands=((2, 63),))
    with _pytest.raises(ValueError, match="bands"):
        codecs.encode_jpeg_progressive(rows, bands=((1, 30),))
    with _pytest.raises(ValueError, match="successive"):
        codecs.encode_jpeg_progressive(rows, successive=14)
    with _pytest.raises(ValueError, match="successive"):
        codecs.encode_jpeg_progressive(rows, successive=-1)


def test_jpeg_successive_approximation_equals_baseline():
    from flashml_spark.functions import codecs

    # refinement scans transmit the exact remaining magnitude bits, so
    # after the last pass the decode equals the baseline decode
    # pixel-for-pixel at every SA depth and band split
    rows = [
        [((x * 31 + y * 7) % 256, (x * 13 + y * 29) % 256,
          (x * 3 + y * 53) % 256) for x in range(16)]
        for y in range(10)
    ]
    base = codecs.decode_jpeg(
        codecs.encode_jpeg(rows, quality=90, subsample="444")
    )
    for sa in (1, 2, 3):
        assert codecs.decode_jpeg(
            codecs.encode_jpeg_progressive(rows, 90, successive=sa)
        ) == base
    assert codecs.decode_jpeg(
        codecs.encode_jpeg_progressive(
            rows, 90, bands=((1, 1), (2, 9), (10, 35), (36, 63)),
            successive=2,
        )
    ) == base


def test_png_16bit_and_grayscale_roundtrips():
    import itertools

    from flashml_spark.functions import codecs

    # 16-bit RGB(A): the decoder surfaces the HIGH byte of each sample
    for ft, inter, alpha in itertools.product(
        range(5), [False, True], [False, True]
    ):
        ns = 4 if alpha else 3
        rows16 = [
            [tuple(((x * 4111 + y * 257 * c + ft * 999) % 65536)
                   for c in range(ns)) for x in range(7)]
            for y in range(5)
        ]
        p = codecs.encode_png(
            rows16, alpha=alpha, filter_type=ft, interlace=inter, depth=16
        )
        w, h, got = codecs.decode_png(p)
        assert (w, h) == (7, 5)
        assert got == [[tuple(v >> 8 for v in px) for px in row]
                       for row in rows16]
    # grayscale (color 0) widens to RGB; gray+alpha (color 4) to RGBA
    g = [[(x * 37 + y * 11) % 256 for x in range(9)] for y in range(6)]
    a = [[(x + y * 3) % 256 for x in range(9)] for y in range(6)]
    for ft, inter in itertools.product(range(5), [False, True]):
        _, _, got = codecs.decode_png(
            codecs.encode_png_gray(g, filter_type=ft, interlace=inter)
        )
        assert got == [[(v, v, v) for v in row] for row in g]
        _, _, got = codecs.decode_png(
            codecs.encode_png_gray(g, a, filter_type=ft, interlace=inter)
        )
        assert got == [
            [(v, v, v, av) for v, av in zip(gr, ar)]
            for gr, ar in zip(g, a)
        ]
    # sub-byte depth still rejects
    with pytest.raises(ValueError, match="depth"):
        codecs.encode_png([[(1, 2, 3)]], depth=4)


def test_png_trns_color_key_gray_and_rgb():
    """tRNS outside palettes (spec §11.3.2): gray/RGB pixels matching
    the transparent-color key decode with alpha 0, everything else
    alpha 255 — the PIL convert("RGBA") semantics (r10 ADVICE item)."""
    import itertools

    from flashml_spark.functions import codecs

    # 8-bit gray: key 7 -> alpha 0 exactly where the sample is 7
    g = [[(x + y) % 11 for x in range(9)] for y in range(6)]
    for ft, inter in itertools.product(range(5), [False, True]):
        _, _, got = codecs.decode_png(
            codecs.encode_png_gray(g, filter_type=ft, interlace=inter,
                                   trns_key=7)
        )
        assert got == [
            [(v, v, v, 0 if v == 7 else 255) for v in row] for row in g
        ]
    # 8-bit RGB: only the EXACT triple matches
    rows = [[(10, 20, 30), (10, 20, 31), (0, 0, 0)],
            [(10, 20, 30), (255, 255, 255), (10, 20, 30)]]
    for ft, inter in itertools.product(range(5), [False, True]):
        _, _, got = codecs.decode_png(
            codecs.encode_png(rows, filter_type=ft, interlace=inter,
                              trns_key=(10, 20, 30))
        )
        assert got == [
            [(*px, 0 if px == (10, 20, 30) else 255) for px in row]
            for row in rows
        ]
    # 16-bit: the key matches at FULL depth — two samples sharing a
    # high byte must not alias (0x0107 != 0x0108), even though the
    # 8-bit surface shows both as 0x01
    rows16 = [[(0x0107, 0x0200, 0x0300), (0x0108, 0x0200, 0x0300)]]
    _, _, got = codecs.decode_png(
        codecs.encode_png(rows16, depth=16, trns_key=(0x0107, 0x0200, 0x0300))
    )
    assert got == [[(1, 2, 3, 0), (1, 2, 3, 255)]]
    g16 = codecs.decode_png(
        codecs.encode_png_gray([[5, 9]], trns_key=9)
    )[2]
    assert g16 == [[(5, 5, 5, 255), (9, 9, 9, 0)]]


def test_png_trns_prohibited_and_invalid():
    import struct as _struct

    import pytest as _pytest

    from flashml_spark.functions import codecs

    # encoders refuse the spec-illegal combination outright
    with _pytest.raises(ValueError, match="prohibited"):
        codecs.encode_png([[(1, 2, 3, 4)]], alpha=True, trns_key=(1, 2, 3))
    with _pytest.raises(ValueError, match="prohibited"):
        codecs.encode_png_gray([[1]], alpha_rows=[[2]], trns_key=1)
    # a hand-built alpha PNG carrying tRNS is rejected by the decoder
    base = codecs.encode_png([[(1, 2, 3, 4)]], alpha=True)
    ihdr_end = base.index(b"IDAT") - 4
    bad = (base[:ihdr_end]
           + codecs._png_chunk(b"tRNS", _struct.pack(">3H", 1, 2, 3))
           + base[ihdr_end:])
    with _pytest.raises(ValueError, match="prohibited"):
        codecs.decode_png(bad)
    # wrong-length key for the color type
    base = codecs.encode_png([[(1, 2, 3)]])
    ihdr_end = base.index(b"IDAT") - 4
    bad = (base[:ihdr_end]
           + codecs._png_chunk(b"tRNS", _struct.pack(">H", 1))
           + base[ihdr_end:])
    with _pytest.raises(ValueError, match="tRNS length"):
        codecs.decode_png(bad)


def test_png_subbyte_gray_and_palette_roundtrips():
    """1/2/4-bit PNG (r10 VERDICT item 3): gray samples scale to the
    8-bit surface by 255/(2^d-1); paletted indices look up PLTE; both
    across every filter type and Adam7, including widths that leave
    partial trailing bytes in the packed scanline."""
    import itertools

    from flashml_spark.functions import codecs

    for depth, ft, inter in itertools.product((1, 2, 4), range(5),
                                              [False, True]):
        hi = (1 << depth) - 1
        # width 11 is never a multiple of 8/depth -> ragged last byte
        g = [[(x * 3 + y * 5 + ft) % (hi + 1) for x in range(11)]
             for y in range(7)]
        w, h, got = codecs.decode_png(
            codecs.encode_png_gray(g, filter_type=ft, interlace=inter,
                                   depth=depth)
        )
        assert (w, h) == (11, 7)
        scale = 255 // hi
        assert got == [[(v * scale,) * 3 for v in row] for row in g]
        # paletted at the same depth (palette exactly fills 2^depth)
        pal = [((i * 40 + 3) % 256, (i * 17) % 256, (i * 9 + 1) % 256)
               for i in range(hi + 1)]
        _, _, gotp = codecs.decode_png(
            codecs.encode_png_palette(g, pal, filter_type=ft,
                                      interlace=inter, depth=depth)
        )
        assert gotp == [[pal[v] for v in row] for row in g]
    # sub-byte paletted with per-entry tRNS alpha
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 2]]
    _, _, got = codecs.decode_png(
        codecs.encode_png_palette(idx, pal, trns=[0, 128], depth=2)
    )
    assert got == [
        [(*pal[v], 0 if v == 0 else (128 if v == 1 else 255)) for v in row]
        for row in idx
    ]
    # sub-byte gray tRNS: the key matches the RAW sample value
    g = [[0, 1, 2, 3]]
    _, _, got = codecs.decode_png(
        codecs.encode_png_gray(g, depth=2, trns_key=2)
    )
    assert got == [[(0, 0, 0, 255), (85, 85, 85, 255), (170, 170, 170, 0),
                    (255, 255, 255, 255)]]
    # 1x1 at every sub-byte depth
    for depth in (1, 2, 4):
        assert codecs.decode_png(
            codecs.encode_png_gray([[1]], depth=depth)
        )[2] == [[(255 // ((1 << depth) - 1),) * 3]]


def test_png_subbyte_validation():
    import pytest as _pytest

    from flashml_spark.functions import codecs

    with _pytest.raises(ValueError, match="out of range"):
        codecs.encode_png_gray([[4]], depth=2)
    with _pytest.raises(ValueError, match="gray-only"):
        codecs.encode_png_gray([[1]], alpha_rows=[[1]], depth=4)
    with _pytest.raises(ValueError, match="does not fit"):
        codecs.encode_png_palette([[0]], [(0, 0, 0)] * 5, depth=2)
    with _pytest.raises(ValueError, match="depth must be"):
        codecs.encode_png_gray([[0]], depth=3)
    # sub-byte truecolor stays spec-forbidden at the decoder gate
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
    bad = (codecs._PNG_SIG + codecs._png_chunk(b"IHDR", ihdr)
           + codecs._png_chunk(b"IDAT", _zlib.compress(b"\x00\x00\x00"))
           + codecs._png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="unsupported PNG"):
        codecs.decode_png(bad)


def test_jpeg_dims_reads_progressive_sof2():
    from flashml_spark.functions import codecs

    rows = [[((x * 16) % 256, (y * 7) % 256, 128) for x in range(17)]
            for y in range(9)]
    prog = codecs.encode_jpeg_progressive(rows)
    assert codecs.jpeg_dims(prog) == (17, 9)
    base = codecs.encode_jpeg(rows)
    assert codecs.jpeg_dims(base) == (17, 9)


def test_png_hypothesis_roundtrips():
    """Randomized cross-product of the PNG feature space: any pixel
    content x filter x interlace x depth x alpha must roundtrip
    exactly (16-bit surfaces compared on the high byte)."""
    import random

    from flashml_spark.functions import codecs

    rng = random.Random(77)
    for _ in range(25):
        w, h = rng.randint(1, 19), rng.randint(1, 13)
        ft = rng.randrange(5)
        inter = rng.random() < 0.5
        mode = rng.choice(["rgb", "rgba", "rgb16", "gray", "graya", "pal"])
        if mode in ("rgb", "rgba"):
            ns = 3 if mode == "rgb" else 4
            rows = [[tuple(rng.randrange(256) for _ in range(ns))
                     for _ in range(w)] for _ in range(h)]
            p = codecs.encode_png(rows, alpha=(ns == 4), filter_type=ft,
                                  interlace=inter)
            assert codecs.decode_png(p) == (w, h, rows)
        elif mode == "rgb16":
            rows = [[tuple(rng.randrange(65536) for _ in range(3))
                     for _ in range(w)] for _ in range(h)]
            p = codecs.encode_png(rows, filter_type=ft, interlace=inter,
                                  depth=16)
            assert codecs.decode_png(p) == (
                w, h,
                [[tuple(v >> 8 for v in px) for px in r] for r in rows],
            )
        elif mode in ("gray", "graya"):
            g = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
            a = ([[rng.randrange(256) for _ in range(w)] for _ in range(h)]
                 if mode == "graya" else None)
            p = codecs.encode_png_gray(g, a, filter_type=ft, interlace=inter)
            _, _, got = codecs.decode_png(p)
            if a is None:
                assert got == [[(v, v, v) for v in r] for r in g]
            else:
                assert got == [
                    [(v, v, v, av) for v, av in zip(gr, ar)]
                    for gr, ar in zip(g, a)
                ]
        else:
            npal = rng.randint(1, 17)
            pal = [tuple(rng.randrange(256) for _ in range(3))
                   for _ in range(npal)]
            idx = [[rng.randrange(npal) for _ in range(w)] for _ in range(h)]
            p = codecs.encode_png_palette(idx, pal, filter_type=ft,
                                          interlace=inter)
            assert codecs.decode_png(p) == (
                w, h, [[pal[i] for i in r] for r in idx]
            )


def test_tiff_lzw_stream_roundtrips_across_width_changes():
    """The TIFF-variant LZW (MSB-first, early change) must roundtrip
    streams whose tables cross the 9->10->11 bit boundaries, hit
    KwKwK, and (at ~8 KB of high-entropy input) trip the NextCode=4094
    ClearCode reset."""
    import random as _random

    from flashml_spark.functions import codecs

    rng = _random.Random(42)
    cases = [
        b"",
        b"\x00",
        b"aaaaaaaaaaaaaaaa",              # KwKwK ladder
        bytes(rng.randrange(256) for _ in range(300)),
        bytes(rng.randrange(4) for _ in range(5000)),   # deep table, low alphabet
        bytes(rng.randrange(256) for _ in range(9000)), # crosses the clear reset
    ]
    for data in cases:
        enc = codecs._tiff_lzw_encode(data)
        assert codecs._tiff_lzw_decode(enc, len(data)) == data
    # overrun guard
    data = b"abcabcabc"
    enc = codecs._tiff_lzw_encode(data)
    with pytest.raises(ValueError, match="more bytes"):
        codecs._tiff_lzw_decode(enc, len(data) - 1)


def test_tiff_roundtrip_grid():
    """RGB/gray/paletted x uncompressed/LZW x endian x strip split x
    predictor — decode(encode(x)) == x everywhere."""
    import itertools

    from flashml_spark.functions import codecs

    rgb = [[((x * 31 + y * 7) % 256, (x * 5) % 256, (y * 11) % 256)
            for x in range(9)] for y in range(7)]
    gray = [[(x * 13 + y * 3) % 256 for x in range(9)] for y in range(7)]
    pal = [((i * 37) % 256, (i * 3 + 7) % 256, (i * 91) % 256)
           for i in range(16)]
    idx = [[(x + y) % 16 for x in range(9)] for y in range(7)]
    for comp, be, rps, pred in itertools.product(
        (1, 5), (False, True), (None, 1, 3, 4), (1, 2)
    ):
        kw = dict(compression=comp, big_endian=be, rows_per_strip=rps,
                  predictor=pred)
        w, h, got = codecs.decode_tiff(codecs.encode_tiff(rgb, **kw))
        assert (w, h, got) == (9, 7, rgb)
        _, _, gotg = codecs.decode_tiff(
            codecs.encode_tiff(gray, gray=True, **kw))
        assert gotg == [[(v, v, v) for v in row] for row in gray]
        _, _, gotp = codecs.decode_tiff(
            codecs.encode_tiff(idx, palette=pal, **kw))
        assert gotp == [[pal[v] for v in row] for row in idx]


def test_tiff_whitesiszero_and_validation():
    import struct as _struct

    from flashml_spark.functions import codecs

    gray = [[0, 100, 255]]
    p = codecs.encode_tiff(gray, gray=True)
    # flip PhotometricInterpretation 1 -> 0 (WhiteIsZero): patch the
    # IFD entry value in place
    lt = "<"
    old = _struct.pack(f"{lt}HHI", 262, 3, 1) + _struct.pack(f"{lt}H", 1) + b"\x00\x00"
    new = _struct.pack(f"{lt}HHI", 262, 3, 1) + _struct.pack(f"{lt}H", 0) + b"\x00\x00"
    assert p.count(old) == 1
    _, _, got = codecs.decode_tiff(p.replace(old, new))
    assert got == [[(255, 255, 255), (155, 155, 155), (0, 0, 0)]]

    with pytest.raises(ValueError, match="not a TIFF"):
        codecs.decode_tiff(b"XX\x00\x00whatever")
    # unsupported compression rejects loudly (patch 1 -> 32773 PackBits)
    oldc = _struct.pack(f"{lt}HHI", 259, 3, 1) + _struct.pack(f"{lt}H", 1) + b"\x00\x00"
    newc = _struct.pack(f"{lt}HHI", 259, 3, 1) + _struct.pack(f"{lt}H", 32773) + b"\x00\x00"
    assert p.count(oldc) == 1
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        codecs.decode_tiff(p.replace(oldc, newc))
    # truncated strip
    with pytest.raises(ValueError, match="out of bounds|shorter"):
        codecs.decode_tiff(p[:-2])
