"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs.
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
only sane shape for Python media libs at scale (per-batch amortized
overhead, no per-row pickling, executor-parallel).

The codec step has two paths: ``fake=True`` produces a DETERMINISTIC
md5-derived fake (so the full Spark plumbing — schema, Arrow batches,
partitioning — is real and test-covered everywhere), and ``fake=False``
decodes for real via PIL (dimensions + 8x8 average-hash), raising
``NotImplementedError`` where PIL is not installed — as in this container,
where the real-codec test import-skips.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("phash", StringType()),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so the
    binary-column pipeline is exercisable with the synthetic tables."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decode: dimensions and a
    perceptual-hash-shaped digest derived from md5(payload)."""
    d = hashlib.md5(payload).hexdigest()
    width = 64 + int(d[:4], 16) % 1856  # 64..1919
    height = 64 + int(d[4:8], 16) % 1016  # 64..1079
    return width, height, d[:16]


def _real_decode(payload: bytes) -> tuple[int, int, str]:
    """Real image decode (PIL): dimensions + 8x8 average perceptual hash.
    Raises NotImplementedError where PIL is not installed (this container)
    — the test for this path is import-gated accordingly."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not in this environment"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    gray = img.convert("L").resize((8, 8))
    px = list(gray.getdata())
    avg = sum(px) / 64.0
    bits = 0
    for i, p in enumerate(px):
        if p >= avg:
            bits |= 1 << i
    return width, height, f"{bits:016x}"


def decode_media(df: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode media payloads to metadata via Arrow-batched mapInPandas.

    ``fake=False`` is the production path: PIL decode inside the executor
    task, NotImplementedError where PIL is missing (as in this container).
    """

    def decode_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        codec = _fake_decode if fake else _real_decode
        for pdf in batches:
            decoded = [codec(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "byte_len": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "phash": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling STUB: emits the (media_id, frame_idx) work plan
    a real decoder would execute — ``sequence``-generated, no Python."""
    # byte_len / 1000 as a fake frame count — real impl reads container metadata
    frames = F.sequence(F.lit(0), F.floor(F.length("payload") / 1000), F.lit(every_n))
    return df.select("media_id", F.explode(frames).alias("frame_idx"))
