"""Extension queries x271+ — round-10 additions.

Closes the last partial §2 component (real baseline JPEG, x271) and
empties the rows-only set (planted-fixture oracles for the k-means and
absorbing-Markov solvers, x272/x273), then widens the dedup family with
the one modality a frontier text pipeline still lacked here: exact
substring dedup (suffix-array / Lee et al. 2022 style, x274).  Oracle
discipline unchanged: exact integer/decimal accumulation before any
float, one written operation order in both engines, Python-computed
shared literals pinned as SQL text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# x271 — REAL baseline-JPEG encode→decode roundtrip audit over the whole
# corpus (multimodal.jpeg_roundtrip_audit): per doc_id a two-tone image
# with a GUARANTEED luma gap (dark half < 64, bright half ≥ 192 — JPEG
# is lossy, so unlike x255/x270 the construction must make the hash
# decision immune to quantization/ringing error, which is bounded well
# under half the gap at quality 90) is pushed through the full SOF0
# pipeline: RGB→YCbCr, 4:2:0 box subsampling on even ids / 4:4:4 on odd,
# FDCT, Annex-K quantize + Huffman, then Huffman decode, dequant, IDCT,
# upsample, YCbCr→RGB.  Dims come from the decoded SOF0 header and the
# aHash from the luma ORDER of the two halves — both exactly derivable
# from the id arithmetic, so a hash match certifies the whole lossy
# chain on every row (the planted-fixture pattern, corpus as fixture).
_JPEG_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(4 + 2 * (doc_id % 3) AS INT) AS height,
       CASE WHEN doc_id % 4 >= 2 THEN '00000000ffffffff'
            ELSE 'ffffffff00000000' END AS phash
FROM documents ORDER BY media_id"""


@register("x271_jpeg_roundtrip_audit", _JPEG_SQL)
def x271(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.jpeg_roundtrip_audit(docs, "doc_id")
