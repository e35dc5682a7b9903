"""Deterministic, engine-portable hashing column expressions.

The dedup/similarity operators need hash families that are reproducible
across engines (Spark ↔ SQL oracle).  We derive everything from md5 —
available and bit-identical everywhere — instead of Spark-private hashes
(murmur3/xxhash64 seeds differ across engines):

  * ``md5_hex(col)``          — 32-char lowercase hex digest
  * ``md5_long(col, n=12)``   — first n hex chars as a non-negative long
                                (48 bits default: fits bigint, no sign issues)
  * minhash_h_i(token) = md5(i || ':' || token); the signature component is
    the LEXICOGRAPHIC MIN over tokens — hex-string order equals numeric
    order of the digest, and string MIN is portable to any SQL engine.

All are pure column expressions: whole-stage codegen, zero shuffles beyond
what the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    return F.md5(col.cast("binary"))


def md5_long(col: Column, n_hex: int = 12) -> Column:
    """First ``n_hex`` hex chars of md5 as a long (``conv`` base-16→10)."""
    return F.conv(F.substring(md5_hex(col), 1, n_hex), 16, 10).cast("bigint")


CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime: Σ-mod stays in BIGINT


def content_checksum_term(id_col: Column, content_col: Column) -> Column:
    """Per-row term of the COMMUTATIVE content checksum shared by the
    batch shard manifest (``operators.textops.shard_checksum_manifest``)
    and its streaming twin: ``md5(id || ':' || content)`` truncated to
    15 hex digits (60 bits), as DECIMAL(38,0) so a shard's Σ cannot
    overflow.  One expression, both engines' manifests comparable."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        id_col.cast("string"),
                        F.lit(":"),
                        content_col.cast("string"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("decimal(38,0)")
    )


def md5_uniform(col: Column) -> Column:
    """Deterministic uniform in (0, 1]: ``(first-8-hex-of-md5 + 1) / 2^32``
    — the engine-portable u behind every reproducible sampler here
    (SQL twin: ``(CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) + 1.0)
    / 4294967296.0``).  Strictly positive so ``ln(u)`` is always
    finite."""
    return (
        md5_long(col.cast("string"), 8).cast("double") + 1.0
    ) / 4294967296.0


def tokens(text: Column) -> Column:
    """Whitespace tokenization after lowercase+trim (array<string>)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def py_tokens(text: object) -> list[str]:
    """Worker/driver-side LITERAL mirror of :func:`tokens` — Spark
    ``trim`` strips ASCII SPACE only and Java ``\\s`` is the ASCII
    class ``[ \\t\\n\\x0b\\f\\r]`` (NOT Python's Unicode ``\\s``), so
    the mirror must too (pinned by
    ``test_py_token_count_matches_spark_tokens``).  Used wherever a
    Python stage must tokenize identically to the engine (streaming
    packer offsets, quality-scorer features)."""
    import re

    return re.split(r"[ \t\n\x0b\f\r]+", str(text).lower().strip(" "))


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Murmur3_x86_32 (unsigned), the hash behind spark.ml
    ``HashingTF``'s term indexing (hash version 2 = the STANDARD
    murmur3 tail, unlike the SQL ``hash()`` expression's per-byte
    tail) — pinned equal to ``HashingTF`` indices by
    ``test_murmur3_matches_ml_hashingtf``."""
    import struct as _struct

    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    n = len(data) & ~3
    for i in range(0, n, 4):
        (k1,) = _struct.unpack_from("<I", data, i)
        k1 = rotl((k1 * c1) & 0xFFFFFFFF, 15) * c2 & 0xFFFFFFFF
        h1 = ((rotl(h1 ^ k1, 13) * 5) + 0xE6546B64) & 0xFFFFFFFF
    k1 = 0
    tail = data[n:]
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if tail:
        k1 ^= tail[0]
        h1 ^= rotl((k1 * c1) & 0xFFFFFFFF, 15) * c2 & 0xFFFFFFFF
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def hashing_tf_index(term: str, n_features: int) -> int:
    """The exact spark.ml ``HashingTF`` bucket of ``term``:
    murmur3_32(utf8, seed 42) as a SIGNED int, then Java
    ``nonNegativeMod``."""
    h = murmur3_32(term.encode("utf-8"))
    if h >= 1 << 31:
        h -= 1 << 32
    return ((h % n_features) + n_features) % n_features


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles, space-joined, 1-based element_at so the same
    expression ports to 1-indexed SQL list engines.

    The input expression is bound ONCE per row (single-element
    ``transform`` wrapper) before the per-gram lambda touches it.
    Without the binding, each ``element_at(toks, ...)`` inside the HOF
    lambda RE-EVALUATES the whole ``toks`` expression tree — for the
    idiomatic inline call ``word_ngrams(tokens(text), 2)`` that is ~2
    regex splits of the full document per output gram (measured 13x
    slower at sf0.1: 5.8 s vs 0.5 s for the corpus bigram explode).
    """
    if n == 1:
        return toks

    def _grams(t: Column) -> Column:
        count = F.size(t) - (n - 1)
        built = F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
        )
        # guard: F.sequence(1, k<1) would generate a DESCENDING sequence
        return F.when(count >= 1, built).otherwise(
            F.expr("CAST(array() AS array<string>)")
        )

    return F.element_at(F.transform(F.array(toks), _grams), 1)


def minhash_digests(shingles: Column, num_hashes: int) -> list[Column]:
    """The md5 digest arrays backing a signature: hash family
    ``h_i(s) = substr(md5('<i//4>:' || s), (i%4)*8+1, 8)`` — four 8-hex
    (32-bit) components per digest, so k hashes cost ⌈k/4⌉ md5 calls per
    shingle instead of k.  Returns one digest-array column per BLOCK;
    materialize these in their own select stage before taking mins."""
    blocks = (num_hashes + 3) // 4

    def digest(prefix: str):
        # factory: keeps the HOF lambda single-param (arity = lambda vars)
        return F.transform(
            shingles, lambda s: F.md5(F.concat(F.lit(prefix), s).cast("binary"))
        )

    return [digest(f"{b}:") for b in range(blocks)]


def minhash_components_from_digests(digest_cols: list[str], num_hashes: int) -> list[Column]:
    """Signature components from materialized digest arrays: component i is
    the LEXICOGRAPHIC MIN over shingles of hex slice i%4 of digest block
    i//4 (hex-string order == numeric digest order; portable SQL)."""
    out = []
    for i in range(num_hashes):
        block, slot = i // 4, i % 4

        def slicer(s: int):
            return lambda d: F.substring(d, s * 8 + 1, 8)

        out.append(F.array_min(F.transform(F.col(digest_cols[block]), slicer(slot))))
    return out


def token_hashes(toks: Column) -> Column:
    """48-bit md5-derived long per token (``array<bigint>``).  Materialize
    this ONCE (own select stage) before fanning out into per-bit SimHash
    votes — otherwise expression duplication recomputes md5 per bit."""
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 12), 16, 10).cast("bigint"),
    )


def simhash_from_hashes(hashes: Column, bits: int = 16) -> Column:
    """SimHash fingerprint from precomputed token hashes: bit j is set iff
    the sum over tokens of ±1 (sign of token-hash bit j) is positive.

    Per-row higher-order aggregation — embarrassingly parallel, no shuffle.
    """
    def bit_vote(j: int):
        # NB: the merge lambda must take EXACTLY (acc, elem) — pyspark maps
        # every positional param (even defaulted) to a lambda variable.
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("bigint")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0), bit_vote(j))
        out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out
