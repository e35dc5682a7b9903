"""PII detection and redaction — the scrubbing pass every production
training-data pipeline runs before packing (the C4/FineWeb-style
email/IP/phone scrub; cf. Raffel et al. 2020 §2.2's heuristic
cleanup and the Penedo et al. 2024 FineWeb pipeline's PII step).

Engine-portable by construction: the patterns use only RE2-safe
syntax (no lookaround, no backreferences), so the identical regex
runs in Spark's Java engine and a SQL oracle's RE2 — x288 certifies
the match COUNTS and the full REDACTED TEXT (via md5) corpus-wide
against a DuckDB twin.  Everything is a pure column map: counting is
``size(regexp_extract_all(...))``, redaction a fixed-order
``regexp_replace`` chain — whole-stage codegen, zero Python, zero
shuffles; at 100 TB this is scan-speed.

Pattern scope is deliberately conservative (precision over recall —
a redaction pass must not mangle prose): emails, dotted-quad IPv4,
and ``ddd[- .]ddd[- .]dddd`` phone shapes.  Real deployments widen
the family per jurisdiction; each added pattern is one more
(name, regex, token) row here, same plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement token) — REDACTION APPLIES IN THIS
# ORDER, which is semantic: emails redact before IPv4 so a dotted
# mail host is consumed as part of the email, not re-matched.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
)


def pii_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII hit counts: ``id_col, n_email, n_ipv4,
    n_phone, has_pii`` (one row per non-null-text document).  Pure
    map — ``size(regexp_extract_all)`` per pattern."""
    cols = [F.col(id_col)]
    names = []
    for name, pat, _tok in PII_PATTERNS:
        c = f"n_{name}"
        names.append(c)
        cols.append(
            F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))
            .cast("bigint")
            .alias(c)
        )
    out = df.where(F.col(text_col).isNotNull()).select(*cols)
    total = None
    for c in names:
        total = F.col(c) if total is None else total + F.col(c)
    return out.withColumn("has_pii", (total > 0).cast("int"))


def pii_redact(
    df: DataFrame,
    text_col: str,
    out_col: str = "redacted",
) -> DataFrame:
    """Append ``out_col`` with every PII match replaced by its type
    token, applying the patterns in ``PII_PATTERNS`` order (order is
    part of the contract — see the module note).  NULL text stays
    NULL.  Pure map."""
    red = F.col(text_col)
    for _name, pat, tok in PII_PATTERNS:
        red = F.regexp_replace(red, pat, tok)
    return df.withColumn(out_col, red)
