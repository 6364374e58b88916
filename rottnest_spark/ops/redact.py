"""PII detection / redaction — the scrubbing stage of a training-data
pipeline (emails, phone numbers, IP addresses).

Everything is codegen regex (`regexp_count` / `regexp_replace`), one
narrow projection per pass — at 100 TB this runs at scan speed with zero
shuffles. Patterns deliberately stay in the common Java-regex/RE2 subset
so the same pattern text drives Spark and the DuckDB oracle.

The redaction token embeds the PII type ("[EMAIL]", "[PHONE]", ...) —
the form downstream tokenizers are usually taught to expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ordered: earlier patterns are redacted first — emails before anything
#: digit-based, and IPs before phones (a dotted quad also matches the
#: looser phone pattern and must be typed [IPV4], not [PHONE])
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "phone": r"\+?[0-9][0-9() .-]{6,}[0-9]",
}


def pii_counts(
    df: DataFrame,
    id_col: str,
    col: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """One row per doc: (id, n_<type>... , has_pii)."""
    patterns = patterns or PII_PATTERNS
    counts = [
        F.regexp_count(F.col(col), F.lit(pat)).alias(f"n_{name}")
        for name, pat in patterns.items()
    ]
    out = df.select(F.col(id_col).alias("id"), *counts)
    has = None
    for name in patterns:
        c = F.col(f"n_{name}") > 0
        has = c if has is None else (has | c)
    return out.withColumn("has_pii", has)


def redact(
    df: DataFrame,
    id_col: str,
    col: str,
    patterns: dict[str, str] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """(id, <out_col>): the text with every PII match replaced by its
    typed token, applied in PII_PATTERNS order."""
    patterns = patterns or PII_PATTERNS
    expr = F.col(col)
    for name, pat in patterns.items():
        expr = F.regexp_replace(expr, pat, f"[{name.upper()}]")
    return df.select(F.col(id_col).alias("id"), expr.alias(out_col))
