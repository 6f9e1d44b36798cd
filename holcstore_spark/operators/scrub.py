"""PII scrubbing for training-data pipelines.

Detects and redacts emails, IPv4 addresses and phone numbers with regex
patterns chosen to behave identically under Java regex (Spark) and RE2
(DuckDB oracle): no lookaround, no backreferences, explicit character
classes only.

Scale design: a narrow map over the text column — zero shuffle, one
``regexp_count`` + ``regexp_replace`` pair per pattern inside whole-stage
codegen. Beyond-reference (LLM-pipeline layer); the reference engine has
no text surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_stats", "redact_pii"]

#: pattern name -> (regex, replacement token). Order matters: emails are
#: redacted first (their local part may contain digits), then IPv4 (dots
#: separate octets, so the phone pattern — which has no dot — cannot eat
#: them), then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Add one ``n_<kind>`` count column per PII pattern (pre-redaction
    hit counts on the raw text)."""
    c = F.col(text)
    for name, pat, _ in PII_PATTERNS:
        df = df.withColumn(f"n_{name}", F.regexp_count(c, F.lit(pat)))
    return df


def redact_pii(
    df: DataFrame, text: str = "text", out: str = "redacted"
) -> DataFrame:
    """Replace every PII match with its placeholder token, applying the
    patterns in the documented order."""
    c: Column = F.col(text)
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return df.withColumn(out, c)
