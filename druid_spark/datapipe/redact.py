"""PII redaction for training corpora — pure Column expressions.

A standard pre-training cleaning stage: scrub emails, phone numbers,
IP addresses, SSN-shaped ids, and long digit runs (card-shaped) from
document text before anything downstream sees it. Runs as chained
JVM-side ``regexp_replace`` — no Python in the data path, fully
parallel over document partitions, safe at corpus scale.

Patterns are deliberately conservative (high precision): each is valid
under both Java regex (Spark) and RE2 (DuckDB/common scanners) so the
operator is oracle-checkable and portable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# kind -> (pattern, replacement token). Order matters: emails before
# bare digit runs, SSN/phone before card-shaped (shorter runs first
# would otherwise split longer matches).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("card", r"\b\d{13,19}\b", "[CARD]"),
]


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace each PII match with its bracket token."""
    out = text
    for kind, pat, tok in PII_PATTERNS:
        if kinds is None or kind in kinds:
            out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(text: Column, kinds: tuple[str, ...] | None = None) -> dict[str, Column]:
    """Per-kind match counts (for corpus audit reports)."""
    out = {}
    for kind, pat, _ in PII_PATTERNS:
        if kinds is None or kind in kinds:
            out[kind] = F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
    return out
