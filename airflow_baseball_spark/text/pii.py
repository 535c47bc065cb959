"""PII detection/redaction over document text — pure column
expressions (no Python in the hot path).

A large-scale training-data pipeline scrubs personally identifiable
information before anything else touches the text. Here that is a
fixed, ordered set of regex classes applied as chained
``regexp_replace`` (JVM-side, whole-stage codegen) plus per-class
match counts via ``regexp_extract_all`` — all in-row, zero shuffle,
so it scales embarrassingly: 100 TB of documents is a map-only pass
whose cost is the scan itself.

Patterns are intentionally RE2-compatible (no backreferences or
lookaround) so the same strings run verbatim under Spark (Java regex)
and the DuckDB oracle (RE2) — that equivalence is what the
differential test relies on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: URL first so an address inside a URL query-string is eaten
# by the URL rule, not double-counted by the email rule.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}-\d{3,4}-\d{4}",
}

REDACTION_TOKEN = "[PII]"


def pii_count(col: Column, kind: str) -> Column:
    """Number of matches of one PII class (in-row)."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact(col: Column, token: str = REDACTION_TOKEN) -> Column:
    """Replace every PII match with ``token``, classes applied in
    ``PII_PATTERNS`` order. Chained ``regexp_replace`` stays inside
    one codegen stage — the column is rewritten once per class but
    never leaves the JVM."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
