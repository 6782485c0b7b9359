"""PII detection and redaction over text columns.

Training-corpus hygiene: find and mask emails, phone numbers, and IPv4
addresses before a corpus ships to a trainer. Scope extension beyond
the reference pipeline (SURVEY §2 north-star: the operations a large
training-data pipeline needs that long2ice/synch never had — the
reference stops at replication, `/root/reference/synch/replication/`).

Scale design: every function is a pure Column expression over built-in
regexp functions — JVM-side, whole-stage codegen, zero shuffle, zero
Python. The pass stays a narrow map over the scan, so filter pushdown
and column pruning are unaffected; at 100 TB it is embarrassingly
parallel and bounded by read bandwidth, and composes with any
downstream shuffle without adding one.

Pattern notes: the regexes deliberately use only the common subset of
Java regex (Spark) and RE2 (DuckDB oracle / many scrubbing tools) —
character classes, bounded repetition, non-capturing groups, `\\b` —
so the same pattern string is portable across engines and the oracle
comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (their domains contain dots/digits that the
# looser ipv4/phone patterns must never see), then phones, then ipv4.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
)

_BY_KIND = {k: (rx, tok) for k, rx, tok in PII_PATTERNS}


def pattern(kind: str) -> str:
    """The portable regex for one PII class (email | phone | ipv4)."""
    return _BY_KIND[kind][0]


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII class in the column (bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern(kind))).cast("long")


def redact(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with its class token, in PII_PATTERNS
    order (email before phone/ipv4 — see module docstring). Spark's
    regexp_replace is replace-all by default, matching the oracle's
    'g' flag."""
    c = F.col(col) if isinstance(col, str) else col
    for kind, rx, tok in PII_PATTERNS:
        if kinds is None or kind in kinds:
            c = F.regexp_replace(c, rx, tok.replace("$", r"\$"))
    return c


def has_pii(col: Column | str) -> Column:
    """True when any PII class matches — the drop-gate form."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(False)
    for kind, rx, _ in PII_PATTERNS:
        out = out | (F.regexp_count(c, F.lit(rx)) > 0)
    return out
