"""PII scrubbing column library for the training-data pipeline.

Pattern-based redaction of emails, phone numbers, and bare digit runs —
the pre-training privacy pass every published corpus pipeline applies.
All patterns are deliberately RE2-safe (no lookaround, no backrefs) so
the exact same pattern string runs in Spark's Java regex engine and
DuckDB's RE2 oracle with identical match semantics, keeping every
redaction bit-for-bit verifiable cross-engine.

Application order is part of the contract: emails first (their local
part would otherwise be chewed up by the phone/digit passes), then
phones, then leftover digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (tag, pattern) in application order — order matters and is shared
#: verbatim by the Spark path and the DuckDB oracle fragments.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\+?\(?[0-9][0-9 ()./-]{6,}[0-9]"),
    ("NUM", r"[0-9]+"),
]


def redact(col: Column) -> Column:
    """Apply every PII pattern in order; matches become ``[TAG]``."""
    out = col
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def redaction_counts(col: Column) -> dict[str, Column]:
    """Per-tag match counts against the progressively-redacted
    intermediate (so a phone inside an email is counted once, as the
    email) — mirrors the redaction order of :func:`redact`."""
    counts: dict[str, Column] = {}
    cur = col
    for tag, pat in PII_PATTERNS:
        counts[tag] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, f"[{tag}]")
    return counts


def sql_redact(expr: str) -> str:
    out = expr
    for tag, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '[{tag}]', 'g')"
    return out


def sql_redaction_count(expr: str, upto_tag: str) -> str:
    """DuckDB count of ``upto_tag`` matches at its point in the chain."""
    cur = expr
    for tag, pat in PII_PATTERNS:
        if tag == upto_tag:
            return f"len(regexp_extract_all({cur}, '{pat}'))"
        cur = f"regexp_replace({cur}, '{pat}', '[{tag}]', 'g')"
    raise KeyError(upto_tag)
