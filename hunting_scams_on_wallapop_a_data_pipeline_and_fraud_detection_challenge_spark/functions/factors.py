"""Risk-factor normalization (SURVEY §2.8 X22 / UD3) — a faithful
column-expression port of the Kibana Painless runtime field
``risk_factor_normalized`` (kibana/dashboard_export.ndjson:1, ~80-line
script): multi-emit per document, positives dropped, 12 canonical
labels, and a keyword branch that extracts the ``[...]`` payload,
splits on commas and re-emits each keyword quoted.

Painless ``emit()`` per factor ≅ per-factor array → ``flatten`` →
``explode``; every branch is a codegen'd when/otherwise — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: contains-pattern → canonical label, in Painless branch order.
CANONICAL = [
    (("Price is <40%",), "Critical Price Drop (<40% val.)"),
    (("Statistically Cheap",), "Statistically Cheap (Z-Score)"),
    (("EXTREME Price Anomaly",), "EXTREME Price Anomaly"),
    (("External Contact",), "External Contact Attempt"),
    (("Very Short Description",), "Low Quality Desc."),
    (("Low Image Count",), "Missing Photos (0-1)"),
    (("Aggressive Title",), "Aggressive Title (CAPS)"),
    (("Risky Payment",), "Risky Payment Method"),
    (("User registered", "New User"), "New User (<48h)"),
    (("User has Scam Reports",), "User Reported as Scam"),
    (("No Reviews", "Dormant Account"), "No Reputation / Dormant"),
]

POSITIVE = ("Trusted Seller", "TOP SELLER")
KEYWORD_MARKERS = ("Suspicious keywords", "Keyword found")


def _contains_any(f: Column, pats: tuple[str, ...]) -> Column:
    cond = f.contains(pats[0])
    for p in pats[1:]:
        cond = cond | f.contains(p)
    return cond


def _keyword_emissions(f: Column) -> Column:
    """The Painless cleanup branch: content = text between the first
    '[' and the LAST ']' (greedy regex), else after the first ':',
    else the whole factor; strip quotes; split on ',', trim, emit each
    non-empty keyword wrapped in double quotes."""
    bracketed = F.regexp_extract(f, r"\[(.*)\]", 1)
    after_colon = F.regexp_replace(f, r"^[^:]*:", "")
    content = (
        F.when(f.rlike(r"\[.*\]"), bracketed)
        .when(f.contains(":"), after_colon)
        .otherwise(f)
    )
    content = F.regexp_replace(content, "['\"]", "")
    kws = F.filter(
        F.transform(F.split(content, ","), lambda k: F.trim(k)),
        lambda k: F.length(k) > 0,
    )
    return F.transform(kws, lambda k: F.concat(F.lit('"'), k, F.lit('"')))


def normalize_risk_factors(factors: Column) -> Column:
    """array<string> risk_factors → array<string> normalized emissions
    (order-preserving; empty array when everything is filtered)."""

    def per_factor(f: Column) -> Column:
        expr = F.when(
            _contains_any(f, POSITIVE), F.array().cast("array<string>")
        )
        for pats, label in CANONICAL:
            expr = expr.when(_contains_any(f, pats), F.array(F.lit(label)))
        expr = expr.when(_contains_any(f, KEYWORD_MARKERS), _keyword_emissions(f))
        return expr.otherwise(F.array(f))

    return F.flatten(
        F.transform(F.coalesce(factors, F.array().cast("array<string>")), per_factor)
    )
