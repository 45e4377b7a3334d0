"""Condition normalization (SURVEY §2.2 F6, §2.8 X3).

Priority: API condition value > is_refurbished flag > regex text
analysis (reference poller.py:248-281,630-634;
regex_analyzer.py:320-369).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_api_condition(api_val: Column) -> Column:
    """API term → {NEW, LIKE_NEW, USED, BROKEN}; null-safe
    (poller.py:248-281): good/fair → USED, unknown non-null → USED."""
    low = F.lower(api_val)
    return F.when(
        api_val.isNotNull(),
        F.when(low == "new", "NEW")
        .when(low == "as_good_as_new", "LIKE_NEW")
        .when(low == "has_given_it_all", "BROKEN")
        .otherwise("USED"),
    )


def detect_condition(
    api_condition: Column, is_refurbished: Column, text_condition: Column
) -> Column:
    """Fallback precedence API > refurbished-flag > regex
    (regex_analyzer.py:320-369): refurbished forces LIKE_NEW."""
    return F.coalesce(
        map_api_condition(api_condition),
        F.when(F.coalesce(is_refurbished, F.lit(False)), F.lit("LIKE_NEW")),
        text_condition,
    )
