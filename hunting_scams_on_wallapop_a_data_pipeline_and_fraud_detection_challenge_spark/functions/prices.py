"""Price normalization + hidden-price extraction (SURVEY §2.8 X1/X2, K3).

Reference: regex_analyzer.py:151-221 (clean_price, try_extract_hidden_price),
applied in poller.py:598-612.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Structured hidden-price pattern (regex_analyzer.py:69-72): value group
# must exceed 20 to beat symbolic prices; first match wins.
RE_HIDDEN_PRICE = (
    r"(?i)(?:precio|valor|vende|vendo|pido|oferta)[:\s]*(?:por)?\s*"
    r"(\d{2,4})(?:[\.,]\d{2})?\s*(?:€|eur|euros)"
)

# Loose price mentions (regex_analyzer.py:76): candidates in [50, 5000],
# max wins (K3: max-of-candidates).
RE_LOOSE_PRICE = r"(?i)\b(\d{2,4})\s*(?:€|euros)\b"


def clean_price(price_amount: Column, price_raw: Column | None = None) -> Column:
    """X1: number-or-struct price → double, fail→0.0
    (regex_analyzer.py:151-171). With a fixed schema this is a coalesce
    chain; ``price_raw`` covers the bare-number API variant."""
    cands = [price_amount.cast("double")]
    if price_raw is not None:
        cands.append(F.try_cast(price_raw, "double"))
    return F.coalesce(*cands, F.lit(0.0))


def extract_hidden_price(title: Column, description: Column) -> Column:
    """X2: structured pattern first (first value > 20), else max loose
    candidate in [50, 5000], else null (regex_analyzer.py:174-221)."""
    full_text = F.concat_ws(" \n ", title, description)

    structured_vals = F.transform(
        F.regexp_extract_all(full_text, F.lit(RE_HIDDEN_PRICE), 1),
        lambda x: x.cast("double"),
    )
    structured = F.get(F.filter(structured_vals, lambda v: v > 20), 0)

    loose_vals = F.transform(
        F.regexp_extract_all(full_text, F.lit(RE_LOOSE_PRICE), 1),
        lambda x: x.cast("double"),
    )
    loose = F.array_max(F.filter(loose_vals, lambda v: (v >= 50) & (v <= 5000)))

    return F.coalesce(structured, loose)


def corrected_price(price: Column, title: Column, description: Column) -> Column:
    """poller.py:598-608: symbolic price (<5) replaced by the hidden
    price when one is found. Returns struct(price, corrected flag)."""
    hidden = extract_hidden_price(title, description)
    use_hidden = (price < 5.0) & hidden.isNotNull()
    return F.struct(
        F.when(use_hidden, hidden).otherwise(price).alias("price"),
        use_hidden.alias("corrected"),
    )
