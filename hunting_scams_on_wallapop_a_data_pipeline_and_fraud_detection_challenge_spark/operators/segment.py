"""Market segmentation (SURVEY §2.2 F4/F5).

Reference regex_analyzer.py:793-842: ordered predicate chain
UNCERTAIN (<5) / JUNK (>10,000) / BROKEN / ACCESSORY / PRIME.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.textprep import contains_any

LAPTOP_KEYWORDS = ["portatil", "laptop", "macbook"]
ACCESSORY_KEYWORDS = ["funda", "caja", "dock", "raton"]


def market_segment(title_lower: Column, price: Column, condition: Column) -> Column:
    """Ordered segment routing — the WHEN order is the semantics
    (regex_analyzer.py:814-842). Keyword tests are plain substring
    membership, as in the reference."""
    is_laptop = contains_any(title_lower, LAPTOP_KEYWORDS)
    is_accessory = contains_any(title_lower, ACCESSORY_KEYWORDS)
    return (
        F.when(price < 5, "UNCERTAIN")
        .when(price > 10000, "JUNK")
        .when(condition == "BROKEN", "BROKEN")
        .when(is_accessory & (price < 100), "ACCESSORY")
        .when(is_accessory & ~is_laptop, "ACCESSORY")
        .otherwise("PRIME")
    )
