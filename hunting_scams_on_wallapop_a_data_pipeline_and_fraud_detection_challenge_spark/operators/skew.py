"""Skew mitigation for hot join keys (100 TB posture).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; this module is the explicit fallback for the pathological case
AQE can't fix — a single hot key that must meet a NON-broadcastable
right side (e.g. every listing of one power-seller joining a large
per-seller history table): salt the big side into ``n`` sub-keys and
replicate the matching right rows per salt, so one reducer's work
spreads over ``n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ right`` on ``key`` with the big side salted.

    ``big`` rows get a uniform salt in [0, n_salts); ``right`` rows are
    replicated once per salt (right must be the smaller side — its
    shuffle volume grows ×n_salts while the hot key's reducer shrinks
    ÷n_salts). Result is row-identical to the unsalted join.
    """
    salted_big = big.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_right = right.withColumn("__salt", salts)
    out = salted_big.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")
