"""Portable (cross-engine) hashing primitives.

The training-data operators (MinHash-LSH dedup, SimHash, fingerprinting,
LSH-ANN) need a hash function that produces IDENTICAL values in Spark
and in the DuckDB oracle, so the driver's value-hash correctness gate
can verify them exactly instead of falling back to rows-only checks.

``h32``: the first 8 hex chars of md5 reinterpreted as a BIGINT in
[0, 2^32). Both engines expose md5 as a lowercase hex string, so
``conv(substring(md5(x),1,8),16,10)`` (Spark) and
``CAST('0x'||substring(md5(x),1,8) AS BIGINT)`` (DuckDB) agree
bit-for-bit. Derived hash families use Carter-Wegman style
``(a*h + b) mod M31`` with small odd ``a`` so all arithmetic stays
inside BIGINT (max ~2^36) with no overflow in either engine.

Scale note: md5-per-value is heavier than xxhash64, but it stays inside
whole-stage codegen (no Python), is branch-free, and the hash cost is
dwarfed by the shuffle it feeds; on a real cluster swap ``h32`` for
``F.xxhash64`` and drop oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — the modulus for all derived hash families.
M31 = 2147483647


def h32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 md5 hex chars as BIGINT [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def hmod(col: Column) -> Column:
    """``h32`` reduced mod M31 — the input to seeded hash families."""
    return h32(col) % M31


def seeded(hcol: Column, j: Column) -> Column:
    """j-th universal hash of an already-``hmod``-ed value.

    ``((2j+1)*h + 7919j + 1) mod M31`` — odd multiplier, distinct per
    seed; 31 * 2^31 < 2^36 so BIGINT-safe in both engines.
    """
    return ((2 * j + 1) * hcol + 7919 * j + 1) % M31


# --- DuckDB oracle fragments (kept adjacent so they can't drift) -----------


def sql_h32(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def sql_hmod(expr: str) -> str:
    return f"({sql_h32(expr)} % {M31})"


def sql_seeded(hexpr: str, jexpr: str) -> str:
    return f"(((2*{jexpr}+1)*{hexpr} + 7919*{jexpr} + 1) % {M31})"
