"""Bit-level result comparison shared by the local correctness gates.

The driver's t2 gate compares Spark vs DuckDB results with an
order-insensitive **value hash over raw bytes**, so two frames can be
value-equal (``-0.0 == 0.0`` is true under IEEE comparison) yet still
hash-differ because the float bit patterns differ.  Round 3 lost its only
red driver row to exactly this: DuckDB's ``round()`` emitted ``-0.0`` where
Spark's BigDecimal-based ``F.round`` emitted ``+0.0`` (rp01, one row).

``bit_row_multiset`` reproduces the driver's sensitivity locally: float64
columns are viewed as their raw uint64 bit patterns, every other column is
reduced to a stable repr, and the rows are returned as a sorted multiset.
Value-equality green + bit-multiset green together imply driver-hash green.

NaNs are canonicalized to the single quiet-NaN pattern first: both engines
emit value-level NaN in the same row positions (the equality gate checks
that), and we don't want engine-specific NaN payload bits to false-alarm a
gate that exists to catch signed zero.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_CANON_NAN = np.float64("nan")


def _stable_cell(x):
    """Engine-neutral repr for non-float cells (lists may arrive as
    np.ndarray from one engine and list from the other)."""
    if isinstance(x, np.ndarray):
        return repr(x.tolist())
    if isinstance(x, (list, tuple)):
        return repr(list(x))
    return repr(x)


def bit_row_multiset(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive multiset of rows, float64 columns as raw bit
    patterns.  Input should already be dtype-normalized (the gates pass
    frames through their ``normalize()`` first)."""
    if df.empty:
        return []
    cols = []
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            v = np.ascontiguousarray(s.to_numpy(dtype="float64"))
            v = v.copy()
            v[np.isnan(v)] = _CANON_NAN
            cols.append([format(int(b), "016x") for b in v.view(np.uint64)])
        else:
            cols.append([_stable_cell(x) for x in s])
    return sorted(zip(*cols))


def bit_mismatch(actual: pd.DataFrame, expected: pd.DataFrame) -> str | None:
    """Return a human-readable description of the first bit-level row
    mismatch between two value-equal frames, or None if bit-identical."""
    a, e = bit_row_multiset(actual), bit_row_multiset(expected)
    if a == e:
        return None
    a_only = [r for r in a if r not in e]
    e_only = [r for r in e if r not in a]
    return (
        f"bit-level mismatch (signed zero?): {len(a_only)} rows differ; "
        f"first actual={a_only[0] if a_only else None} "
        f"vs expected={e_only[0] if e_only else None}"
    )
