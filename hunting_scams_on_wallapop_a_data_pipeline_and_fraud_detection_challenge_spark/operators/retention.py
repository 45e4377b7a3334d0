"""Retention / lifecycle management (SURVEY §2.1 S8).

The reference rotates ES indices at 1 GB/1 day and deletes after 30
days (``ingestion/ilm_policy.json:1-20``). On a date-partitioned
Parquet lake that becomes: write with ``partitionBy(ingest_date)``
(rollover for free) and drop expired partition directories — an O(1)
metadata operation per partition, no data rewrite, which is the only
retention strategy that survives 100 TB.
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path


def expired_partitions(
    table_path: str,
    retain_days: int,
    today: dt.date | None = None,
    partition_col: str = "ingest_date",
) -> list[Path]:
    """List partition dirs older than the retention horizon
    (``<table>/<partition_col>=YYYY-MM-DD``)."""
    today = today or dt.date.today()
    cutoff = today - dt.timedelta(days=retain_days)
    out = []
    root = Path(table_path)
    if not root.exists():
        return out
    prefix = f"{partition_col}="
    for child in sorted(root.iterdir()):
        if not (child.is_dir() and child.name.startswith(prefix)):
            continue
        try:
            part_date = dt.date.fromisoformat(child.name[len(prefix):])
        except ValueError:
            continue
        if part_date < cutoff:
            out.append(child)
    return out


def drop_expired(
    table_path: str,
    retain_days: int = 30,
    today: dt.date | None = None,
    partition_col: str = "ingest_date",
) -> list[str]:
    """ILM delete phase: drop expired partitions, return what was
    removed. Partition drop only — never a row-level delete."""
    dropped = []
    for part in expired_partitions(table_path, retain_days, today, partition_col):
        shutil.rmtree(part)
        dropped.append(part.name)
    return dropped
