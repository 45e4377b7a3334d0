"""Crash-safe versioned on-disk state for foreachBatch operators —
the commit protocol ST9's bloom store established (ADVICE r09),
factored out so every stateful gate (ST9's bloom, ST14's maintained
view) shares ONE contract instead of re-implementing it:

- a state is a directory of ``v=<n>`` version dirs, each a parquet
  table whose ``_SUCCESS`` marker IS the commit;
- readers only ever open the newest COMMITTED version — a crash
  mid-write leaves a marker-less directory that is invisible;
- writers commit to a FRESH ``v=<latest+1>`` path and then prune all
  but the new version and its predecessor, so even a crash mid-prune
  can never leave zero committed versions;
- a pre-versioned flat layout (parquet files directly under the state
  dir) raises instead of silently reading as "no state" — treating
  corruption as first-batch would reset the operator's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def committed_versions(spark: SparkSession, state_dir: str) -> list[int]:
    """COMMITTED state versions under ``state_dir`` (``v=<n>``
    directories containing a parquet ``_SUCCESS`` marker), ascending.

    Listing goes through the Hadoop FileSystem API so any scheme the
    checkpoint supports (local, HDFS, object stores with a committer)
    works. A missing ``state_dir`` is the one legitimate "no state yet"
    case and returns ``[]``; every OTHER failure mode (permissions,
    transient FS faults) propagates — silently treating corruption as
    "first batch" would reset the operator's history (ADVICE r09)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    legacy = False
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v=")):
            # pre-versioned layouts wrote part-*.parquet + _SUCCESS
            # directly under state_dir; treating that as "no state"
            # would be exactly the silent history reset the versioned
            # layout exists to prevent
            if not st.isDirectory() and (
                name == "_SUCCESS" or name.endswith(".parquet")
            ):
                legacy = True
            continue
        try:
            n = int(name[2:])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        if fs.exists(marker):
            out.append(n)
    if legacy and not out:
        raise ValueError(
            f"state at {state_dir!r} uses the pre-versioned flat "
            "layout; migrate it (move the parquet files into "
            f"{state_dir}/v=0/) instead of silently restarting with "
            "empty operator history"
        )
    return sorted(out)


def read_latest_state(
    spark: SparkSession, state_dir: str, empty_schema: str
) -> DataFrame:
    """The newest COMMITTED state table, or an empty ``empty_schema``
    frame when no version has ever committed. Readers never see a
    mid-write state: a version directory only becomes visible here
    once its parquet ``_SUCCESS`` marker exists."""
    versions = committed_versions(spark, state_dir)
    if not versions:
        return spark.createDataFrame([], empty_schema)
    return spark.read.parquet(f"{state_dir}/v={versions[-1]}")


def write_next_state(
    spark: SparkSession, df: DataFrame, state_dir: str
) -> None:
    """Commit ``df`` as the next state version, crash-safely.

    The new table lands at ``state_dir/v=<latest+1>`` — a FRESH path,
    so a crash mid-write leaves the previous committed version intact
    and the partial new directory invisible (no ``_SUCCESS``); the
    switch is atomic from the reader's perspective (ADVICE r09: a plain
    ``mode("overwrite")`` of ``state_dir`` deleted the old state before
    the new write committed). After the commit, versions older than the
    previous one are pruned best-effort — the reader only ever opens
    the newest, and keeping one predecessor means even a crash mid-
    prune can never leave zero committed versions."""
    versions = committed_versions(spark, state_dir)
    new = (versions[-1] + 1) if versions else 0
    # mode("overwrite") only to reclaim an UNCOMMITTED leftover v=<new>
    # from a crashed writer; a committed v=<new> can't exist (versions
    # lists every committed dir and new is past the last one)
    df.coalesce(1).write.mode("overwrite").parquet(f"{state_dir}/v={new}")
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(state_dir).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for n in versions[:-1]:  # keep the new version and its predecessor
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{state_dir}/v={n}"), True)
