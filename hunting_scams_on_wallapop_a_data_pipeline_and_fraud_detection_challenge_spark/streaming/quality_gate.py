"""Streaming expectation gate (ST13) — dq02's batched rule suite as a
``foreachBatch`` gate on an orders landing stream: every micro-batch is
evaluated against the SAME one-pass rule aggregate the batch suite
runs (``plans.training_queries._dq02_orders_agg`` — one source of
truth, lazily imported like ST9/ST10 share their batch-twin helpers),
rows violating a row-level rule or duplicating a key within the batch
are QUARANTINED, clean rows are admitted, and a per-batch verdict
ledger is appended — the quality-gate batch↔stream twin that completes
the dd12↔ST9 / dd16↔ST10 / cdc02↔ST11 / j09-j10↔ST12 pattern
(parity pinned in tests/test_streaming_quality_gate.py).

Semantics (documented, not hidden):

- The three ROW-level rules (price range, status set, custkey null)
  quarantine exactly the violating rows, and a MALFORMED row (NULL in
  a rule field, where the rule comparison itself is NULL) quarantines
  too — the ledger counts only definite violations (the dq02 oracle's
  CASE semantics), but no row is ever lost to three-valued logic:
  accepted ∪ quarantine == batch always. The UNIQUENESS rule is
  cross-row: within a micro-batch, ALL rows of a duplicated orderkey
  quarantine (keeping "the first" of an unordered batch would be
  nondeterministic); duplicates SPLIT ACROSS batches are admitted —
  batch-local uniqueness is what a bounded-state gate can check
  (cross-batch exact dedup is ST9/ST10's job, a different operator).
- The ledger row (batch_id, rule, n_checked, n_violations, pass) per
  rule per batch equals dq02's orders legs evaluated on that batch's
  rows — the parity pin.

Scale shape (100 TB/day ingest): the verdict is ONE map-side-combinable
aggregate per batch (collected — it is a single row), the quarantine
partition is one shuffle on orderkey for the duplicate flag plus a
codegen filter, and each leg lands as date/batch-partitioned NDJSON
(the S3 sink shape); the gate keeps NO cross-batch state, so restart
safety is entirely the checkpoint's file-source offset log.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

#: landing-file schema: the orders columns the rule suite consumes
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double"
)


def read_orders_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """NDJSON orders landing files as an unbounded file-source stream
    (the scd/joins landing pattern)."""
    return spark.readStream.schema(ORDERS_SCHEMA).json(landing_dir)


def gate_batch(batch_df: DataFrame, batch_id: int, out_dir: str) -> None:
    """Evaluate one micro-batch: append the per-rule verdict ledger and
    split the rows into accepted/ and quarantine/ NDJSON legs."""
    # lazy import: the rule battery lives with its oracle twin in the
    # batch registry; importing it here keeps ONE source of truth for
    # the thresholds without making the registry import streaming
    from ..plans.training_queries import (
        _DQ02_ORDERS_RULES,
        _dq02_orders_agg,
        _dq02_row_violations,
    )

    rows = batch_df.localCheckpoint(eager=True)
    verdict = _dq02_orders_agg(rows).collect()[0]
    ledger = [
        {
            "batch_id": batch_id,
            "rule": name,
            "n_checked": verdict["n"],
            "n_violations": verdict[vcol],
            "pass": verdict[vcol] == 0,
        }
        for name, vcol in _DQ02_ORDERS_RULES
    ]
    os.makedirs(f"{out_dir}/ledger", exist_ok=True)
    with open(f"{out_dir}/ledger/batch-{batch_id:05d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in ledger) + "\n")

    dup = F.count(F.lit(1)).over(Window.partitionBy("o_orderkey")) > 1
    flagged = _dq02_row_violations(rows).withColumn("v_dup", dup)
    # NULL-safe quarantine: a NULL in a rule field (missing price or
    # status on a malformed landing row) makes the comparison flag
    # NULL — three-valued logic would then drop the row from BOTH legs
    # and silently lose it. coalesce(..., True) sends malformed rows
    # to quarantine, keeping accepted ∪ quarantine == batch. The
    # LEDGER still counts only DEFINITE violations (the dq02 oracle's
    # CASE semantics) — a quarantined-as-malformed row need not appear
    # in any rule's violation count.
    bad = (
        F.coalesce(F.col("v_range") | F.col("v_set"), F.lit(True))
        | F.col("v_null")
        | F.col("v_dup")
    )
    cols = rows.columns
    (
        flagged.filter(bad)
        .select(*cols)
        .write.mode("overwrite")
        .json(f"{out_dir}/quarantine/batch={batch_id}")
    )
    (
        flagged.filter(~bad)
        .select(*cols)
        .write.mode("overwrite")
        .json(f"{out_dir}/accepted/batch={batch_id}")
    )


def start_quality_gate(
    spark: SparkSession, landing_dir: str, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Run the gate over everything currently in the landing dir
    (availableNow trigger; the checkpoint's offset log makes restarts
    exactly-once per input file)."""
    return (
        read_orders_stream(spark, landing_dir)
        .writeStream.foreachBatch(
            lambda df, bid: gate_batch(df, bid, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
