"""Streaming expectation gate (streaming/quality_gate.py, ST13): each
micro-batch is judged by dq02's shared one-pass orders rule aggregate,
violating rows quarantine while clean rows are admitted (a disjoint
partition of the batch), the per-batch ledger matches dq02's orders
legs evaluated on the same rows (batch↔stream parity), and a restart
re-processes nothing."""

from __future__ import annotations

import glob
import json

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
    _DQ02_ORDERS_RULES,
    _dq02_orders_agg,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.quality_gate import (
    ORDERS_SCHEMA,
    start_quality_gate,
)


def _order(key, cust, status, price):
    return {
        "o_orderkey": key,
        "o_custkey": cust,
        "o_orderstatus": status,
        "o_totalprice": price,
    }


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _read_leg(out_dir, leg):
    rows = []
    for f in sorted(glob.glob(f"{out_dir}/{leg}/batch=*/*.json")):
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    return sorted(rows, key=lambda r: r["o_orderkey"])


def _read_ledger(out_dir):
    # the ledger is a Spark JSON sink like the other two legs
    # (ADVICE r11): one batch=<n> dir per micro-batch
    rows = []
    for f in sorted(glob.glob(f"{out_dir}/ledger/batch=*/*.json")):
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    return rows


_B1 = [
    _order(1, 10, "O", 120.0),        # clean
    _order(2, 11, "F", 400_000.0),    # price over ceiling -> quarantine
    _order(3, 12, "X", 55.0),         # status outside set -> quarantine
    _order(4, None, "P", 70.0),       # null custkey -> quarantine
    _order(5, 13, "O", -3.0),         # non-positive price -> quarantine
    _order(6, 14, "O", 10.0),         # duplicated key: BOTH rows
    _order(6, 15, "F", 20.0),         # quarantine (batch-local dup)
    _order(7, 16, "P", 99.5),         # clean
]


def test_gate_partitions_batch_and_ledger_matches_dq02(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "out"
    _write(landing / "b1.json", _B1)
    q = start_quality_gate(spark, str(landing), str(out), str(tmp_path / "ck"))
    q.awaitTermination(120)

    accepted = _read_leg(out, "accepted")
    quarantined = _read_leg(out, "quarantine")
    assert [r["o_orderkey"] for r in accepted] == [1, 7]
    assert [r["o_orderkey"] for r in quarantined] == [2, 3, 4, 5, 6, 6]
    # disjoint partition of the whole batch
    assert len(accepted) + len(quarantined) == len(_B1)

    # batch↔stream parity: dq02's shared orders aggregate over the SAME
    # rows produces the ledger the gate appended
    batch = spark.read.schema(ORDERS_SCHEMA).json(str(landing))
    verdict = _dq02_orders_agg(batch).collect()[0]
    expected = [
        {
            "batch_id": 0,
            "rule": name,
            "n_checked": verdict["n"],
            "n_violations": verdict[vcol],
            "pass": verdict[vcol] == 0,
        }
        for name, vcol in _DQ02_ORDERS_RULES
    ]
    got = _read_ledger(out)
    assert got == expected, (got, expected)
    # and the suite REALLY catches: every rule has violations here
    assert all(not r["pass"] for r in got)
    by_rule = {r["rule"]: r["n_violations"] for r in got}
    assert by_rule == {
        "orders_totalprice_range": 2,
        "orders_status_in_set": 1,
        "orders_custkey_not_null": 1,
        "orders_orderkey_unique": 1,
    }


def test_gate_restart_is_exactly_once_per_file(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    _write(landing / "b1.json", _B1)
    start_quality_gate(spark, str(landing), str(out), str(ck)).awaitTermination(
        120
    )
    # restart with nothing new: no batch runs, no ledger rows appended
    start_quality_gate(spark, str(landing), str(out), str(ck)).awaitTermination(
        120
    )
    assert len(_read_ledger(out)) == len(_DQ02_ORDERS_RULES)

    # a second file: only ITS rows are processed (a clean batch passes
    # all rules); duplicates split ACROSS batches are admitted —
    # batch-local uniqueness, per the module contract
    _write(landing / "b2.json", [_order(1, 17, "O", 50.0)])
    start_quality_gate(spark, str(landing), str(out), str(ck)).awaitTermination(
        120
    )
    ledger = _read_ledger(out)
    assert len(ledger) == 2 * len(_DQ02_ORDERS_RULES)
    b2 = [r for r in ledger if r["batch_id"] == 1]
    assert all(r["pass"] and r["n_checked"] == 1 for r in b2), b2
    # orderkey 1 appears in accepted twice (once per batch)
    accepted = _read_leg(out, "accepted")
    assert [r["o_orderkey"] for r in accepted] == [1, 1, 7]


def test_gate_malformed_and_empty_batches(spark, tmp_path):
    """NULL-safe partition: rows with NULL rule fields (malformed
    landing rows) quarantine instead of vanishing into three-valued
    logic, and a zero-record file yields an all-pass n_checked=0
    ledger instead of NULL/fail verdicts."""
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    rows = [
        _order(1, 10, "O", 120.0),   # clean
        {"o_orderkey": 2, "o_custkey": 11, "o_totalprice": 10.0},  # no status
        {"o_orderkey": 3, "o_custkey": 12, "o_orderstatus": "O"},  # no price
    ]
    _write(landing / "b1.json", rows)
    start_quality_gate(spark, str(landing), str(out), str(ck)).awaitTermination(
        120
    )
    accepted = _read_leg(out, "accepted")
    quarantined = _read_leg(out, "quarantine")
    assert [r["o_orderkey"] for r in accepted] == [1]
    assert [r["o_orderkey"] for r in quarantined] == [2, 3]
    assert len(accepted) + len(quarantined) == len(rows)
    # the ledger counts only DEFINITE violations: every rule passes
    # (NULL comparisons are not counted — the dq02 oracle's CASE
    # semantics), yet the malformed rows still quarantined above
    assert all(r["pass"] and r["n_checked"] == 3 for r in _read_ledger(out))

    # an empty landing file: if the source plans a batch for it, the
    # verdict must be all-pass with n_checked = 0 (never NULL/fail)
    (landing / "b2.json").write_text("")
    start_quality_gate(spark, str(landing), str(out), str(ck)).awaitTermination(
        120
    )
    for r in _read_ledger(out):
        if r["batch_id"] >= 1:
            assert r["pass"] and r["n_checked"] == 0, r
            assert r["n_violations"] == 0, r


def test_null_orderkey_quarantines_and_ledger_agrees(spark, tmp_path):
    """ADVICE r11: a NULL-orderkey row counts as a uniqueness violation
    in the ledger (n - countDistinct ignores NULL keys), so the leg
    split must quarantine it — the verdict and the partition agree on
    malformed keys."""
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "out"
    rows = [
        _order(1, 10, "O", 120.0),     # clean
        _order(None, 11, "F", 50.0),   # NULL key -> quarantine
    ]
    _write(landing / "b1.json", rows)
    start_quality_gate(
        spark, str(landing), str(out), str(tmp_path / "ck")
    ).awaitTermination(120)
    accepted = _read_leg(out, "accepted")
    # Spark's JSON writer omits NULL fields, so the NULL-key quarantine
    # row has no o_orderkey key at all — read the leg raw
    quarantined = []
    for f in sorted(glob.glob(f"{out}/quarantine/batch=*/*.json")):
        with open(f) as fh:
            quarantined.extend(json.loads(x) for x in fh if x.strip())
    assert [r["o_orderkey"] for r in accepted] == [1]
    assert len(quarantined) == 1
    assert quarantined[0].get("o_orderkey") is None
    assert len(accepted) + len(quarantined) == len(rows)
    by_rule = {r["rule"]: r for r in _read_ledger(out)}
    assert by_rule["orders_orderkey_unique"]["n_violations"] == 1
    assert not by_rule["orders_orderkey_unique"]["pass"]


def test_global_uniqueness_opt_in_quarantines_cross_batch_dup(
    spark, tmp_path
):
    """VERDICT r11 item 8: under ``unique_state_dir``, a duplicate key
    SPLIT ACROSS batches quarantines (the default gate admits it), the
    extra ledger rule reports it, fresh keys still pass, and a replayed
    batch id reproduces its original verdicts (the fence probes the
    predecessor state version)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.quality_gate import (
        GLOBAL_UNIQUE_RULE,
        gate_batch,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    st = tmp_path / "keystate"
    _write(landing / "b1.json", [_order(1, 10, "O", 120.0),
                                 _order(7, 16, "P", 99.5)])
    start_quality_gate(
        spark, str(landing), str(out), str(ck), unique_state_dir=str(st)
    ).awaitTermination(120)
    assert [r["o_orderkey"] for r in _read_leg(out, "accepted")] == [1, 7]
    b1 = {r["rule"]: r for r in _read_ledger(out) if r["batch_id"] == 0}
    assert b1[GLOBAL_UNIQUE_RULE]["pass"]

    # batch 2 re-sends key 1 (clean by every row rule) plus a fresh key
    _write(landing / "b2.json", [_order(1, 17, "O", 50.0),
                                 _order(9, 18, "F", 60.0)])
    start_quality_gate(
        spark, str(landing), str(out), str(ck), unique_state_dir=str(st)
    ).awaitTermination(120)
    accepted = _read_leg(out, "accepted")
    quarantined = _read_leg(out, "quarantine")
    # the cross-batch duplicate quarantined; the fresh key was admitted
    assert [r["o_orderkey"] for r in accepted] == [1, 7, 9]
    assert [r["o_orderkey"] for r in quarantined] == [1]
    b2 = {r["rule"]: r for r in _read_ledger(out) if r["batch_id"] == 1}
    assert b2[GLOBAL_UNIQUE_RULE]["n_violations"] == 1
    assert not b2[GLOBAL_UNIQUE_RULE]["pass"]
    # batch-local uniqueness still passes (no within-batch dup)
    assert b2["orders_orderkey_unique"]["pass"]

    # replay batch 1 directly (foreachBatch at-least-once): its keys
    # are already merged, but the fence probes the PREDECESSOR version,
    # so the original verdicts reproduce — key 1 stays accepted in its
    # own batch, never self-flagged
    batch1 = spark.read.schema(ORDERS_SCHEMA).json(str(landing / "b2.json"))
    gate_batch(batch1, 1, str(out), unique_state_dir=str(st))
    accepted = _read_leg(out, "accepted")
    quarantined = _read_leg(out, "quarantine")
    assert [r["o_orderkey"] for r in accepted] == [1, 7, 9]
    assert [r["o_orderkey"] for r in quarantined] == [1]


def test_global_uniqueness_rejected_key_can_resubmit(spark, tmp_path):
    """Review r12: the bloom folds only ADMITTED keys — a rejected
    row's key stays available, so a corrected resubmission is accepted
    instead of being re-quarantined as a duplicate of its own rejected
    attempt. Also: a batch with only keyless/rejected rows commits a
    sentinel state version, and the NEXT batch must survive reading it."""
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    st = tmp_path / "keystate"

    def _run():
        start_quality_gate(
            spark, str(landing), str(out), str(ck), unique_state_dir=str(st)
        ).awaitTermination(120)

    # batch 0: one NULL-key row only -> everything quarantines, the
    # state commits a keyless sentinel (fence advances, no words)
    _write(landing / "b0.json", [_order(None, 30, "O", 10.0)])
    _run()
    # batch 1: order 99 with an invalid price -> quarantined by v_range
    # (reading the sentinel state must not crash the gate)
    _write(landing / "b1.json", [_order(99, 31, "O", -5.0)])
    _run()
    assert _read_leg(out, "accepted") == []
    # batch 2: the corrected resubmission of order 99 -> ADMITTED
    _write(landing / "b2.json", [_order(99, 31, "O", 50.0)])
    _run()
    accepted = _read_leg(out, "accepted")
    assert [r["o_orderkey"] for r in accepted] == [99]
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.quality_gate import (
        GLOBAL_UNIQUE_RULE,
    )

    b2 = {
        r["rule"]: r for r in _read_ledger(out) if r["batch_id"] == 2
    }
    assert b2[GLOBAL_UNIQUE_RULE]["pass"]
    # batch 3: NOW the key is taken — a re-send quarantines
    _write(landing / "b3.json", [_order(99, 32, "F", 60.0)])
    _run()
    assert [r["o_orderkey"] for r in _read_leg(out, "accepted")] == [99]
    b3 = {
        r["rule"]: r for r in _read_ledger(out) if r["batch_id"] == 3
    }
    assert b3[GLOBAL_UNIQUE_RULE]["n_violations"] == 1
