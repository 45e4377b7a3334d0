"""Streaming weighted-sample maintenance (streaming/sample.py, ST16):
after every micro-batch the maintained top-K sample equals the direct
sk05-style top-K over everything ingested so far — sample(stream) ==
sample(batch), the mergeability identity sk05's `merge_exact`
certifies, held continuously; restarts resume from the checkpoint and
replayed batches fold nothing twice (zero-I/O fence no-op)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.sample import (
    ITEM_SCHEMA,
    batch_sample,
    merge_sample,
    read_sample,
    start_sample_maintenance,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.streaming.state import (
    committed_versions,
)

K = 5


def _write(path, rows):
    path.write_text(
        "\n".join(json.dumps({"item_id": i, "value": v}) for i, v in rows)
        + "\n"
    )


def _drain(spark, landing, state, ckpt):
    q = start_sample_maintenance(
        spark, str(landing), str(state), str(ckpt), k=K
    )
    q.awaitTermination(120)


def _direct(spark, all_rows):
    df = spark.createDataFrame(list(all_rows), ITEM_SCHEMA)
    return {
        (r.item_id, r.w): r.pk for r in batch_sample(df, K).collect()
    }


def _stored(spark, state):
    return {
        (r.item_id, r.weight_cents): r.priority_femto
        for r in read_sample(spark, str(state)).collect()
    }


def test_sample_stream_equals_batch_continuously(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    b1 = [(i, float(i % 7 + 1)) for i in range(1, 40)]
    b2 = [(i, float(i % 11 + 1)) for i in range(40, 90)]
    b3 = [(901, 5000.0), (902, 0.001), (903, 250.0)]

    seen = []
    for n, batch in enumerate((b1, b2, b3), start=1):
        _write(landing / f"b{n}.json", batch)
        _drain(spark, landing, state, ckpt)
        seen.extend(batch)
        direct = _direct(spark, seen)
        stored = _stored(spark, state)
        assert set(stored) == set(direct), (n, stored, direct)
        # priorities round-trip bit-exactly through the parquet state
        for key, pk in direct.items():
            assert stored[key] == int(pk * 1.0e15 // 1), (key, pk)


def test_restart_and_replay_are_no_ops(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    rows = [(i, float(i)) for i in range(1, 60)]
    _write(landing / "b1.json", rows)
    _drain(spark, landing, state, ckpt)
    before = _stored(spark, state)
    v_before = committed_versions(spark, str(state))

    # restart with the same checkpoint: no new input -> no new version
    _drain(spark, landing, state, ckpt)
    assert _stored(spark, state) == before
    assert committed_versions(spark, str(state)) == v_before

    # a replayed foreachBatch call (same batch id) is a zero-I/O no-op
    df = spark.createDataFrame(rows, ITEM_SCHEMA)
    merge_sample(df, 0, str(state), K)
    assert committed_versions(spark, str(state)) == v_before
    assert _stored(spark, state) == before


def test_malformed_rows_are_dropped_not_folded(spark, tmp_path):
    state = tmp_path / "state"
    df = spark.createDataFrame(
        [(1, 10.0), (None, 99.0), (3, None), (4, 0.0), (5, 2.0)],
        ITEM_SCHEMA,
    )
    merge_sample(df, 0, str(state), K)
    stored = _stored(spark, state)
    assert set(i for i, _w in stored) == {1, 5}, stored


def test_sample_prefers_heavy_weights(spark, tmp_path):
    """Sanity on the semantics, not just the plumbing: with one item
    carrying overwhelming weight it must enter the K-row sample."""
    state = tmp_path / "state"
    rows = [(i, 1.0) for i in range(1, 200)] + [(999, 1.0e7)]
    df = spark.createDataFrame(rows, ITEM_SCHEMA)
    merge_sample(df, 0, str(state), K)
    assert any(i == 999 for i, _w in _stored(spark, state)), "heavy item absent"


def test_reobserved_item_occupies_one_slot(spark, tmp_path):
    """An item re-emitted across batches (review r13) must hold ONE
    rank in the maintained sample — upgraded to its best draw — and
    the K rows must cover K distinct items."""
    landing = tmp_path / "landing"
    landing.mkdir()
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    heavy = [(7, 1.0e6)]
    _write(landing / "b1.json", heavy + [(i, 1.0) for i in range(1, 5)])
    _drain(spark, landing, state, ckpt)
    # re-emit item 7 (same weight) plus a heavier re-observation later
    _write(landing / "b2.json", heavy + [(i, 1.0) for i in range(10, 20)])
    _drain(spark, landing, state, ckpt)
    rows = read_sample(spark, str(state)).collect()
    ids = [r.item_id for r in rows]
    assert len(ids) == len(set(ids)), ids
    assert ids.count(7) == 1, ids
    _write(landing / "b3.json", [(7, 5.0e6)])  # heavier draw upgrades
    _drain(spark, landing, state, ckpt)
    stored = _stored(spark, state)
    assert (7, 500000000) in stored, stored
    assert (7, 100000000) not in stored, stored
