"""Driver-visibility rotation invariants (plans/queries.py tail schedule).

The driver records correctness rows for the FIRST 50 registry entries in
iteration order. These tests pin the round-4 rotation contract: every
entry still needing a green driver row (zero or one so far) sits inside
the window, the parked tail is exactly the documented triple-green set,
and the registry's iteration order is what ``__spark_entry__.queries()``
will expose.
"""

from __future__ import annotations

import json
import os

import pytest

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
    _ROTATION_TAIL,
)

#: Entries with ZERO green driver rows entering round 13 — the
#: operators added this round. They must be inside the 50-slot window.
NEEDS_FIRST_ROW: set[str] = {
    "ix03_index_artifact",
    "ts05_holt_forecast",
    "er03_blocking_recall",
    "qf03_operating_point",
    "zo03_bucketed_join",
    "ts06_seasonal_decompose",
    "ts07_cusum_changepoint",
    "pii05_l_diversity",
    "ix04_phrase_index",
    "gr04_kcore",
    "sk05_weighted_sample",
    "ts08_seasonal_anomaly",
}

#: Single-green entries (first non-vacuous rows earned in r12 — the
#: eight r12 arrivals) — the schedule keeps any entry with <2 green
#: rows in-window until it has two.
SINGLE_GREEN = {
    "ix02_bm25_topk",
    "sk03_quantile_sketch",
    "ts03_lttb_downsample",
    "pii04_dp_counts",
    "qf02_calibration_audit",
    "sk04_set_op_sketches",
    "ts04_ewma_anomaly",
    "er02_survivorship",
}

#: Double-green entries (the r11 arrivals, seconds earned in r12) —
#: kept in-window for third rows.
DOUBLE_GREEN = {
    "sk02_hll_mergeable",
    "ix01_inverted_index",
    "w07_sequence_patterns",
    "ts02_ohlc_resample",
    "ds13_mmr_diverse_select",
    "j10_last_touch_attribution",
    "gr03_connected_components",
    "ivm02_retraction_merge",
    "zo02_zorder_file_pruning",
}

#: Triple-green r10 arrivals still in-window (thirds earned in r12),
#: minus the six parked this round at three greens — the most
#: expensive residents in the round-13 idle sims (dd16_url_dedup,
#: lm02_crossentropy_buckets, j08_interval_overlap_join,
#: a19_robust_zscore at round start; u14_table_set_ops and
#: j07_grid_spatial_join mid-round), funding the new entries
#: one-for-one.
TRIPLE_GREEN_R10 = {
    "w06_sliding_window",
    "a18_rollup_cube",
    "u13_unpivot_long",
    "qf01_linear_quality_classifier",
    "cdc02_scd2_intervals",
    # (dq02_expectation_suite parked mid-round-13, next in expense
    # order after the first six parks)
    "pii03_k_anonymity",
    "er01_fuzzy_match",
    "ts01_gap_fill_locf",
    "dq01_segment_drift",
    "ivm01_partial_merge",
    "zo01_zorder_layout",
    "j09_attribution_join",
}

#: Triple-or-more-green entries still in-window (the r09 arrivals at
#: three greens; the r08 arrivals and the five-green r07-era stock) —
#: eligible parking stock for future rounds.
QUAD_GREEN_OLDER = {
    "ds12_epoch_allocation",
    "mm03_alignment_score",
    "tk01_bpe_merge_mining",
    "a15_mixture_rollup",
    "w05_cohort_retention",
    "a16_event_type_pivot",
    "cdc01_snapshot_delta",
    "pd01_padding_efficiency",
}

#: Multi-green entries deliberately in-window this round: with 49
#: non-parked entries the driver's 50th slot falls to the tail head —
#: deliberately reordered to x19_geo_struct (four greens, a 0.2 s scan
#: projection) so the leftover slot is the cheapest possible.
BACK_IN_WINDOW: set[str] = {"x19_geo_struct"}


def test_window_contains_every_entry_needing_rows():
    window = set(list(REGISTRY)[:50])
    assert NEEDS_FIRST_ROW <= window, (
        f"entries with zero green driver rows outside the window: "
        f"{NEEDS_FIRST_ROW - window}"
    )
    assert SINGLE_GREEN <= window, (
        f"single-green entries outside the window: {SINGLE_GREEN - window}"
    )
    assert DOUBLE_GREEN <= window, (
        f"double-green entries outside the window: {DOUBLE_GREEN - window}"
    )
    assert TRIPLE_GREEN_R10 <= window, (
        f"triple-green entries outside the window: "
        f"{TRIPLE_GREEN_R10 - window}"
    )
    assert QUAD_GREEN_OLDER <= window, (
        f"older multi-green stock outside the window: "
        f"{QUAD_GREEN_OLDER - window}"
    )
    assert BACK_IN_WINDOW <= window


def test_tail_is_the_documented_rotation():
    # The tail occupies the END of the registry; the window (everything
    # before it) must fit inside the driver's 50 recorded slots.
    assert list(REGISTRY)[-len(_ROTATION_TAIL):] == _ROTATION_TAIL
    assert len(REGISTRY) - len(_ROTATION_TAIL) <= 50, (
        "window overflows the driver's 50 slots — grow _ROTATION_TAIL"
    )


def test_tail_entries_all_multi_green():
    """Parked entries must already be multi-green across the driver rounds
    where they HAD a window slot — parking them costs no union coverage.
    A parked entry by construction has NO row in the round it is parked,
    so absence from a file is the expected parked state, not a failure.
    What matters: at least two accumulated green rows (the rotation
    comment's standing rule — any entry with <2 green rows stays
    in-window until it has two; VERDICT r10 item 8 sanctions parking
    "the moment they're double-green"), and the MOST
    RECENT row the entry has is green (never park something that was red
    the last time the driver ran it — a historical red from a since-fixed
    bug, e.g. nn03's r01 replayed-fit SF mismatch, doesn't forbid parking
    forever). Read from the actual CORRECTNESS files so the pin can't
    drift."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        f for f in os.listdir(repo)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    if not rounds:
        pytest.skip("no driver correctness files present")
    for name in _ROTATION_TAIL:
        assert REGISTRY[name].oracle_text() is not None, name
        greens, last = 0, None
        for rf in rounds:
            row = json.load(open(os.path.join(repo, rf))).get(name)
            if row is None:  # outside that round's 50-slot window
                continue
            last = bool(
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )
            # 0-row matches are vacuous (VERDICT r05: st01) — they keep an
            # entry un-parkable even though the row itself is "green"
            greens += last and row.get("spark_rows", 0) > 0
        assert greens >= 2, (
            f"parked entry {name} has only {greens} green driver rows — "
            f"parking requires at least two"
        )
        assert last, f"parked entry {name} was RED in its most recent driver row"


def test_entry_contract_exposes_rotated_order():
    import __spark_entry__ as mod

    assert list(mod.queries()) == list(REGISTRY)
    oracles = mod.oracle_sql()
    # every windowed entry is oracle-checked (a01b — the one by-design
    # rows-only entry — was retired from the registry in round 5)
    window = list(REGISTRY)[:50]
    missing = [n for n in window if n not in oracles]
    assert missing == [], missing


def test_bench_summary_line_fits_driver_tail():
    """The driver parses the bench JSON line from its LAST 2000 stdout
    bytes; the compact summary must stay under 1900 bytes WITH MARGIN at
    the CURRENT entry count even with adversarially wide timing values
    (VERDICT r13 item 9 — the r12 line silently outgrew the tail and
    cost the round its round-over-round comparison)."""
    import bench

    labels = [n for n in bench.HEADLINE if n in REGISTRY] + list(bench.VARIANTS)
    # worst case: every entry slow (5 integer digits) and max spread
    timings = {n: 10000.123 for n in labels}
    spreads = {n: 99.999 for n in labels}
    line = bench.summary_line(timings, spreads, "0.1", 3)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["n_queries"] == len(labels)
    assert len(line.encode()) < 1900, len(line.encode())
    # and the realistic shape (sub-10s entries) also fits
    line2 = bench.summary_line(
        {n: 1.234 for n in labels}, {n: 0.123 for n in labels}, "0.1", 3
    )
    assert len(line2.encode()) < 1900, len(line2.encode())
