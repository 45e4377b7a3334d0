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

#: Entries with ZERO green driver rows entering round 4 — rp01 lost its
#: only row to the r03 signed-zero hash artifact (fixed this round),
#: a01c and the eleven round-4 additions are new. They must be inside the
#: 50-slot window.
NEEDS_FIRST_ROW = {
    "rp01_end_to_end_risk", "a01c_approx_median_rank_gate",
    "ds05_source_mixture", "ds06_token_budget_select",
    "txt05_gopher_filters", "pii02_detection_stats",
    "mm02_frame_sample", "cp01_corpus_curation_pipeline",
    "txt06_token_rarity", "ds07_weighted_interleave", "nn04_pq_adc",
    "nn05_ivfpq", "rep02_ngram_repetition",
}

#: Single-green entries (first row earned in r03) — the schedule keeps
#: any entry with <2 green rows in-window until it has two.
SINGLE_GREEN = {
    "ds03_leakage_safe_split", "ds04_training_order",
    "ct02_decontaminated_train", "dd08_simhash_neardup",
    "x19_geo_struct", "ud2_spec_extraction",
}

#: The 13 double-greens parked in round 3 rotate back in for a third row.
BACK_IN_WINDOW = {
    "u12_token_set_ops", "w03_global_share", "a13_minmax_metrics",
    "a03_secondary_segment_stats", "a08_price_histogram",
    "a09_risk_buckets", "a10_heatmap_share", "a12_top_terms_other",
    "w02_topk_by_last_value", "a02_component_stats",
    "a05_review_stats_per_user", "k03_hidden_price_max",
    "a01_grouped_price_stats",
}


def test_window_contains_every_entry_needing_rows():
    window = set(list(REGISTRY)[:50])
    assert NEEDS_FIRST_ROW <= window, (
        f"entries with zero green driver rows outside the window: "
        f"{NEEDS_FIRST_ROW - window}"
    )
    assert SINGLE_GREEN <= window, (
        f"single-green entries outside the window: {SINGLE_GREEN - window}"
    )
    assert BACK_IN_WINDOW <= window


def test_tail_is_the_documented_rotation():
    assert list(REGISTRY)[50:] == _ROTATION_TAIL


def test_tail_entries_all_multi_green():
    """Parked entries must already be multi-green across the driver rounds
    where they HAD a window slot — parking them costs no union coverage.
    A parked entry by construction has NO row in the round it is parked,
    so absence from a file is the expected parked state, not a failure;
    what matters is that every row it does have is fully green and that
    it has accumulated at least three green rows before being parked.
    Read from the actual CORRECTNESS files so the pin can't drift."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        f for f in os.listdir(repo)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    if not rounds:
        pytest.skip("no driver correctness files present")
    for name in _ROTATION_TAIL:
        assert REGISTRY[name].oracle_text() is not None, name
        greens = 0
        for rf in rounds:
            row = json.load(open(os.path.join(repo, rf))).get(name)
            if row is None:  # outside that round's 50-slot window
                continue
            assert row["rows_match"] and row["schema_match"] and row["hash_match"], (
                f"parked entry {name} has a NON-green row in {rf}"
            )
            greens += 1
        assert greens >= 3, (
            f"parked entry {name} has only {greens} green driver rows — "
            f"parking requires at least three"
        )


def test_entry_contract_exposes_rotated_order():
    import __spark_entry__ as mod

    assert list(mod.queries()) == list(REGISTRY)
    oracles = mod.oracle_sql()
    # every windowed entry except the by-design rows-only one is checked
    window = list(REGISTRY)[:50]
    missing = [n for n in window if n not in oracles]
    assert missing == ["a01b_approx_stats_scale_path"], missing
