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

#: Entries with ZERO green driver rows entering round 6 — the operators
#: added this round. They must be inside the 50-slot window.
NEEDS_FIRST_ROW: set[str] = {
    "nn08_recall_gate",
    "ds09_weighted_sample",
}

#: Single-green entries (first row earned in r05) — the schedule keeps
#: any entry with <2 green rows in-window until it has two. Also pinned
#: here: st01_windowed_frequency, whose four nominal greens were all
#: vacuous 0-row matches (VERDICT r05) — it must stay in-window until
#: the retuned thresholds earn a green row with spark_rows > 0.
SINGLE_GREEN = {
    "nn06_residual_ivfpq", "dd09_boilerplate_spans", "txt07_vocab_oov",
    "cp02_tokenizer_prep_pipeline", "ds08_curriculum_order",
    "dd10_semantic_dedup", "nn07_opq_pq",
    "st01_windowed_frequency",
}

#: The 27 multi-greens parked in round 5 rotate back in for a fourth row.
BACK_IN_WINDOW = {
    "a01_grouped_price_stats", "a02_component_stats",
    "a03_secondary_segment_stats", "a05_review_stats_per_user",
    "a08_price_histogram", "a09_risk_buckets", "a10_heatmap_share",
    "a12_top_terms_other", "a13_minmax_metrics",
    "w02_topk_by_last_value", "w03_global_share", "k03_hidden_price_max",
    "u12_token_set_ops", "dd07_cluster_survivors",
    "ds01_stratified_sample", "ds02_sequence_packing",
    "ct01_benchmark_contamination", "rep01_repetition_scores",
    "pii01_redact_props", "nn03_ivf_ann", "ud1_spam_truncate",
    "dd01_exact_dedup", "dd02_minhash_lsh_pairs", "dd03_simhash",
    "dd04_ngram_jaccard_pairs", "nn01_cosine_topk", "txt01_language_id",
}
# (dd08 and ud2 park in st01's place: both triple-green, and ud2 is the
# single most expensive SQL entry in the window — see the schedule
# comment in plans/queries.py)


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
    What matters: at least three accumulated green rows, and the MOST
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
        assert greens >= 3, (
            f"parked entry {name} has only {greens} green driver rows — "
            f"parking requires at least three"
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
