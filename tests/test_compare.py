"""The bit-level comparator must catch what plain value equality cannot:
the driver's value hash works on raw bytes, so ``-0.0`` vs ``+0.0``
hash-differs even though ``-0.0 == 0.0`` (the r03 rp01 driver failure)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.compare import (
    bit_mismatch,
    bit_row_multiset,
)
from conftest import assert_frames_match


def test_planted_negative_zero_is_caught():
    a = pd.DataFrame({"k": [1, 2], "z": [0.5, 0.0]})
    e = pd.DataFrame({"k": [1, 2], "z": [0.5, -0.0]})
    # value equality alone is blind to it...
    pd.testing.assert_frame_equal(a, e, check_exact=True)
    # ...the bit gate is not
    assert bit_mismatch(a, e) is not None
    with pytest.raises(AssertionError, match="bit-level"):
        assert_frames_match(a, e, "planted")


def test_identical_frames_pass_out_of_order():
    a = pd.DataFrame({"k": [2, 1], "z": [0.0, -0.0]})
    e = pd.DataFrame({"k": [1, 2], "z": [-0.0, 0.0]})
    assert bit_mismatch(a, e) is None


def test_cross_row_zero_sign_swap_is_caught():
    # same per-column multiset of bit patterns, paired to different keys —
    # a whole-row hash distinguishes these, so must we
    a = pd.DataFrame({"k": [1, 2], "z": [-0.0, 0.0]})
    e = pd.DataFrame({"k": [1, 2], "z": [0.0, -0.0]})
    assert bit_mismatch(a, e) is not None


def test_nan_payloads_do_not_false_alarm():
    # engines may emit different NaN payload bits; canonicalized before hash
    weird_nan = np.uint64(0x7FF8000000000BAD).view(np.float64)
    a = pd.DataFrame({"z": [1.0, float("nan")]})
    e = pd.DataFrame({"z": [1.0, float(weird_nan)]})
    assert bit_mismatch(a, e) is None


def test_list_cells_compare_across_engine_types():
    a = pd.DataFrame({"tags": [np.array(["x", "y"]), np.array([], dtype=object)]})
    e = pd.DataFrame({"tags": [["x", "y"], []]})
    assert bit_mismatch(a, e) is None


def test_empty_frames():
    a = pd.DataFrame({"z": pd.Series([], dtype="float64")})
    assert bit_row_multiset(a) == []
    assert bit_mismatch(a, a.copy()) is None
