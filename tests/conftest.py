from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.session import (  # noqa: E402
    get_spark,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.compare import (  # noqa: E402
    bit_mismatch,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
# lazily-generated oracles (nn03's replayed quantizer fit) must read the
# same SF this session's oracle views serve
os.environ["SPARK_GRAFT_TESTDATA"] = TESTDATA


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


@pytest.fixture(scope="session")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form mirroring the driver's compare: columns sorted by
    name, rows sorted by all columns, dtypes canonicalized."""
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif s.dtype == object:
            out[c] = s.map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    out = out[sorted(out.columns)]
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    return out


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, name: str = ""):
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), f"{name}: row count {len(actual)} vs {len(expected)}"
    a, e = normalize(actual), normalize(expected)
    pd.testing.assert_frame_equal(a, e, check_dtype=False, check_exact=True, obj=name or "df")
    # The driver hashes raw value bytes, so -0.0 vs +0.0 fails there even
    # though it passes IEEE value equality above (the r03 rp01 defect).
    diff = bit_mismatch(a, e)
    assert diff is None, f"{name}: {diff}"
