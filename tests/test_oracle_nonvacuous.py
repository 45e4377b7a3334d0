"""Meta-gate: every registered oracle must return >0 rows at the
driver's correctness SF (sf0.01).

VERDICT r05: ``st01_windowed_frequency`` was green for four rounds while
proving nothing — its ``value >= 400`` filter matched no synthetic event,
so the driver compared 0 rows == 0 rows and never exercised the window
semantics. A zero-row oracle match is vacuous by construction; this test
fails the build the moment any registry entry's oracle goes empty at the
SF the driver verifies, before the driver records another hollow green.

Runs in a SUBPROCESS pinned to sf0.01: replayed-fit oracles (nn03,
nn04-nn07, dd10, ...) read SPARK_GRAFT_TESTDATA once and cache the
generated SQL, so evaluating them at sf0.01 inside a pytest session whose
fixtures run at a different SF would poison the cache for the parity
tests (see round-workflow notes). The oracle builders are pure
pyarrow+numpy+DuckDB — no SparkSession needed in the child.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORRECTNESS_SF_DIR = "/root/testdata/sf0.01"

_CHILD = r"""
import json, os, sys

sys.path.insert(0, os.environ["NONVACUOUS_REPO"])
import duckdb

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)

sf_dir = os.environ["SPARK_GRAFT_TESTDATA"]
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )

empty, errors = [], []
for name, spec in REGISTRY.items():
    sql = spec.oracle_text()
    if sql is None:
        continue
    try:
        n = len(con.execute(sql).fetchall())
    except Exception as e:  # noqa: BLE001
        errors.append(f"{name}: {e}")
        continue
    if n == 0:
        empty.append(name)
print(json.dumps({"empty": empty, "errors": errors}))
"""


def test_every_oracle_nonempty_at_correctness_sf():
    env = dict(
        os.environ,
        SPARK_GRAFT_TESTDATA=CORRECTNESS_SF_DIR,
        NONVACUOUS_REPO=REPO,
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["errors"] == [], report["errors"]
    assert report["empty"] == [], (
        f"oracles returning 0 rows at {CORRECTNESS_SF_DIR} — any driver "
        f"green for these is vacuous: {report['empty']}"
    )
