"""PII scrubbing: golden redactions on realistic strings + cross-engine
pattern parity (the same pattern text must match identically in Spark's
Java regex and DuckDB's RE2)."""

from __future__ import annotations

import pytest

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.functions.pii import (
    PII_PATTERNS,
    redact,
    redaction_counts,
    sql_redact,
)

CASES = [
    # (raw, expected_redacted, n_email, n_phone, n_num)
    ("contact me at jane.doe+spam@mail.example.co", "contact me at [EMAIL]", 1, 0, 0),
    ("call +34 612 345 678 now", "call [PHONE] now", 0, 1, 0),
    ("our ref 12345, apt 9", "our ref [NUM], apt [NUM]", 0, 0, 2),
    (
        "a@b.io or 612-345-678 or box 77",
        "[EMAIL] or [PHONE] or box [NUM]",
        1,
        1,
        1,
    ),
    # the digit pass must NOT fire inside an already-redacted email
    ("id99@x.org", "[EMAIL]", 1, 0, 0),
    # phone chars inside an email local part stay part of the email
    ("(1) 2345678 x9", "[PHONE] x[NUM]", 0, 1, 1),
    ("no pii here", "no pii here", 0, 0, 0),
    ("", "", 0, 0, 0),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, raw) for i, (raw, *_) in enumerate(CASES)], "i int, raw string")
    counts = redaction_counts(F.col("raw"))
    rows = (
        df.select(
            "i",
            redact(F.col("raw")).alias("clean"),
            *[counts[tag].alias(f"n_{tag.lower()}") for tag, _ in PII_PATTERNS],
        )
        .orderBy("i")
        .collect()
    )
    return rows


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_golden_redaction(scrubbed, idx):
    raw, clean, n_email, n_phone, n_num = CASES[idx]
    row = scrubbed[idx]
    assert row.clean == clean, raw
    assert (row.n_email, row.n_phone, row.n_num) == (n_email, n_phone, n_num), raw


def test_duckdb_pattern_parity(scrubbed, ddb):
    """The same pattern strings must redact identically under RE2."""
    for idx, (raw, *_rest) in enumerate(CASES):
        got = ddb.execute(
            f"SELECT {sql_redact('?')}", [raw]
        ).fetchone()[0]
        assert got == scrubbed[idx].clean, raw
