"""Property-based cross-engine parity: the portable hash family and
text primitives must agree between Spark and DuckDB on ADVERSARIAL
inputs (unicode, punctuation, long runs, empties), not just the driver
corpus. Hypothesis generates the corpus once per run; both engines
evaluate the same expressions; results must match exactly."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.functions.hashing import (
    h32,
    sql_h32,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.functions.textstats import (
    fingerprint,
    sql_fingerprint,
    sql_tokens,
    tokens,
)

# Latin corpus: the parity contract covers UTF-8 text where JVM and
# utf8proc case-folding agree. Exhaustively probed over U+0020–U+02FF:
# the ONLY divergent codepoint is U+0130 'İ' (JVM lowers to i + COMBINING
# DOT ABOVE, DuckDB to plain 'i'), so it is excluded here and called out
# as an engine-boundary difference rather than a bug.
TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        max_codepoint=0x2FF,
        blacklist_characters="İ",
    ),
    max_size=200,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_hash_and_fingerprint_parity(spark_prop, texts):
    spark, con = spark_prop
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: (r.h, r.fp, r.nt)
        for r in df.select(
            "i",
            h32(F.col("t")).alias("h"),
            fingerprint(F.col("t")).alias("fp"),
            F.size(tokens(F.col("t"))).alias("nt"),
        ).collect()
    }
    con.execute("DROP TABLE IF EXISTS props")
    con.execute("CREATE TABLE props(i INT, t VARCHAR)")
    con.executemany("INSERT INTO props VALUES (?, ?)", list(enumerate(texts)))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT i, {sql_h32('t')}, {sql_fingerprint('t')}, len({sql_tokens('t')}) FROM props"
        ).fetchall()
    }
    assert got == want


@pytest.fixture(scope="module")
def spark_prop(spark):
    con = duckdb.connect()
    yield spark, con
    con.close()
