"""Local twin of the driver's t2 correctness gate: run every registered
query in Spark AND its DuckDB oracle on the same parquet, compare
row-count + schema + exact values (order-insensitive)."""

from __future__ import annotations

import pytest

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)

from conftest import assert_frames_match

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    spec = REGISTRY[name]
    actual = spec.fn(spark, sf_dir).toPandas()
    expected = ddb.execute(spec.oracle_text()).fetchdf()
    assert_frames_match(actual, expected, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


@pytest.mark.parametrize("epoch", [1, 3])
def test_ds08_curriculum_exact_for_any_epoch(epoch, spark, sf_dir, ddb):
    """ADVICE r05: the registry oracle binds epoch=0 (the driver's
    call), but the operator exposes an epoch kwarg — the oracle builder
    must describe the same plan for any epoch, verified by replaying it
    with the epoch substituted."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _ds08_sql,
        ds08_curriculum_order,
    )

    actual = ds08_curriculum_order(spark, sf_dir, epoch=epoch).toPandas()
    expected = ddb.execute(_ds08_sql(epoch=epoch)).fetchdf()
    assert_frames_match(actual, expected, f"ds08@epoch={epoch}")


@pytest.mark.parametrize("cells,coarse", [(8, 2), (16, 8)])
def test_dd11_hierarchical_exact_for_any_schedule(cells, coarse, spark, sf_dir, ddb):
    """The registry oracle binds the default (cells=16, coarse=4)
    schedule, but dd11's scale knobs move BOTH quantizer levels — the
    oracle builder must replay the two-level fit for any schedule
    (parameterized from day one, the ds08/ds09 ADVICE lesson)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _dd11_sql,
        dd11_hierarchical_semdedup,
    )

    actual = dd11_hierarchical_semdedup(
        spark, sf_dir, cells=cells, coarse=coarse
    ).toPandas()
    expected = ddb.execute(_dd11_sql(cells=cells, coarse=coarse)).fetchdf()
    assert_frames_match(actual, expected, f"dd11@{cells}/{coarse}")


@pytest.mark.parametrize("bench_mod,cells", [(5, 16), (10, 8)])
def test_ct03_semantic_contamination_exact_for_any_split(
    bench_mod, cells, spark, sf_dir, ddb
):
    """The registry oracle binds (cells=16, bench_mod=10); the builder
    must replay the fit and the benchmark split for any knobs
    (parameterized from day one, the ds08/ds09 ADVICE lesson)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _ct03_sql,
        ct03_semantic_contamination,
    )

    actual = ct03_semantic_contamination(
        spark, sf_dir, cells=cells, bench_mod=bench_mod
    ).toPandas()
    expected = ddb.execute(
        _ct03_sql(cells=cells, bench_mod=bench_mod)
    ).fetchdf()
    assert actual["contaminated"].any(), "fixture produced zero hits"
    assert_frames_match(actual, expected, f"ct03@{bench_mod}/{cells}")


@pytest.mark.parametrize("seed,temperature", [(3, 2), (1, 1), (1, 4)])
def test_ds10_temperature_resample_exact_for_any_knobs(
    seed, temperature, spark, sf_dir, ddb
):
    """The registry oracle binds (seed=1, T=2); the builder must replay
    the per-language rates and the coin for any supported temperature
    and seed (parameterized from day one, the ds08/ds09 ADVICE lesson).
    Also pins that the filter is REAL on the fixture corpus — a
    temperature resample that keeps every row is vacuous."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _ds10_sql,
        ds10_temperature_resample,
    )

    actual = ds10_temperature_resample(
        spark, sf_dir, seed=seed, temperature=temperature
    ).toPandas()
    expected = ddb.execute(
        _ds10_sql(seed=seed, temperature=temperature)
    ).fetchdf()
    total = ddb.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(actual) < total, "resample kept everything (or nothing)"
    assert_frames_match(actual, expected, f"ds10@{seed}/T{temperature}")


@pytest.mark.parametrize("seed", [2, 9])
def test_ds09_weighted_sample_exact_for_any_seed(seed, spark, sf_dir, ddb):
    """The sampling coin must redraw an INDEPENDENT but equally
    hash-exact sample for any seed (epoch resampling) — the oracle
    builder is parameterized, replayed here off the registry default."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _ds09_sql,
        ds09_weighted_sample,
    )

    actual = ds09_weighted_sample(spark, sf_dir, seed=seed).toPandas()
    expected = ddb.execute(_ds09_sql(seed=seed)).fetchdf()
    assert_frames_match(actual, expected, f"ds09@seed={seed}")


@pytest.mark.parametrize("budget", [7, 384, 500])
def test_ds02_packing_exact_for_any_budget(budget, spark, sf_dir, ddb):
    """ADVICE r02: pack_id must use integer division so parity holds for
    NON-power-of-two budgets too (floor(double-div) only coincided with
    // for power-of-two budgets). Replay the oracle with the budget
    substituted and compare exactly."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _PACK_BUDGET,
        ds02_sequence_packing,
    )

    actual = ds02_sequence_packing(spark, sf_dir, budget=budget).toPandas()
    sql = REGISTRY["ds02_sequence_packing"].oracle_text().replace(
        f"// {_PACK_BUDGET}", f"// {budget}"
    ).replace(f"% {_PACK_BUDGET}", f"% {budget}")
    assert sql.count(f"// {budget}") == 1 and sql.count(f"% {budget}") == 1
    expected = ddb.execute(sql).fetchdf()
    assert_frames_match(actual, expected, f"ds02@budget={budget}")


@pytest.mark.parametrize("chunk,stride", [(64, 48), (200, 200), (128, 128)])
def test_ch01_chunking_exact_for_any_schedule(chunk, stride, spark, sf_dir, ddb):
    """The registry oracle binds (chunk=128, stride=96); the builder
    must replay the window arithmetic for any schedule, including the
    non-overlapping stride == chunk case (parameterized from day one,
    the ds08/ds09 ADVICE lesson). Also pins the tail contract: every
    document's final chunk reaches the end of its text (no trailing
    text is ever dropped)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _ch01_sql,
        ch01_context_chunks,
    )

    actual = ch01_context_chunks(
        spark, sf_dir, chunk=chunk, stride=stride
    ).toPandas()
    expected = ddb.execute(_ch01_sql(chunk=chunk, stride=stride)).fetchdf()
    assert_frames_match(actual, expected, f"ch01@{chunk}/{stride}")
    # no-trailing-text-dropped: per doc, last chunk_start + chunk_chars
    # == doc length (assert against DuckDB's independent length())
    last = (
        actual.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")
        .tail(1)[["doc_id", "chunk_start", "chunk_chars"]]
    )
    lens = ddb.execute(
        "SELECT doc_id, length(text) AS len FROM documents"
    ).fetchdf()
    merged = last.merge(lens, on="doc_id")
    assert (
        merged["chunk_start"] + merged["chunk_chars"] == merged["len"]
    ).all(), "a document's chunking dropped trailing text"


@pytest.mark.parametrize("lo_pct,hi_pct", [(10, 90), (1, 99), (50, 50)])
def test_ds11_quantile_trim_exact_for_any_band(lo_pct, hi_pct, spark, sf_dir, ddb):
    """The registry oracle binds [p5, p95]; the builder must replay the
    integer rank math for any band, including the degenerate
    median-only band (parameterized from day one). Also pins that the
    thresholds are REAL discrete percentiles: lo <= hi and both are
    actual document lengths present in the corpus."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _ds11_sql,
        ds11_length_quantile_trim,
    )

    actual = ds11_length_quantile_trim(
        spark, sf_dir, lo_pct=lo_pct, hi_pct=hi_pct
    ).toPandas()
    expected = ddb.execute(_ds11_sql(lo_pct=lo_pct, hi_pct=hi_pct)).fetchdf()
    assert_frames_match(actual, expected, f"ds11@{lo_pct}/{hi_pct}")
    lo, hi = int(actual["lo_chars"].iloc[0]), int(actual["hi_chars"].iloc[0])
    assert lo <= hi
    present = set(
        r[0] for r in ddb.execute(
            "SELECT DISTINCT n_chars FROM documents"
        ).fetchall()
    )
    assert lo in present and hi in present, (
        "discrete percentile must be an observed value, not interpolated"
    )
    kept, total = int(actual["kept_docs"].sum()), int(actual["lang_docs"].sum())
    assert 0 < kept < total, "trim must actually drop outliers on the fixture"


@pytest.mark.parametrize("gap_s", [1800, 86400])
def test_w04_sessionize_exact_for_any_gap(gap_s, spark, sf_dir, ddb):
    """The registry oracle binds the 8-hour gap; the builder must
    replay the break/running-sum algebra for any gap (parameterized
    from day one). The two extremes also pin non-degeneracy bounds:
    sessions can never outnumber events, and each user has at least
    one session."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _w04_sql,
        w04_sessionize,
    )

    actual = w04_sessionize(spark, sf_dir, gap_us=gap_s * 1_000_000).toPandas()
    expected = ddb.execute(_w04_sql(gap_us=gap_s * 1_000_000)).fetchdf()
    assert_frames_match(actual, expected, f"w04@gap={gap_s}s")
    n_events, n_users = ddb.execute(
        "SELECT count(*), count(DISTINCT user_id) FROM events"
    ).fetchone()
    assert n_users <= len(actual) <= n_events
    assert int(actual["n_events"].sum()) == n_events, (
        "sessionization must partition the event stream exactly"
    )


@pytest.mark.parametrize("k", [16, 128])
def test_cs01_source_overlap_exact_for_any_k(k, spark, sf_dir, ddb):
    """The registry oracle binds k=64 signature slots; the builder must
    replay the union-minima and agreement count for any k
    (parameterized from day one). Pair count is always
    C(|sources|, 2) — the audit covers every source pair."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _cs01_sql,
        cs01_source_overlap,
    )

    actual = cs01_source_overlap(spark, sf_dir, k=k).toPandas()
    expected = ddb.execute(_cs01_sql(k=k)).fetchdf()
    assert_frames_match(actual, expected, f"cs01@k={k}")
    n_src = ddb.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(actual) == n_src * (n_src - 1) // 2


@pytest.mark.parametrize("win_s", [1800, 86400])
def test_j06_range_count_exact_for_any_window(win_s, spark, sf_dir, ddb):
    """The registry oracle binds the 6-hour look-back; the builder must
    replay the bin/filter algebra for any window (parameterized from
    day one). Invariants at any window: exactly one output row per
    purchase event, and counts are monotone in the window size at the
    aggregate level (pinned implicitly by the two extremes both
    matching the inequality-join oracle)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _j06_sql,
        j06_range_count,
    )

    win_us = win_s * 1_000_000
    actual = j06_range_count(spark, sf_dir, win_us=win_us).toPandas()
    expected = ddb.execute(_j06_sql(win_us=win_us)).fetchdf()
    assert_frames_match(actual, expected, f"j06@win={win_s}s")
    n_purch = ddb.execute(
        "SELECT count(*) FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert len(actual) == n_purch
