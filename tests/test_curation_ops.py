"""Semantic invariants of the round-4 curation operators — ds05 source
mixture, ds06 token-budget selection, txt05 gopher rules, pii02 PII
audit — beyond what the oracle-parity gate already pins."""

from __future__ import annotations

import pandas as pd

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (
    REGISTRY,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
    _MIX_WEIGHTS,
    _SEL_BUDGET,
    ds05_source_mixture,
    ds06_token_budget_select,
)

from conftest import assert_frames_match


def _source_counts(ddb) -> dict[str, int]:
    rows = ddb.execute(
        "SELECT source, count(*) FROM documents GROUP BY source"
    ).fetchall()
    return dict(rows)


def test_ds05_rates_are_the_closed_form(spark, sf_dir, ddb):
    """rate_s = (w_s * n_b) / (w_b * n_s) with the binding source at
    exactly 1.0 — the unique maximal mix with exact target proportions
    and no source oversampled."""
    out = ds05_source_mixture(spark, sf_dir).toPandas()
    counts = _source_counts(ddb)
    ratios = {s: counts[s] / w for s, w in _MIX_WEIGHTS.items()}
    binding = min(ratios, key=lambda s: (ratios[s], s))
    nb, wb = counts[binding], _MIX_WEIGHTS[binding]
    got = out.groupby("source")["rate"].first().to_dict()
    for s, w in _MIX_WEIGHTS.items():
        expect = round((w * nb) / (wb * counts[s]) + 1e-9, 6)
        assert got[s] == expect, (s, got[s], expect)
    # the binding source is never downsampled
    n_binding = (out["source"] == binding).sum()
    assert n_binding == counts[binding]
    # nothing outside the weighted sources leaks in
    assert set(out["source"]) <= set(_MIX_WEIGHTS)


def test_ds05_equal_weights_keep_everything(spark, sf_dir, ddb):
    """Equal weights over equal-sized sources → every rate is 1.0 and
    the mixture is the union (no sampling at all)."""
    weights = {"src0": 3, "src2": 3}
    out = ds05_source_mixture(spark, sf_dir, weights=weights).toPandas()
    counts = _source_counts(ddb)
    assert len(out) == counts["src0"] + counts["src2"]
    assert set(out["rate"]) == {1.0}


def test_ds06_budget_boundary_semantics(spark, sf_dir):
    """Selected set fills the budget with exactly one straddling doc:
    every start offset is under budget, and dropping the last doc's
    tokens lands under budget while the full sum reaches it."""
    out = ds06_token_budget_select(spark, sf_dir).toPandas()
    assert (out["start"] < _SEL_BUDGET).all()
    total = int(out["n_tok"].sum())
    last = out.loc[out["start"].idxmax()]
    assert total - int(last["n_tok"]) == int(last["start"])
    assert total >= _SEL_BUDGET  # corpus is bigger than the budget
    # best-first: every selected doc's quality is >= the straddler's
    # (modulo the rounded report column, so compare with a tolerance)
    assert (out["quality"] >= last["quality"] - 1e-4).all()


def test_ds06_degenerate_budgets(spark, sf_dir, ddb):
    assert ds06_token_budget_select(spark, sf_dir, budget=0).count() == 0
    n_docs = ddb.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert ds06_token_budget_select(spark, sf_dir, budget=1 << 40).count() == n_docs


def test_ds06_parity_at_second_budget(spark, sf_dir, ddb):
    """Replay the oracle with a substituted budget so the distributed
    prefix sum is pinned for more than the default constant."""
    budget = 3000
    actual = ds06_token_budget_select(spark, sf_dir, budget=budget).toPandas()
    sql = REGISTRY["ds06_token_budget_select"].oracle_text()
    assert sql.count(f"< {_SEL_BUDGET}") == 1
    expected = ddb.execute(sql.replace(f"< {_SEL_BUDGET}", f"< {budget}")).fetchdf()
    assert_frames_match(actual, expected, f"ds06@budget={budget}")


def test_txt05_keep_is_the_conjunction(spark, sf_dir):
    out = REGISTRY["txt05_gopher_filters"].fn(spark, sf_dir).toPandas()
    rules = [c for c in out.columns if c.startswith("rule_")]
    assert len(rules) == 5
    conj = out[rules].all(axis=1)
    assert (out["keep"] == conj).all()
    # the battery must actually discriminate on this corpus
    assert 0 < out["keep"].sum() < len(out)


def test_pii02_agrees_with_pii01_scrub_counts(spark, sf_dir, ddb):
    """Audit and scrub share the progressive-redaction counting, so
    pii02's per-class totals must equal pii01's per-event counts rolled
    up by event_type."""
    pii01 = REGISTRY["pii01_redact_props"].fn(spark, sf_dir).toPandas()
    pii02 = REGISTRY["pii02_detection_stats"].fn(spark, sf_dir).toPandas()
    types = ddb.execute("SELECT event_id, event_type FROM events").fetchdf()
    tags = [c for c in pii01.columns if c.startswith("n_")]
    rolled = (
        pii01.merge(types, on="event_id")
        .groupby("event_type")[tags]
        .sum()
        .astype("int64")
    )
    got = pii02.set_index("event_type")[tags].astype("int64").sort_index()
    pd.testing.assert_frame_equal(got, rolled.sort_index(), check_names=False)
    assert (pii02["n_with_pii"] <= pii02["n_events"]).all()


def test_ds07_prefix_fairness(spark, sf_dir):
    """Stride scheduling's defining property: every prefix of the
    interleaved order holds each source within one slot of its target
    share."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        ds07_weighted_interleave,
    )

    out = (
        ds07_weighted_interleave(spark, sf_dir)
        .toPandas()
        .sort_values(["pos_key", "source", "i"])
        .reset_index(drop=True)
    )
    total_w = sum(_MIX_WEIGHTS.values())
    seen: dict[str, int] = {s: 0 for s in _MIX_WEIGHTS}
    # sources exhaust at different times (equal sizes, different
    # weights), so check fairness over the prefix where all are live
    n_live = min(
        (out["source"] == s).sum() * total_w // w
        for s, w in _MIX_WEIGHTS.items()
    )
    for n, row in enumerate(out.itertuples(), start=1):
        seen[row.source] += 1
        if n > n_live:
            break
        for s, w in _MIX_WEIGHTS.items():
            share = n * w / total_w
            assert abs(seen[s] - share) <= total_w, (n, s, seen[s], share)
    # per-source indices are dense 1..n_s
    for s in _MIX_WEIGHTS:
        idx = sorted(out.loc[out["source"] == s, "i"])
        assert idx == list(range(1, len(idx) + 1))


# ---------------------------------------------------------------------------
# cdc01 / snapshot_delta — general CDC semantics beyond the oracle pin
# ---------------------------------------------------------------------------


def test_snapshot_delta_null_payload_semantics(spark):
    """Presence is tracked by markers, NOT payload nullness: a present
    row with NULL text must diff as present (NULL == NULL is
    unchanged, NULL vs value is changed), and absent-side lengths
    report 0."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        snapshot_delta,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (5, None), (6, "same")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(2, None), (3, "c2"), (4, None), (5, "now-set"), (6, "same")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["change_type"], r["old_len"], r["new_len"])
        for r in snapshot_delta(old, new).collect()
    }
    assert got == {
        1: ("removed", 1, 0),  # only in old
        3: ("changed", 1, 2),  # payload differs
        4: ("added", 0, 0),  # only in new, with NULL payload
        5: ("changed", 0, 7),  # NULL -> value is a change
        # 2 (NULL == NULL) and 6 (equal text) are unchanged -> dropped
    }


def test_cdc01_delta_is_seeded_twenty_percent(spark, sf_dir, ddb):
    """The derived snapshots put exactly buckets {0,1,2,3} of
    h(doc_id) % 20 into the delta — added/removed/changed counts must
    equal the bucket populations, and re-running is bit-stable."""
    out = REGISTRY["cdc01_snapshot_delta"].fn(spark, sf_dir).toPandas()
    buckets = dict(
        ddb.execute(
            "SELECT (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
            " % 2147483647) % 20 AS b, count(*) FROM documents"
            " WHERE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
            " % 2147483647) % 20 IN (0, 1, 2, 3) GROUP BY b"
        ).fetchall()
    )
    counts = out["change_type"].value_counts().to_dict()
    assert counts.get("added", 0) == buckets.get(0, 0)
    assert counts.get("removed", 0) == buckets.get(1, 0)
    assert counts.get("changed", 0) == buckets.get(2, 0) + buckets.get(3, 0)
    again = REGISTRY["cdc01_snapshot_delta"].fn(spark, sf_dir).toPandas()
    assert_frames_match(out, again)


# ---------------------------------------------------------------------------
# rk01 — fusion invariants beyond the oracle pin
# ---------------------------------------------------------------------------


def test_rk01_fusion_invariants(spark, sf_dir):
    """Every query returns exactly _RRF_TOPK fused rows; reported ranks
    stay within [0, _RRF_DEPTH]; the rrf score recomputes exactly from
    the reported ranks (0 = absent contributes nothing); and fused_rk
    descends with score (ties by doc_id)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _RRF_DEPTH,
        _RRF_K0,
        _RRF_QUERIES,
        _RRF_TOPK,
    )

    out = REGISTRY["rk01_rank_fusion"].fn(spark, sf_dir).toPandas()
    assert set(out["q_id"]) == set(range(_RRF_QUERIES))
    assert (out.groupby("q_id").size() == _RRF_TOPK).all()
    for c in ("lex_rk", "emb_rk"):
        assert out[c].between(0, _RRF_DEPTH).all()
    # a fused row must come from at least one retriever list
    assert ((out["lex_rk"] > 0) | (out["emb_rk"] > 0)).all()
    recomputed = out.apply(
        lambda r: (1.0 / (_RRF_K0 + r["lex_rk"]) if r["lex_rk"] else 0.0)
        + (1.0 / (_RRF_K0 + r["emb_rk"]) if r["emb_rk"] else 0.0),
        axis=1,
    )
    assert (out["rrf_score"] == recomputed).all()  # bit-exact, no epsilon
    for _, g in out.sort_values(["q_id", "fused_rk"]).groupby("q_id"):
        s = g["rrf_score"].to_numpy()
        assert (s[:-1] >= s[1:]).all()
        assert list(g["fused_rk"]) == list(range(1, _RRF_TOPK + 1))
