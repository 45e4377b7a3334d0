"""Quality gates for every approximate operator: the approximate paths
(multi-table hyperplane LSH, IVF) must recover a numeric-threshold
fraction of the exact brute-force answer at BOTH driver scale factors —
the correctness criterion an oracle can't express for banded candidate
generation or a seeded KMeans fit.

Baselines are the operators' own ``bits=0, tables=1`` degenerates
(single all-matching bucket == exact brute force), so gate and subject
share every line of scoring code except the candidate pruning under
test. Thresholds sit ~0.1 below values measured on the synthetic
corpus, which is near-random (top-3 neighbor cosine ≈ 0.26-0.49) — the
hardest case for LSH; real near-dup corpora with high-similarity pairs
recall strictly higher."""

from __future__ import annotations

import os

import pytest

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
    dd05_embedding_neardup,
    nn01_cosine_topk,
    nn02_lsh_ann,
    nn03_ivf_ann,
)

SF_DIRS = [d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, truth in exact.items():
        total += len(truth)
        hits += len(truth & approx.get(q, set()))
    assert total > 0
    return hits / total


@pytest.mark.parametrize("sf", SF_DIRS)
def test_nn02_multitable_lsh_recall(spark, sf):
    exact = _topk(nn02_lsh_ann(spark, sf, bits=0, tables=1))
    approx = _topk(nn02_lsh_ann(spark, sf))
    recall = _recall(approx, exact)
    assert recall >= 0.6, f"nn02 recall@3={recall:.2f} < 0.6 at {sf}"


@pytest.mark.parametrize("sf", SF_DIRS)
def test_nn03_ivf_recall(spark, sf):
    exact = _topk(nn01_cosine_topk(spark, sf))
    approx = _topk(nn03_ivf_ann(spark, sf))
    recall = _recall(approx, exact)
    assert recall >= 0.45, f"nn03 recall@5={recall:.2f} < 0.45 at {sf}"


def test_ann_operating_point_tradeoff(spark):
    """The documented banding law (training_queries.py: recall fixed at
    1-(1-p^bits)^tables) must MOVE when the operating point moves:
    bits=6/tables=4 (longer signatures, fewer tables) prunes harder
    than the default 4/8, so recall drops toward — but not below — a
    floor, and the surviving near-dup pair set shrinks and stays nested
    inside the exact answer. Deterministic hyperplanes → no flake."""
    sf = SF_DIRS[0]
    exact = _topk(nn02_lsh_ann(spark, sf, bits=0, tables=1))
    default = _recall(_topk(nn02_lsh_ann(spark, sf)), exact)
    tight = _recall(_topk(nn02_lsh_ann(spark, sf, bits=6, tables=4)), exact)
    assert tight <= default, (
        f"harder pruning raised recall?! default(4,8)={default:.2f} "
        f"tight(6,4)={tight:.2f}"
    )
    assert tight >= 0.25, f"nn02 recall collapsed at (6,4): {tight:.2f}"

    exact_pairs = {
        (r.a_id, r.b_id)
        for r in dd05_embedding_neardup(spark, sf, bits=0, tables=1).collect()
    }
    dflt_pairs = {
        (r.a_id, r.b_id) for r in dd05_embedding_neardup(spark, sf).collect()
    }
    tight_pairs = {
        (r.a_id, r.b_id)
        for r in dd05_embedding_neardup(spark, sf, bits=6, tables=4).collect()
    }
    assert tight_pairs <= exact_pairs, "approx pair outside the exact set"
    assert len(tight_pairs) <= len(dflt_pairs), (
        f"candidate set grew under harder pruning: "
        f"{len(tight_pairs)} > {len(dflt_pairs)}"
    )
    assert len(tight_pairs) >= 1, "pruning at (6,4) lost every pair"


@pytest.mark.parametrize("sf", SF_DIRS)
def test_dd05_neardup_pair_recall(spark, sf):
    exact = {
        (r.a_id, r.b_id)
        for r in dd05_embedding_neardup(spark, sf, bits=0, tables=1).collect()
    }
    approx = {(r.a_id, r.b_id) for r in dd05_embedding_neardup(spark, sf).collect()}
    assert exact, f"brute-force baseline found no pairs at {sf}"
    assert approx <= exact, "LSH path produced a pair the exact path lacks"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, f"dd05 pair recall={recall:.2f} < 0.6 at {sf}"


def test_nn03_ivf_operating_point_tradeoff(spark):
    """IVF's knobs must move recall the documented way: probing the
    same 1/4 fraction of a finer quantizer (cells=32, probes=8) stays
    in the default's recall regime, while halving the probed fraction
    (cells=32, probes=4) prunes harder and cannot raise recall.
    Deterministic seeded fit → no flake."""
    sf = SF_DIRS[0]
    exact = _topk(nn01_cosine_topk(spark, sf))
    default = _recall(_topk(nn03_ivf_ann(spark, sf)), exact)
    same_frac = _recall(_topk(nn03_ivf_ann(spark, sf, cells=32, probes=8)), exact)
    half_frac = _recall(_topk(nn03_ivf_ann(spark, sf, cells=32, probes=4)), exact)
    assert half_frac <= same_frac + 1e-9, (
        f"halving probed fraction raised recall?! {half_frac:.2f} > {same_frac:.2f}"
    )
    assert same_frac >= 0.35, f"recall collapsed at cells=32/probes=8: {same_frac:.2f}"
    assert default >= 0.45  # the pinned default gate still holds here


@pytest.mark.parametrize("sf", SF_DIRS)
def test_nn04_pq_recall_floor_and_quantization_tradeoff(spark, sf):
    """PQ on near-random vectors is the adversarial floor for ADC
    (quantizing directions that have no cluster structure), so the
    recall gate is a floor well above chance (~0.3% for k=5) rather
    than an LSH-class bound — and the OPERATING POINT is gated on the
    metric PQ actually controls: mean |approx_cos − true_cos|
    quantization error must strictly shrink when the codebook grows
    16 → 64 codes per subspace (measured: 0.28 → 0.18-0.20)."""
    from pyspark.sql import functions as F

    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _dot,
        _fold_sum,
        _t,
        _vec_double,
        nn04_pq_adc,
    )

    exact = _topk(nn01_cosine_topk(spark, sf))
    approx = _topk(nn04_pq_adc(spark, sf))
    recall = _recall(approx, exact)
    assert recall >= 0.1, f"nn04 recall@5={recall:.2f} < 0.1 at {sf}"

    emb = _t(spark, sf, "embeddings")
    base = (
        emb.select("vec_id", _vec_double(F.col("embedding")).alias("v"))
        .withColumn(
            "nrm", F.sqrt(_fold_sum(F.transform(F.col("v"), lambda x: x * x)))
        )
        .filter(F.col("nrm") > 0)
    )

    def quant_err(codes: int) -> float:
        ap = nn04_pq_adc(spark, sf, codes=codes)
        true_cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        return (
            ap.join(
                base.select(
                    F.col("vec_id").alias("q_id"),
                    F.col("v").alias("qv"),
                    F.col("nrm").alias("qn"),
                ),
                "q_id",
            )
            .join(
                base.select(
                    "vec_id", F.col("v").alias("cv"), F.col("nrm").alias("cn")
                ),
                "vec_id",
            )
            .agg(F.avg(F.abs(F.col("approx_cosine") - true_cos)))
            .first()[0]
        )

    coarse, fine = quant_err(16), quant_err(64)
    assert fine < coarse, (
        f"64-code quantization error {fine:.3f} not below 16-code {coarse:.3f} at {sf}"
    )


@pytest.mark.parametrize("sf", SF_DIRS)
def test_nn05_ivfpq_recall_floor_and_degenerate_composition(spark, sf):
    """IVF-PQ recall is bounded by BOTH pruning and quantization, so
    the floor mirrors nn04's; the composition itself is gated exactly:
    probing EVERY cell removes the pruning, and the output must then be
    row-identical to plain PQ (nn04) — same candidates, same ADC, same
    ranks."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _IVF_CELLS,
        nn04_pq_adc,
        nn05_ivfpq,
    )

    exact = _topk(nn01_cosine_topk(spark, sf))
    approx = _topk(nn05_ivfpq(spark, sf))
    recall = _recall(approx, exact)
    assert recall >= 0.1, f"nn05 recall@5={recall:.2f} < 0.1 at {sf}"

    full = {
        (r.q_id, r.rk): (r.vec_id, r.approx_cosine)
        for r in nn05_ivfpq(spark, sf, probes=_IVF_CELLS).collect()
    }
    pq = {
        (r.q_id, r.rk): (r.vec_id, r.approx_cosine)
        for r in nn04_pq_adc(spark, sf).collect()
    }
    assert full == pq, "all-cell IVF-PQ must degenerate to plain PQ"


@pytest.mark.parametrize("sf", SF_DIRS)
def test_nn06_residual_quantizes_tighter_than_flat(spark, sf):
    """The residual claim, gated on the metric residual encoding
    actually controls: mean |approx_cos − true_cos| over each
    operator's returned top-k must be LOWER for nn06 (codebooks fit on
    vn − centroid[cell], per-(query, cell) ADC tables) than for the
    flat nn05 at the same operating point (same cells/probes/codes/
    sample). Recall@5 over 10 queries (50 pairs) on this near-random
    corpus is too coarse to rank variants — it flips between SFs while
    the quantization error improves at both (measured 0.2568 → 0.2558
    at sf0.01, 0.2777 → 0.2629 at sf0.1; deterministic seeded fits, so
    no flake). Plus the same recall floor as the other PQ paths."""
    from pyspark.sql import functions as F

    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _dot,
        _fold_sum,
        _t,
        _vec_double,
        nn05_ivfpq,
        nn06_residual_ivfpq,
    )

    exact = _topk(nn01_cosine_topk(spark, sf))
    approx = _topk(nn06_residual_ivfpq(spark, sf))
    recall = _recall(approx, exact)
    assert recall >= 0.1, f"nn06 recall@5={recall:.2f} < 0.1 at {sf}"

    emb = _t(spark, sf, "embeddings")
    base = (
        emb.select("vec_id", _vec_double(F.col("embedding")).alias("v"))
        .withColumn(
            "nrm", F.sqrt(_fold_sum(F.transform(F.col("v"), lambda x: x * x)))
        )
        .filter(F.col("nrm") > 0)
    )

    def quant_err(fn) -> float:
        ap = fn(spark, sf)
        true_cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        return (
            ap.join(
                base.select(
                    F.col("vec_id").alias("q_id"),
                    F.col("v").alias("qv"),
                    F.col("nrm").alias("qn"),
                ),
                "q_id",
            )
            .join(
                base.select(
                    "vec_id", F.col("v").alias("cv"), F.col("nrm").alias("cn")
                ),
                "vec_id",
            )
            .agg(F.avg(F.abs(F.col("approx_cosine") - true_cos)))
            .first()[0]
        )

    flat, residual = quant_err(nn05_ivfpq), quant_err(nn06_residual_ivfpq)
    assert residual < flat, (
        f"residual quantization error {residual:.4f} not below flat "
        f"{flat:.4f} at {sf}"
    )


@pytest.mark.parametrize("sf", SF_DIRS)
def test_nn07_rotation_is_parity_on_isotropic_data(spark, sf):
    """OPQ's rotation exploits correlation structure; this synthetic
    corpus is isotropic BY CONSTRUCTION, so the honest gate is parity,
    not superiority: rotated-PQ quantization error must stay within 5%
    of flat nn04's at the same code budget (measured 0.2773 vs 0.2759
    at sf0.01, 0.2850 vs 0.2856 at sf0.1 — deterministic fits, no
    flake), with the same recall floor as the other PQ paths. On
    correlated real embeddings the same plan is the standard accuracy
    upgrade."""
    from pyspark.sql import functions as F

    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _dot,
        _fold_sum,
        _t,
        _vec_double,
        nn04_pq_adc,
        nn07_opq_pq,
    )

    exact = _topk(nn01_cosine_topk(spark, sf))
    approx = _topk(nn07_opq_pq(spark, sf))
    recall = _recall(approx, exact)
    assert recall >= 0.1, f"nn07 recall@5={recall:.2f} < 0.1 at {sf}"

    emb = _t(spark, sf, "embeddings")
    base = (
        emb.select("vec_id", _vec_double(F.col("embedding")).alias("v"))
        .withColumn(
            "nrm", F.sqrt(_fold_sum(F.transform(F.col("v"), lambda x: x * x)))
        )
        .filter(F.col("nrm") > 0)
    )

    def quant_err(fn) -> float:
        ap = fn(spark, sf)
        true_cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        return (
            ap.join(
                base.select(
                    F.col("vec_id").alias("q_id"),
                    F.col("v").alias("qv"),
                    F.col("nrm").alias("qn"),
                ),
                "q_id",
            )
            .join(
                base.select(
                    "vec_id", F.col("v").alias("cv"), F.col("nrm").alias("cn")
                ),
                "vec_id",
            )
            .agg(F.avg(F.abs(F.col("approx_cosine") - true_cos)))
            .first()[0]
        )

    flat, rotated = quant_err(nn04_pq_adc), quant_err(nn07_opq_pq)
    assert rotated <= flat * 1.05, (
        f"rotated quantization error {rotated:.4f} drifted >5% above flat "
        f"{flat:.4f} at {sf} — the rotation is supposed to be neutral here"
    )


def _write_dup_corpus(spark, tmp_path) -> str:
    """Corpus with real dup structure for the SemDeDup recall gates:
    two noisy copies of every even-id sf0.01 vector, seeded — copies
    sit at cosine ~0.9 / ~0.7 to their base, well above the 0.4
    threshold."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet").to_pandas()
    rng = np.random.default_rng(11)
    X = np.array([list(e) for e in t.embedding], dtype=np.float64)
    dim = X.shape[1]
    recs = [
        (int(v), list(map(float, X[i])), int(t.label[i]))
        for i, v in enumerate(t.vec_id)
    ]
    for i, v in enumerate(t.vec_id):
        if v % 2:
            continue
        for c in (1, 2):
            noise = rng.standard_normal(dim)
            noise *= 0.5 * np.linalg.norm(X[i]) / np.linalg.norm(noise) * c
            recs.append(
                (
                    int(v + c * 100_000),
                    list(map(float, X[i] + noise)),
                    int(t.label[i]),
                )
            )
    spark.createDataFrame(
        recs, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_dd10_semdedup_dup_recall_vs_exact_and_dd05(spark, tmp_path):
    """VERDICT r05 item 3: SemDeDup's cross-cell miss rate, MEASURED.

    Build a corpus with real dup structure (two noisy copies of every
    even-id sf0.01 vector, seeded — copies sit at cosine ~0.9 / ~0.7 to
    their base, well above the 0.4 threshold), then:

    - cross-operator exactness: dd10 with cells=1 (confinement removed)
      must produce EXACTLY the drop set dd05's exact all-pairs verdict
      implies (a vector drops iff it has a smaller-id partner within
      the threshold) — the two operators' dup semantics are the same
      contract, verified operator-against-operator;
    - the cell-confined default can only lose cross-cell dups (nesting);
    - dup-recall of the confined default vs the exact set is GATED at
      0.65 — measured 0.79 on this corpus, floor ~0.1 below, the same
      margin discipline as the ANN operating-point gates above. The
      docstring tradeoff ("cross-cell near-dups are missed by
      construction") is now a number, not an assertion."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        dd10_semantic_dedup,
    )

    sf = _write_dup_corpus(spark, tmp_path)

    exact = {
        r.vec_id for r in dd10_semantic_dedup(spark, sf, cells=1).collect()
        if not r.keep
    }
    dd05_drop = {
        max(r.a_id, r.b_id)
        for r in dd05_embedding_neardup(spark, sf, bits=0, tables=1).collect()
    }
    assert exact, "perturbed corpus produced no dups — fixture broken"
    assert exact == dd05_drop, (
        "dd10(cells=1) and dd05-exact disagree on the dup set: "
        f"{len(exact)} vs {len(dd05_drop)}"
    )

    approx = {
        r.vec_id for r in dd10_semantic_dedup(spark, sf).collect() if not r.keep
    }
    assert approx <= exact, "cell confinement invented a dup"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.65, f"dd10 dup-recall={recall:.2f} < 0.65"


def test_dd11_hierarchical_semdedup_recall_and_degeneracy(spark, tmp_path):
    """dd11's recall tradeoff, MEASURED (the dd10 discipline applied to
    the hierarchical path), on the same seeded dup corpus:

    - coarse=1 degeneracy: one coarse cell makes the member filter a
      no-op, so dd11 must equal dd10 on the SAME fine fit — verdict for
      verdict, the cross-operator equivalence that pins the hierarchy
      as pure assignment routing, not a semantics change;
    - cprobes >= coarse degeneracy: probing every coarse cell un-masks
      every fine cell, so the assignment degenerates to dd10's flat
      argmin — the multi-probe twin of the coarse=1 equivalence;
    - nesting: the hierarchical default can only LOSE dups relative to
      the exact (cells=1) verdict, never invent one;
    - dup-recall of the hierarchical default vs exact is GATED at 0.60
      — the coarse multi-probe default (cprobes=2, VERDICT r07 item 4)
      measures 0.70 on this corpus vs 0.66 single-probe and 0.73 at
      cprobes=3; dd10's flat assignment measures 0.79 (the residual
      gap is the fine-cell boundary both operators share), floor ~0.1
      below measured, the same margin discipline as the ANN
      operating-point gates."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        dd10_semantic_dedup,
        dd11_hierarchical_semdedup,
    )

    sf = _write_dup_corpus(spark, tmp_path)
    d11 = {
        (r.vec_id, r.cell, r.keep)
        for r in dd11_hierarchical_semdedup(spark, sf, coarse=1).collect()
    }
    d10 = {
        (r.vec_id, r.cell, r.keep)
        for r in dd10_semantic_dedup(spark, sf).collect()
    }
    assert d11 == d10, "dd11(coarse=1) diverged from dd10 on the same fit"

    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _HIER_COARSE,
    )

    allprobe = {
        (r.vec_id, r.cell, r.keep)
        for r in dd11_hierarchical_semdedup(
            spark, sf, cprobes=_HIER_COARSE
        ).collect()
    }
    assert allprobe == d10, (
        "dd11(cprobes=coarse) diverged from dd10 on the same fit"
    )

    exact = {
        r.vec_id for r in dd10_semantic_dedup(spark, sf, cells=1).collect()
        if not r.keep
    }
    assert exact, "perturbed corpus produced no dups — fixture broken"
    approx = {
        r.vec_id
        for r in dd11_hierarchical_semdedup(spark, sf).collect()
        if not r.keep
    }
    assert approx <= exact, "hierarchical assignment invented a dup"
    # NOTE deliberately NOT asserted: single-probe ⊆ multi-probe. Probes
    # widen the candidate fine-cell set, which can ROUTE a row to a
    # closer fine cell and split a previously co-located pair — the dup
    # set is not monotone in cprobes (measured: 60 lost / 82 gained at
    # 1→2 probes on this corpus); only aggregate recall improves.
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.60, f"dd11 dup-recall={recall:.2f} < 0.60"


def test_ct03_contamination_recall_and_probe_degeneracy(spark, tmp_path):
    """ct03's confinement tradeoff, MEASURED (the dd10/dd11 discipline
    applied to the decontamination split), on the seeded dup corpus —
    contamination here = a corpus vector near a benchmark-slice vector:

    - probes == cells degeneracy: the benchmark side probing every cell
      makes the cell key vacuous, so the verdict must equal the exact
      all-pairs (cells=1) contamination set — the pinned equivalence;
    - nesting: confinement can only LOSE contaminated flags, never
      invent one;
    - recall of the multi-probe default vs exact is GATED at 0.55 —
      measured 0.64 (single-probe measures 0.30: the benchmark-side
      multi-probe is what recovers the cross-cell pairs), the same
      ~0.1-margin discipline as the other recall gates."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        ct03_semantic_contamination,
    )

    sf = _write_dup_corpus(spark, tmp_path)
    exact = {
        r.vec_id
        for r in ct03_semantic_contamination(spark, sf, cells=1).collect()
        if r.contaminated
    }
    assert exact, "fixture produced no contamination — broken"
    allp = {
        r.vec_id
        for r in ct03_semantic_contamination(spark, sf, probes=16).collect()
        if r.contaminated
    }
    assert allp == exact, "probes=cells diverged from the exact verdict"
    conf = {
        r.vec_id
        for r in ct03_semantic_contamination(spark, sf).collect()
        if r.contaminated
    }
    assert conf <= exact, "confinement invented a contamination flag"
    recall = len(conf & exact) / len(exact)
    assert recall >= 0.55, f"ct03 recall={recall:.2f} < 0.55"


def test_tp02_rk01_ivf_legs_degeneracy_and_recall(spark, sf_dir):
    """The production IVF retrieval legs (VERDICT r07 item 3): tp02's
    hard-negative miner and rk01's semantic retriever each grow an
    ``impl="ivf"`` variant that swaps the brute-force scoring leg for
    nn03's replayed-fit cell probe — exclusion / ranking / fusion
    unchanged. Contract, per leg:

    - probes == cells degeneracy: probing every cell makes candidate
      generation exhaustive, so the variant must equal the brute-force
      form ROW FOR ROW (ranks and scores included) — pinning the IVF
      path as pure candidate pruning, not a scoring change;
    - recall of the default operating point (cells=16, probes=4) vs
      the brute-force result set, gated at the _LEG_RECALL_FLOORS
      constants nn08's driver row shares: tp02 >= 0.4 (measured 0.53
      at sf0.001 / 0.50 at sf0.01; probes 6/8 measure 0.65/0.80),
      rk01 >= 0.6 (measured 0.76 / 0.73; probes 6/8 measure
      0.83/0.90)."""
    from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.training_queries import (
        _IVF_CELLS,
        _LEG_RECALL_FLOORS,
        rk01_rank_fusion,
        tp02_hard_negatives,
    )

    for rfn, keycols in (
        (tp02_hard_negatives, ("q_id", "neg_id")),
        (rk01_rank_fusion, ("q_id", "doc_id")),
    ):
        name = rfn.__name__
        bf_rows = rfn(spark, sf_dir).collect()
        dg_rows = rfn(
            spark, sf_dir, impl="ivf", probes=_IVF_CELLS
        ).collect()
        assert sorted(map(tuple, bf_rows)) == sorted(map(tuple, dg_rows)), (
            f"{name}: probes=cells diverged from the brute-force form"
        )
        bf = {tuple(getattr(r, c) for c in keycols) for r in bf_rows}
        iv = {
            tuple(getattr(r, c) for c in keycols)
            for r in rfn(spark, sf_dir, impl="ivf").collect()
        }
        recall = len(bf & iv) / len(bf)
        floor = _LEG_RECALL_FLOORS[name]
        assert recall >= floor, f"{name} ivf recall={recall:.2f} < {floor}"
