#!/usr/bin/env python3
"""Dump .explain('formatted') for named registry entries into
plans/$PLANS_ROUND/<name>_<tag>.txt (default r14 — the
optimization-round evidence files).

Usage: python scripts/dump_plans.py <tag> [name ...]
With no names, dumps the default optimization-target set.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from hunting_scams_on_wallapop_a_data_pipeline_and_fraud_detection_challenge_spark.session import (  # noqa: E402
    get_spark,
)

DEFAULT = [
    "rp01_end_to_end_risk",
    "ud2_spec_extraction",
    "pr01_table_profile",
    "a19_robust_zscore",
    "nn05_ivfpq",
    "nn06_residual_ivfpq",
    "nn07_opq_pq",
    "cp05_quality_gate_pipeline",
    "tk04_bpe_encode",
    "cp04_span_scrub_pipeline",
    "tp01_contrastive_pairs",
    "tp03_triplet_assembly",
    "co01_supplier_cooccurrence",
    "cs01_source_overlap",
    "cp01_corpus_curation_pipeline",
    "nn03_ivf_ann",
    "nn04_pq_adc",
    "dd02_minhash_lsh_pairs",
    "lm01_bigram_likelihood",
    "cp02_tokenizer_prep_pipeline",
    "ds13_mmr_diverse_select",
    "gr04_kcore",
    "sk04_set_op_sketches",
    "dd14_duplicate_spans",
    "j07_grid_spatial_join",
    "gr02_dup_graph_cohesion",
    "dd13_winnow_pairs",
    "mm05_pair_dedup",
    "lm02_crossentropy_buckets",
    "nn02_lsh_ann",
    "er01_fuzzy_match",
    "dd11_hierarchical_semdedup",
    "qf03_operating_point",
    "rk01_rank_fusion",
    "dd10_semantic_dedup",
    "j08_interval_overlap_join",
    "ix04_phrase_index",
    "sk03_quantile_sketch",
    "cp03_incremental_pipeline",
    "ts03_lttb_downsample",
    "er02_survivorship",
    "rk02_retrieval_eval",
    "dd03_simhash",
    "a06_weighted_zscore",
    "dd15_span_scrub",
    "rk03_ndcg",
    "ts05_holt_forecast",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building plan: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        n_py = text.count("EvalPython") + text.count("MapInPandas") + text.count(
            "MapInArrow"
        )
        joins = [
            j
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct")
            if j in text
        ]
        print(f"{name}: Exchange={n_ex} py_nodes={n_py} joins={','.join(joins) or '-'}")
    spark.stop()


if __name__ == "__main__":
    main()
