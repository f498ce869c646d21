"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-data extensions), one named plan each.
``oracle_sql()`` — DuckDB twins for the correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kaggle_data_pipeline_with_aws_spark.plans import registry

registry.load_all()

SF0001 = "/root/testdata/sf0.001"

# Extra bench-headline ops (bench.py appends these to HEADLINE): the
# exact set-similarity PPJoins — the repo's biggest plan-level perf
# work — so BENCH_r{N}.json carries their time series going forward.
BENCH_EXTRA = [
    "d06_ngram_jaccard",
    "d42_shingle_containment",
    "d110_semdedup",
    # added round 5 after its in-task pair-kernel rewrite (182→9.7 s
    # at 10×) so the series tracks the flagship embedding-pair op
    "d10_embedding_neardup",
    # added round 6 with the shared ranked-shingle substrate — its
    # loosest-threshold PPJoin pass was the family's biggest win
    # (30.1→5.9 s at 10×); the series tracks the substrate economics
    "d126_dedup_threshold_sweep",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return registry.QUERIES["q01_pricing_summary"](spark, SF0001)


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order, so ordering is part of the contract. CORRECTNESS_r{N}
# files are cumulative proof, so each round the window holds (a) queries
# whose implementation or oracle changed since their last green row —
# they must re-prove (ENFORCED by tools/proof_audit.py, gate stage 3:
# symbol-level AST diff of each proven query's dependency closure
# against its proof-baseline commit) — and (b) as many
# never-driver-checked queries as fit.
#
# Round-6 window: THE CLOSING WINDOW. After five rounds, exactly 48
# registry queries lack a currently-valid driver proof — 7 whose r2-r4
# proofs were invalidated by round-5 determinism/performance rewrites
# (q38 exact-DECIMAL money sums, d95 exact integer moments, d10/d53/d85
# in-task pair kernels, d69/d43 salted block pairs) and 41 never-proven
# (the wave-17-32 tail: q101-q113, d113-d139, s13, plus the two
# rows-only-by-design twins d15/d23). All 48 fit in one 50-slot window:
# invalidated re-proofs first (oldest original proof first), then the
# never-proven queue oldest-wave-first, rows-only twins last among the
# never-proven. The 2 spare slots carry d11/d51 re-proofs — their
# decode tier gained a real stdlib PNG codec this round (see
# operators/multimodal.py), which changes their dependency closure and
# invalidates the r5 proofs per the audit rule. 50/50 staged; if every
# row comes back green, all 263 queries the registry held at the
# START of round 6 carry a currently-valid driver proof. The round's
# LATER work then re-opens a bounded queue for round 7 (listed at
# position 51+ below): 9 proofs invalidated by the substrate switch
# plus the 8 new wave-33/34/35 queries (d140-d147), all locally
# gate-green.
_WINDOW_PRIORITY = [
    # ---- re-proofs: impl changed after an earlier green row (r5 work) ----
    "q38_supplier_revenue_rank",
    "d95_embedding_norm_outliers",
    "d10_embedding_neardup",
    "d53_translation_candidates",
    "d85_translation_length_filter",
    "d69_edit_distance_linkage",
    "d43_fuzzy_prefix_match",
    # ---- never-proven queue, oldest wave first (waves 17-32) ----
    "q101_ab_ztest",
    "q102_dow_seasonality",
    "q103_conversion_latency",
    "d113_dataset_card",
    "d114_tail_token_exposure",
    "d115_cross_source_dup_matrix",
    "q104_lag_gap_sessions",
    "d116_signal_agreement",
    "q105_sql_face",
    "d117_packed_sequences",
    "d118_packing_efficiency",
    "q106_dynamic_pivot",
    "d119_feature_corr_matrix",
    "d120_psi_drift",
    "d121_zorder_layout",
    "q107_json_key_profile",
    "q108_schema_evolution_union",
    "d123_source_gini",
    "d124_quality_residuals",
    "q109_time_weighted_avg",
    "d125_prefix_cache_rates",
    "d126_dedup_threshold_sweep",
    "q110_rfm_segments",
    "d127_shard_manifest",
    "d128_temperature_weights",
    "q111_decile_lift",
    "d129_dedup_impact",
    "q112_point_in_time_join",
    "d130_kcenter_coreset",
    "s13_windowed_countmin",
    "d131_forget_purge_audit",
    "d133_rrf_fusion",
    "d134_ndcg_eval",
    "d135_ks_source_drift",
    "d136_chi2_keyness",
    "q113_benford_audit",
    "d137_ivfpq_adc",
    "d138_dsir_importance",
    "d139_curriculum_order",
    # ---- rows-only-by-design twins, never driver-recorded ----
    "d15_ann_ivf",
    "d23_frame_sample",
    # ---- spare slots: d11/d51 re-proofs (round-6 real PNG decode tier
    # ---- changes operators/multimodal.py symbols in their closure) ----
    "d11_multimodal_features",
    "d51_image_patches",
    # ---- position 51+: BEYOND this round's 50-slot window — the
    # round-7 re-proof queue, staged per the audit rule (post-window
    # perf work that touches proven closures costs next-round slots;
    # the round-5 verdict's directives #4/#6 budgeted exactly this).
    # d06/d07/d42 now consume the shared ranked-shingle / MinHash-
    # signature substrate (operators/text_substrate.py) instead of
    # re-deriving per run; value-equivalence to the standalone dedup
    # plans is pinned at sf0.001 in tests/test_text_substrate.py and
    # re-verified at sf0.01 by the round-6 gate sweep.
    "d06_ngram_jaccard",
    "d07_minhash_lsh",
    "d42_shingle_containment",
    "d108_incremental_dedup",
    # The kNN edge substrate's store mechanics moved into the shared
    # substrate_store (configurable root URI, race/fallback contract —
    # directive #6); builder plan and artifact identity unchanged, but
    # the rule is any closure change re-proves.
    "d62_knn_graph",
    "d63_knn_triangles",
    "d64_label_vote",
    "d122_kcore_peel",
    "d132_bfs_hops",
]


def _ordered() -> list[str]:
    missing = [n for n in _WINDOW_PRIORITY if n not in registry.QUERIES]
    assert not missing, f"priority window references unknown queries: {missing}"
    rest_oracle = [
        n
        for n in registry.QUERIES
        if n not in _WINDOW_PRIORITY and n in registry.ORACLE_SQL
    ]
    rest_rows_only = [
        n
        for n in registry.QUERIES
        if n not in _WINDOW_PRIORITY and n not in registry.ORACLE_SQL
    ]
    return [*_WINDOW_PRIORITY, *rest_oracle, *rest_rows_only]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        n: registry.ORACLE_SQL[n] for n in _ordered() if n in registry.ORACLE_SQL
    }
