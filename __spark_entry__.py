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
    # added round 7 when d15 gained the deterministic fitted quantizer
    # and a full value oracle (the registry's last rows-only check) —
    # the series tracks the flagship ANN serving path
    "d15_ann_ivf",
    # added round 8 with the URL/domain curation family: d158 is the
    # WindowGroupLimit frequency cap over the published domain-map
    # substrate, d162 the iterated BPE trainer — the series tracks
    # the two new tiers' economics
    "d158_domain_frequency_cap",
    "d162_bpe_train",
    # added late round 8 with the sketch/serving tiers: d174 is the
    # explicit-register HLL build (the mergeable-sketch substrate of
    # d178/d181/d187/s14), d198 the Matryoshka coarse-to-fine rerank —
    # the series tracks both tiers' economics going forward
    "d174_hll_cardinality",
    "d198_progressive_rerank",
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
# Round-8 window. Two blocks:
#
# (A) 24 substrate-store re-proofs, batched WEEK-1 per the round-7
#     verdict's item 6 (substrate freeze discipline): the three
#     round-7 ADVICE fixes all land in operators/substrate_store.py —
#     memoized-fast-path recovery after a peer process's GC,
#     _FPRINT_MEMO TTL expiry so in-place dataset regeneration is
#     eventually observed, and the prune_superseded ownership gate for
#     no-_SUCCESS entries — plus d155's integral pred_candidates sum
#     (wave39). Every registered query whose dependency closure
#     includes materialize_once/prune_superseded/_dataset_fingerprint
#     re-proves (tools/proof_audit.py's rule); all were green in r7 and
#     the fixes change only degraded/GC paths, so results are
#     unchanged. substrate_store is now FROZEN for the round.
# (B) the round-8 never-proven additions (staged as they land).
# All verified green vs DuckDB at sf0.01 before staging.
_WINDOW_PRIORITY = [
    # ---- (B) round-8 additions, never driver-checked ----
    # wave 41: URL/domain curation family (round-7 verdict #1)
    "d157_registrable_domains",
    "d158_domain_frequency_cap",
    "d159_domain_blocklist_screen",
    "d160_domain_quality_rollup",
    "d161_domain_skew_profile",
    # wave 42: iterated BPE trainer + encode curve (round-7 verdict #2)
    "d162_bpe_train",
    "d167_bpe_encode_stats",
    # wave 43: domain-aware curation tier 2
    "d163_domain_quality_topk",
    "d164_domain_stratified_sample",
    "d165_public_suffix_rollup",
    "d166_domain_dup_locality",
    # wave 44: domain boilerplate + coverage
    "d168_domain_template_shingles",
    "d169_domain_coverage_curve",
    # wave 45: exact token-budget waterfilling
    "d170_domain_token_waterfill",
    # wave 46: per-domain path-prefix exclusion rules + mirror detection
    "d171_path_rule_screen",
    "d172_domain_mirror_candidates",
    "d173_domain_curation_funnel",
    # wave 47: explicit-register HLL, URL canonical dedup, RBO,
    # Poisson bootstrap
    "d174_hll_cardinality",
    "d175_url_canonical_dedup",
    "d176_rank_biased_overlap",
    "d177_poisson_bootstrap",
    # wave 48: HLL roll-forward, Chao1 richness, bootstrap CI, sketch
    # error audit — fills the 50-slot window exactly
    "d178_hll_rollforward",
    "d179_chao1_vocab_richness",
    "d180_bootstrap_ci",
    "d181_sketch_error_audit",
    # ---- re-proof: q80's money sum moved onto exact decimal cents
    # ---- (the q38/q88/q100 rule), retiring the sf0.1 1-ulp WARN ----
    "q80_grouping_sets_revenue",
    # ---- (A) re-proofs: substrate_store.py ADVICE fixes (week 1) ----
    "d06_ngram_jaccard",
    "d07_minhash_lsh",
    "d42_shingle_containment",
    "d108_incremental_dedup",
    "d62_knn_graph",
    "d63_knn_triangles",
    "d64_label_vote",
    "d122_kcore_peel",
    "d132_bfs_hops",
    "d115_cross_source_dup_matrix",
    "d126_dedup_threshold_sweep",
    "d141_split_leakage",
    "d142_cluster_safe_split",
    "d149_contrastive_pairs",
    "d150_cluster_cohesion",
    "d152_lsh_band_tuning",
    # d155 additionally re-proves for its own integral-sum fix
    "d155_ppjoin_cost_estimate",
    "d156_cluster_threshold_stability",
    "d31_dedup_components",
    "d55_canonical_docs",
    "d76_cluster_size_histogram",
    "d40_pagerank",
    "d61_lsh_estimate_error",
    "d67_cross_source_leakage",
]
# The window above is exactly 50 entries (the driver's check depth).
# Queries registered beyond it this round — d182–d200, s14 (waves
# 49–57: entropy/burstiness/MMR, IVM merge, MI, purged split,
# expectations, transition entropy, attribution, CUSUM, conformal,
# PR curve, stratified bootstrap, progressive rerank, modularity,
# Wasserstein, streaming HLL) — are builder-verified at sf0.01 +
# sf0.1 + 10× (BENCH_SCALING.md) and queue for the round-9 window.


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
