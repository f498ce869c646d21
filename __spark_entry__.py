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
    # added round 9 with the tokenizer-EM and graph-serving tiers:
    # d202 is the unigram-LM EM trainer (the likelihood half of the
    # tokenizer story), d204 the NSW beam search over the kNN
    # substrate — the series tracks both tiers' economics
    "d202_unigram_train",
    "d204_nsw_beam_search",
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
# Round-9 window. Per the round-8 verdict's item 1, the 20 queries
# registered after round 8's window filled (waves 49–57; all
# builder-verified at sf0.01 + sf0.1 + 10× AND independently re-run
# green by the round-8 judge) LEAD the window so their driver proof
# debt converts to CORRECTNESS rows. The remaining slots carry the
# round-9 additions (staged as they land) and any re-proofs
# tools/proof_audit.py demands.
_WINDOW_PRIORITY = [
    # ---- (A) round-8 proof debt: waves 49–57, judge-verified 20/20 ----
    "d182_conditional_entropy",
    "d183_term_burstiness",
    "d184_mmr_topk",
    "d185_k_anonymity",
    "d186_join_cardinality_estimate",
    "d187_hll_set_ops",
    "d188_incremental_agg_merge",
    "d189_length_token_mi",
    "d190_purged_time_split",
    "d191_expectation_suite",
    "d192_transition_entropy",
    "d193_attribution_models",
    "d194_cusum_drift",
    "d195_conformal_calibration",
    "d196_dedup_pr_curve",
    "d197_stratified_bootstrap",
    "d198_progressive_rerank",
    "d199_cluster_modularity",
    "d200_wasserstein_drift",
    "s14_windowed_hll_users",
    # ---- (B) round-9 additions (staged as they land) ----
    # wave 58: PSL as managed data (round-8 verdict #3) — the Spark
    # side resolves through the broadcast-join path, the oracle
    # through the compiled-SQL path: a hash match cross-certifies
    # the two PSL implementations.
    "d201_psl_join_resolution",
    # wave 59: unigram-LM (SentencePiece-style) EM trainer + quality
    # curve (round-8 verdict #2) — the likelihood half of the
    # tokenizer tier next to d162's merge-based BPE half.
    "d202_unigram_train",
    "d203_unigram_segment_stats",
    # wave 60: snapshot/time-travel table face (round-8 verdict #4) —
    # a real transaction-logged parquet table staged per run; the
    # oracle states the same three committed states against orders,
    # so the hash match proves the log replay.
    "q114_snapshot_time_travel",
    "q115_version_incremental_read",
    "q116_version_row_diff",
    # wave 61: NSW greedy beam search over the published mutual-kNN
    # substrate + recall/cost audit (round-8 verdict #5).
    "d204_nsw_beam_search",
    "d205_nsw_recall_audit",
    # wave 62: lakehouse tier 2 — compaction invariance, schema
    # evolution, MERGE-as-a-commit through the transaction log.
    "q117_compaction_invariance",
    "q118_versioned_schema_evolution",
    "q119_versioned_merge",
    # d206: the prune round closing the SentencePiece loop (seed → EM
    # → prune → re-EM); d207: PSL v1→v2 drift matrix (the audit a
    # domain-keyed pipeline runs before adopting a PSL update).
    "d206_unigram_prune_round",
    "d207_psl_version_drift",
    # ---- (C) re-proofs: registrable_domain/_sql re-expressed as thin
    # faces over the generalized PSL compiler (wildcard/exception
    # support, rule list as a parameter). Values are bit-identical
    # (tests/test_psl.py::test_embedded_subset_face_unchanged) but
    # the AST changed, so proof_audit stages the whole domain family.
    "d157_registrable_domains",
    "d158_domain_frequency_cap",
    "d159_domain_blocklist_screen",
    "d160_domain_quality_rollup",
    "d161_domain_skew_profile",
    "d163_domain_quality_topk",
    "d164_domain_stratified_sample",
    "d165_public_suffix_rollup",
    "d166_domain_dup_locality",
    "d168_domain_template_shingles",
    "d169_domain_coverage_curve",
    "d170_domain_token_waterfill",
    "d171_path_rule_screen",
    "d172_domain_mirror_candidates",
    "d173_domain_curation_funnel",
    "d175_url_canonical_dedup",
    "d176_rank_biased_overlap",
]
# The window above is exactly 50 entries (the driver's check depth):
# 20 round-8 proof-debt conversions + 13 round-9 additions (waves
# 58-62) + 17 proof_audit-demanded domain-family re-proofs.


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
