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
# Round-7 window, per the round-6 verdict's "Next round" list:
# (1) the 9 substrate-switch re-proofs staged at the end of round 6 —
#     d06/d07/d42/d108 moved onto the shared ranked-shingle / MinHash-
#     signature substrate (operators/text_substrate.py; equivalence
#     pinned in tests/test_text_substrate.py) and d62/d63/d64/d122/d132
#     whose kNN store mechanics moved into operators/substrate_store.py;
# (2) d115/d126 re-proofs: green in r6, but round 7 added version GC +
#     two ADVICE race/memo fixes to substrate_store.py, which sits in
#     their dependency closure — the audit rule re-proves them;
# (3) the 10 never-proven wave-33-36 queries (d140-d149), three of
#     them reworked this round (d140 order-free quantized weight sum,
#     d146 engine-exact order-statistic leg, d148 single-scan stack);
# (4) d15 — re-registered on a deterministic fitted quantizer (one
#     exact Lloyd step from seeded centroids) WITH a full value oracle
#     (verdict #2: was the registry's only rows-only check);
# (5) the new wave-37-40 queries (d150-d156), never driver-checked;
# (6) d31/d55/d76/d40/d61/d67 — re-proofs after the late-round switch
#     of the last per-run LSH pair/components derivers onto the shared
#     substrates (equivalence pinned in tests/test_text_substrate.py).
# All 35 verified green vs DuckDB at sf0.01 before staging; the
# new/changed ones also 10x-exact and 100x-clean (BENCH_SCALING.md).
_WINDOW_PRIORITY = [
    # ---- re-proofs: text-substrate consumers (staged since round 6) ----
    "d06_ngram_jaccard",
    "d07_minhash_lsh",
    "d42_shingle_containment",
    "d108_incremental_dedup",
    # ---- re-proofs: kNN substrate consumers (store mechanics moved) ----
    "d62_knn_graph",
    "d63_knn_triangles",
    "d64_label_vote",
    "d122_kcore_peel",
    "d132_bfs_hops",
    # ---- re-proofs: substrate_store.py changed this round (GC +
    # ---- ADVICE fixes), and these r6-proven queries read the store ----
    "d115_cross_source_dup_matrix",
    "d126_dedup_threshold_sweep",
    # ---- never-proven: waves 33-36 (added after the r6 window) ----
    "d140_mix_epochs",
    "d141_split_leakage",
    "d142_cluster_safe_split",
    "d143_intra_doc_repetition",
    "d144_label_margin",
    "d145_label_coherence",
    "d146_histogram_quantiles",
    "d147_token_mass_percentiles",
    "d148_join_key_skew",
    "d149_contrastive_pairs",
    # ---- d15 upgraded to a full value oracle (round-6 verdict #2) ----
    "d15_ann_ivf",
    # ---- never-proven: round-7 additions (wave 37+) ----
    "d150_cluster_cohesion",
    "d151_dim_truncation_recall",
    "d152_lsh_band_tuning",
    "d153_ivf_probe_sweep",
    "d154_ivf_cell_balance",
    "d155_ppjoin_cost_estimate",
    # ---- re-proofs: the last per-run LSH pair/components derivers
    # ---- moved onto the shared substrates late in round 7 (d31/d55
    # ---- onto the components artifact; d40/d61/d67 onto the pair
    # ---- substrate; d76 composes d31) — equivalence pinned in
    # ---- tests/test_text_substrate.py, all gate-green at sf0.01/sf0.1
    "d31_dedup_components",
    "d55_canonical_docs",
    "d76_cluster_size_histogram",
    "d40_pagerank",
    "d61_lsh_estimate_error",
    "d67_cross_source_leakage",
    # ---- wave 40 (round 7, never proven) ----
    "d156_cluster_threshold_stability",
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
