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
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return registry.QUERIES["q01_pricing_summary"](spark, SF0001)


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order, so ordering is part of the contract. CORRECTNESS_r{N}
# files are cumulative proof, so each round the window holds (a) queries
# whose implementation or oracle changed since their last green row —
# they must re-prove (now ENFORCED by tools/proof_audit.py, gate
# stage 4: symbol-level AST diff of each proven query's dependency
# closure against its proof-baseline commit) — and (b) as many
# never-driver-checked oracle-backed queries as fit.
#
# Round-5 window: 16 re-proofs first. Seven carry this round's
# changes — q17/d66/d82/d93 (contiguous_row_number gained an
# `accuracy` parameter for the q17 bench re-pin; results identical
# for default callers, but the rule is any impl change re-proves),
# d11/d51 (real BMP/WAV decode tier), d62/d63/d64 (mutual-kNN edges
# now served from the materialize-once parquet substrate). Nine are
# LEGACY staleness the new audit uncovered — queries proven in r1-r3
# whose dependency symbols changed in later rounds without re-proof
# (d01/d08 via dedup constants+fingerprints, d09 via the cosine
# helpers, d31/d40 via minhash_signatures_vectorized, s01/s02 via
# their streaming twins) — all locally gate-green every round, but
# claims-not-proof until re-proven. Then d122/d132 (graph consumers
# whose impl changed with the substrate + BFS lineage fix), then the
# OLDEST 32 of the wave-12-31 proof queue. The remaining ~35 queued
# queries stay staged after the window via _ordered()'s rest_oracle
# block for round 6 (joined by wave 32's d137/d138/d139, added after
# this window was sealed — 38 queued total, fits the one-window
# budget); rows-only twins (d15/d23) stay dead last.
_WINDOW_PRIORITY = [
    # re-proofs: implementation changed after an earlier green row
    "q17_global_renumber",
    "d66_sorted_neighborhood",
    "d82_perplexity_buckets",
    "d93_quantile_normalize",
    "d11_multimodal_features",
    "d51_image_patches",
    "d62_knn_graph",
    "d63_knn_triangles",
    "d64_label_vote",
    "d01_dedup_exact",
    "d08_simhash",
    "d09_ann_topk",
    "d31_dedup_components",
    "d40_pagerank",
    "s01_windowed_event_counts",
    "s02_session_windows",
    # substrate/BFS impl-changed graph queries, never yet proven
    "d122_kcore_peel",
    "d132_bfs_hops",
    # proof queue, oldest waves first (12-14)
    "s10_windowed_kmv_users",
    "s11_segment_event_counts",
    "q87_forecast_revenue",
    "q88_profit_by_nation_year",
    "q89_late_priority_matrix",
    "q90_customer_order_distribution",
    "q91_promo_revenue_share",
    "q92_top_supplier",
    "q93_part_supplier_variety",
    "q94_small_quantity_revenue",
    "q95_qualified_shippers",
    "d98_pii_screen",
    "d99_gopher_quality_rules",
    "d100_padding_waste",
    "d101_bigram_diversity",
    "d102_lang_margin",
    "d103_filter_funnel",
    "q96_fk_orphan_audit",
    "q97_customer_journey",
    "q98_modal_value_bucket",
    "d104_jackknife_variance",
    "d105_gram_matrix",
    "d106_pca_top_component",
    # waves 15-16
    "q99_value_ecdf",
    "q100_region_nation_rollup",
    "d107_pq_codes",
    "d108_incremental_dedup",
    "d109_hapax_ratio",
    "d110_semdedup",
    "d111_logreg_steps",
    "d112_calibration_curve",
    # late re-proof: the round-5 sf0.1 robustness sweep caught q61's
    # avg() crossing a round(,6) boundary cross-engine (1 row of 3,498
    # at sf0.1; invisible at the sf0.01 driver scale) — fixed with a
    # sorted-fold mean and swapped into the window's last slot
    # (q101_ab_ztest moves to the head of the round-6 queue).
    "q61_min_cost_supplier",
    # ---- position 51+: BEYOND this round's 50-slot window ----
    # q38: the 10× sweep caught half-cent double-summation ties
    # flipping its rank order between engines; revenue now sums in
    # exact DECIMAL money arithmetic. The impl change invalidates its
    # r2 proof, so it is staged here — head of the round-6 queue —
    # satisfying the proof audit while the 50 slots above keep their
    # committed order.
    "q38_supplier_revenue_rank",
    # d95: same sweep — engine-native avg/stddev_pop accumulation
    # algorithms diverged ~2e-8 at 20k vectors, flipping rounded
    # z-scores; stats now derive from exact integer micro-unit
    # moments. r4 proof invalidated; staged for round 6.
    "d95_embedding_norm_outliers",
    # round-5 performance pass on the three 10× hotspots the r4 run
    # flagged: pair enumeration moved INSIDE tasks (bucket-local /
    # block-pair numpy kernels, fold-order-exact, survivors-only
    # output) — d10 182→9.7 s, d53 65→6.8 s, d85 66→5.5 s at 10×,
    # value-exact at sf0.001/sf0.01. Impl changes invalidate their
    # r2/r3/r4 proofs; staged here for round 6.
    "d10_embedding_neardup",
    "d53_translation_candidates",
    "d85_translation_length_filter",
    # the 100× full-registry sweep found d69's hot (lang, bucket)
    # block running as one ~15-min join-key straggler task; both
    # blocked-linkage queries now enumerate pairs via
    # dedup.salted_block_pairs (identical pair set, sub-block join
    # groups). Impl changes invalidate their r3 proofs; staged for
    # round 6.
    "d69_edit_distance_linkage",
    "d43_fuzzy_prefix_match",
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
