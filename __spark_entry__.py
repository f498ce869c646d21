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
BENCH_EXTRA = ["d06_ngram_jaccard", "d42_shingle_containment", "d110_semdedup"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return registry.QUERIES["q01_pricing_summary"](spark, SF0001)


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order, so ordering is part of the contract. CORRECTNESS_r{N}
# files are cumulative proof, so each round the window holds (a) queries
# whose implementation or oracle changed since the last check — they
# must re-prove — and (b) as many never-driver-checked oracle-backed
# queries as fit. Round-4 window: the impl-changed re-proofs FIRST —
# d07 (per-batch md5 memo, r2-proven then changed), d06 (PPJoin
# prefix-filter rewrite + this round's float-ulp ceil guard), d42
# (this round's asymmetric-PPJoin containment rewrite of the last
# quadratic self-join) — then the 28 wave-6–9 queries added after the
# round-3 window sealed (all locally oracle-green at sf0.01; d82 also
# carries this round's prefix-sum decile rewrite), then the new
# round-4 wave-10 operators in the remaining slots. Rows-only twins
# (d15/d23, no oracle possible by design) stay dead last so they
# never burn a slot.
_WINDOW_PRIORITY = [
    # re-proofs: implementation changed after an earlier green row
    "d07_minhash_lsh",
    "d06_ngram_jaccard",
    "d42_shingle_containment",
    # wave 6 (first-time driver checks)
    "q67_nation_trade_matrix",
    "q68_returned_items",
    "q69_large_volume_customers",
    "q70_disjunctive_join_revenue",
    "q71_dormant_rich_customers",
    "q72_event_transition_matrix",
    "d74_bpe_merge_candidates",
    "d75_langid_confusion",
    "d76_cluster_size_histogram",
    "d77_stopword_discovery",
    "d78_neyman_allocation",
    "d79_blocklist_screen",
    "s07_running_user_totals",
    # wave 7
    "q73_value_trend_per_type",
    "q74_scd2_user_state",
    "s08_late_event_audit",
    "d80_similarity_histogram",
    "d81_column_profile",
    # wave 8 (d82 re-proves its prefix-sum decile rewrite)
    "q75_event_sequence_detection",
    "q76_cumulative_unique_users",
    "q77_join_skew_audit",
    "d82_perplexity_buckets",
    # wave 9
    "q78_mom_revenue_growth",
    "q79_copurchase_pairs",
    "d83_dedup_survivorship",
    "d84_shard_assignment",
    "d85_translation_length_filter",
    "s09_event_rate_anomaly",
    # wave 10 (new this round; locally oracle-green at sf0.01)
    "q80_grouping_sets_revenue",
    "q81_merge_upsert",
    "q82_relational_division",
    "q83_priority_pivot",
    "q84_range_frame_totals",
    "d86_train_split",
    "d87_overlap_chunks",
    "d88_winnowing",
    "d89_contamination_score",
    "d90_embedding_dim_variance",
    "d91_hard_negatives",
    "d92_vocab_growth",
    # wave 11 (new this round; locally oracle-green at sf0.01) —
    # fills the 50-slot window exactly. Waves 12-31 (q87-q113,
    # d98-d136, s10-s13 — the further queries added later in round 4)
    # queue immediately after the window via _ordered()'s rest_oracle
    # block: ALL are locally oracle-green at sf0.01 (tools/gate.sh +
    # per-wave check_correctness runs) and form the staged proof
    # queue for the round-5 window. s08's impl changed late in round
    # 4 (distributed running max) — it is ALREADY in this round's
    # window below, so its proof row will reflect the new plan.
    "q85_events_since_purchase",
    "q86_except_all_views",
    "d93_quantile_normalize",
    "d94_vocab_coverage",
    "d95_embedding_norm_outliers",
    "d96_lang_profile_cosine",
    "d97_length_token_correlation",
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
