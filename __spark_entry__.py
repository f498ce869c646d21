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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return registry.QUERIES["q01_pricing_summary"](spark, SF0001)


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order, so ordering is part of the contract. CORRECTNESS_r{N}
# files are cumulative proof, so each round the window holds (a) queries
# whose implementation or oracle changed since the last check — they
# must re-prove — and (b) as many never-driver-checked oracle-backed
# queries as fit, one representative per operator family first.
# Round-2 window: q06/q13 re-prove the BIGINT oracle casts; d07/d10/d13
# re-prove the vectorized-signature + banded-LSH rewrites; the other 45
# slots are first-time checks (incl. q48/d46/q51 whose latent type bugs
# were fixed, all five streaming faces, sketches, sampling, LM scoring,
# graph ops). Family-redundant twins (e.g. d21 keep-first vs checked
# d01, d44 bigram vs d33 unigram) wait for round 3. Rows-only twins
# (no oracle possible) stay dead last so they never burn a slot.
_WINDOW_PRIORITY = [
    # re-prove after this round's changes
    "q06_null_profile",
    "q13_conditional_count",
    "d07_minhash_lsh",
    "d10_embedding_neardup",
    "d13_ann_lsh",
    # first-time driver checks
    "d14_simhash_pairs",
    "d16_text_clean",
    "d17_quality_filter",
    "d18_vocabulary",
    "d19_hash_sample",
    "d20_ann_ivf_fixed",
    "d22_bpe_token_count",
    "d24_decontaminate",
    "d26_stratified_sample",
    "d27_source_lang_matrix",
    "d28_kmv_distinct",
    "d29_label_centroids",
    "d30_tfidf_top_terms",
    "d31_dedup_components",
    "d40_pagerank",
    "d33_unigram_logprob",
    "d34_chunk_documents",
    "d41_countmin_heavy_hitters",
    "d42_shingle_containment",
    "d46_ngram_novelty",
    "d47_histogram_quantiles",
    "d49_weighted_sample",
    "d50_pmi_collocations",
    "d52_source_kl_divergence",
    "d54_zipf_slope",
    "q37_customer_value_quartiles",
    "q39_orders_above_customer_avg",
    "q40_customers_with_urgent_orders",
    "q41_status_priority_cube",
    "q42_retained_customers",
    "q43_event_funnel",
    "q47_length_histogram",
    "q48_json_payload_stats",
    "q49_unpivot_order_measures",
    "q50_mad_outliers",
    "q51_session_conversion",
    "q53_rolling_median",
    "q54_cohort_retention",
    "q55_value_autocorrelation",
    "q56_revenue_shares",
    "s01_windowed_event_counts",
    "s02_session_windows",
    "s03_first_arrival_dedup",
    "s04_click_view_attribution",
    "s05_unattributed_clicks",
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
