"""Wave-35 semantics: mergeable histogram quantile sketch (d146) and
token-mass length percentiles (d147)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave35
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
SF = "/root/testdata/sf0.001"


def test_d146_error_within_one_bucket_width(spark):
    rows = registry.QUERIES["d146_histogram_quantiles"](spark, SF).collect()
    assert [r["q"] for r in rows] == sorted(wave35._HQ_QS)
    for r in rows:
        # the straddling-bucket interpolation can't miss the exact
        # percentile by more than one bucket
        assert r["err_in_widths"] <= 1.0, r
        assert r["est_value"] > 0 and r["exact_value"] > 0


def test_d146_bucket_table_merges_by_addition(spark):
    """The sketch artifact contract: (bucket, count) tables built on
    disjoint halves sum to the full table — what makes the histogram
    mergeable across partitions/streams/days."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )

    def buckets(df):
        return {
            r["bucket"]: r["c"]
            for r in df.select(
                F.floor(F.col("l_extendedprice") / wave35._HQ_WIDTH)
                .cast("long")
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("c"))
            .collect()
        }

    full = buckets(li)
    h1 = buckets(li.filter(F.col("l_orderkey") % 2 == 0))
    h2 = buckets(li.filter(F.col("l_orderkey") % 2 == 1))
    merged: dict[int, int] = {}
    for d in (h1, h2):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_d147_mass_skew_at_least_one(spark):
    """Token-weighted length percentiles can only sit at or above the
    doc-count percentiles (long docs carry more mass)."""
    rows = registry.QUERIES["d147_token_mass_percentiles"](
        spark, SF
    ).collect()
    assert [r["q"] for r in rows] == sorted(wave35._TM_QS)
    for r in rows:
        assert r["len_at_token_q"] >= r["len_at_doc_q"]
        assert r["mass_skew"] >= 1.0


def test_d147_matches_python_replay(spark):
    docs = load_table(spark, SF, "documents").select("text").collect()
    lens = sorted(len(r["text"].split(" ")) for r in docs)
    total_mass = sum(lens)
    total_docs = len(lens)
    for r in registry.QUERIES["d147_token_mass_percentiles"](
        spark, SF
    ).collect():
        q = r["q"]
        cum = 0
        for ln in lens:
            cum += ln
            if cum >= q * total_mass:
                assert r["len_at_token_q"] == ln
                break
        cum_d = 0
        for i, ln in enumerate(lens):
            cum_d = i + 1
            if cum_d >= q * total_docs:
                assert r["len_at_doc_q"] == ln
                break
