"""Semantic unit tests for wave 9 (q78, q79, d83, d84, d85, s09)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q78_growth_arithmetic(spark):
    rows = Q["q78_mom_revenue_growth"](spark, SF).collect()
    assert rows
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r["month"])
        assert rs[0]["mom_growth"] is None  # no prior month
        for prev, cur in zip(rs, rs[1:]):
            if cur["mom_growth"] is not None:
                expect = round(cur["revenue"] / prev["revenue"] - 1, 6)
                assert abs(cur["mom_growth"] - expect) < 1e-9, nation


def test_q79_pairs_bounded_by_order_lines(spark):
    rows = Q["q79_copurchase_pairs"](spark, SF).collect()
    assert len(rows) == 25
    li = load_table(spark, SF, "lineitem")
    # recompute one pair's support brute-force
    top = sorted(rows, key=lambda r: r["rk"])[0]
    orders_with_both = (
        li.filter(F.col("l_partkey").isin([top["part_1"], top["part_2"]]))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("k"))
        .filter("k = 2")
        .count()
    )
    assert top["n_orders"] == orders_with_both
    for r in rows:
        assert r["part_1"] < r["part_2"]


def test_d83_survivorship_accounting(spark):
    rows = Q["d83_dedup_survivorship"](spark, SF).collect()
    d = load_table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    n_kept_total = sum(r["n_kept"] for r in rows)
    assert n_kept_total == d.groupBy("text").count().count()  # distinct texts
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert 0.0 <= r["drop_rate"] <= 1.0


def test_d84_shards_partition_corpus_and_balance(spark):
    rows = Q["d84_shard_assignment"](spark, SF).collect()
    d = load_table(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    assert all(0 <= r["shard"] < 64 for r in rows)
    sizes = [r["n_docs"] for r in rows]
    # 500 docs over 64 shards: hash balance keeps the max reasonable
    assert max(sizes) <= 10 * max(1, min(sizes) or 1)


def test_d85_filter_is_subset_with_ratio_bounds(spark):
    kept = Q["d85_translation_length_filter"](spark, SF).collect()
    cand = Q["d53_translation_candidates"](spark, SF).collect()
    cand_pairs = {(r["id_1"], r["id_2"]) for r in cand}
    for r in kept:
        assert (r["id_1"], r["id_2"]) in cand_pairs
        assert 0.5 <= r["len_ratio"] <= 2.0


def test_s09_zscore_rule(spark):
    rows = Q["s09_event_rate_anomaly"](spark, SF).collect()
    for r in rows:
        assert abs(r["zscore"]) > 3.0
    # the hourly series itself must reconcile with raw counts
    ev = load_table(spark, SF, "events")
    hours = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    lut = {r["h"]: r["n"] for r in hours}
    for r in rows:
        assert lut[r["hour"]] == r["n_events"]
