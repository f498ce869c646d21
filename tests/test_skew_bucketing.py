"""Tests for salted joins and bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators.skew import (
    salted_join,
    write_bucketed,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table


def test_salted_join_same_result_as_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", salt=4)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    got = {(r.l_orderkey, r.n, round(r.q, 6)) for r in salted.collect()}
    want = {(r.l_orderkey, r.n, round(r.q, 6)) for r in plain.collect()}
    assert got == want


def test_salted_join_spreads_hot_key(spark):
    # one pathological key with 10k rows + a normal tail
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(100).select(
        (F.col("id") + 2).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionByName(tail)
    right = spark.range(200).select(F.col("id").alias("k"), F.lit("d").alias("v"))
    out = salted_join(left, right, "k", salt=8)
    assert out.count() == 10_100  # hot k=1 (10k rows) + tail k=2..101
    # the hot key's rows really do take distinct shard values
    shard = F.pmod(
        F.xxhash64(F.col("k"), F.monotonically_increasing_id()), F.lit(8)
    ).cast("int")
    n_shards = (
        left.filter(F.col("k") == 1)
        .withColumn("__shard", shard)
        .select("__shard")
        .distinct()
        .count()
    )
    assert n_shards == 8


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(o, "orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"), "o_orderkey"
    )
    # co-located: no Exchange on either side (disable auto-broadcast so
    # the test exercises the bucket path, not a broadcast shortcut)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "Exchange" not in plan
    assert joined.count() == li.count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
