"""Partition-layout tests: hive-partitioned writes + pruning at read.

At 100 TB the cheapest scan is the one that never happens: data written
``partitionBy(key)`` lets a key predicate prune whole directories
before any IO. The reference gets a crude version via S3 prefix rules
(SURVEY §4); this is the Spark-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory pruning),
    # NOT in PushedFilters/DataFilters (row-level, after IO)
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters:")[1].split("]")[0]

    want = events.filter(F.col("event_type") == "click").count()
    assert df.count() == want


def test_partition_values_roundtrip(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_part")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out)
    got = {
        r.event_type: r.n
        for r in back.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
