"""Range join vs brute force; KMV sketch accuracy + mergeability."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators.interval import (
    interval_point_join,
)
from kaggle_data_pipeline_with_aws_spark.operators.sketch import (
    kmv_distinct_estimate,
)


def test_interval_point_join_matches_brute_force(spark):
    base = dt.datetime(2024, 3, 1)
    points = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=37 * i)) for i in range(200)],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (
                j,
                base + dt.timedelta(seconds=250 * j),
                # deliberately varied lengths incl. bucket-straddling ones
                base + dt.timedelta(seconds=250 * j + 40 + 173 * (j % 5)),
            )
            for j in range(30)
        ],
        ["iid", "start_ts", "end_ts"],
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_point_join(
            points, intervals, "ts", "start_ts", "end_ts", bucket_width_s=120
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
        .collect()
    )
    assert got == want and len(want) > 0


def test_kmv_estimate_tracks_true_distinct(spark):
    n_distinct = 5000
    df = spark.range(20000).select(
        (F.col("id") % n_distinct).cast("string").alias("v")
    )
    row = kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert row["k"] == 256
    # KMV standard error ~ 1/sqrt(k-1) ≈ 6%; allow 4 sigma
    assert abs(row["est_distinct"] - n_distinct) / n_distinct < 0.25


def test_kmv_is_mergeable(spark):
    """Sketching two halves and merging (k smallest of the union) must
    equal sketching the whole — the property that makes KMV usable for
    incremental/streaming distinct counts."""
    df = spark.range(10000).select((F.col("id") % 777).cast("string").alias("v"))
    whole = kmv_distinct_estimate(df, "v", k=64).collect()[0]
    h1 = df.filter(F.col("id") < 5000)
    h2 = df.filter(F.col("id") >= 5000)
    from kaggle_data_pipeline_with_aws_spark.operators.text import portable_hash

    merged_hashes = (
        h1.select(portable_hash(F.col("v")).alias("__h"))
        .union(h2.select(portable_hash(F.col("v")).alias("__h")))
        .distinct()
        .orderBy("__h")
        .limit(64)
    )
    merged = merged_hashes.agg(F.max("__h").alias("kth")).collect()[0]
    assert merged["kth"] == whole["kth_min_hash"]


def test_bloom_no_false_negatives_and_prunes(spark):
    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(50)], "k string"
    )
    probes = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], "k string"
    )
    bloom = bloom_build(members, "k", m_bits=1024, k=4)
    out = bloom_probe(probes, "k", bloom, m_bits=1024, k=4).collect()
    hits = {r["k"] for r in out if r["bloom_member"] == 1}
    # every true member must pass (no false negatives)
    assert all(f"key{i}" in hits for i in range(50))
    # the filter must actually prune most non-members at this m/k
    assert len(hits) < 100
