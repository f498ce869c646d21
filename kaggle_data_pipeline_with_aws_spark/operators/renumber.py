"""Scalable contiguous global row numbering (SURVEY §2.6 W2).

The reference re-assigns ``match_number = range(1, n+1)`` after a global
sort (``convert_mongo_db_data_to_csv_lambda.py:43-44``) — a total-order-
defined dense sequence over the whole table. The naive Spark translation,
``row_number().over(Window.orderBy(...))``, collapses the entire dataset
into ONE partition (Spark must see a global order), which is fine at 3k
rows and fatal at 100 TB.

Scale path implemented here (two-stage prefix-sum numbering):

1. Range-repartition on the sort keys and sort within each partition —
   partitions are now globally ordered ranges (partition i's keys all
   precede partition i+1's).
2. Per-partition local ``row_number`` (window partitioned by
   ``spark_partition_id()`` — fully parallel, no single-partition sink).
3. A tiny per-partition COUNT (one row per partition) is collected,
   prefix-summed on the driver, and joined back as a broadcast offset
   map: ``global = offset[pid] + local``.

The only driver-side data is one (pid, count) row per partition —
O(partitions), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def contiguous_row_number(
    df: DataFrame,
    order_by: list[str | Column],
    out_col: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 1..N column defined by a total order.

    ``order_by`` should be a total order (include a unique tie-breaker
    key) — same requirement the reference's sort-then-range has
    implicitly via ``(date, match_id)``.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    # Persisted because two jobs (count pass, numbering pass) must see the
    # SAME partitioning; DISK spill keeps this viable beyond memory. At
    # extreme scale swap for rdd.zipWithIndex(), which makes the identical
    # two-pass contract without the cache.
    ranged = ranged.persist()
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())

    local_w = Window.partitionBy("__pid").orderBy(*order_by)
    local = with_pid.withColumn("__local_rn", F.row_number().over(local_w))

    # O(partitions) stats → driver prefix sum → broadcast join back.
    counts = sorted(
        local.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offsets, running = {}, 0
    for row in counts:
        offsets[row["__pid"]] = running
        running += row["count"]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid INT, __offset BIGINT"
    )
    return (
        local.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )
