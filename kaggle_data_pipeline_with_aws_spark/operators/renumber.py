"""Scalable contiguous global row numbering (SURVEY §2.6 W2).

The reference re-assigns ``match_number = range(1, n+1)`` after a global
sort (``convert_mongo_db_data_to_csv_lambda.py:43-44``) — a total-order-
defined dense sequence over the whole table. The naive Spark translation,
``row_number().over(Window.orderBy(...))``, collapses the entire dataset
into ONE partition (Spark must see a global order), which is fine at 3k
rows and fatal at 100 TB.

Scale path implemented here (two-stage prefix-sum numbering, ONE
shuffle total):

1. Range-repartition on the sort keys and sort within each partition —
   partitions are now globally ordered ranges (partition i's keys all
   precede partition i+1's). This is the only row-level shuffle.
2. ``monotonically_increasing_id()`` over the sorted partitions:
   its layout is ``(partition_id << 33) | in-partition counter``, so
   the lower 33 bits ARE the local 0-based row number in sorted order —
   no window function, and crucially no second (hash-partition) shuffle
   that ``row_number().over(partitionBy(pid))`` would force on the
   already-range-partitioned data.
3. A tiny per-partition COUNT (one row per partition) is collected,
   prefix-summed on the driver, and joined back as a broadcast offset
   map: ``global = offset[pid] + local + 1``.

The only driver-side data is one (pid, count) row per partition —
O(partitions), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: pid << 33 | local counter
_LOCAL_MASK = (1 << _LOCAL_BITS) - 1


def contiguous_row_number(
    df: DataFrame,
    order_by: list[str | Column],
    out_col: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 1..N column defined by a total order.

    ``order_by`` must be a total order (include a unique tie-breaker
    key) — same requirement the reference's sort-then-range has
    implicitly via ``(date, match_id)``.

    The persist below is LOAD-BEARING, not an optimization: the count
    pass and the numbering pass are separate actions, which compile to
    separate physical plans — ``repartitionByRange`` re-SAMPLES its
    boundaries per plan, so without a materialization barrier the two
    passes can see different partition assignments and the offsets
    won't line up (observed: ~off-by-a-few on 15k rows). Spill-to-disk
    keeps it viable beyond executor memory.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    withid = ranged.withColumn("__mid", F.monotonically_increasing_id()).persist()
    pid = F.shiftrightunsigned(F.col("__mid"), _LOCAL_BITS).cast("int")
    local = F.col("__mid").bitwiseAND(F.lit(_LOCAL_MASK))

    # O(partitions) stats → driver prefix sum → broadcast join back.
    counts = sorted(
        withid.groupBy(pid.alias("__pid")).count().collect(),
        key=lambda r: r["__pid"],
    )
    offsets, running = {}, 0
    for row in counts:
        offsets[row["__pid"]] = running
        running += row["count"]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(p, off) for p, off in offsets.items()], "__pid INT, __offset BIGINT"
    )
    return (
        withid.withColumn("__pid", pid)
        .join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, (F.col("__offset") + local + 1).cast("long"))
        .drop("__pid", "__mid", "__offset")
    )
