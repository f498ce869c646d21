"""Range (interval-containment) join — the no-equality-key time join.

``points ⋈ intervals ON point.ts BETWEEN interval.start AND interval.end``
has no equi-key, so Spark's only native plan is a nested-loop join —
O(|points|·|intervals|) unless one side broadcasts. The scale path here
is the standard bucketization rewrite:

1. Pick a bucket width W (seconds). Each point maps to ONE bucket
   ``floor(epoch(ts)/W)``; each interval EXPLODES to every bucket it
   overlaps (``sequence(floor(start/W), floor(end/W))``).
2. Equi-join on the bucket id — now it's a plain hash-partitioned join.
3. Re-check the exact range predicate.

A (point, interval) pair can only meet in the point's single bucket, so
no dedup pass is needed. Interval duplication is bounded by
``len(interval)/W + 1`` — choose W near the typical interval length so
the blow-up stays ~2×. Skewed hot buckets fall out of AQE's skew-join
handling like any other equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 300,
) -> DataFrame:
    """Inner join of each point to every interval containing it
    (inclusive bounds). Column sets must be disjoint apart from none —
    both sides' columns are kept."""
    w = F.lit(int(bucket_width_s))
    pb = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts_col)) / w).cast("long")
    )
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "__bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
