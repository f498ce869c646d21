"""Skew- and shuffle-management operators.

The reference never needed these (3k matches, one process); they are
what its operator set requires to survive 100 TB:

- **Salted join**: a hot key (one team's matches, one stop-shingle, one
  power user) lands an entire join partition on one task. Salting
  splits each hot left-side key into ``salt`` shards and replicates the
  matching right-side rows per shard — same result set, bounded task
  size. AQE's skew-join split handles sort-merge cases adaptively;
  explicit salting is for when the skew is known and extreme (or the
  join is broadcast-ineligible).

- **Bucketed co-located join**: both sides pre-bucketed on the join key
  make the join shuffle-free at read time — the 100 TB pattern for a
  fact table joined repeatedly on the same key. (Requires a metastore
  table, i.e. ``saveAsTable``; path-based parquet does not retain
  bucket specs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's keys salted ``salt`` ways.

    left gets a random-ish (hash-derived, deterministic) shard id in
    [0, salt); right is replicated once per shard via a literal-array
    explode. The join key becomes (key, shard) — hot keys now spread
    across ``salt`` tasks. Result rows are identical to the unsalted
    join; only the partitioning of work changes.
    """
    shard = F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()),
                   F.lit(salt)).cast("int")
    l_salted = left.withColumn("__shard", shard)
    r_salted = right.withColumn(
        "__shard",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return l_salted.join(r_salted, [on, "__shard"], how).drop("__shard")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) metastore table.

    Two tables bucketed identically on the join key join WITHOUT an
    exchange on either side — the pattern for repeated large-large
    joins on a stable key (orders ⋈ lineitem and friends).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
