"""KMV (k-minimum-values) distinct-count sketch.

``approx_count_distinct`` (HyperLogLog) is the usual Spark answer, but
its estimate is engine-specific — no cross-engine oracle can check it.
KMV with the portable md5 hash is *deterministic*: the k smallest
distinct hash values, and therefore the estimate, are bit-identical in
any engine that implements md5. Estimate (for k-th smallest distinct
hash ``h_k`` over a hash space of size M):

    D̂ = (k − 1) · M / h_k

Scale shape: hash each value (map-side), global top-k-smallest via
``orderBy().limit(k)`` — Spark's TakeOrderedAndProject computes per-
partition top-k then merges k·partitions rows on the driver; nothing
close to the data size ever moves. Sketches of partitions/streams can
be unioned (take the k smallest of the union) — the standard mergeable-
sketch property, usable for incremental distinct counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import HASH_MOD, portable_hash


def kmv_distinct_estimate(
    df: DataFrame, col: str | Column, k: int = 256
) -> DataFrame:
    """One-row DataFrame: (k, kth_min_hash, est_distinct) for the
    distinct count of ``col``. Exact duplicates of a hash value are
    collapsed before ranking (KMV is defined on distinct hashes)."""
    c = col if isinstance(col, Column) else F.col(col)
    hashes = (
        df.select(portable_hash(c.cast("string")).alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    return hashes.agg(
        F.count("*").cast("long").alias("k"),
        F.max("__h").alias("kth_min_hash"),
        F.round(
            (F.count("*") - 1) * F.lit(float(HASH_MOD)) / F.max("__h"), 6
        ).alias("est_distinct"),
    )
