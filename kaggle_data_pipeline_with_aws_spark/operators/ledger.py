"""Incremental-processing ledger (SURVEY §2.9 T2/T7, §2.4 J2, §2.2 K4).

The reference tracks per-file processing state in a DynamoDB table
(``aws/mens_t20i_dataset_stack.py:53-62``): a full scan builds the
processed set (``download_from_cricsheet_lambda_function.py:80-82``),
new files are detected by membership anti-filter (``:84-94``), and
per-file boolean flags are upserted after each extraction branch
(``utils.py:74-89``). Exactly-once-per-file is a *ledger* property, not
a streaming-watermark property.

Spark realization: a parquet state table + left-anti join for detection
+ union-dedup-overwrite for the upsert (the documented upgrade path is
Delta ``MERGE`` when a transactional table format is on the classpath).

Scale: the ledger has one row per *file* — millions of rows at 100 TB,
comfortably broadcastable; the anti-join broadcasts the ledger, never
shuffles the candidate set.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FILE_STATUS_SCHEMA

MATCHWISE_FLAG = "matchwise_data_extraction_status"
DELIVERYWISE_FLAG = "deliverywise_data_extraction_status"


def read_ledger(spark: SparkSession, state_dir: str) -> DataFrame:
    """S5: ledger scan. Returns an empty typed frame when no state exists."""
    path = os.path.join(state_dir, "file_status")
    try:
        # Drop any stale FileStatusCache listing from a previous overwrite.
        spark.catalog.refreshByPath(path)
        return spark.read.schema(FILE_STATUS_SCHEMA).parquet(path)
    except Exception:  # noqa: BLE001 — first run: no state yet
        return spark.createDataFrame([], FILE_STATUS_SCHEMA)


def detect_new_files(
    candidates: DataFrame, ledger: DataFrame, limit: int | None = None
) -> DataFrame:
    """P5/J2/P9: candidates not yet in the ledger, oldest-name-first,
    capped at ``limit`` per cycle (reference THRESHOLD=10,
    ``download...py:115``).

    ``candidates`` needs a ``file_name`` column. Left-anti join against
    the broadcast ledger reproduces the set-membership check without
    collecting anything to the driver.
    """
    fresh = candidates.join(
        F.broadcast(ledger.select("file_name")), "file_name", "left_anti"
    )
    if limit is not None:
        fresh = fresh.orderBy("file_name").limit(limit)
    return fresh


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched: dict[str, Column] | None = None,
    insert_values: dict[str, Column] | None = None,
    delete_condition: Column | None = None,
) -> DataFrame:
    """The Delta-style ``MERGE`` face for K4/T7 (the documented upgrade
    path from ``upsert_status``'s union-dedup-overwrite — reference
    semantics at ``utils.py:74-89``): one relational expression with
    all three clauses.

    - WHEN MATCHED [AND ``delete_condition``] THEN DELETE
    - WHEN MATCHED THEN UPDATE SET ``when_matched`` (exprs may
      reference both sides via the ``t.``/``s.`` aliases; unnamed
      columns keep the target value)
    - WHEN NOT MATCHED THEN INSERT (``insert_values`` overrides,
      else the source's same-named column, else typed NULL)
    - WHEN NOT MATCHED BY SOURCE: target row carried unchanged

    Output schema = target schema. Scale shape: ONE full-outer
    equi-join on the key — shuffles both sides once on the merge key
    (co-located and shuffle-free when target and source are bucketed
    on it); every clause is a projection over that join, so MERGE
    costs exactly one shuffle regardless of clause count. Under a
    transactional table format the same plan becomes ``DeltaTable
    .merge``; this face keeps the semantics available on plain
    parquet."""
    when_matched = when_matched or {}
    insert_values = insert_values or {}
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = source.withColumn("__s", F.lit(True)).alias("s")
    joined = t.join(s, keys, "full_outer")
    matched = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
    if delete_condition is not None:
        joined = joined.filter(~(matched & F.coalesce(delete_condition, F.lit(False))))
    out_cols: list[Column] = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.col(c))  # coalesced by the USING join
            continue
        upd = when_matched.get(c, F.col(f"t.{c}"))
        if c in insert_values:
            ins = insert_values[c]
        elif c in source.columns:
            ins = F.col(f"s.{c}")
        else:
            ins = F.lit(None).cast(target.schema[c].dataType)
        out_cols.append(
            F.when(matched, upd)
            .when(F.col("s.__s").isNotNull(), ins)
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
        )
    return joined.select(*out_cols)


def upsert_status(
    spark: SparkSession,
    state_dir: str,
    file_names: DataFrame,
    flag: str,
) -> None:
    """K4/T7: set ``flag = true`` for the given file_names, idempotently.

    Read-union-dedup-overwrite: last-writer-wins per key, keeping the
    other branch's flag value (a true per-column merge like DynamoDB's
    ``SET field = :val``). Replays converge to the same state — the
    ledger is the idempotency mechanism, exactly as in the reference.
    """
    path = os.path.join(state_dir, "file_status")
    current = read_ledger(spark, state_dir)
    updates = file_names.select("file_name").withColumn(flag, F.lit(True))

    flag_cols = []
    for col in (MATCHWISE_FLAG, DELIVERYWISE_FLAG):
        if col == flag:
            flag_cols.append(
                F.coalesce(F.col(f"u.{flag}"), F.col(f"c.{flag}")).alias(flag)
            )
        else:
            flag_cols.append(F.col(f"c.{col}").alias(col))
    merged = (
        current.alias("c")
        .join(updates.alias("u"), "file_name", "full_outer")
        .select("file_name", *flag_cols)
    )
    # Overwrite via staging: the ledger is file-count-sized, so the
    # rewrite is cheap; swap for Delta MERGE at petabyte file counts.
    staging = path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    spark.catalog.refreshByPath(staging)
    final = spark.read.schema(FILE_STATUS_SCHEMA).parquet(staging)
    final.write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)
