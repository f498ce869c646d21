"""As-of join semantics: inclusivity at equal timestamps, nulls before
any right row, atomic payload carry, and the single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from kaggle_data_pipeline_with_aws_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(5)),   # before any quote -> null
            (2, "u1", _ts(10)),  # exactly at quote ts -> inclusive match
            (3, "u1", _ts(25)),  # latest prior is ts=20
            (4, "u2", _ts(50)),  # other key
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), 1.0, "a"),
            ("u1", _ts(20), 2.0, None),  # null field must ride along atomically
            ("u2", _ts(40), 9.0, "c"),
        ],
        ["user_id", "ts", "price", "tag"],
    )
    out = asof_join(left, right, on="user_id", ts_col="ts")
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["price_asof"] is None and rows[1]["tag_asof"] is None
    assert rows[2]["price_asof"] == 1.0 and rows[2]["tag_asof"] == "a"
    # event 3 must carry the WHOLE ts=20 row: price=2.0 AND tag=None —
    # not tag="a" leaking from the earlier row
    assert rows[3]["price_asof"] == 2.0 and rows[3]["tag_asof"] is None
    assert rows[4]["price_asof"] == 9.0
    assert len(rows) == 4  # left rows preserved 1:1


def test_asof_join_single_shuffle(spark):
    left = spark.range(100).selectExpr(
        "id AS event_id", "CAST(id % 5 AS STRING) AS user_id",
        "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts",
    )
    right = spark.range(20).selectExpr(
        "CAST(id % 5 AS STRING) AS user_id",
        "timestamp_micros(CAST(id * 3000000 AS LONG)) AS ts",
        "CAST(id AS DOUBLE) AS v",
    )
    out = asof_join(left, right, on="user_id", ts_col="ts")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # each row crosses exactly one exchange: the window's hash partition
    # on the key reaches both union branches (one Exchange node per
    # branch, same partitioning) — and nothing else shuffles
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([^,)]+)", plan)
    assert exchanges and all(
        kind == "hashpartitioning" and key.startswith("user_id")
        for kind, key in exchanges
    ), exchanges
    assert "SortMergeJoin" not in plan  # no join at all, just the window
