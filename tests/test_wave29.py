"""Semantic unit tests for wave 29 (s13, d131)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave29 import _FORGET_MOD
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_s13_estimates_dominate_truth(spark):
    rows = Q["s13_windowed_countmin"](spark, SF).collect()
    assert rows
    for r in rows:
        # the count-min guarantee — never an undercount
        assert r["est_count"] >= r["true_n"], (r["win_start"], r["event_type"])
    # true counts reconcile with the event table
    ev = load_table(spark, SF, "events").collect()
    from collections import Counter

    want = Counter(
        (
            e["ts"].replace(minute=0, second=0, microsecond=0),
            e["event_type"],
        )
        for e in ev
    )
    got = {(r["win_start"], r["event_type"]): r["true_n"] for r in rows}
    assert got == dict(want)
    # with only 5 candidate types in 64 buckets, most probes are exact
    exact = sum(1 for r in rows if r["est_count"] == r["true_n"])
    assert exact / len(rows) > 0.5


def test_s13_sketch_aggregate_is_streamable_shape(spark, sf_dir):
    """The sketch half must be a single groupBy aggregate (no window
    function, no join before the counters) — the streamable part."""
    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.plans.wave29 import (
        _CM_DEPTH,
        _CM_SALT,
        _CM_WIDTH,
    )
    from kaggle_data_pipeline_with_aws_spark.operators.text import (
        portable_hash,
    )

    ev = load_table(spark, sf_dir, "events")
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    F.pmod(
                        portable_hash(
                            F.concat(
                                F.lit(f"{_CM_SALT}{j}|"), F.col("event_type")
                            )
                        ),
                        F.lit(_CM_WIDTH),
                    ).alias("bucket"),
                )
                for j in range(_CM_DEPTH)
            ]
        )
    ).alias("rb")
    cm = (
        ev.select(F.window("ts", "1 hour").alias("win"), rb)
        .select("win", "rb.row", "rb.bucket")
        .groupBy("win", "row", "bucket")
        .agg(F.count("*").alias("n"))
    )
    plan = cm._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # counters bounded: at most depth*width rows per window
    per_win = cm.groupBy("win").count().collect()
    assert all(r["count"] <= _CM_DEPTH * _CM_WIDTH for r in per_win)


def test_d131_cascade_reconciles(spark):
    rows = {r["tbl"]: r for r in Q["d131_forget_purge_audit"](spark, SF).collect()}
    cust = load_table(spark, SF, "customer").collect()
    orders = load_table(spark, SF, "orders").collect()
    li = load_table(spark, SF, "lineitem").collect()
    ev = load_table(spark, SF, "events").collect()
    fc = {c["c_custkey"] for c in cust if c["c_custkey"] % _FORGET_MOD == 0}
    po = {o["o_orderkey"] for o in orders if o["o_custkey"] in fc}
    pl = sum(1 for l in li if l["l_orderkey"] in po)
    pe = sum(1 for e in ev if e["user_id"] % _FORGET_MOD == 0)
    assert rows["customer"]["n_purged"] == len(fc)
    assert rows["orders"]["n_purged"] == len(po)
    assert rows["lineitem"]["n_purged"] == pl
    assert rows["events"]["n_purged"] == pe
    for r in rows.values():
        assert r["n_after"] == r["n_before"] - r["n_purged"]
        assert r["n_purged"] > 0  # the stand-in set must be non-empty
