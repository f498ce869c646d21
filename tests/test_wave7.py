"""Semantic unit tests for wave 7 (q73, q74, s08, d80, d81)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q73_slope_matches_numpy_lstsq(spark):
    import numpy as np

    rows = {r["event_type"]: r for r in Q["q73_value_trend_per_type"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull()).collect()
    by_type: dict[str, list] = {}
    for e in ev:
        x = (e["ts"].timestamp() - 1_704_067_200) / 86_400.0
        by_type.setdefault(e["event_type"], []).append((x, e["value"]))
    for t, pts in by_type.items():
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(rows[t]["slope_per_day"] - slope) < 1e-4, t
        assert abs(rows[t]["intercept"] - intercept) < 1e-3, t
        assert rows[t]["n_points"] == len(pts)


def test_q74_intervals_tile_each_user_timeline(spark):
    rows = Q["q74_scd2_user_state"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert len(rows) == ev.count()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: (r["valid_from"]))
        # exactly one open interval per user, and it is the last one
        opens = [r for r in rs if r["valid_to"] is None]
        assert len(opens) == 1 and rs[-1]["valid_to"] is None
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], uid


def test_s08_late_events_obey_the_discard_rule(spark):
    rows = Q["s08_late_event_audit"](spark, SF).collect()
    assert rows, "jittered arrival should produce late events"
    for r in rows:
        assert r["late_by_us"] > 3_600_000_000
    # determinism: identical on re-run (hash jitter, no RNG)
    again = Q["s08_late_event_audit"](spark, SF).collect()
    assert {r["event_id"] for r in rows} == {r["event_id"] for r in again}


def test_d80_histogram_counts_all_sample_pairs(spark):
    rows = Q["d80_similarity_histogram"](spark, SF).collect()
    from kaggle_data_pipeline_with_aws_spark.operators.text import (
        portable_hash,
    )

    e = load_table(spark, SF, "embeddings")
    n_sample = e.filter(
        F.pmod(
            portable_hash(
                F.concat(F.lit("simsamp-"), F.col("vec_id").cast("string"))
            ),
            F.lit(100),
        )
        < 9
    ).count()
    assert sum(r["n_pairs"] for r in rows) == n_sample * (n_sample - 1) // 2
    for r in rows:
        assert -10 <= r["bucket"] <= 10


def test_d81_profile_matches_direct_queries(spark):
    rows = {r["column_name"]: r for r in Q["d81_column_profile"](spark, SF).collect()}
    o = load_table(spark, SF, "orders")
    assert rows["o_orderkey"]["n_distinct"] == o.count()  # pk
    assert rows["o_orderkey"]["n_nulls"] == 0
    statuses = o.select("o_orderstatus").distinct().count()
    assert rows["o_orderstatus"]["n_distinct"] == statuses
    assert rows["o_totalprice"]["min_value"] is not None
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
