"""Semantic unit tests for wave 12 (q87-q95, the TPC-H-shaped
remainder) — each query checked against a brute-force Python replay of
its definition over sf0.001."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def _lineitem(spark):
    return load_table(spark, SF, "lineitem").collect()


def test_q87_matches_bruteforce(spark):
    row = Q["q87_forecast_revenue"](spark, SF).collect()[0]
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    keep = [
        l
        for l in _lineitem(spark)
        if lo <= l["l_shipdate"] < hi
        and 0.05 <= l["l_discount"] <= 0.07
        and l["l_quantity"] < 24
    ]
    want = sum(l["l_extendedprice"] * l["l_discount"] for l in keep)
    assert row["n_lines"] == len(keep)
    assert abs(row["promo_revenue_delta"] - want) < 1e-3


def test_q88_profit_signs_and_grain(spark):
    rows = Q["q88_profit_by_nation_year"](spark, SF).collect()
    # one row per (nation, year) — grain is unique
    keys = [(r["n_name"], r["o_year"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(1995 <= r["o_year"] <= 2001 for r in rows)
    # sorted output contract
    assert keys == sorted(keys)


def test_q89_counts_partition_late_lines(spark):
    rows = {r["l_linestatus"]: r for r in Q["q89_late_priority_matrix"](spark, SF).collect()}
    orders = {
        o["o_orderkey"]: o for o in load_table(spark, SF, "orders").collect()
    }
    late = [
        l
        for l in _lineitem(spark)
        if l["l_shipdate"]
        > orders[l["l_orderkey"]]["o_orderdate"] + datetime.timedelta(days=90)
    ]
    for status in {l["l_linestatus"] for l in late}:
        mine = [l for l in late if l["l_linestatus"] == status]
        high = sum(
            1
            for l in mine
            if orders[l["l_orderkey"]]["o_orderpriority"]
            in ("1-URGENT", "2-HIGH")
        )
        assert rows[status]["high_line_count"] == high
        assert rows[status]["low_line_count"] == len(mine) - high


def test_q90_histogram_accounts_for_every_customer(spark):
    rows = Q["q90_customer_order_distribution"](spark, SF).collect()
    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    # weighted sum of counts == number of qualifying orders
    n_orders = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .count()
    )
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_orders


def test_q91_share_is_bounded_and_matches(spark):
    row = Q["q91_promo_revenue_share"](spark, SF).collect()[0]
    assert 0.0 <= row["promo_pct"] <= 100.0
    part_type = {
        p["p_partkey"]: p["p_type"]
        for p in load_table(spark, SF, "part").collect()
    }
    lo = datetime.datetime(1996, 3, 1)
    hi = datetime.datetime(1996, 4, 1)
    keep = [l for l in _lineitem(spark) if lo <= l["l_shipdate"] < hi]
    rev = lambda l: l["l_extendedprice"] * (1 - l["l_discount"])  # noqa: E731
    total = sum(rev(l) for l in keep)
    promo = sum(rev(l) for l in keep if part_type[l["l_partkey"]] == "PROMO")
    assert abs(row["promo_pct"] - 100.0 * promo / total) < 1e-4


def test_q92_winner_has_max_revenue_ties_kept(spark):
    rows = Q["q92_top_supplier"](spark, SF).collect()
    assert rows
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)
    per_sup = {}
    for l in _lineitem(spark):
        if lo <= l["l_shipdate"] < hi:
            per_sup[l["l_suppkey"]] = per_sup.get(l["l_suppkey"], 0.0) + l[
                "l_extendedprice"
            ] * (1 - l["l_discount"])
    rounded = {k: round(v, 2) for k, v in per_sup.items()}
    mx = max(rounded.values())
    want = {k for k, v in rounded.items() if v == mx}
    assert {r["s_suppkey"] for r in rows} == want
    assert all(abs(r["total_revenue"] - mx) < 1e-9 for r in rows)


def test_q93_excludes_flagged_suppliers(spark):
    rows = Q["q93_part_supplier_variety"](spark, SF).collect()
    bad = {
        s["s_suppkey"]
        for s in load_table(spark, SF, "supplier").collect()
        if s["s_acctbal"] < 0
    }
    parts = {
        p["p_partkey"]: p for p in load_table(spark, SF, "part").collect()
    }
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in rows
    }
    want = {}
    for lp, ls in {
        (l["l_partkey"], l["l_suppkey"]) for l in _lineitem(spark)
    }:
        p = parts[lp]
        if (
            p["p_brand"] == "Brand#5"
            or p["p_size"] not in (1, 4, 9, 14, 19, 24, 29, 34)
            or ls in bad
        ):
            continue
        want.setdefault((p["p_brand"], p["p_type"], p["p_size"]), set()).add(ls)
    assert got == {k: len(v) for k, v in want.items()}


def test_q94_fence_semantics(spark):
    row = Q["q94_small_quantity_revenue"](spark, SF).collect()[0]
    brand3 = {
        p["p_partkey"]
        for p in load_table(spark, SF, "part").collect()
        if p["p_brand"] == "Brand#3"
    }
    li = _lineitem(spark)
    avg_q = {}
    for l in li:
        avg_q.setdefault(l["l_partkey"], []).append(l["l_quantity"])
    keep = [
        l
        for l in li
        if l["l_partkey"] in brand3
        and l["l_quantity"]
        < 0.5 * (sum(avg_q[l["l_partkey"]]) / len(avg_q[l["l_partkey"]]))
    ]
    assert row["n_lines"] == len(keep)
    want = sum(l["l_extendedprice"] for l in keep) / 7.0
    assert abs((row["avg_yearly"] or 0.0) - want) < 1e-3


def test_q95_every_supplier_is_a_qualified_mover(spark):
    rows = Q["q95_qualified_shippers"](spark, SF).collect()
    sup = {
        s["s_suppkey"]: s for s in load_table(spark, SF, "supplier").collect()
    }
    nation = {
        n["n_nationkey"]: n["n_name"]
        for n in load_table(spark, SF, "nation").collect()
    }
    small = {
        p["p_partkey"]
        for p in load_table(spark, SF, "part").collect()
        if p["p_name"].startswith("small")
    }
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1997, 1, 1)
    vol = {}
    for l in _lineitem(spark):
        if lo <= l["l_shipdate"] < hi and l["l_partkey"] in small:
            k = (l["l_suppkey"], l["l_partkey"])
            vol[k] = vol.get(k, 0.0) + l["l_quantity"]
    movers = {sk for (sk, _pk), q in vol.items() if q > 60}
    want = sorted(
        (sup[sk]["s_name"], nation[sup[sk]["s_nationkey"]])
        for sk in movers
        if nation[sup[sk]["s_nationkey"]]
        in ("NATION_3", "NATION_7", "NATION_11")
    )
    assert [(r["s_name"], r["n_name"]) for r in rows] == want
