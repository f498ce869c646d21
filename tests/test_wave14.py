"""Semantic unit tests for wave 14 (q96-q98, d104-d106)."""

from __future__ import annotations

import math

import numpy as np

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q96_covers_all_edges_and_counts_children(spark):
    rows = {r["edge"]: r for r in Q["q96_fk_orphan_audit"](spark, SF).collect()}
    assert len(rows) == 6
    # synthetic star schema is referentially intact
    assert all(r["n_orphans"] == 0 for r in rows.values())
    assert rows["lineitem.l_orderkey->orders"]["n_child"] == load_table(
        spark, SF, "lineitem"
    ).count()
    assert rows["orders.o_custkey->customer"]["n_child"] == load_table(
        spark, SF, "orders"
    ).count()


def test_q96_detects_planted_orphans(spark):
    # drive the positive path: a child table with two orphan keys
    from pyspark.sql import functions as F

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (99,), (98,)], ["ck"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    got = (
        child.join(parent, F.col("ck") == F.col("pk"), "left")
        .agg(
            F.count("*").alias("n_child"),
            F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)).alias(
                "n_orphans"
            ),
        )
        .collect()[0]
    )
    assert (got["n_child"], got["n_orphans"]) == (5, 2)


def test_q97_journey_is_chronological(spark):
    rows = {r["c_custkey"]: r for r in Q["q97_customer_journey"](spark, SF).collect()}
    orders = load_table(spark, SF, "orders").collect()
    per_cust = {}
    for o in orders:
        per_cust.setdefault(o["o_custkey"], []).append(o)
    for ck, os in per_cust.items():
        want = "".join(
            o["o_orderstatus"]
            for o in sorted(os, key=lambda o: (o["o_orderdate"], o["o_orderkey"]))
        )
        assert rows[ck]["journey"] == want
        assert rows[ck]["n_orders"] == len(os)


def test_q98_mode_matches_counter_with_tiebreak(spark):
    from collections import Counter

    rows = {r["event_type"]: r for r in Q["q98_modal_value_bucket"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    per_type = {}
    for e in ev:
        per_type.setdefault(e["event_type"], Counter())[
            math.floor(e["value"])
        ] += 1
    for t, cnt in per_type.items():
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert rows[t]["modal_bucket"] == best[0]
        assert rows[t]["n"] == best[1]


def test_d104_matches_python_jackknife(spark):
    row = Q["d104_jackknife_variance"](spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents").collect()
    per_src = {}
    for d in docs:
        s, n = per_src.get(d["source"], (0, 0))
        per_src[d["source"]] = (s + d["n_chars"], n + 1)
    S = sum(s for s, _ in per_src.values())
    N = sum(n for _, n in per_src.values())
    g = len(per_src)
    loo = [(S - s) / (N - n) for s, n in per_src.values()]
    mbar = sum(loo) / g
    se = math.sqrt((g - 1) / g * sum((m - mbar) ** 2 for m in loo))
    assert row["n_sources"] == g
    assert abs(row["mean_chars"] - S / N) < 1e-5
    assert abs(row["jk_se"] - se) < 1e-5


def test_d105_matches_numpy_gram(spark):
    rows = Q["d105_gram_matrix"](spark, SF).collect()
    embs = load_table(spark, SF, "embeddings").collect()
    X = np.array([e["embedding"] for e in embs], dtype=np.float64)
    G = X.T @ X
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert r["i"] <= r["j"]
        assert abs(r["v"] - round(G[r["i"], r["j"]], 4)) < 1e-9


def test_d106_is_the_dominant_eigvec(spark):
    rows = Q["d106_pca_top_component"](spark, SF).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    embs = load_table(spark, SF, "embeddings").collect()
    X = np.array([e["embedding"] for e in embs], dtype=np.float64)
    G = X.T @ X
    # after 4 power iterations the iterate must be closer to the true
    # top eigvec than the start was (Rayleigh quotient check)
    evals, evecs = np.linalg.eigh(G)
    top = evals[-1]
    rq = float(v @ G @ v)
    start = np.full(64, 1 / 8.0)
    rq0 = float(start @ G @ start)
    assert rq > rq0
    # fixed-round power iteration on sf0.001's flat 50-vector spectrum
    # can't reach the top eigenvalue — but it must dominate the bulk
    # (median eigenvalue) and sit within the top's neighborhood.
    assert rq > float(np.median(evals))
    assert rq > 0.8 * top
