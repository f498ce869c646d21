"""Semantic unit tests for the round-3 second wave (q67-q72, d74-d79,
s07) — independent invariants and brute-force recomputations, so the
DuckDB oracle isn't the only line of defense.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q67_excludes_domestic_trade(spark):
    rows = Q["q67_nation_trade_matrix"](spark, SF).collect()
    assert rows
    assert all(r["supp_nation"] != r["cust_nation"] for r in rows)


def test_q69_threshold_and_join_integrity(spark):
    rows = Q["q69_large_volume_customers"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    totals = {
        r["l_orderkey"]: r["tq"]
        for r in li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tq")).collect()
    }
    expected_keys = {k for k, v in totals.items() if v > 250}
    assert {r["o_orderkey"] for r in rows} == expected_keys
    for r in rows:
        assert r["total_qty"] == round(totals[r["o_orderkey"]], 6)


def test_q70_matches_brute_force(spark):
    row = Q["q70_disjunctive_join_revenue"](spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem").collect()
    part = {r["p_partkey"]: r for r in load_table(spark, SF, "part").collect()}
    n = 0
    rev = 0.0
    for l in li:
        p = part[l["l_partkey"]]
        if (
            (p["p_brand"] == "Brand#1" and 1 <= p["p_size"] <= 15 and l["l_quantity"] >= 5)
            or (p["p_brand"] == "Brand#2" and 1 <= p["p_size"] <= 25 and l["l_quantity"] >= 15)
            or (p["p_brand"] == "Brand#3" and 1 <= p["p_size"] <= 35 and l["l_quantity"] >= 25)
        ):
            n += 1
            rev += l["l_extendedprice"] * (1 - l["l_discount"])
    assert row["n_lines"] == n
    assert abs(row["revenue"] - rev) < 1e-4


def test_q71_dormant_means_no_recent_orders(spark):
    rows = Q["q71_dormant_rich_customers"](spark, SF).collect()
    assert rows
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    avg_bal = c.filter("c_acctbal > 0").agg(F.avg("c_acctbal")).first()[0]
    recent = {
        r["o_custkey"]
        for r in o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")).collect()
    }
    qualified = c.filter(F.col("c_acctbal") > avg_bal).filter(
        ~F.col("c_custkey").isin(recent)
    )
    assert sum(r["n_customers"] for r in rows) == qualified.count()


def test_q72_probabilities_row_normalize(spark):
    rows = Q["q72_event_transition_matrix"](spark, SF).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_d74_pair_counts_match_python(spark):
    rows = Q["d74_bpe_merge_candidates"](spark, SF).collect()
    assert len(rows) == 20
    docs = load_table(spark, SF, "documents").select("text").collect()
    from collections import Counter

    cnt: Counter = Counter()
    for d in docs:
        for t in d["text"].split(" "):
            if len(t) >= 2:
                for i in range(len(t) - 1):
                    cnt[(t[i], t[i + 1])] += 1
    expected = sorted(
        cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:20]
    got = [
        ((r["left_sym"], r["right_sym"]), r["n"])
        for r in sorted(rows, key=lambda r: r["rk"])
    ]
    assert got == expected


def test_d75_confusion_totals_and_diagonal(spark):
    rows = Q["d75_langid_confusion"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    assert sum(r["n"] for r in rows) == docs.count()
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got_per_lang: dict[str, int] = {}
    for r in rows:
        got_per_lang[r["true_lang"]] = got_per_lang.get(r["true_lang"], 0) + r["n"]
    assert got_per_lang == per_lang


def test_d76_histogram_accounts_every_clustered_doc(spark):
    rows = Q["d76_cluster_size_histogram"](spark, SF).collect()
    from kaggle_data_pipeline_with_aws_spark.plans.llm_data import (
        d31_dedup_components,
    )

    comp = d31_dedup_components(spark, SF)
    assert sum(r["cluster_size"] * r["n_clusters"] for r in rows) == comp.count()
    assert all(r["cluster_size"] >= 2 or r["n_clusters"] >= 0 for r in rows)


def test_d77_stopwords_are_high_df(spark):
    rows = Q["d77_stopword_discovery"](spark, SF).collect()
    assert rows
    n_docs = load_table(spark, SF, "documents").count()
    for r in rows:
        assert r["df_ratio"] >= 0.6
        assert r["df"] <= n_docs


def test_d78_shares_sum_to_one(spark):
    rows = Q["d78_neyman_allocation"](spark, SF).collect()
    assert rows
    assert abs(sum(r["alloc_share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["alloc_n"] for r in rows) <= 1000
    for r in rows:
        assert r["alloc_n"] >= 0


def test_d79_counts_occurrences_not_distinct(spark):
    df = spark.createDataFrame(
        [(1, "error error error table"), (2, "error table"), (3, "slow slow stream")],
        "doc_id LONG, text STRING",
    )
    import kaggle_data_pipeline_with_aws_spark.plans.wave6 as w6

    hits = F.size(
        F.filter(
            F.split(F.col("text"), " "),
            lambda t: t.isin(*w6._D79_BLOCKLIST),
        )
    )
    got = {r["doc_id"]: r["h"] for r in df.select("doc_id", hits.alias("h")).collect()}
    assert got == {1: 3, 2: 1, 3: 3}


def test_s07_matches_stateful_semantics(spark):
    rows = Q["s07_running_user_totals"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert len(rows) == ev.select("user_id").distinct().count()
    assert sum(r["n_events"] for r in rows) == ev.count()
