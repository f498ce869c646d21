"""Wave-37 semantics: near-dup cluster cohesion (d150), embedding
dimension-truncation recall (d151), MinHash banding tuning (d152)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.operators import text_substrate
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave37

registry.load_all()
SF = "/root/testdata/sf0.001"


def test_d150_cluster_invariants(spark):
    rows = registry.QUERIES["d150_cluster_cohesion"](spark, SF).collect()
    assert rows
    pairs = text_substrate.lsh_pairs(spark, SF, threshold=0.5).collect()
    n_pairs_total = sum(r["n_pairs"] for r in rows)
    assert n_pairs_total == len(pairs)  # every pair lands in one cluster
    for r in rows:
        assert r["n_docs"] >= 2  # pair-graph clusters only
        # a cluster of n docs has at most C(n,2) internal pairs and at
        # least n-1 (it is connected)
        assert r["n_docs"] - 1 <= r["n_pairs"] <= r["n_docs"] * (r["n_docs"] - 1) // 2
        assert 0 < r["density"] <= 1.0
        assert 0.5 <= r["min_sim"] <= r["mean_sim"] <= 1.0
        # cluster_id is the min doc id of the cluster => <= any member;
        # it must itself appear in some pair of the cluster
        assert r["cluster_id"] >= 0


def test_d150_singleton_free_and_distinct_clusters(spark):
    rows = registry.QUERIES["d150_cluster_cohesion"](spark, SF).collect()
    ids = [r["cluster_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_d151_recall_bounds_and_self_consistency(spark):
    rows = registry.QUERIES["d151_dim_truncation_recall"](
        spark, SF
    ).collect()
    assert len(rows) == 10  # one row per query, zero-overlap included
    for r in rows:
        assert 0 <= r["n_common"] <= wave37._TRUNC_K
        assert abs(r["recall_at_k"] - r["n_common"] / wave37._TRUNC_K) < 1e-9


def test_d151_full_dims_recall_is_one_by_construction(spark):
    """Sanity: truncating to ALL 64 dims must reproduce the full top-k
    exactly (recall 1.0 for every query) — pins the overlap join."""
    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.operators import similarity
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    embs = load_table(spark, SF, "embeddings")
    queries = embs.filter(F.col("vec_id") < 10)
    full = similarity.brute_force_topk(embs, queries, k=5)
    again = similarity.brute_force_topk(
        embs.select("vec_id", F.slice("embedding", 1, 64).alias("embedding")),
        queries.select(
            "vec_id", F.slice("embedding", 1, 64).alias("embedding")
        ),
        k=5,
    )
    a = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    b = {(r["query_id"], r["neighbor_id"]) for r in again.collect()}
    assert a == b


def test_d152_tuning_curve_shape(spark):
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in registry.QUERIES["d152_lsh_band_tuning"](spark, SF).collect()
    }
    assert set(rows) == set(wave37._BAND_CONFIGS)
    n = {r["n_pairs"] for r in rows.values()}
    assert len(n) == 1  # same observed pair set for every config
    for r in rows.values():
        assert 0.0 <= r["min_p"] <= r["mean_p"] <= 1.0
        assert r["expected_missed"] >= 0.0
    # more, smaller bands = more candidate chances: recall must be
    # monotone along the config ladder (32,1) >= (16,2) >= ... >= (2,16)
    ladder = [rows[c]["mean_p"] for c in wave37._BAND_CONFIGS]
    assert all(a >= b for a, b in zip(ladder, ladder[1:]))


def test_d152_p_candidate_matches_python_model(spark):
    """The squaring-chain column equals the closed form 1-(1-s^r)^b
    for a grid of similarities, for every configuration."""
    import pandas as pd
    from pyspark.sql import functions as F

    sims = [0.5, 0.7, 0.8, 0.9, 0.95, 1.0]
    df = spark.createDataFrame(pd.DataFrame({"jaccard": sims}))
    for b, r in wave37._BAND_CONFIGS:
        got = [
            row[0]
            for row in df.select(
                wave37._p_candidate_col(F.col("jaccard"), b, r)
            ).collect()
        ]
        want = [1.0 - (1.0 - s**r) ** b for s in sims]
        for g, w in zip(got, want):
            assert abs(g - w) < 1e-12
