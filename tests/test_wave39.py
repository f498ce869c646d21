"""Wave-39 semantics: PPJoin cost estimate vs actuals (d155)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.operators import text_substrate
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave39

registry.load_all()
SF = "/root/testdata/sf0.001"


def test_d155_cost_model_invariants(spark):
    rows = {
        r["threshold"]: r
        for r in registry.QUERIES["d155_ppjoin_cost_estimate"](
            spark, SF
        ).collect()
    }
    assert set(rows) == set(wave39._COST_TS)
    for r in rows.values():
        # the prediction is an upper bound on verified pairs
        assert r["n_pairs"] <= r["pred_candidates"]
        assert 0.0 <= r["verify_rate"] <= 1.0
        assert r["prefix_postings"] >= 0
    # a tighter threshold shrinks the prefix, so postings, predicted
    # candidates, and verified pairs are all monotone non-increasing
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[a]["prefix_postings"] >= rows[b]["prefix_postings"]
        assert rows[a]["pred_candidates"] >= rows[b]["pred_candidates"]
        assert rows[a]["n_pairs"] >= rows[b]["n_pairs"]


def test_d155_actuals_match_pairwise_runs(spark):
    """The conditional counts from the one loosest pass equal separate
    PPJoin runs per threshold (the d126 equivalence, re-pinned here)."""
    rows = {
        r["threshold"]: r["n_pairs"]
        for r in registry.QUERIES["d155_ppjoin_cost_estimate"](
            spark, SF
        ).collect()
    }
    for t in wave39._COST_TS:
        want = text_substrate.jaccard_pairs(spark, SF, threshold=t).count()
        assert rows[t] == want, f"threshold {t}"


def test_d156_refinement_invariants(spark):
    """Wave-40: the tight clustering refines the loose one — subcluster
    counts bounded by cluster size, stable ⟺ one subcluster, and the
    union of subclusters accounts for every loose-cluster member."""
    from kaggle_data_pipeline_with_aws_spark.plans import wave40

    rows = registry.QUERIES["d156_cluster_threshold_stability"](
        spark, SF
    ).collect()
    assert rows
    d150 = {
        r["cluster_id"]: r
        for r in registry.QUERIES["d150_cluster_cohesion"](spark, SF).collect()
    }
    assert {r["cluster_id"] for r in rows} == set(d150)  # same clusters
    for r in rows:
        assert 1 <= r["n_subclusters"] <= r["n_docs"]
        assert r["stable"] == (r["n_subclusters"] == 1)
        assert abs(r["cohesion_ratio"] - round(1.0 / r["n_subclusters"], 6)) < 1e-12
        assert r["n_docs"] == d150[r["cluster_id"]]["n_docs"]
        # a cluster whose weakest internal pair clears the tight floor
        # cannot shatter
        if d150[r["cluster_id"]]["min_sim"] >= wave40._T_TIGHT:
            assert r["stable"]
