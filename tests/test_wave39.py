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
