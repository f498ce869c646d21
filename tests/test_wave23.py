"""Semantic unit tests for wave 23 (d123-d124)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_d123_matches_python_gini(spark):
    rows = Q["d123_source_gini"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    counts: dict[str, int] = {}
    for d in docs:
        counts[d["source"]] = counts.get(d["source"], 0) + 1
    xs = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    g, total = len(xs), sum(n for _, n in xs)
    gini = 2 * sum((i + 1) * n for i, (_, n) in enumerate(xs)) / (
        g * total
    ) - (g + 1) / g
    assert len(rows) == g
    assert all(abs(r["gini"] - round(gini, 6)) < 1e-9 for r in rows)
    # Lorenz curve: sorted ascending by construction, ends at 1
    curve = [r["lorenz_cum"] for r in rows]
    assert curve == sorted(curve)
    assert abs(curve[-1] - 1.0) < 1e-9
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert 0.0 <= rows[0]["gini"] < 1.0


def test_d123_gini_zero_on_uniform_and_high_on_skew(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave23 import (
        d123_source_gini,  # noqa: F401 — formula exercised via replay
    )

    # replay the formula on constructed distributions
    def gini(xs):
        xs = sorted(xs)
        g, total = len(xs), sum(xs)
        return 2 * sum((i + 1) * n for i, n in enumerate(xs)) / (
            g * total
        ) - (g + 1) / g

    assert abs(gini([10, 10, 10, 10])) < 1e-12
    assert gini([1, 1, 1, 97]) > 0.7


def test_d124_residuals_average_to_zero_weighted(spark):
    rows = Q["d124_quality_residuals"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    # all rows carry the same fitted slope
    slopes = {r["slope"] for r in rows}
    assert len(slopes) == 1
    # OLS residuals sum ≈ 0 over the whole corpus (rounding of the
    # fit shifts it slightly — tolerance reflects the 1e-6 rounding)
    weighted = sum(r["mean_residual"] * r["n_docs"] for r in rows) / len(docs)
    assert abs(weighted) < 1e-3
    # TTR must fall with length on word-soup text
    assert rows[0]["slope"] < 0
