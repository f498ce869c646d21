"""Wave-38 semantics: IVF probe-budget sweep (d153) and IVF
cell-balance audit (d154)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave38

registry.load_all()
SF = "/root/testdata/sf0.001"


def test_d153_probe_sweep_monotone(spark):
    rows = {
        r["n_probe"]: r
        for r in registry.QUERIES["d153_ivf_probe_sweep"](spark, SF).collect()
    }
    assert set(rows) == set(wave38._PROBE_GRID)
    for r in rows.values():
        assert 0.0 <= r["mean_recall"] <= 1.0
        assert 0.0 < r["scanned_frac"] <= 1.0
        assert abs(
            r["mean_recall"]
            - r["n_hits"] / (wave38._K * wave38._N_QUERIES)
        ) < 1e-9
    # a bigger probe budget can only add candidates: recall and scanned
    # fraction are both monotone non-decreasing in p
    ladder = sorted(rows)
    for a, b in zip(ladder, ladder[1:]):
        assert rows[a]["mean_recall"] <= rows[b]["mean_recall"]
        assert rows[a]["scanned_frac"] <= rows[b]["scanned_frac"]


def test_d153_max_budget_matches_d59_shape(spark):
    """At the largest budget the sweep's recall can't be below the
    production-config point measurement (n_probe=2, d59 semantics)."""
    rows = {
        r["n_probe"]: r["mean_recall"]
        for r in registry.QUERIES["d153_ivf_probe_sweep"](spark, SF).collect()
    }
    d59 = registry.QUERIES["d59_ann_recall"](spark, SF).collect()
    d59_mean = sum(r["n_hit"] for r in d59) / sum(r["n_exact"] for r in d59)
    assert rows[max(wave38._PROBE_GRID)] >= d59_mean - 1e-9
    assert abs(rows[2] - d59_mean) < 1e-6  # same config, same number


def test_d154_cell_balance_partition_of_corpus(spark):
    rows = registry.QUERIES["d154_ivf_cell_balance"](spark, SF).collect()
    assert 1 <= len(rows) <= wave38._N_CENTS
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    n = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n  # assignment is a partition
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 <= r["cell_id"] < wave38._N_CENTS
        assert r["load_ratio"] > 0
