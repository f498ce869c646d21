"""Wave-36 semantics: join-key skew report (d148) and contrastive
pair mining (d149)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.operators import text_substrate
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave36

registry.load_all()
SF = "/root/testdata/sf0.001"


def test_d148_skew_report_invariants(spark):
    rows = {
        r["join_key"]: r
        for r in registry.QUERIES["d148_join_key_skew"](spark, SF).collect()
    }
    assert set(rows) == set(wave36._SKEW_KEYS)
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1  # every key column counts the same fact rows
    for r in rows.values():
        assert r["max_key_rows"] >= 1
        assert 0 < r["max_key_share"] <= 1
        # hottest key can't be below the mean
        assert r["skew_ratio"] >= 1.0
        # share * n_rows == max_key_rows (within rounding)
        assert abs(r["max_key_share"] * r["n_rows"] - r["max_key_rows"]) < 1
    # orderkey repeats per line; it must be the least skewed axis of
    # this generator only if cardinalities differ — just check mutual
    # consistency of cardinality vs rows
    for r in rows.values():
        assert r["n_keys"] <= r["n_rows"]


def test_d149_triplets_are_valid_and_deterministic(spark):
    df = registry.QUERIES["d149_contrastive_pairs"](spark, SF)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in text_substrate.lsh_pairs(spark, SF, threshold=0.5).collect()
    }
    sym = pairs | {(b, a) for a, b in pairs}
    for anchor, pos, pos_sim, neg in rows:
        assert (anchor, pos) in pairs  # positive comes from the substrate
        assert neg not in (anchor, pos)
        assert (anchor, neg) not in sym  # negative is not a near-dup
        assert 0.5 <= pos_sim <= 1.0
    # deterministic: a second run yields the identical triplet set
    again = [
        tuple(r)
        for r in registry.QUERIES["d149_contrastive_pairs"](
            spark, SF
        ).collect()
    ]
    assert rows == again


def test_d148_single_fact_scan_plan(spark):
    """Round-6 verdict #4: the skew report reads lineitem ONCE (stacked
    keys in the projection), not once per candidate key."""
    df = registry.QUERIES["d148_join_key_skew"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
