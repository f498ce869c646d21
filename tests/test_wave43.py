"""Wave 43 — domain-aware curation tier 2 (d163–d166)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry

SF = "/root/testdata/sf0.01"


def _rows(spark, name, sf=SF):
    registry.load_all()
    return registry.QUERIES[name](spark, sf).collect()


def test_d164_quotas_sum_exactly_to_sample_size(spark):
    rows = _rows(spark, "d164_domain_stratified_sample")
    assert sum(r.quota for r in rows) == 100
    for r in rows:
        assert r.n_sampled == min(r.quota, r.n_docs)
        assert 0 <= r.quota - (100 * r.n_docs) // sum(
            x.n_docs for x in rows
        ) <= 1  # base quota or base+1, never more


def test_d164_matches_python_hamilton_replay(spark):
    rows = _rows(spark, "d164_domain_stratified_sample")
    counts = {r.domain: r.n_docs for r in rows}
    total = sum(counts.values())
    base = {d: (n * 100) // total for d, n in counts.items()}
    rem = {d: (n * 100) % total for d, n in counts.items()}
    deficit = 100 - sum(base.values())
    extras = set(
        sorted(counts, key=lambda d: (-rem[d], d))[:deficit]
    )
    for r in rows:
        assert r.quota == base[r.domain] + (1 if r.domain in extras else 0)


def test_d163_plan_uses_window_group_limit(spark):
    registry.load_all()
    df = registry.QUERIES["d163_domain_quality_topk"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_d163_scores_and_k_bound(spark):
    rows = _rows(spark, "d163_domain_quality_topk")
    for r in rows:
        assert 1 <= r.n_kept <= 2
        assert r.worst_kept_score <= r.best_score <= 1.0


def test_d166_pair_accounting_is_consistent(spark):
    """Each intra pair contributes 1 intra row; each cross pair
    contributes 1 cross row per endpoint domain — so the rollup's
    totals must reconcile with the substrate pair list."""
    from kaggle_data_pipeline_with_aws_spark.operators import (
        text_substrate,
    )
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import (
        _with_domain,
    )

    rows = _rows(spark, "d166_domain_dup_locality")
    n_intra = sum(r.intra_pairs for r in rows)
    n_cross_rows = sum(r.cross_pairs for r in rows)
    pairs = text_substrate.lsh_pairs(spark, SF, threshold=0.5).select(
        "doc_id_1", "doc_id_2"
    )
    dm = {
        r.doc_id: r.domain
        for r in _with_domain(spark, SF).select("doc_id", "domain").collect()
    }
    got_intra = got_cross = 0
    for p in pairs.collect():
        if dm[p.doc_id_1] == dm[p.doc_id_2]:
            got_intra += 1
        else:
            got_cross += 1
    assert n_intra == got_intra
    assert n_cross_rows == 2 * got_cross


def test_d164_sample_selection_is_hash_deterministic(spark):
    """The selected per-domain rows are the lowest salted hashes —
    python replay over one domain."""
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import (
        _with_domain,
    )

    rows = _rows(spark, "d164_domain_stratified_sample")
    target = next(r for r in rows if 0 < r.quota < r.n_docs)
    docs = [
        r.doc_id
        for r in _with_domain(spark, SF)
        .filter(F.col("domain") == target.domain)
        .select("doc_id")
        .collect()
    ]

    def h(i: int) -> int:
        return (
            int(hashlib.md5(f"smp|{i}".encode()).hexdigest()[:15], 16)
            % 2_147_483_647
        )

    chosen = sorted(docs, key=lambda i: (h(i), i))[: target.quota]
    assert sum(chosen) == target.sample_key_sum
