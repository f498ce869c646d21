"""Wave 56 — python replay for d198 (progressive rerank)."""

from __future__ import annotations

import math

import pytest

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave56

SF = "/root/testdata/sf0.001"


def _cos(a, b, dims=None):
    if dims:
        a, b = a[:dims], b[:dims]
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)


def test_d198_matches_python_replay(spark):
    registry.load_all()
    embs = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    out = {
        r.query_id: r
        for r in registry.QUERIES["d198_progressive_rerank"](
            spark, SF
        ).collect()
    }
    assert set(out) == set(range(wave56._PR_NQ))
    for q in out:
        others = [n for n in embs if n != q]
        coarse = sorted(
            others,
            key=lambda n: (
                -_cos(embs[q], embs[n], wave56._PR_COARSE_DIMS),
                n,
            ),
        )[: wave56._PR_STAGE1_K]
        prog = sorted(
            coarse, key=lambda n: (-_cos(embs[q], embs[n]), n)
        )[: wave56._PR_K]
        exact = sorted(
            others, key=lambda n: (-_cos(embs[q], embs[n]), n)
        )[: wave56._PR_K]
        row = out[q]
        assert row.prog_id_sum == sum(prog)
        assert row.exact_id_sum == sum(exact)
        rec = len(set(prog) & set(exact)) / wave56._PR_K
        assert row.recall_at_5 == pytest.approx(round(rec, 6), abs=1e-9)


def test_d198_beats_random_candidates(spark):
    """The 16-dim prefix stage must carry real signal: mean recall@5
    clearly above the random-candidate baseline stage1_k/(N-1). (The
    synthetic embeddings are near-isotropic, so absolute recall is
    modest — the margin over random is the meaningful check; run at
    sf0.01 where the baseline is small.)"""
    registry.load_all()
    sf01 = "/root/testdata/sf0.01"
    n = spark.read.parquet(f"{sf01}/embeddings.parquet").count()
    rows = registry.QUERIES["d198_progressive_rerank"](
        spark, sf01
    ).collect()
    mean_recall = sum(r.recall_at_5 for r in rows) / len(rows)
    baseline = wave56._PR_STAGE1_K / (n - 1)
    assert mean_recall >= 3 * baseline
