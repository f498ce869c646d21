"""Wave 55 — python-model replays for d196–d197 (dedup PR curve,
stratified bootstrap)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave55

SF = "/root/testdata/sf0.001"
MOD = 2_147_483_647


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


# ---------------------------------------------------------------------------
# d196 — PR curve over d61's pair table
# ---------------------------------------------------------------------------
def test_d196_matches_replay_of_d61(spark):
    registry.load_all()
    pairs = [
        (r.est_jaccard, r.true_jaccard >= wave55._PR_TRUE_CUT)
        for r in registry.QUERIES["d61_lsh_estimate_error"](
            spark, SF
        ).collect()
    ]
    assert pairs, "candidate pairs exist at sf0.001"
    out = _rows(spark, "d196_dedup_pr_curve")
    assert sorted({r.threshold for r in out}) == sorted(
        {e for e, _ in pairs}
    )
    best = None
    for row in out:
        tp = sum(1 for e, p in pairs if e >= row.threshold and p)
        fp = sum(1 for e, p in pairs if e >= row.threshold and not p)
        fn = sum(1 for e, p in pairs if e < row.threshold and p)
        assert (row.tp, row.fp, row.fn) == (tp, fp, fn)
        assert row.precision == pytest.approx(
            round(tp / (tp + fp), 6), abs=1e-9
        )
        if tp + fn:
            assert row.recall == pytest.approx(
                round(tp / (tp + fn), 6), abs=1e-9
            )
        f1 = 0.0 if tp == 0 else round(2 * tp / (2 * tp + fp + fn), 6)
        assert row.f1 == pytest.approx(f1, abs=1e-9)
        if best is None or (row.f1, -row.threshold) > (
            best.f1,
            -best.threshold,
        ):
            best = row
    assert sum(1 for r in out if r.is_best) == 1
    flagged = next(r for r in out if r.is_best)
    assert flagged.f1 == best.f1
    # recall is monotone non-increasing in the threshold
    rs = [r.recall for r in sorted(out, key=lambda r: r.threshold)]
    rs = [r for r in rs if r is not None]
    assert all(a >= b - 1e-9 for a, b in zip(rs, rs[1:]))


# ---------------------------------------------------------------------------
# d197 — stratified bootstrap
# ---------------------------------------------------------------------------
def test_d197_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src: dict = defaultdict(list)
    for r in docs:
        by_src[r.source].append((r.doc_id, r.n_chars))

    def py_hash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MOD

    out = {r.source: r for r in _rows(spark, "d197_stratified_bootstrap")}
    assert set(out) == set(by_src)
    for src, rows in by_src.items():
        means = []
        for rep in range(wave55._SB_R):
            n_eff = wx = 0
            for doc_id, n_chars in rows:
                u = py_hash(f"boot|{rep}|{doc_id}")
                w = 6
                for k, t in enumerate(wave55._BOOT_T):
                    if u < t:
                        w = k
                        break
                n_eff += w
                wx += w * n_chars
            means.append(wx / n_eff)
        row = out[src]
        assert row.n_docs == len(rows)
        total = sum(n for _, n in rows)
        assert row.point_mean == pytest.approx(
            round(total / len(rows), 6), abs=1e-9
        )
        mb = sum(means) / len(means)
        assert row.boot_mean == pytest.approx(mb, abs=1e-6)
        se = math.sqrt(
            sum((m - mb) ** 2 for m in means) / (len(means) - 1)
        )
        assert row.boot_se == pytest.approx(se, abs=1e-6)
        s = sorted(means)
        assert row.ci_lo == pytest.approx(
            round(s[wave55._SB_LO - 1], 6), abs=1e-9
        )
        assert row.ci_hi == pytest.approx(
            round(s[wave55._SB_HI - 1], 6), abs=1e-9
        )
        assert row.ci_lo <= row.boot_mean <= row.ci_hi
