"""Wave 48 — python-model replays for d178–d181 (HLL roll-forward,
Chao1 richness, bootstrap CI, sketch error audit)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.operators.sketch import (
    HLL_M,
    hll_alpha,
)
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave48

SF = "/root/testdata/sf0.001"
MOD = 2_147_483_647


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


def py_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MOD


def py_hash60(s: str) -> int:
    d = hashlib.md5(s.encode()).hexdigest()
    return (int(d[:8], 16) % (1 << 30)) + (
        (int(d[8:16], 16) % (1 << 30)) << 30
    )


def _rho(w: int) -> int:
    if w == 0:
        return 55
    rho = 1
    while w % 2 == 0:
        w //= 2
        rho += 1
    return rho


def _hll_update(regs: list[int], value: str) -> None:
    h = py_hash60("hll|" + value)
    idx = h % HLL_M
    regs[idx] = max(regs[idx], _rho(h // HLL_M))


def _hll_est(regs: list[int]) -> float:
    num = hll_alpha() * HLL_M * HLL_M * float(1 << 55)
    rs = sum(1 << (55 - r) for r in regs)
    v = sum(1 for r in regs if r == 0)
    raw = num / float(rs)
    if raw <= 2.5 * HLL_M and v > 0:
        return round(HLL_M * math.log(HLL_M / float(v)), 6)
    return round(raw, 6)


# ---------------------------------------------------------------------------
# d178 — HLL roll-forward
# ---------------------------------------------------------------------------
def test_d178_matches_python_replay(spark):
    from kaggle_data_pipeline_with_aws_spark.sources.readers import (
        load_table,
    )

    ev = [
        (r.day, r.user_id)
        for r in load_table(spark, SF, "events")
        .selectExpr("date_trunc('day', ts) AS day", "user_id")
        .collect()
    ]
    daily_users: dict = defaultdict(set)
    for day, uid in ev:
        daily_users[day].add(uid)
    days = sorted(daily_users)

    daily_regs = {
        d: [0] * HLL_M for d in days
    }
    for day, uid in ev:
        _hll_update(daily_regs[day], str(uid))

    out = _rows(spark, "d178_hll_rollforward")
    assert [r.day for r in out] == days
    cum_regs = [0] * HLL_M
    seen: set = set()
    for row, day in zip(out, days):
        cum_regs = [max(a, b) for a, b in zip(cum_regs, daily_regs[day])]
        seen |= daily_users[day]
        assert row.exact_daily == len(daily_users[day])
        assert row.exact_cum == len(seen)
        assert row.reg_sum_daily == sum(
            1 << (55 - r) for r in daily_regs[day]
        )
        assert row.reg_sum_cum == sum(1 << (55 - r) for r in cum_regs)
        assert row.est_daily == pytest.approx(
            _hll_est(daily_regs[day]), abs=1e-9
        )
        assert row.est_cum == pytest.approx(_hll_est(cum_regs), abs=1e-9)
    # roll-forward invariants: cumulative counts and register sums
    # are monotone (exact_cum up; reg_sum_cum down as rhos only grow)
    cums = [r.exact_cum for r in out]
    assert cums == sorted(cums)
    rsums = [r.reg_sum_cum for r in out]
    assert rsums == sorted(rsums, reverse=True)


# ---------------------------------------------------------------------------
# d179 — Chao1 richness
# ---------------------------------------------------------------------------
def test_d179_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    tf: dict = defaultdict(Counter)
    for r in docs:
        tf[r.source].update(r.text.split(" "))
    out = _rows(spark, "d179_chao1_vocab_richness")
    assert {r.source for r in out} == set(tf)
    for row in out:
        c = tf[row.source]
        v = len(c)
        n1 = sum(1 for n in c.values() if n == 1)
        n2 = sum(1 for n in c.values() if n == 2)
        total = sum(c.values())
        assert (row.vocab_size, row.n_singletons, row.n_doubletons) == (
            v,
            n1,
            n2,
        )
        assert row.total_tokens == total
        assert row.chao1_est == pytest.approx(
            round(v + (n1 * (n1 - 1)) / (2.0 * (n2 + 1)), 6), abs=1e-9
        )
        assert row.coverage_est == pytest.approx(
            round(1.0 - n1 / total, 6), abs=1e-9
        )
        # Chao1 never estimates fewer types than observed
        assert row.chao1_est >= row.vocab_size
        assert 0.0 <= row.coverage_est <= 1.0


# ---------------------------------------------------------------------------
# d180 — bootstrap CI
# ---------------------------------------------------------------------------
def test_d180_matches_python_replay(spark):
    docs = [
        (r.doc_id, r.n_chars)
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    means = []
    for rep in range(wave48._CI_R):
        n_eff = wx = 0
        for doc_id, n_chars in docs:
            u = py_hash(f"boot|{rep}|{doc_id}")
            w = 6
            for k, t in enumerate(wave48._BOOT_T):
                if u < t:
                    w = k
                    break
            n_eff += w
            wx += w * n_chars
        means.append(wx / n_eff)

    out = _rows(spark, "d180_bootstrap_ci")
    assert len(out) == 1
    row = out[0]
    assert row.n_docs == len(docs)
    assert row.n_replicates == wave48._CI_R
    total = sum(n for _, n in docs)
    assert row.point_mean == pytest.approx(
        round(total / len(docs), 6), abs=1e-9
    )
    assert row.boot_mean == pytest.approx(
        sum(means) / len(means), abs=1e-6
    )
    mb = sum(means) / len(means)
    se = math.sqrt(sum((m - mb) ** 2 for m in means) / (len(means) - 1))
    assert row.boot_se == pytest.approx(se, abs=1e-6)
    s = sorted(means)
    assert row.ci_lo == pytest.approx(
        round(s[wave48._CI_LO_RANK - 1], 6), abs=1e-9
    )
    assert row.ci_hi == pytest.approx(
        round(s[wave48._CI_HI_RANK - 1], 6), abs=1e-9
    )
    assert row.ci_lo <= row.boot_mean <= row.ci_hi


# ---------------------------------------------------------------------------
# d181 — sketch error audit
# ---------------------------------------------------------------------------
def test_d181_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    regs: dict = defaultdict(lambda: [0] * HLL_M)
    khash: dict = defaultdict(set)
    texts: dict = defaultdict(set)
    for r in docs:
        _hll_update(regs[r.source], r.text)
        khash[r.source].add(py_hash("kmv|" + r.text))
        texts[r.source].add(r.text)

    out = _rows(spark, "d181_sketch_error_audit")
    assert {r.source for r in out} == set(texts)
    for row in out:
        exact = len(texts[row.source])
        assert row.exact_distinct == exact
        assert row.hll_est == pytest.approx(
            _hll_est(regs[row.source]), abs=1e-9
        )
        hs = sorted(khash[row.source])[: wave48._KMV_K]
        kmv = round((len(hs) - 1) * float(MOD) / hs[-1], 6)
        assert row.kmv_est == pytest.approx(kmv, abs=1e-9)
        assert row.hll_rel_err == pytest.approx(
            round(abs(row.hll_est - exact) / exact, 6), abs=1e-9
        )
        assert row.kmv_rel_err == pytest.approx(
            round(abs(row.kmv_est - exact) / exact, 6), abs=1e-9
        )
