"""Wave 54 — python-model replays for d194–d195 (CUSUM drift,
split-conformal calibration)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave54
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"
MOD = 2_147_483_647


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(
        math.floor(-x + 0.5)
    )


# ---------------------------------------------------------------------------
# d194 — CUSUM via the recurrence (python runs the SEQUENTIAL form;
# the engine runs the prefix-scan identity — equality IS the proof)
# ---------------------------------------------------------------------------
def test_d194_matches_sequential_recurrence(spark):
    ev = load_table(spark, SF, "events").collect()
    daily: dict = defaultdict(lambda: [0, 0])
    for r in ev:
        day = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        daily[day][0] += _round_half_away(r.value * 1000000.0)
        daily[day][1] += 1
    days = sorted(daily)
    target = _round_half_away(
        sum(v for v, _ in daily.values())
        / sum(n for _, n in daily.values())
    )
    k = abs(target) // 20
    h = abs(target) // 10
    out = _rows(spark, "d194_cusum_drift")
    assert [r.day for r in out] == days
    s_up = s_dn = 0
    for row, day in zip(out, days):
        v6, n = daily[day]
        mean = _round_half_away(v6 / n)
        assert row.mean_e6 == mean
        s_up = max(0, s_up + (mean - target - k))
        s_dn = max(0, s_dn + (target - mean - k))
        assert (row.s_up_e6, row.s_dn_e6) == (s_up, s_dn)
        assert row.alarm_up == (s_up > h)
        assert row.alarm_dn == (s_dn > h)


# ---------------------------------------------------------------------------
# d195 — split-conformal calibration
# ---------------------------------------------------------------------------
def test_d195_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()

    def is_cal(doc_id: int) -> bool:
        hh = int(
            hashlib.md5(f"conf|{doc_id}".encode()).hexdigest()[:15], 16
        ) % MOD
        return hh % wave54._CONF_SPLIT_MOD == 0

    cal = [
        (r.n_chars, len(r.text.split(" ")))
        for r in docs
        if is_cal(r.doc_id)
    ]
    test = [
        (r.n_chars, len(r.text.split(" ")))
        for r in docs
        if not is_cal(r.doc_id)
    ]
    n = len(cal)
    sx = sum(x for x, _ in cal)
    sy = sum(y for _, y in cal)
    sxy = sum(x * y for x, y in cal)
    sxx = sum(x * x for x, _ in cal)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - beta * sx) / n

    def r6(x, y):
        return _round_half_away(abs(y - (alpha + beta * x)) * 1e6)

    cal_res = sorted(r6(x, y) for x, y in cal)
    kk = math.ceil(0.9 * (n + 1))
    q6 = cal_res[kk - 1]
    cov = sum(1 for x, y in test if r6(x, y) <= q6) / len(test)

    out = _rows(spark, "d195_conformal_calibration")
    assert len(out) == 1
    row = out[0]
    assert (row.n_cal, row.n_test) == (n, len(test))
    assert row.beta == pytest.approx(round(beta, 6), abs=1e-9)
    assert row.alpha == pytest.approx(round(alpha, 6), abs=1e-9)
    assert row.q_conformal_e6 == q6
    assert row.test_coverage == pytest.approx(round(cov, 6), abs=1e-9)
    # the conformal guarantee holds loosely even on this small sample
    assert row.test_coverage >= 0.75
