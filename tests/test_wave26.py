"""Semantic unit tests for wave 26 (q110)."""

from __future__ import annotations

import math

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q110_matches_python_rfm(spark):
    rows = {r["user_id"]: r for r in Q["q110_rfm_segments"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    now = max(e["ts"] for e in ev)
    agg: dict[int, list] = {}
    for e in ev:
        last, n, s = agg.get(e["user_id"], (e["ts"], 0, 0.0))
        agg[e["user_id"]] = (max(last, e["ts"]), n + 1, s + e["value"])
    users = {
        u: (
            int((now - last).total_seconds() // 86400),
            n,
            round(s, 2),
        )
        for u, (last, n, s) in agg.items()
    }
    assert set(rows) == set(users)
    total = len(users)

    def quint(rank):
        return math.ceil(rank * 5 / total)

    rk_r = {
        u: i + 1
        for i, (u, _) in enumerate(
            sorted(users.items(), key=lambda kv: (kv[1][0], kv[0]))
        )
    }
    rk_f = {
        u: i + 1
        for i, (u, _) in enumerate(
            sorted(users.items(), key=lambda kv: (kv[1][1], kv[0]))
        )
    }
    rk_m = {
        u: i + 1
        for i, (u, _) in enumerate(
            sorted(users.items(), key=lambda kv: (kv[1][2], kv[0]))
        )
    }
    for u, (r_days, f_n, m_sum) in users.items():
        row = rows[u]
        assert row["r_days"] == r_days, u
        assert row["f_n"] == f_n
        assert abs(row["m_sum"] - m_sum) < 1e-9
        assert row["r_score"] == 6 - quint(rk_r[u])
        assert row["f_score"] == quint(rk_f[u])
        assert row["m_score"] == quint(rk_m[u])
        assert 1 <= row["r_score"] <= 5
    # quintiles are balanced within rounding
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        c = Counter(r[col] for r in rows.values())
        assert max(c.values()) - min(c.values()) <= math.ceil(total / 5)
