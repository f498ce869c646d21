"""Semantic unit tests for wave 24 (q109, d125)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave24 import _PREFIX_KS
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q109_matches_python_twa(spark):
    rows = {r["user_id"]: r for r in Q["q109_time_weighted_avg"](spark, SF).collect()}
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda e: (e["user_id"], e["ts"], e["event_id"]),
    )
    per_user: dict[int, list] = {}
    for e in ev:
        per_user.setdefault(e["user_id"], []).append(e)
    for u, es in per_user.items():
        holds = [
            (a["value"], (b["ts"] - a["ts"]).total_seconds())
            for a, b in zip(es, es[1:])
            if (b["ts"] - a["ts"]).total_seconds() > 0
        ]
        if not holds:
            assert u not in rows
            continue
        r = rows[u]
        assert r["n_holds"] == len(holds)
        twa = sum(v * d for v, d in holds) / sum(d for _, d in holds)
        assert abs(r["twa_value"] - twa) < 1e-4
        naive = sum(v for v, _ in holds) / len(holds)
        assert abs(r["naive_mean"] - naive) < 1e-4


def test_q109_twa_differs_from_naive_when_durations_skew(spark):
    """Constructed series: value 100 held 99 s, value 0 held 1 s —
    TWA ≈ 99, naive mean = 50."""
    from kaggle_data_pipeline_with_aws_spark.plans.wave24 import (
        q109_time_weighted_avg,  # noqa: F401 — formula replayed below
    )

    holds = [(100.0, 99.0), (0.0, 1.0)]
    twa = sum(v * d for v, d in holds) / sum(d for _, d in holds)
    naive = sum(v for v, _ in holds) / len(holds)
    assert abs(twa - 99.0) < 1e-12
    assert abs(naive - 50.0) < 1e-12


def test_d125_matches_python_and_curve_falls(spark):
    rows = {r["k"]: r for r in Q["d125_prefix_cache_rates"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    assert set(rows) == set(_PREFIX_KS)
    for k in _PREFIX_KS:
        prefixes: dict[str, int] = {}
        for d in docs:
            tok = d["text"].split(" ")
            if len(tok) >= k:
                p = " ".join(tok[:k])
                prefixes[p] = prefixes.get(p, 0) + 1
        n_docs = sum(prefixes.values())
        n_shared = sum(n for n in prefixes.values() if n > 1)
        assert rows[k]["n_docs"] == n_docs
        assert rows[k]["n_shared"] == n_shared
        assert abs(rows[k]["hit_rate"] - round(n_shared / n_docs, 6)) < 1e-9
    # longer prefixes can only reduce (or hold) the hit rate
    rates = [rows[k]["hit_rate"] for k in sorted(_PREFIX_KS)]
    assert rates == sorted(rates, reverse=True)
