"""Semantic unit tests for wave 31 (d135, d136, q113)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_d135_matches_python_ks(spark):
    rows = Q["d135_ks_source_drift"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    by_src = defaultdict(list)
    for d in docs:
        by_src[d["source"]].append(d["n_chars"])
    grid = sorted({d["n_chars"] for d in docs})

    def ecdf(vals, v):
        return sum(1 for x in vals if x <= v) / len(vals)

    got = {(r["source_a"], r["source_b"]): r["ks_stat"] for r in rows}
    srcs = sorted(by_src)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            want = max(
                abs(ecdf(by_src[a], v) - ecdf(by_src[b], v)) for v in grid
            )
            assert abs(got[(a, b)] - want) < 1e-6, (a, b)
    for ks in got.values():
        assert 0.0 <= ks <= 1.0


def test_d136_chi2_matches_contingency(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave31 import (
        _KEYNESS_TOPK,
        _KEYNESS_VOCAB,
    )

    rows = Q["d136_chi2_keyness"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    tok = [(d["source"], t) for d in docs for t in d["text"].split(" ")]
    n = len(tok)
    tok_n = Counter(t for _, t in tok)
    top = sorted(tok_n.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_KEYNESS_VOCAB
    ]
    top_set = dict(top)
    src_n = Counter(s for s, _ in tok)
    k11 = Counter((s, t) for s, t in tok if t in top_set)

    def chi2(s, t):
        a = k11[(s, t)]
        b = src_n[s] - a
        c = top_set[t] - a
        d = n - a - b - c
        num = n * (a * d - b * c) ** 2
        den = (a + b) * (a + c) * (b + d) * (c + d)
        return num / den

    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(r)
    for s, rs in per_src.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _KEYNESS_TOPK
        for r in rs:
            assert abs(r["chi2"] - chi2(s, r["token"])) < 1e-4
        # reported keywords really are the argmax set
        want = sorted(
            ((t, chi2(s, t)) for (s2, t) in k11 if s2 == s),
            key=lambda kv: (-kv[1], kv[0]),
        )[: len(rs)]
        assert [r["token"] for r in rs] == [t for t, _ in want]


def test_q113_benford_shares_reconcile(spark):
    rows = Q["q113_benford_audit"](spark, SF).collect()
    orders = load_table(spark, SF, "orders").collect()
    digits = Counter(
        int(str(int(round(o["o_totalprice"] * 100)))[0]) for o in orders
    )
    tot = sum(digits.values())
    got = {r["digit"]: r for r in rows}
    assert set(got) == set(digits)
    for d, r in got.items():
        assert r["n_orders"] == digits[d]
        assert abs(r["obs_share"] - digits[d] / tot) < 1e-6
        assert abs(r["exp_share"] - math.log10(1 + 1 / d)) < 1e-6
        assert abs(r["abs_dev"] - abs(r["obs_share"] - r["exp_share"])) < 2e-6
    # shares sum to ~1 on both axes
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
