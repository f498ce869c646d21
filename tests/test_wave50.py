"""Wave 50 — python-model replays for d185–d187 (k-anonymity audit,
join-cardinality estimator audit, HLL set algebra)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.operators.sketch import (
    HLL_M,
    hll_alpha,
)
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave50

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


# ---------------------------------------------------------------------------
# d185 — k-anonymity
# ---------------------------------------------------------------------------
def test_d185_matches_python_replay(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    groups: dict = defaultdict(list)
    for r in cust:
        qi = (
            r.c_nationkey,
            r.c_mktsegment,
            math.floor(r.c_acctbal / wave50._QI_BUCKET),
        )
        groups[qi].append(r.c_acctbal)
    sizes = [len(v) for v in groups.values()]
    ldivs = [len(set(v)) for v in groups.values()]
    out = _rows(spark, "d185_k_anonymity")
    assert [r.k for r in out] == list(wave50._K_THRESHOLDS)
    for row in out:
        below = [s for s in sizes if s < row.k]
        assert row.n_groups == len(groups)
        assert row.n_rows == len(cust)
        assert row.min_group_size == min(sizes)
        assert row.min_l_diversity == min(ldivs)
        assert row.groups_below_k == len(below)
        assert row.rows_below_k == sum(below)
        assert row.share_below_k == pytest.approx(
            round(sum(below) / len(cust), 6), abs=1e-9
        )
    # risk is monotone in k
    rb = [r.rows_below_k for r in out]
    assert rb == sorted(rb)


# ---------------------------------------------------------------------------
# d186 — join-cardinality estimator audit
# ---------------------------------------------------------------------------
def test_d186_matches_python_replay(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()

    def leg(lrows, lkey, rrows, rkey):
        a = Counter(getattr(r, lkey) for r in lrows)
        b = Counter(getattr(r, rkey) for r in rrows)
        actual = sum(a[k] * b[k] for k in a if k in b)
        est = len(lrows) * len(rrows) / max(len(a), len(b))
        return len(lrows), len(rrows), len(a), len(b), actual, est

    expect = {
        "customer_orders": leg(cust, "c_custkey", orders, "o_custkey"),
        "orders_lineitem": leg(orders, "o_orderkey", li, "l_orderkey"),
    }
    out = _rows(spark, "d186_join_cardinality_estimate")
    assert {r.join_name for r in out} == set(expect)
    for row in out:
        nl, nr, vl, vr, actual, est = expect[row.join_name]
        assert (row.n_left, row.n_right, row.v_left, row.v_right) == (
            nl, nr, vl, vr,
        )
        assert row.actual_rows == actual
        assert row.est_rows == pytest.approx(round(est, 6), abs=1e-6)
        assert row.actual_over_est == pytest.approx(
            round(actual / est, 6), abs=1e-6
        )


# ---------------------------------------------------------------------------
# d187 — HLL set algebra
# ---------------------------------------------------------------------------
def _h60(s: str) -> int:
    d = hashlib.md5(s.encode()).hexdigest()
    return (int(d[:8], 16) % (1 << 30)) + (
        (int(d[8:16], 16) % (1 << 30)) << 30
    )


def _regs(values) -> list[int]:
    regs = [0] * HLL_M
    for v in values:
        h = _h60("hll|" + v)
        idx, w = h % HLL_M, h // HLL_M
        if w == 0:
            rho = 55
        else:
            rho = 1
            while w % 2 == 0:
                w //= 2
                rho += 1
        regs[idx] = max(regs[idx], rho)
    return regs


def _est(regs: list[int]) -> float:
    num = hll_alpha() * HLL_M * HLL_M * float(1 << 55)
    rs = sum(1 << (55 - r) for r in regs)
    v = sum(1 for r in regs if r == 0)
    raw = num / float(rs)
    if raw <= 2.5 * HLL_M and v > 0:
        return round(HLL_M * math.log(HLL_M / float(v)), 6)
    return round(raw, 6)


def test_d187_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    srcs = sorted({r.source for r in docs})[: wave50._SETOP_NSRC]
    texts: dict = {s: set() for s in srcs}
    for r in docs:
        if r.source in texts:
            texts[r.source].add(r.text)
    regs = {s: _regs(texts[s]) for s in srcs}

    out = _rows(spark, "d187_hll_set_ops")
    pairs = [(a, b) for a in srcs for b in srcs if a < b]
    assert [(r.src_a, r.src_b) for r in out] == sorted(pairs)
    for row in out:
        a, b = row.src_a, row.src_b
        ea, eb = _est(regs[a]), _est(regs[b])
        eu = _est([max(x, y) for x, y in zip(regs[a], regs[b])])
        assert row.est_a == pytest.approx(ea, abs=1e-9)
        assert row.est_b == pytest.approx(eb, abs=1e-9)
        assert row.est_union == pytest.approx(eu, abs=1e-9)
        assert row.est_inter == pytest.approx(
            round(ea + eb - eu, 6), abs=1e-9
        )
        inter = len(texts[a] & texts[b])
        union = len(texts[a] | texts[b])
        assert (row.exact_a, row.exact_b) == (
            len(texts[a]),
            len(texts[b]),
        )
        assert (row.exact_inter, row.exact_union) == (inter, union)
        assert row.exact_jaccard == pytest.approx(
            round(inter / union, 6), abs=1e-9
        )
        # merged union register set dominates both inputs
        assert eu >= max(ea, eb) - 1e-9
