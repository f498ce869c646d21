"""Wave 47 — python-model replays for d174–d177 (HLL registers, URL
canonical dedup, rank-biased overlap, Poisson bootstrap)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.operators.sketch import (
    HLL_M,
    hll_alpha,
)
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave47

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text", "n_chars"
    ).collect()


def py_hash(s: str, mod: int = 2_147_483_647) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def py_hash60(s: str) -> int:
    d = hashlib.md5(s.encode()).hexdigest()
    lo = int(d[:8], 16) % (1 << 30)
    hi = int(d[8:16], 16) % (1 << 30)
    return lo + (hi << 30)


# ---------------------------------------------------------------------------
# d174 — explicit-register HLL
# ---------------------------------------------------------------------------
def test_d174_matches_python_replay(spark):
    regs: dict[str, list[int]] = defaultdict(lambda: [0] * HLL_M)
    true: dict[str, set] = defaultdict(set)
    for r in _docs(spark):
        h = py_hash60("hll|" + r.text)
        idx, w = h % HLL_M, h // HLL_M
        if w == 0:
            rho = 55
        else:
            rho = 1
            while w % 2 == 0:
                w //= 2
                rho += 1
        regs[r.source][idx] = max(regs[r.source][idx], rho)
        true[r.source].add(r.text)

    num = hll_alpha() * HLL_M * HLL_M * float(1 << 55)
    out = _rows(spark, "d174_hll_cardinality")
    assert len(out) == len(regs)
    for row in out:
        rs = sum(1 << (55 - rho) for rho in regs[row.source])
        v = sum(1 for rho in regs[row.source] if rho == 0)
        assert row.register_sum == rs
        assert row.n_zero_registers == v
        raw = num / float(rs)
        est = (
            HLL_M * math.log(HLL_M / float(v))
            if raw <= 2.5 * HLL_M and v > 0
            else raw
        )
        assert row.est_distinct == pytest.approx(round(est, 6), abs=1e-9)
        assert row.true_distinct == len(true[row.source])


def test_d174_estimate_is_sane(spark):
    """The HLL estimate lands within the expected relative-error band
    (1.04/sqrt(64) ~ 13%; allow 3 sigma) of the exact count."""
    for row in _rows(spark, "d174_hll_cardinality"):
        assert row.est_distinct == pytest.approx(
            row.true_distinct, rel=0.39
        )


# ---------------------------------------------------------------------------
# d175 — URL canonicalization dedup
# ---------------------------------------------------------------------------
def _py_page_fields(doc_id: int):
    h = py_hash60(f"curl|{doc_id}")
    sub = wave47._C_SUB[(h // wave47._C_SUBF) % 3]
    site = min(
        (h // wave47._C_SITE_A) % wave47._N_SITES,
        (h // wave47._C_SITE_B) % wave47._N_SITES,
    )
    sfx = wave47._SUFFIXES[(h // wave47._C_SFX) % 8]
    page = (h // wave47._C_PAGE) % wave47._N_PAGES
    return sub, site, sfx, page


def test_d175_matches_python_replay(spark):
    groups: dict[tuple, list[int]] = defaultdict(list)
    for r in _docs(spark):
        sub, site, sfx, page = _py_page_fields(r.doc_id)
        # canonicalization strips scheme/userinfo/port/query/fragment/
        # trailing slash and the www. prefix; m. hosts stay distinct
        key = ("m." if sub == "m." else "") + f"site{site}.{sfx}/p/{page}"
        domain = f"site{site}.{sfx}"
        groups[(domain, key)].append(r.doc_id)

    per_dom = defaultdict(lambda: [0, 0, 0])  # urls, canonical, keepsum
    for (dom, _), ids in groups.items():
        per_dom[dom][0] += len(ids)
        per_dom[dom][1] += 1
        per_dom[dom][2] += min(ids)

    out = _rows(spark, "d175_url_canonical_dedup")
    assert len(out) == len(per_dom)
    for row in out:
        urls, canon, keep = per_dom[row.domain]
        assert (row.n_urls, row.n_canonical, row.kept_key_sum) == (
            urls,
            canon,
            keep,
        )
        assert row.n_dupes == urls - canon


def test_canonicalize_url_unit(spark):
    """Operator-level spot checks on handwritten URLs."""
    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.operators.domains import (
        canonicalize_url,
    )

    cases = [
        ("http://u:p@WWW.Ex.COM:8443/a/b/?q=1#f", "https://ex.com/a/b"),
        ("https://www.ex.com/a/b", "https://ex.com/a/b"),
        ("https://m.ex.com/", "https://m.ex.com"),
        ("https://ex.com", "https://ex.com"),
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    assert [r.c for r in got] == [want for _, want in cases]


# ---------------------------------------------------------------------------
# d176 — rank-biased overlap
# ---------------------------------------------------------------------------
def test_d176_matches_python_replay(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import domain_map

    n: Counter = Counter()
    mass: Counter = Counter()
    for r in domain_map(spark, SF).select("domain", "n_chars").collect():
        if r.domain is None:
            continue
        n[r.domain] += 1
        mass[r.domain] += r.n_chars

    ra = {
        d: i + 1
        for i, d in enumerate(sorted(n, key=lambda d: (-n[d], d)))
    }
    rb = {
        d: i + 1
        for i, d in enumerate(sorted(n, key=lambda d: (-mass[d], d)))
    }
    out = _rows(spark, "d176_rank_biased_overlap")
    assert [r.depth for r in out] == list(range(1, wave47._RBO_K + 1))
    cum = 0.0
    wts = dict(wave47._RBO_WTS)
    for row in out:
        d = row.depth
        ov = sum(1 for k in ra if ra[k] <= d and rb[k] <= d)
        assert row.overlap == ov
        assert row.agreement == pytest.approx(round(ov / d, 6), abs=1e-9)
        cum += wts[d] * (ov / d)
        assert row.rbo_min_cum == pytest.approx(round(cum, 6), abs=1e-9)
    # overlap is monotone non-decreasing; agreement bounded by 1
    ovs = [r.overlap for r in out]
    assert ovs == sorted(ovs)
    assert all(0.0 <= r.agreement <= 1.0 for r in out)


# ---------------------------------------------------------------------------
# d177 — Poisson bootstrap
# ---------------------------------------------------------------------------
def test_d177_matches_python_replay(spark):
    docs = [(r.doc_id, r.n_chars) for r in _docs(spark)]
    out = _rows(spark, "d177_poisson_bootstrap")
    assert [r.replicate for r in out] == list(range(wave47._BOOT_R))
    for row in out:
        n_eff = wx = 0
        for doc_id, n_chars in docs:
            u = py_hash(f"boot|{row.replicate}|{doc_id}")
            w = 6
            for k, t in enumerate(wave47._BOOT_T):
                if u < t:
                    w = k
                    break
            n_eff += w
            wx += w * n_chars
        assert (row.n_eff, row.weighted_chars) == (n_eff, wx)
        assert row.mean_chars == pytest.approx(
            round(wx / n_eff, 6), abs=1e-9
        )


def test_d177_weights_are_poisson_one(spark):
    """Replicate effective sizes concentrate around n (Poisson(1)
    weights have mean 1): every replicate within 4*sqrt(n) of n."""
    n = len(_docs(spark))
    for row in _rows(spark, "d177_poisson_bootstrap"):
        assert abs(row.n_eff - n) <= 4 * math.sqrt(n) + 1
