"""Property tests: explicit-register HLL operators and the URL
canonicalizer vs python models (hypothesis)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators.sketch import (
    HLL_M,
    hll_estimate,
    hll_registers,
    hll_rho_sql,
)


def _py_rho(w: int) -> int:
    if w == 0:
        return 55
    r = 1
    while w % 2 == 0:
        w //= 2
        r += 1
    return r


def _py_regs(values: list[str]) -> list[int]:
    regs = [0] * HLL_M
    for v in values:
        d = hashlib.md5(f"hll|{v}".encode()).hexdigest()
        h = (int(d[:8], 16) % (1 << 30)) + (
            (int(d[8:16], 16) % (1 << 30)) << 30
        )
        idx, w = h % HLL_M, h // HLL_M
        regs[idx] = max(regs[idx], _py_rho(w))
    return regs


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(0, (1 << 54) - 1), min_size=1, max_size=40, unique=True
    )
)
def test_rho_case_matches_python_model(spark, ws):
    """The 54-branch trailing-zero CASE equals the python model for
    arbitrary 54-bit suffixes (including 0 and powers of two)."""
    df = spark.createDataFrame([(w,) for w in ws], "w long")
    got = {
        r.w: r.rho
        for r in df.select(
            "w", F.expr(hll_rho_sql("w")).alias("rho")
        ).collect()
    }
    assert got == {w: _py_rho(w) for w in ws}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text(st.characters(min_codepoint=33, max_codepoint=126),
                     min_size=1, max_size=12),
             min_size=1, max_size=30),
    st.lists(st.text(st.characters(min_codepoint=33, max_codepoint=126),
                     min_size=1, max_size=12),
             min_size=1, max_size=30),
)
def test_register_merge_homomorphism(spark, xs, ys):
    """registers(A ∪ B) == elementwise-max(registers(A), registers(B))
    — the property that makes the sketch shard/day/engine-mergeable —
    and the Spark register build agrees with the python model."""
    ra, rb = _py_regs(xs), _py_regs(ys)
    runion = _py_regs(list(set(xs) | set(ys)))
    assert runion == [max(a, b) for a, b in zip(ra, rb)]

    df = spark.createDataFrame(
        [("a", v) for v in xs] + [("b", v) for v in ys], "g string, v string"
    )
    dense = hll_registers(df, "g", "v").collect()
    got = {"a": [0] * HLL_M, "b": [0] * HLL_M}
    for r in dense:
        got[r.g][r.idx] = r.mrho
    assert got["a"] == ra and got["b"] == rb


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text(st.characters(min_codepoint=33, max_codepoint=126),
                     min_size=1, max_size=10),
             min_size=1, max_size=25, unique=True)
)
def test_estimate_bounds_and_state(spark, vals):
    """Estimates are positive, register sums live in the valid range,
    and zero-register counts reconcile with the python model."""
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    row = hll_estimate(hll_registers(df, "g", "v"), "g").collect()[0]
    regs = _py_regs(vals)
    assert row.register_sum == sum(1 << (55 - r) for r in regs)
    assert row.n_zero_registers == sum(1 for r in regs if r == 0)
    assert 64 <= row.register_sum <= 64 * (1 << 55)
    assert row.est_distinct > 0


@settings(max_examples=8, deadline=None)
@given(
    sub=st.sampled_from(["", "www.", "m.", "cdn."]),
    site=st.integers(0, 5),
    sfx=st.sampled_from(["com", "co.uk", "net"]),
    scheme=st.sampled_from(["http", "https"]),
    user=st.sampled_from(["", "u:p@"]),
    port=st.sampled_from(["", ":8080"]),
    path=st.sampled_from(["", "/a", "/a/b/", "/a//"]),
    qf=st.sampled_from(["", "?x=1", "#f", "?x=1#f"]),
)
def test_canonicalize_url_idempotent(
    spark, sub, site, sfx, scheme, user, port, path, qf
):
    """canonicalize(canonicalize(u)) == canonicalize(u): the
    normalizer is a projection — second application is identity."""
    from kaggle_data_pipeline_with_aws_spark.operators.domains import (
        canonicalize_url,
    )

    url = f"{scheme}://{user}{sub}site{site}.{sfx}{port}{path}{qf}"
    df = spark.createDataFrame([(url,)], "url string")
    row = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()[0]
    assert row.c1 == row.c2
    assert row.c1.startswith("https://")
    assert not row.c1.endswith("/")
    assert "?" not in row.c1 and "#" not in row.c1 and "@" not in row.c1
