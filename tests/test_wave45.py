"""Wave 45 — exact token-budget waterfilling (d170)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry

SF = "/root/testdata/sf0.01"


def _rows(spark, sf=SF):
    registry.load_all()
    return registry.QUERIES["d170_domain_token_waterfill"](
        spark, sf
    ).collect()


def test_d170_allocations_sum_exactly_to_budget(spark):
    rows = _rows(spark)
    total = sum(r.tokens for r in rows)
    budget = total * 60 // 100
    assert sum(r.alloc for r in rows) == budget
    for r in rows:
        assert 0 <= r.alloc <= r.tokens
        assert r.saturated == (r.alloc == r.tokens) or r.alloc in (
            r.tokens,
        )


def test_d170_matches_python_waterfill_replay(spark):
    rows = _rows(spark)
    counts = {r.domain: r.tokens for r in rows}
    total = sum(counts.values())
    b = total * 60 // 100
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    k = len(items)
    cum = 0
    i0, s0, t0 = 0, 0, 0
    for i, (_, t) in enumerate(items, start=1):
        cum += t
        si = cum + (k - i) * t
        if si <= b:
            i0, s0, t0 = i, si, t
    m = k - i0
    if m == 0:
        lev, rem = None, 0
    else:
        lev = t0 + (b - s0) // m
        rem = (b - s0) % m
    unsat = sorted(d for d, t in counts.items() if lev is not None and t > lev)
    bonus = set(unsat[:rem])
    expect = {}
    for d, t in counts.items():
        if lev is None or t <= lev:
            expect[d] = t
        else:
            expect[d] = lev + (1 if d in bonus else 0)
    got = {r.domain: r.alloc for r in rows}
    assert got == expect


def test_d170_levelling_shape(spark):
    """Unsaturated domains all sit at L or L+1; saturated ones keep
    their full token count (alloc == tokens)."""
    rows = _rows(spark)
    unsat_allocs = sorted(r.alloc for r in rows if not r.saturated)
    if unsat_allocs:
        assert max(unsat_allocs) - min(unsat_allocs) <= 1
    for r in rows:
        if r.saturated:
            assert r.alloc == r.tokens
