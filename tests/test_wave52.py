"""Wave 52 — python-model replays for d188–d190 (incremental agg
merge, bucketed MI, purged time split)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import datetime, timedelta

import pytest

from kaggle_data_pipeline_with_aws_spark.operators.sketch import HLL_M
from kaggle_data_pipeline_with_aws_spark.plans import registry, wave52
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


def _h60(s: str) -> int:
    d = hashlib.md5(s.encode()).hexdigest()
    return (int(d[:8], 16) % (1 << 30)) + (
        (int(d[8:16], 16) % (1 << 30)) << 30
    )


def _rho(w: int) -> int:
    if w == 0:
        return 55
    r = 1
    while w % 2 == 0:
        w //= 2
        r += 1
    return r


# ---------------------------------------------------------------------------
# d188 — incremental aggregate merge
# ---------------------------------------------------------------------------
def test_d188_matches_python_replay(spark):
    ev = load_table(spark, SF, "events").collect()
    stats: dict = defaultdict(lambda: [0, 0, None, None])
    regs: dict = defaultdict(lambda: [0] * HLL_M)
    for r in ev:
        st = stats[r.event_type]
        st[0] += 1
        st[1] += round(r.value * 1000000.0)
        st[2] = r.ts if st[2] is None else min(st[2], r.ts)
        st[3] = r.ts if st[3] is None else max(st[3], r.ts)
        h = _h60(f"hll|{r.user_id}")
        rg = regs[r.event_type]
        rg[h % HLL_M] = max(rg[h % HLL_M], _rho(h // HLL_M))

    out = _rows(spark, "d188_incremental_agg_merge")
    assert {r.event_type for r in out} == set(stats)
    for row in out:
        n, v6, t0, t1 = stats[row.event_type]
        assert row.merge_matches_full is True
        assert (row.n_events, row.value_sum_e6) == (n, v6)
        assert (row.first_ts, row.last_ts) == (t0, t1)
        assert row.hll_reg_sum == sum(
            1 << (55 - rho) for rho in regs[row.event_type]
        )


def test_d188_merge_both_sides_nonempty(spark):
    """The cutover actually splits the data — the merge path is
    exercised, not degenerate."""
    ev = load_table(spark, SF, "events").collect()
    cut = datetime(2024, 1, 21)
    assert any(r.ts < cut for r in ev) and any(r.ts >= cut for r in ev)


# ---------------------------------------------------------------------------
# d189 — bucketed MI
# ---------------------------------------------------------------------------
def test_d189_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cxy: Counter = Counter()
    for r in docs:
        x = min(r.n_chars // wave52._MI_XW, wave52._MI_B - 1)
        y = min(
            len(r.text.split(" ")) // wave52._MI_YW, wave52._MI_B - 1
        )
        cxy[(x, y)] += 1
    n = sum(cxy.values())
    cx: Counter = Counter()
    cy: Counter = Counter()
    for (x, y), c in cxy.items():
        cx[x] += c
        cy[y] += c
    mi = sum(
        (c / n) * math.log2(c * n / (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    )
    hx = math.log2(n) - sum(c * math.log2(c) for c in cx.values()) / n
    hy = math.log2(n) - sum(c * math.log2(c) for c in cy.values()) / n

    out = _rows(spark, "d189_length_token_mi")
    assert len(out) == 1
    row = out[0]
    assert row.n_docs == n
    assert row.n_cells == len(cxy)
    assert row.mi_bits == pytest.approx(mi, abs=1e-5)
    assert row.h_x == pytest.approx(hx, abs=1e-5)
    assert row.h_y == pytest.approx(hy, abs=1e-5)
    assert row.nmi == pytest.approx(
        round(row.mi_bits / min(row.h_x, row.h_y), 6), abs=1e-9
    )
    # MI bounds: 0 <= MI <= min(Hx, Hy); length and tokens are
    # strongly dependent in this corpus
    assert -1e-9 <= row.mi_bits <= min(row.h_x, row.h_y) + 1e-9
    assert row.nmi > 0.3


# ---------------------------------------------------------------------------
# d190 — purged time split
# ---------------------------------------------------------------------------
def test_d190_matches_python_replay(spark):
    ev = load_table(spark, SF, "events").collect()
    t = datetime(2024, 1, 21)
    emb = t + timedelta(days=2)
    split_of = (
        lambda ts: "train" if ts < t else ("purged" if ts < emb else "test")
    )
    n_ev: Counter = Counter()
    users: dict = defaultdict(set)
    last_train: dict = {}
    first_test: dict = {}
    for r in ev:
        s = split_of(r.ts)
        n_ev[s] += 1
        users[s].add(r.user_id)
        if s == "train":
            last_train[r.user_id] = max(
                last_train.get(r.user_id, r.ts), r.ts
            )
        elif s == "test":
            first_test[r.user_id] = min(
                first_test.get(r.user_id, r.ts), r.ts
            )
    overlap = set(last_train) & set(first_test)
    min_gap = min(
        (first_test[u] - last_train[u] for u in overlap),
        default=None,
    )
    out = {r.split: r for r in _rows(spark, "d190_purged_time_split")}
    assert set(out) == {"train", "purged", "test"}
    for s in out:
        assert out[s].n_events == n_ev[s]
        assert out[s].n_users == len(users[s])
        assert out[s].n_overlap_users == len(overlap)
        assert out[s].min_gap_us == int(
            min_gap.total_seconds() * 1_000_000
        )
        assert out[s].embargo_holds is True
    assert out["purged"].n_events > 0  # the embargo drops real data
