"""Wave 53 — python-model replays for d191–d193 (expectation suite,
transition entropy, attribution models)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import pytest

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave53
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


# ---------------------------------------------------------------------------
# d191 — expectation suite
# ---------------------------------------------------------------------------
def test_d191_matches_python_replay(spark):
    li = load_table(spark, SF, "lineitem").collect()
    orders = load_table(spark, SF, "orders").collect()
    cust = load_table(spark, SF, "customer").collect()
    ev = load_table(spark, SF, "events").collect()
    docs = load_table(spark, SF, "documents").collect()

    def dup(rows, key):
        c = Counter(getattr(r, key) for r in rows)
        return sum(v - 1 for v in c.values())

    from datetime import datetime

    want = {
        "lineitem_quantity_in_range": (
            sum(1 for r in li if r.l_quantity < 1 or r.l_quantity > 50),
            len(li),
        ),
        "lineitem_price_positive": (
            sum(1 for r in li if r.l_extendedprice <= 0),
            len(li),
        ),
        "orders_key_unique": (dup(orders, "o_orderkey"), len(orders)),
        "customer_acctbal_not_null": (
            sum(1 for r in cust if r.c_acctbal is None),
            len(cust),
        ),
        "events_type_in_enum": (
            sum(
                1
                for r in ev
                if r.event_type not in wave53._EVENT_ENUM
            ),
            len(ev),
        ),
        "events_fresh": (
            0
            if max(r.ts for r in ev) >= datetime(2024, 1, 29)
            else 1,
            len(ev),
        ),
        "events_value_non_negative": (
            sum(1 for r in ev if r.value < 0),
            len(ev),
        ),
        "documents_key_unique": (dup(docs, "doc_id"), len(docs)),
        "documents_text_nonempty": (
            sum(1 for r in docs if not r.text),
            len(docs),
        ),
    }
    out = _rows(spark, "d191_expectation_suite")
    assert {r.expectation for r in out} == set(want)
    for row in out:
        v, n = want[row.expectation]
        assert (row.violations, row.n_rows) == (v, n), row.expectation
        assert row.passed == (v == 0)
        assert row.violation_rate == pytest.approx(
            round(v / n, 6), abs=1e-9
        )


# ---------------------------------------------------------------------------
# d192 — transition entropy
# ---------------------------------------------------------------------------
def test_d192_matches_python_replay(spark):
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    tc: Counter = Counter()
    prev_user, prev_type = None, None
    for r in ev:
        if r.user_id == prev_user:
            tc[(prev_type, r.event_type)] += 1
        prev_user, prev_type = r.user_id, r.event_type
    pn: Counter = Counter()
    for (p, _), c in tc.items():
        pn[p] += c
    total = sum(tc.values())

    out = _rows(spark, "d192_transition_entropy")
    assert {r.prev_type for r in out} == set(pn)
    rate = 0.0
    for row in out:
        p = row.prev_type
        assert row.n_transitions == pn[p]
        h = math.log2(pn[p]) - sum(
            c * math.log2(c) for (q, _), c in tc.items() if q == p
        ) / pn[p]
        assert row.h_next_bits == pytest.approx(h, abs=1e-5)
        assert row.share == pytest.approx(
            round(pn[p] / total, 6), abs=1e-9
        )
        rate += row.rate_contrib_bits
        # entropy bounded by log2 of the next-type alphabet
        k = sum(1 for (q, _) in tc if q == p)
        assert -1e-9 <= row.h_next_bits <= math.log2(max(k, 2)) + 1e-9
    assert 0.0 <= rate <= math.log2(len(pn)) + 1e-6


# ---------------------------------------------------------------------------
# d193 — attribution models
# ---------------------------------------------------------------------------
def test_d193_matches_python_replay(spark):
    ev = load_table(spark, SF, "events").collect()
    by_user: dict = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    credit: dict = defaultdict(float)
    touches_credited: dict = defaultdict(int)
    look = timedelta(days=7)
    for rows in by_user.values():
        convs = [r for r in rows if r.event_type == "purchase"]
        touch = [
            r for r in rows if r.event_type in wave53._TOUCH_TYPES
        ]
        for c in convs:
            win = [
                t
                for t in touch
                if t.ts < c.ts and t.ts >= c.ts - look
            ]
            if not win:
                continue
            first = min(win, key=lambda t: (t.ts, t.event_id))
            last = max(win, key=lambda t: (t.ts, t.event_id))
            credit[("first_touch", first.event_type)] += 1.0
            touches_credited[("first_touch", first.event_type)] += 1
            credit[("last_touch", last.event_type)] += 1.0
            touches_credited[("last_touch", last.event_type)] += 1
            for t in win:
                credit[("linear", t.event_type)] += 1.0 / len(win)
                touches_credited[("linear", t.event_type)] += 1

    out = _rows(spark, "d193_attribution_models")
    got = {(r.model, r.channel): r for r in out}
    # spark emits zero-credit channels too when they received rows;
    # compare on the union of keys with credit
    for key, val in credit.items():
        assert key in got, key
        assert got[key].credit == pytest.approx(
            round(val, 6), abs=1e-6
        )
        assert got[key].n_credited_touches == touches_credited[key]
    # conservation: every model distributes exactly one credit per
    # converted purchase
    per_model: dict = defaultdict(float)
    for (m, _), v in credit.items():
        per_model[m] += v
    assert per_model["first_touch"] == per_model["last_touch"]
    assert per_model["linear"] == pytest.approx(
        per_model["first_touch"], abs=1e-9
    )
