"""Semantic unit tests for wave 28 (q112, d130)."""

from __future__ import annotations

import numpy as np

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave28 import (
    _K_CENTERS,
    _STATE_TYPES,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q112_state_is_as_of_not_latest(spark):
    rows = {r["event_id"]: r for r in Q["q112_point_in_time_join"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    states: dict[int, list] = {}
    for e in sorted(ev, key=lambda e: (e["ts"], e["event_id"])):
        if e["event_type"] in _STATE_TYPES:
            states.setdefault(e["user_id"], []).append(e)
    clicks = [e for e in ev if e["event_type"] == "click"]
    assert set(rows) == {c["event_id"] for c in clicks}
    n_null = 0
    for c in clicks:
        r = rows[c["event_id"]]
        prior = [
            s for s in states.get(c["user_id"], []) if s["ts"] <= c["ts"]
        ]
        if not prior:
            assert r["state_at_event"] is None
            n_null += 1
        else:
            last = prior[-1]
            assert r["state_at_event"] == last["event_type"], c["event_id"]
            assert r["state_since"] == last["ts"]
    # the fixture must exercise both branches
    assert 0 < n_null < len(clicks)
    # exactly one row per click — the intervals tile, no duplication
    assert len(rows) == len(clicks)


def test_d130_matches_python_greedy_kcenter(spark):
    rows = sorted(
        Q["d130_kcenter_coreset"](spark, SF).collect(),
        key=lambda r: r["sel_order"],
    )
    embs = {
        e["vec_id"]: np.array(e["embedding"], dtype=np.float64)
        for e in load_table(spark, SF, "embeddings").collect()
    }
    chosen = [0]
    mind = {
        v: round(float(((x - embs[0]) ** 2).sum()), 6)
        for v, x in embs.items()
    }
    expect = [(1, 0, 0.0)]
    for k in range(2, _K_CENTERS + 1):
        far = min(mind.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((k, far[0], far[1]))
        chosen.append(far[0])
        c = embs[far[0]]
        for v, x in embs.items():
            mind[v] = min(mind[v], round(float(((x - c) ** 2).sum()), 6))
    got = [(r["sel_order"], r["vec_id"], r["dist_at_selection"]) for r in rows]
    for (go, gv, gd), (eo, ev_, ed) in zip(got, expect):
        assert (go, gv) == (eo, ev_)
        assert abs(gd - ed) < 1e-9
    # selection distances are non-increasing (greedy property)
    dists = [d for _, _, d in got[1:]]
    assert dists == sorted(dists, reverse=True)
    assert len(set(chosen)) == _K_CENTERS
