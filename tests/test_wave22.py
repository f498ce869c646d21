"""Semantic unit tests for wave 22 (q108, d122)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave22 import (
    _CORE_K,
    _CORE_ROUNDS,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q108_union_aligns_by_name(spark):
    rows = {r["event_id"]: r for r in Q["q108_schema_evolution_union"](spark, SF).collect()}
    ev = {e["event_id"]: e for e in load_table(spark, SF, "events").collect()}
    assert set(rows) == set(ev)
    for eid, r in rows.items():
        assert r["event_type"] == ev[eid]["event_type"]
        if eid % 2 == 0:
            assert r["schema_version"] == "v1"
            assert r["value"] is None  # missing column null-filled
        else:
            assert r["schema_version"] == "v2"
            assert r["value"] == ev[eid]["value"]


def test_d122_matches_python_peel(spark):
    rows = {r["node"]: r for r in Q["d122_kcore_peel"](spark, SF).collect()}
    edges = [
        (r["node_a"], r["node_b"])
        for r in Q["d62_knn_graph"](spark, SF).collect()
    ]
    nodes = {n for e in edges for n in e}
    assert set(rows) == nodes
    survived = {n: 0 for n in nodes}
    cur = list(edges)
    for _r in range(_CORE_ROUNDS):
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= _CORE_K}
        for n in alive:
            survived[n] += 1
        cur = [(a, b) for a, b in cur if a in alive and b in alive]
    final_alive = {n for n in nodes if survived[n] == _CORE_ROUNDS}
    for n in nodes:
        assert rows[n]["rounds_survived"] == survived[n], n
        assert rows[n]["in_core"] == (n in final_alive)
    # monotone sanity: the in-core set shrinks or holds each round
    assert sum(1 for r in rows.values() if r["in_core"]) <= len(nodes)
