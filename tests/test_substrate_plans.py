"""Regression tests for the materialize-once mutual-kNN substrate
(round 5): every graph consumer must source its edges from the shared
knn_edges parquet artifact — none may regress to re-deriving the edge
list from the embedding table (the ~90 s-per-query-at-10× shape the
substrate removed)."""

from __future__ import annotations

import sys

import pytest

from kaggle_data_pipeline_with_aws_spark.plans.registry import QUERIES, load_all

sys.path.insert(0, "/root/repo/tools")

load_all()

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["d62_knn_graph", "d63_knn_triangles", "d64_label_vote"]
)
def test_graph_consumer_plan_scans_the_artifact(spark, name):
    """Executed plan starts at the materialized edge table and never
    re-runs the IVF pipeline. (d64 still scans embeddings for labels —
    allowed; what must not reappear are the IVF assignment stage's
    centroid-score columns or a cartesian centroid join.)"""
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "knn_edges" in plan, f"{name} does not scan the substrate"
    for marker in ("__cscore", "__crank", "CartesianProduct"):
        assert marker not in plan, f"{name} re-derives the kNN edges ({marker})"


@pytest.mark.parametrize(
    "query,module",
    [
        ("d122_kcore_peel", "plans.wave22"),
        ("d132_bfs_hops", "plans.wave30"),
    ],
)
def test_checkpointing_consumers_source_from_the_substrate(query, module):
    """d122/d132 eagerly localCheckpoint their edges, so the executed
    plan can't show the lineage; assert at the reference-graph level
    instead: their plan functions reach the substrate reader and have
    NO direct reference into the IVF machinery (operators.similarity)
    — the only path there is through knn_substrate.build_edges_plan,
    i.e. the one-time builder."""
    import proof_audit as pa

    graph = pa._RefGraph()
    fn = QUERIES[query]
    root = (fn.__module__, fn.__name__)
    direct = graph.edges[root]
    assert not any(
        m.endswith("operators.similarity") for m, _ in direct
    ), f"{query} calls the IVF machinery directly"
    closure = graph.closure({root})
    assert any(
        m.endswith("operators.knn_substrate") and s == "mutual_knn_edges"
        for m, s in closure
    ), f"{query} does not reach the substrate reader"
