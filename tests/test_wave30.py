"""Semantic unit tests for wave 30 (d132, d133, d134)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.retrieval import (
    _mutual_knn_edges,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def _python_bfs(seeds, edges, max_hops):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
        if not frontier:
            break
    return dist


def test_d132_matches_python_bfs(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave30 import _BFS_MAX_HOPS

    got = {
        r["node"]: r["hops"] for r in Q["d132_bfs_hops"](spark, SF).collect()
    }
    edges = [
        (r["node_a"], r["node_b"])
        for r in _mutual_knn_edges(spark, SF).collect()
    ]
    embs = load_table(spark, SF, "embeddings").collect()
    seeds = [e["vec_id"] for e in embs if e["vec_id"] < 16]
    want = _python_bfs(seeds, edges, _BFS_MAX_HOPS)
    assert got == want
    # every seed is present at distance 0, even isolated ones
    assert all(got[s] == 0 for s in seeds)


def test_d132_bfs_operator_emits_min_distance_once(spark):
    """Diamond + cap: a node reachable two ways keeps the shorter
    path, and nodes beyond max_hops are absent."""
    from kaggle_data_pipeline_with_aws_spark.operators.components import (
        bfs_min_hops,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)],
        "node_a long, node_b long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_min_hops(seeds, edges, max_hops=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}  # 4 is 3 hops away — capped


def test_d133_rrf_prefers_doubly_ranked_neighbors(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave30 import (
        _RRF_DEPTH,
        _RRF_K,
        _RRF_TOPK,
    )
    from kaggle_data_pipeline_with_aws_spark.operators import similarity

    embs = load_table(spark, SF, "embeddings")
    queries = embs.filter("vec_id < 10")
    ex = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in similarity.brute_force_topk(
            embs, queries, k=_RRF_DEPTH
        ).collect()
    }
    ls = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in similarity.hyperplane_lsh_topk(
            embs, queries, k=_RRF_DEPTH
        ).collect()
    }
    rows = Q["d133_rrf_fusion"](spark, SF).collect()
    assert rows
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        want = 0.0
        if key in ex:
            want += 1.0 / (_RRF_K + ex[key])
        if key in ls:
            want += 1.0 / (_RRF_K + ls[key])
        assert abs(r["rrf_score"] - want) < 1e-6
        assert 1 <= r["fused_rank"] <= _RRF_TOPK
    # per query: ranks are dense from 1 and scores non-increasing
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_d134_ndcg_bounds_and_perfect_ranking_is_one(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave30 import (
        _IDCG,
        _NDCG_K,
    )

    rows = Q["d134_ndcg_eval"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0 <= r["n_hits"] <= _NDCG_K
    # a system ranking identical to the ground truth scores exactly 1
    import math

    dcg = sum(
        (_NDCG_K + 1 - j) / math.log2(j + 1) for j in range(1, _NDCG_K + 1)
    )
    assert abs(dcg / _IDCG - 1.0) < 1e-12
