"""NSW-style greedy beam search over the materialized kNN graph — the
graph-traversal ANN serving pattern (round-8 verdict #5: the missing
face next to IVF / IVF-PQ / LSH in the serving tier).

The public navigable-small-world idea (Malkov et al.; HNSW's layer-0):
start from fixed entry points, keep a beam of the best candidates seen
so far, repeatedly expand the beam's graph neighbors, and stop when
the beam converges. This module is the bounded-round, set-synchronous
form of that search over the repo's published mutual-kNN edge
substrate (operators/knn_substrate.py):

- **All queries search at once.** The beam state is a DataFrame
  (query_id, node, score); each round is one frontier-sized join
  against the symmetric adjacency (the d132 BFS discipline), one
  anti-join against the visited set (a node is scored exactly once
  per query), one scoring join, and a windowed top-B reselect. Rounds
  are BOUNDED (the oracle unrolls them), so the plan is R short
  stages, not a data-dependent loop.
- **Beam = ef-search semantics.** After each expansion the beam
  re-selects the best B nodes of EVERYTHING visited (not just the new
  frontier) — the classic best-first ef queue, set-synchronously.
- **Determinism.** Scores are round(cos, 6) with node-id tiebreak in
  every windowed selection, so beams, visited sets, and results are
  engine-independent (the repo's d133/d134 ranking convention).

Scale shape: per round the joined volume is (queries × beam × degree)
— query-set bounded, never corpus-bounded; the adjacency is the
substrate artifact partitioned by source node; the per-query visited
set stays ≤ entry + R × B × degree rows. The graph build itself is
amortized across the whole graph tier (build once, read many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine


def symmetric_adjacency(edges: DataFrame) -> DataFrame:
    """(u, v) both directions of an undirected (node_a, node_b) list."""
    return edges.select(
        F.col("node_a").alias("u"), F.col("node_b").alias("v")
    ).unionByName(
        edges.select(F.col("node_b").alias("u"), F.col("node_a").alias("v"))
    )


def _score(
    cand: DataFrame, embs: DataFrame, queries: DataFrame
) -> DataFrame:
    """Attach round(cos(query, node), 6) to (query_id, node) pairs.
    The query side (id + vector) broadcasts — query sets are small by
    contract; the node side equi-joins the embedding table."""
    e = embs.select(
        F.col("vec_id").alias("node"), F.col("embedding").alias("nvec")
    )
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("qvec")
    )
    return (
        cand.join(e, "node")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "node",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("score"),
        )
    )


def _beam_rank() -> Window:
    return Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("node")
    )


def _ckpt_by_query(visited: DataFrame) -> DataFrame:
    """Materialize the visited set between beam rounds (lineage
    bound). MEASURED AND REJECTED (round 12): repartition("query_id")
    before the checkpoint, so the next round's top-B window could
    reuse the partitioning (guide §2.4) — under AQE the checkpointed
    RDD scans back as UnknownPartitioning (the committed d216 plan
    shows it), so the window re-exchanges anyway and the repartition
    is a pure extra exchange per round. Plain checkpoint kept."""
    return visited.localCheckpoint()


def _new_frontier(
    beam_df: DataFrame, sym: DataFrame, visited: DataFrame
) -> DataFrame:
    """The (query_id, node) pairs adjacent to the beam and NOT yet
    visited: candidate distinct + left-anti join against the visited
    set. MEASURED AND REJECTED (round 12): a single (query_id, node)-
    keyed min(flag) aggregation over the expansion ∪ visited keys —
    statically a prettier plan (one exchange instead of three, no
    anti-join sorts or runtime-bloom subquery, and the committed d216
    `_after` plan from the experiment shows SMJ 1 → 0) — but an
    interleaved A/B at sf0.1 read it consistently 15-20% SLOWER
    (d204 2.45→2.82, d208 2.41→2.84, d216 4.03→4.98, d217 4.64→5.47
    min-of-4 each arm): AQE already converts the tiny anti-join to a
    runtime broadcast with no exchange on the streamed side, while an
    aggregation can never be broadcast-converted, so the flag form
    forces a real shuffle per round. Same family as round 11's
    rejected broadcast hints: on query-bounded frames, leave the tiny
    joins to AQE."""
    return (
        beam_df.join(sym, beam_df["node"] == sym["u"])
        .select("query_id", sym["v"].alias("node"))
        .distinct()
        .filter(F.col("node") != F.col("query_id"))
        .join(visited, ["query_id", "node"], "left_anti")
    )


def search_visited(
    queries: DataFrame,
    edges: DataFrame,
    embs: DataFrame,
    entry_points: DataFrame,
    beam: int,
    rounds: int,
) -> DataFrame:
    """The full visited-and-scored set (query_id, node, score) after
    ``rounds`` bounded beam expansions from ``entry_points`` (a
    1-column ``node`` DataFrame). The query's own node never scores
    (self-match excluded at candidate time)."""
    sym = symmetric_adjacency(edges)
    w = _beam_rank()
    cand0 = (
        queries.select("query_id")
        .crossJoin(F.broadcast(entry_points.select("node")))
        .filter(F.col("node") != F.col("query_id"))
    )
    visited = _ckpt_by_query(_score(cand0, embs, queries))
    for r in range(rounds):
        beam_df = (
            visited.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= beam)
            .drop("rk")
        )
        cand = _new_frontier(beam_df, sym, visited)
        visited = visited.unionByName(_score(cand, embs, queries))
        # Checkpoint BETWEEN rounds only: it bounds lineage growth
        # (each round references `visited` three times, so lazy
        # composition is exponential in rounds), but after the LAST
        # expansion the consumer reads the result once — that final
        # eager materialization job was pure overhead (round 11,
        # guide §1.2: one fewer Spark job per search, values
        # untouched since the plan below the union is identical).
        if r < rounds - 1:
            visited = _ckpt_by_query(visited)
    return visited


def search_visited_from(
    queries: DataFrame,
    edges: DataFrame,
    embs: DataFrame,
    entry_pairs: DataFrame,
    beam: int,
    rounds: int,
) -> DataFrame:
    """``search_visited`` with PER-QUERY entry points — the HNSW
    layered-descent hook (round-10 verdict #6): ``entry_pairs`` is a
    (query_id, node) DataFrame (e.g. the top-e of an upper-layer
    search), so each query starts its layer-0 beam at entries already
    near it instead of at fixed global entries. Everything else is the
    bounded set-synchronous search: frontier join → visited anti-join
    → score → top-B reselect, rounds bounded, determinism via
    round(cos, 6) + node-id tiebreaks.

    If ``entry_pairs`` ALREADY carries a ``score`` column — the
    layered descent's case: the upper-layer search scored every
    (query, node) it visited with this module's own round(cos, 6)
    over the same embedding table — the scores pass through instead
    of being recomputed, removing one full embedding-table join per
    search (guide §2.4: don't re-derive what an earlier pass already
    computed). Values are identical by construction. Pre-scored
    entries must be unique per (query_id, node) — true of any
    windowed top-e selection; self-pairs are dropped either way. The
    initial checkpoint stays in BOTH arms: round 0 references the
    visited set three times, and a layered caller's entry frame hides
    the upper search's (deliberately lazy) final expansion round —
    without the checkpoint that corpus-joining subtree would execute
    three times instead of once."""
    sym = symmetric_adjacency(edges)
    w = _beam_rank()
    if "score" in entry_pairs.columns:
        vis0 = entry_pairs.select("query_id", "node", "score").filter(
            F.col("node") != F.col("query_id")
        )
    else:
        cand0 = (
            entry_pairs.select("query_id", "node")
            .filter(F.col("node") != F.col("query_id"))
            .distinct()
        )
        vis0 = _score(cand0, embs, queries)
    visited = _ckpt_by_query(vis0)
    for r in range(rounds):
        beam_df = (
            visited.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= beam)
            .drop("rk")
        )
        cand = _new_frontier(beam_df, sym, visited)
        visited = visited.unionByName(_score(cand, embs, queries))
        # Same discipline as ``search_visited``: checkpoint between
        # rounds (lineage bound), never after the last one (the
        # consumer's single read replaces that materialization job).
        if r < rounds - 1:
            visited = _ckpt_by_query(visited)
    return visited


def nsw_beam_search(
    queries: DataFrame,
    edges: DataFrame,
    embs: DataFrame,
    entry_points: DataFrame,
    beam: int,
    rounds: int,
    topk: int,
) -> DataFrame:
    """(query_id, rank, neighbor_id, score): the top-``topk`` of
    everything the beam search visited."""
    visited = search_visited(
        queries, edges, embs, entry_points, beam, rounds
    )
    return (
        visited.withColumn("rank", F.row_number().over(_beam_rank()))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("node").alias("neighbor_id"),
            "score",
        )
    )
