"""Connected components over near-duplicate pairs — dedup *clustering*.

Pair generators (minhash-LSH, simhash, embedding cosine) emit edges;
the curation decision needs *groups*: every document transitively
connected to a duplicate cluster keeps exactly one representative (the
min doc id). This is iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors' labels)

repeated to fixpoint. Each iteration is two shuffles (join on edge
endpoints + groupBy node) over (node, label) pairs only — never the
documents. Convergence is O(diameter) iterations; near-dup graphs are
collections of small dense cliques, so the diameter is tiny (2-3) and
the loop ends after a couple of passes. A driver-side count per
iteration detects the fixpoint (O(1) rows to the driver).

This is the "large-scale graph-connectivity as repeated joins" shape
(the alternating/large-star small-star family); for billion-edge graphs
swap in GraphFrames — the contract here stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id of the connected component."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # undirected adjacency, both directions
    adj = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = nodes.withColumn("component", F.col("node"))
    cached_prev = None

    for _ in range(max_iterations):
        neighbor_min = (
            adj.join(
                labels.withColumnRenamed("node", "b").withColumnRenamed(
                    "component", "nbr_component"
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        if cached_prev is not None:  # superseded round's cache
            cached_prev.unpersist()
        cached_prev = new_labels
        labels = new_labels
        if changed == 0:
            break
    adj.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "doc_id_1",
    dst: str = "doc_id_2",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the undirected pair graph — fixed-iteration power
    method as repeated join + aggregate (the canonical iterative-
    algorithm shape on DataFrames).

    Per iteration: one join of (node, rank) onto the symmetrized edge
    list, one groupBy on the destination — both shuffles carry (node,
    rank/degree) pairs only. Ranks are cached per round and the
    superseded round unpersisted, so lineage stays one-iteration deep
    (without the cache, iteration k would recompute 1..k-1). The node
    count is a single O(1)-to-driver job. For billion-node graphs the
    same loop runs unchanged; only shuffle partitioning needs sizing.

    Returns (node, pagerank) with rank rounded to 1e-6 for cross-engine
    reproducibility (sum association differs between engines).
    """
    e = edges.cache()  # nodes + adj both derive from it: one pipeline run
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .cache()
    )
    adj = (
        e.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(e.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    deg = adj.groupBy("a").agg(F.count("*").alias("deg")).cache()
    # Materializing node count also populates the caches, so the
    # edge-generation pipeline upstream runs exactly once.
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            adj.join(ranks.withColumnRenamed("node", "a"), "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        incoming = contribs.groupBy("node").agg(
            (F.lit((1 - damping) / n) + F.lit(damping) * F.sum("c")).alias(
                "rank"
            )
        )
        new_ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                F.coalesce("rank", F.lit((1 - damping) / n)).alias("rank"),
            )
        )
        # Eager localCheckpoint: materializes the round AND truncates
        # lineage. Plain cache keeps the full logical plan, so analyzer/
        # optimizer time grows every round even when data is cached;
        # without any action at all the final collect re-derives the
        # edge pipeline multiplicatively. (On a cluster with flaky
        # executors prefer reliable checkpoints to a checkpoint dir.)
        ranks = new_ranks.localCheckpoint(eager=True)
    adj.unpersist()
    nodes.unpersist()
    deg.unpersist()
    e.unpersist()
    return ranks.select("node", F.round("rank", 6).alias("pagerank"))


def bfs_min_hops(
    seeds: DataFrame,
    edges: DataFrame,
    src: str = "node_a",
    dst: str = "node_b",
    max_hops: int = 4,
) -> DataFrame:
    """(node, hops): minimum hop distance from any seed node over the
    undirected ``edges``, breadth-first, capped at ``max_hops``.

    Level-synchronous frontier expansion: each round joins only the
    CURRENT frontier (nodes first reached last round) against the
    adjacency — never the full visited set — then anti-joins the
    visited set so every node is emitted exactly once, at its minimum
    distance. Per round that is one equi-join shuffle keyed on the
    node id plus one anti-join against the (node)-keyed visited set;
    the frontier shrinks as the traversal saturates, so late rounds
    are cheap. ``max_hops`` bounds the work regardless of graph
    diameter — the standard k-hop neighborhood contract.

    ``seeds`` must have a ``node`` column; output hops is 0 for seeds
    even when they also appear deeper in the traversal.
    """
    # localCheckpoint (not cache) on the adjacency: the edge generator
    # upstream may be an arbitrarily deep plan (e.g. the IVF-scored
    # mutual-kNN pipeline) and every per-level job would re-analyze and
    # re-schedule that whole lineage — checkpointing truncates it to
    # the materialized edge list once, so each BFS level is a join over
    # two narrow checkpointed tables.
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = seeds.select(
        "node", F.lit(0).cast("long").alias("hops")
    ).localCheckpoint(eager=True)
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        reached = (
            adj.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = (
            reached.join(dist, "node", "left_anti")
            .select("node", F.lit(h).cast("long").alias("hops"))
            .localCheckpoint(eager=True)  # one job: this level, settled
        )
        if not new.take(1):
            break
        # dist stays a LAZY union of the already-checkpointed per-level
        # pieces: each piece's lineage is truncated, the union is at
        # most max_hops+1 frames wide, and we avoid re-materializing
        # (and re-storing) the whole accumulated set every level —
        # which grew executor storage O(levels × |dist|).
        dist = dist.union(new)
        frontier = new.select("node")
    return dist
