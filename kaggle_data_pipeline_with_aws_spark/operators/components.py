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
