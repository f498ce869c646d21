"""Materialized mutual-kNN edge substrate (build once, read many).

Five registry queries consume the SAME deterministic artifact — the
mutual IVF-top-5 edge list over the embedding table: d62 (the graph
itself), d63 (triangles), d64 (label vote), d122 (k-core peel), d132
(BFS hops). Until round 5 each re-derived it from the embedding table
(~90 s each at 10×, the biggest cross-query compute-waste shape in the
registry per the round-4 verdict). At 100 TB you would run the edge
builder ONCE as a writer job and point every graph query at the
resulting parquet table; this module is that exact idiom scaled down.

Since round 6 the store mechanics (content-addressed version-keyed
paths, atomic publication, crashed-writer rebuild, concurrent-race
handling, unusable-store fallback, configurable root URI via
``$SPARK_GRAFT_SUBSTRATE_ROOT``) live in the shared
``operators/substrate_store.py`` — the same contract now also serving
the ranked-shingle and MinHash-signature artifacts
(operators/text_substrate.py). This module keeps the builder plan and
the artifact identity:

- ``build_edges_plan`` is the deterministic round-2-proven semantics
  (IVF with fixed centroids ``vec_id < 16``, k=5, n_probe=2,
  mutuality via a narrow self semi-join — never all-pairs), served
  since round 5 by the grouped in-task kernel
  (``similarity.ivf_topk_fixed_centroids_grouped``) — bit-identical
  values, ~10× less build wall at 10×.
- ``_VERSION`` is part of the path: bump it whenever the builder plan
  changes so a stale artifact from an older plan can never be read.
  Note the round-6 store generalization DID move the path: the dataset
  token now hashes the dataset's listing fingerprint alongside its
  location (md5(path + '|' + fingerprint) vs the round-5 md5(path)),
  so round-5 artifacts became unreachable and were rebuilt on first
  use; the orphans are collected by ``substrate_store.
  prune_superseded`` (keep-latest-N per family/dataset, grace-windowed).

Reference scope: the reference pipeline has no graph substrate — this
is part of the beyond-reference LLM-data-curation surface the brief
asks for (mutual-kNN graphs for semantic dedup/curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from . import similarity, substrate_store

# Bump whenever build_edges_plan's semantics change — the version is
# baked into the artifact path so stale materializations are unreachable.
# v2: within-cell scoring moved into the cell tasks (grouped kernel) —
# values are bit-identical to v1, but the rule is any plan change bumps.
_VERSION = "v2"


def build_edges_plan(embs: DataFrame) -> DataFrame:
    """(node_a < node_b, cos_sim): mutual IVF-top-5 pairs.

    The kNN side is the scale-safe IVF with fixed centroids (never
    all-pairs), in its grouped form: because the query set here IS the
    corpus, the join-based plan would shuffle every candidate pair
    with both vector payloads attached; the grouped kernel co-groups
    members and probers by cell and scores in-task (10× build wall
    107 s → 10 s, bit-identical values — the same semantics d62/d63
    proved in round 2, formerly ``plans/retrieval._mutual_knn_edges``).
    Mutuality is a self equi-join of the narrow per-query top-5 table.
    """
    cents = embs.filter(F.col("vec_id") < 16)
    knn = similarity.ivf_topk_fixed_centroids_grouped(
        embs, embs, cents, k=5, n_probe=2
    ).select("query_id", "neighbor_id", "cos_sim")
    rev = knn.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
    )
    return (
        knn.join(rev, ["query_id", "neighbor_id"], "left_semi")
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("node_a"),
            F.col("neighbor_id").alias("node_b"),
            "cos_sim",
        )
    )


def edges_artifact_path(sf_dir: str) -> str:
    return substrate_store.artifact_path("knn_edges", _VERSION, sf_dir)


def mutual_knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substrate table, materializing it on first use.

    Returns (node_a, node_b, cos_sim) with node_a < node_b. The first
    caller per (dataset, plan version) pays one builder job; everyone
    after reads a narrow 3-column parquet scan, so the BFS/k-core/
    triangle queries' lineage starts at the edge list instead of at
    the embedding table. Store mechanics (atomic publish, races,
    fallback) are substrate_store's contract.
    """
    return substrate_store.materialize_once(
        spark,
        "knn_edges",
        _VERSION,
        sf_dir,
        lambda: build_edges_plan(load_table(spark, sf_dir, "embeddings")),
    ).select("node_a", "node_b", "cos_sim")
