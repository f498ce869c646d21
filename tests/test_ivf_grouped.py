"""Contract lock for ``similarity.ivf_topk_fixed_centroids_grouped``:
the in-task cell kernel must stay value- AND rank-exact vs the
join-based ``ivf_topk_fixed_centroids`` it replaces in the substrate
builder (the two are one semantic with two physical shapes — grouped
for self-kNN, broadcast join for user-sized query sets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import similarity
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _maps(df):
    return {
        (r["query_id"], r["neighbor_id"]): (r["cos_sim"], r["rank"])
        for r in df.collect()
    }


def test_grouped_matches_join_plan_self_knn(spark):
    """Self-kNN (queries = corpus), the substrate-builder shape."""
    embs = load_table(spark, SF, "embeddings")
    cents = embs.filter(F.col("vec_id") < 16)
    old = _maps(
        similarity.ivf_topk_fixed_centroids(embs, embs, cents, k=5, n_probe=2)
    )
    new_df = similarity.ivf_topk_fixed_centroids_grouped(
        embs, embs, cents, k=5, n_probe=2
    )
    new = _maps(new_df)
    assert old == new
    assert len(new) > 0
    # schema parity matters for artifact round-trips
    assert new_df.schema.simpleString() == (
        "struct<query_id:bigint,neighbor_id:bigint,"
        "cos_sim:double,rank:bigint>"
    )


def test_grouped_matches_join_plan_query_subset(spark):
    """Distinct query table (the d20/d59 shape) — grouped must agree
    even where the join plan is the one actually shipped."""
    embs = load_table(spark, SF, "embeddings")
    cents = embs.filter(F.col("vec_id") < 16)
    queries = embs.filter(F.col("vec_id") % 7 == 3)
    old = _maps(
        similarity.ivf_topk_fixed_centroids(
            embs, queries, cents, k=3, n_probe=2
        )
    )
    new = _maps(
        similarity.ivf_topk_fixed_centroids_grouped(
            embs, queries, cents, k=3, n_probe=2
        )
    )
    assert old == new


def test_grouped_small_chunk_exact(spark):
    """A chunk smaller than any cell exercises the chunk loop without
    changing results (fold order is per-row, not per-chunk)."""
    embs = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 200)
    cents = embs.filter(F.col("vec_id") < 4)
    base = _maps(
        similarity.ivf_topk_fixed_centroids_grouped(
            embs, embs, cents, k=5, n_probe=2, chunk=512
        )
    )
    tiny = _maps(
        similarity.ivf_topk_fixed_centroids_grouped(
            embs, embs, cents, k=5, n_probe=2, chunk=7
        )
    )
    assert base == tiny


def test_grouped_tie_heavy_replicas(spark):
    """Exact-replica groups (the 10×/100× scale-data structure) put
    many candidates at identical cosine — the kth cut must keep every
    tie so the Spark-side deterministic row_number picks the same set
    as the join plan."""
    base = [[float((i * 7 + j * 3) % 11 - 5) for j in range(8)] for i in range(6)]
    rows = [
        (g * 50 + r, base[g])
        for g in range(6)
        for r in range(12)  # 12 exact replicas per group
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = embs.filter("vec_id % 50 = 0")  # one centroid per group
    old = _maps(
        similarity.ivf_topk_fixed_centroids(embs, embs, cents, k=5, n_probe=2)
    )
    new = _maps(
        similarity.ivf_topk_fixed_centroids_grouped(
            embs, embs, cents, k=5, n_probe=2
        )
    )
    assert old == new
    assert len(new) == 72 * 5  # every vector has ≥11 cos-1.0 ties
