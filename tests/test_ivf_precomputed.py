"""Contract lock for the round-11 split of
``similarity.ivf_topk_fixed_centroids`` into its assignment half
(``ivf_cells_fixed_centroids``) and scoring half
(``ivf_topk_precomputed``): deriving every probe level from ONE
top-``n_hi`` cell table (``filter(__crank <= n_probe)``) must stay
value- and rank-exact vs calling the monolithic operator per level —
the equivalence d214/d215/d218 rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import similarity
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"
N_HI = 6


def _maps(df):
    return {
        (r["query_id"], r["neighbor_id"]): (r["cos_sim"], r["rank"])
        for r in df.collect()
    }


def test_precomputed_levels_match_monolithic(spark):
    embs = load_table(spark, SF, "embeddings")
    cents = embs.filter(F.col("vec_id") < 16)
    corpus = embs.filter(F.col("vec_id") % 4 == 1)
    queries = embs.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 110)
    )

    assigned = similarity.ivf_cells_fixed_centroids(
        corpus, cents, 1, "neighbor_id", "__cv"
    ).drop("__crank")
    qcells = similarity.ivf_cells_fixed_centroids(
        queries, cents, N_HI, "query_id", "__qv"
    )

    for n_probe in (1, 2, N_HI):
        old = _maps(
            similarity.ivf_topk_fixed_centroids(
                corpus, queries, cents, k=3, n_probe=n_probe
            )
        )
        new_df = similarity.ivf_topk_precomputed(
            assigned,
            qcells.filter(F.col("__crank") <= n_probe).drop("__crank"),
            k=3,
        )
        new = _maps(new_df)
        assert old == new, f"n_probe={n_probe}"
        assert len(new) > 0
        assert new_df.schema.simpleString() == (
            "struct<query_id:bigint,neighbor_id:bigint,"
            "cos_sim:double,rank:bigint>"
        )


def test_cells_rank_filter_matches_direct_assignment(spark):
    """top-n via rank filter == a direct top-n assignment call."""
    embs = load_table(spark, SF, "embeddings")
    cents = embs.filter(F.col("vec_id") < 16)
    queries = embs.filter(F.col("vec_id") % 11 == 2)
    hi = similarity.ivf_cells_fixed_centroids(
        queries, cents, N_HI, "query_id", "__qv"
    )
    for n in (1, 3):
        direct = similarity.ivf_cells_fixed_centroids(
            queries, cents, n, "query_id", "__qv"
        )
        a = {
            (r["query_id"], r["centroid_id"], r["__crank"])
            for r in hi.filter(F.col("__crank") <= n).collect()
        }
        b = {
            (r["query_id"], r["centroid_id"], r["__crank"])
            for r in direct.collect()
        }
        assert a == b and len(a) > 0
