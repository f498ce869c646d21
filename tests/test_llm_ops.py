"""Property tests for the dedup / similarity / multimodal operators —
the guarantees that matter beyond the oracle value checks:

- MinHash-LSH recall: every truly-high-Jaccard pair must surface as a
  candidate (banding guarantee), and the estimate must track truth.
- Hyperplane-LSH: results are a subset of brute-force scoring with
  decent top-1 recall on clustered embeddings.
- Exact dedup: constructed duplicates collapse to the min doc_id.
- Multimodal: mapInPandas features equal the decoder applied locally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_recall_and_accuracy(spark):
    docs = load_table(spark, SF, "documents")
    true_pairs = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert true_pairs, "fixture data should contain high-jaccard pairs"
    est_pairs = {
        (r["doc_id_1"], r["doc_id_2"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    for pair, true_j in true_pairs.items():
        assert pair in est_pairs, f"missed true near-dup {pair} (j={true_j})"
        assert abs(est_pairs[pair] - true_j) < 0.35, (pair, true_j, est_pairs[pair])


def test_exact_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        "doc_id LONG, text STRING",
    )
    kept = sorted(
        r["doc_id"] for r in dedup.exact_dedup_keep_first(df).collect()
    )
    assert kept == [1, 2, 5]
    groups = {
        r["text"]: (r["keep_doc_id"], r["n_copies"])
        for r in dedup.exact_duplicates(df).collect()
    }
    assert groups["aaa"] == (1, 3)


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zz yy xx ww vv uu tt ss"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(df).collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert {(r["doc_id_1"], r["doc_id_2"]) for r in pairs} == {(1, 2)}


def test_hyperplane_lsh_subset_of_bruteforce(spark):
    embs = load_table(spark, SF, "embeddings")
    queries = embs.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(embs, queries, k=1).collect()
    }
    approx_rows = similarity.hyperplane_lsh_topk(
        embs, queries, k=1, max_hamming=8
    ).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    # probabilistic: demand ≥ 60% top-1 recall on 20 queries
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"top-1 recall {recall}"


def test_multimodal_features_match_local_decode(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    media = multimodal.documents_as_media(docs)
    feats = {
        r["doc_id"]: r for r in multimodal.extract_features(media).collect()
    }
    for row in media.collect():
        want = multimodal.fake_decode(bytes(row["payload"]), row["media_type"])
        got = feats[row["doc_id"]]
        assert got["byte_len"] == want["byte_len"]
        assert got["width"] == want["width"]
        assert got["height"] == want["height"]
        assert got["n_frames"] == want["n_frames"]
        assert got["byte_len"] == row["meta"]["byte_len"]


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from kaggle_data_pipeline_with_aws_spark.operators import similarity
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(embs, queries, k=5).collect()
    approx = similarity.ivf_topk(
        embs, queries, k=5, n_cells=8, n_probe=4, seed=42
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    # every query answered, k results each
    assert len(approx) == len(exact)
    # probing half the cells must recover a solid share of true top-5
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall {recall}"
    # determinism: same seed, same result
    approx2 = similarity.ivf_topk(
        embs, queries, k=5, n_cells=8, n_probe=4, seed=42
    ).collect()
    assert {(r.query_id, r.neighbor_id) for r in approx2} == approx_set


def test_multimodal_resize_and_frame_sample(spark, sf_dir):
    from kaggle_data_pipeline_with_aws_spark.operators import multimodal
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = multimodal.documents_as_media(docs)

    resized = multimodal.resize_media(media, width=8, height=4)
    rows = resized.limit(5).collect()
    assert all(len(r.payload) == 32 for r in rows)
    assert all(r.width == 8 and r.height == 4 for r in rows)

    frames = multimodal.sample_frames(media, every_n_bytes=64)
    # videos fan out: more frame rows than media rows; non-video rows
    # pass through exactly once with frame 0
    n_media = media.count()
    assert frames.count() > n_media
    non_video = media.filter(F.col("media_type") != "video").count()
    assert (
        frames.join(
            media.filter(F.col("media_type") != "video").select("doc_id"),
            "doc_id",
        ).count()
        == non_video
    )
    # frame indexes contiguous from 0 per doc
    from pyspark.sql import functions as SF

    agg = frames.groupBy("doc_id").agg(
        SF.min("frame_idx").alias("lo"),
        SF.max("frame_idx").alias("hi"),
        SF.count("*").alias("n"),
    )
    bad = agg.filter(
        (SF.col("lo") != 0) | (SF.col("n") != SF.col("hi") + 1)
    ).count()
    assert bad == 0


def test_decontaminate_drops_leaked_docs(spark):
    """A corpus doc sharing any 3-shingle with the benchmark must go;
    docs sharing nothing must survive — and the corpus side must never
    shuffle (broadcast semi + anti joins only)."""
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps high")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (100, "prefix the quick brown fox tail"),  # leaked shingle
            (101, "completely unrelated sentence about spark engines"),
            (102, "another clean document with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    out = dedup.decontaminate(corpus, bench)
    assert sorted(r["doc_id"] for r in out.collect()) == [101, 102]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_repetition_ratio_flags_boilerplate(spark):
    from kaggle_data_pipeline_with_aws_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),  # 2 distinct bigrams
            (2, "all words here are fully distinct tokens"),
            (3, "one"),  # no bigrams -> 0.0 by definition
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", T.repetition_ratio("text").alias("rep")
        ).collect()
    }
    assert got[1] > 0.6 and got[2] == 0.0 and got[3] == 0.0


def test_stratified_sample_rates_and_determinism(spark):
    from kaggle_data_pipeline_with_aws_spark.operators import text as T

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    pred = T.stratified_hash_sample("doc_id", "lang", {"en": 50}, 10)
    kept = docs.filter(pred).groupBy("lang").count().collect()
    total = dict(
        (r["lang"], r["count"]) for r in docs.groupBy("lang").count().collect()
    )
    rates = {r["lang"]: r["count"] / total[r["lang"]] for r in kept}
    assert 0.35 < rates["en"] < 0.65
    for lang, rate in rates.items():
        if lang != "en":
            assert rate < 0.25, (lang, rate)
    # determinism: same predicate, same rows
    a = sorted(r["doc_id"] for r in docs.filter(pred).collect())
    b = sorted(r["doc_id"] for r in docs.filter(pred).collect())
    assert a == b


def test_connected_components_multi_hop_chain(spark):
    """A 5-node chain (diameter 4) must collapse to one component —
    exercises the fixpoint loop past a single propagation round — plus
    a disjoint pair and an isolated edge."""
    from kaggle_data_pipeline_with_aws_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21)],
        ["doc_id_1", "doc_id_2"],
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_pagerank_star_and_triangle(spark):
    from kaggle_data_pipeline_with_aws_spark.operators.components import pagerank

    # star: 0 is the hub of 1..4; triangle: 10-11-12 all symmetric
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11), (11, 12), (10, 12)],
        "doc_id_1 LONG, doc_id_2 LONG",
    )
    ranks = {r["node"]: r["pagerank"] for r in pagerank(edges).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4, 10, 11, 12}
    # hub dominates its spokes, spokes are symmetric
    assert ranks[0] > ranks[1]
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4]
    # symmetric triangle: equal ranks
    assert ranks[10] == ranks[11] == ranks[12]
    # no dangling nodes → total probability mass is conserved
    assert abs(sum(ranks.values()) - 1.0) < 1e-4


def test_patch_grid_geometry(spark):
    from kaggle_data_pipeline_with_aws_spark.operators import multimodal
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    media = multimodal.documents_as_media(load_table(spark, SF, "documents"))
    patches = multimodal.extract_patches(media, patch=16, decoder="fake").collect()
    feats = {
        r["doc_id"]: (r["width"], r["height"])
        for r in multimodal.extract_features(media, decoder="fake").collect()
        if r["media_type"] == "image"
    }
    by_doc = {}
    for r in patches:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(feats)
    for doc_id, (w, h) in feats.items():
        ps = by_doc[doc_id]
        n_rows = (h + 15) // 16
        n_cols = (w + 15) // 16
        assert len(ps) == n_rows * n_cols
        # patch areas tile the image exactly
        assert sum(p["patch_w"] * p["patch_h"] for p in ps) == w * h
        assert all(1 <= p["patch_w"] <= 16 and 1 <= p["patch_h"] <= 16 for p in ps)


def test_vectorized_cosine_and_signature_bit_identical(spark, sf_dir):
    """The Arrow-batched paths must be BIT-identical to the interpreted
    folds (vectorized across rows, sequential across dimensions), or
    every similarity oracle silently becomes approximate."""
    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.operators import similarity as S
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    embs = load_table(spark, sf_dir, "embeddings").limit(100)
    a = embs.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = embs.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    rows = (
        a.crossJoin(b)
        .filter(F.col("i") < F.col("j"))
        .select(
            S.cosine(F.col("va"), F.col("vb")).alias("fold"),
            S.cosine_vectorized(F.col("va"), F.col("vb")).alias("vec"),
        )
        .collect()
    )
    assert rows and all(r.fold == r.vec for r in rows)

    sigs = embs.select(
        S.hyperplane_signature(F.col("embedding")).alias("fold"),
        S.hyperplane_signature_vectorized(F.col("embedding")).alias("vec"),
    ).collect()
    assert sigs and all(r.fold == r.vec for r in sigs)


def test_minhash_xxhash_production_path(spark):
    """The xxhash64 (portable=False) signature path — the JVM-side
    production hash that has no DuckDB twin (its registry entry was
    retired as permanently unprovable). Identical texts must still
    collide with est_jaccard 1.0 regardless of hash function, and
    high-Jaccard pairs must be recalled just like the portable path."""
    docs = load_table(spark, SF, "documents")
    true_pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    est = {
        (r["doc_id_1"], r["doc_id_2"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.0, portable=False, vectorized=False
        ).collect()
    }
    assert true_pairs and true_pairs <= set(est)
    dupes = spark.createDataFrame(
        [(1, "the same exact text here"), (2, "the same exact text here"),
         (3, "completely different words instead")],
        "doc_id LONG, text STRING",
    )
    out = {
        (r["doc_id_1"], r["doc_id_2"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            dupes, threshold=0.5, portable=False, vectorized=False
        ).collect()
    }
    assert out == {(1, 2): 1.0}
