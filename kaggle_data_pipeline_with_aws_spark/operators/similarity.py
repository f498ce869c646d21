"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (queries are user-sized, corpus is data-sized); per-partition the
  corpus streams against all queries, then a partitioned window keeps
  top-k per query — corpus is never shuffled, only k·|queries| rows are.
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane signatures
  bucket the corpus; candidates are enumerated by a band equi-join
  (never a cross join) and only survivors are scored.  The planes are
  seeded constants, so the whole pipeline is exactly oracle-checkable
  (literal-plane SQL rebuilds the identical signatures).

Dot products have two implementations with IDENTICAL results:

- interpreted fold (``F.zip_with`` + ``F.aggregate``) — the semantic
  definition, mirrored 1:1 by the DuckDB oracle SQL;
- Arrow-batched Pandas UDF (``vectorized=True``, the default and the
  100 TB path) — vectorized ACROSS rows but sequential ACROSS
  dimensions (``acc = acc + A[:,j] * B[:,j]``), so every IEEE-754
  rounding step happens in the same order as the fold and the results
  are bit-identical, not just close.  Oracles therefore hold for both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.readers import spread_for_compute

# Fixed seeded hyperplane constants: per plane, per dimension pseudo-
# random ±1 derived from a hash — deterministic, no runtime RNG.
NUM_PLANES = 16


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision fold — mirrors the SQL oracle's
    list_reduce exactly (term order is part of the contract)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _seq_dot(A, B):
    """Row-batch dot product, sequential over dimensions: bit-identical
    to the ``F.aggregate`` fold (same add/mul order per row)."""
    import numpy as np

    acc = np.zeros(A.shape[0])
    for j in range(A.shape[1]):
        acc = acc + A[:, j] * B[:, j]
    return acc


def cosine_vectorized(a: Column, b: Column) -> Column:
    """Arrow-batched cosine: one numpy pass per batch instead of three
    interpreted folds per row.  float32→float64 widening is exact and
    the dimension loop preserves fold order, so results are
    bit-identical to ``cosine`` — oracle-safe."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def cos(ca, cb):
        if len(ca) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(ca.to_numpy()).astype(np.float64)
        B = np.stack(cb.to_numpy()).astype(np.float64)
        d = _seq_dot(A, B)
        na = np.sqrt(_seq_dot(A, A))
        nb = np.sqrt(_seq_dot(B, B))
        return pd.Series(d / (na * nb))

    # explicit hints: `from __future__ import annotations` stringifies
    # inline ones, which pandas_udf can't introspect
    cos.__annotations__ = {"ca": pd.Series, "cb": pd.Series, "return": pd.Series}
    return pandas_udf(cos, "double")(a, b)


def _cosine(a: Column, b: Column, vectorized: bool) -> Column:
    return cosine_vectorized(a, b) if vectorized else cosine(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cos_sim, rank), self-matches
    excluded, ties broken by neighbor id asc (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(_cosine(F.col("__qv"), F.col("__cv"), vectorized), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id1 < id2, cosine ≥ threshold).

    All-pairs theta join — O(n²) enumeration, kept ONLY as the exact
    verification twin for ``near_duplicate_pairs_banded`` (the
    registered, scale-safe plan) and for small reference sets."""
    embeddings = spread_for_compute(embeddings)
    a = embeddings.select(
        F.col(id_col).alias("id_1"), F.col(vec_col).alias("__a")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_2"), F.col(vec_col).alias("__b")
    )
    return (
        a.join(b, F.col("id_1") < F.col("id_2"))
        .withColumn(
            "cos_sim",
            F.round(_cosine(F.col("__a"), F.col("__b"), vectorized), 6),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_1", "id_2", "cos_sim")
    )


def hyperplane_signature(
    vec: Column, num_planes: int = NUM_PLANES, dim: int = 64
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(<v, r_i>) where
    r_i's components are deterministic ±1 pseudo-random values
    (hash(i, j) parity). Cosine-similar vectors agree on most bits."""
    v = _as_double(vec)
    bits = []
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(
                    *[
                        F.lit(1.0 if _plane_sign(p, j) else -1.0)
                        for j in range(dim)
                    ]
                ),
                lambda x, r: x * r,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
        )
    out = bits[0]
    for t in bits[1:]:
        out = out + t
    return out


def _plane_sign(p: int, j: int) -> bool:
    # Deterministic pseudo-random sign per (plane, dim): splitmix-style.
    x = (p * 0x9E3779B9 + j * 0x85EBCA6B + 0xC2B2AE35) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x45D9F3B) & 0xFFFFFFFF
    x ^= x >> 16
    return bool(x & 1)


def hyperplane_signature_vectorized(
    vec: Column, num_planes: int = NUM_PLANES, dim: int = 64
) -> Column:
    """Arrow-batched twin of ``hyperplane_signature``: per plane, the
    projection accumulates sequentially over dimensions (fold order),
    so signatures are bit-identical to the interpreted version AND to
    the literal-plane oracle SQL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    signs = np.array(
        [
            [1.0 if _plane_sign(p, j) else -1.0 for j in range(dim)]
            for p in range(num_planes)
        ]
    )

    def sig(cv):
        if len(cv) == 0:
            return pd.Series([], dtype="int64")
        V = np.stack(cv.to_numpy()).astype(np.float64)
        out = np.zeros(V.shape[0], dtype=np.int64)
        for p in range(num_planes):
            acc = np.zeros(V.shape[0])
            for j in range(dim):
                acc = acc + V[:, j] * signs[p, j]
            out = out + ((acc > 0).astype(np.int64) << p)
        return pd.Series(out)

    sig.__annotations__ = {"cv": pd.Series, "return": pd.Series}
    return pandas_udf(sig, "long")(vec)


def _signature(
    vec: Column, num_planes: int, dim: int, vectorized: bool
) -> Column:
    if vectorized:
        return hyperplane_signature_vectorized(vec, num_planes, dim)
    return hyperplane_signature(vec, num_planes, dim)


def band_bounds(num_planes: int, n_bands: int) -> list[tuple[int, int]]:
    """Split ``num_planes`` signature bits into ``n_bands`` contiguous
    (offset, size) bands, sizes as even as possible."""
    assert 1 <= n_bands <= num_planes
    base, extra = divmod(num_planes, n_bands)
    bounds, off = [], 0
    for i in range(n_bands):
        size = base + (1 if i < extra else 0)
        bounds.append((off, size))
        off += size
    return bounds


def _explode_bands(
    df: DataFrame, sig_col: str, bounds: list[tuple[int, int]]
) -> DataFrame:
    """One row per (row, band): band_val = (sig >> off) & mask.  The
    equi-join key (band_id, band_val) is what turns LSH candidate
    enumeration into a hash join instead of a cross join."""
    return df.select(
        "*",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(sig_col), off).bitwiseAND(
                        F.lit((1 << size) - 1)
                    )
                    for off, size in bounds
                ]
            )
        ).alias("band_id", "band_val"),
    )


# BLAS summation order differs from the sequential fold only by
# blocked/pairwise accumulation: for unit-scale cosines over d=O(100)
# dims the absolute difference is bounded by ~d·eps ≈ 1e-14.  Widening
# a candidate cut by this slack makes the GEMM-selected set a superset
# of the fold-selected one by eight orders of magnitude of margin.
_GEMM_SLACK = 1e-9


def _block_cosines(ids_a, A, ids_b, B, keep_floor, upper, chunk=512):
    """All cross-pair cosines between two row blocks, keeping pairs
    with (fold-exact) cos ≥ ``keep_floor``.

    Two phases so the n²·d arithmetic runs at BLAS speed without
    giving up bit-exactness:

    1. CUT — one GEMM per A-chunk (``A @ B.T``) scores every pair;
       candidates are kept at ``keep_floor - _GEMM_SLACK``, a strict
       superset of the exact-fold keep set (see ``_GEMM_SLACK``).
    2. EMIT — survivors only (near-threshold pairs, output-sized) are
       re-scored with the dimension-SEQUENTIAL fold (``_seq_dot``, the
       same IEEE-754 add/mul order as the ``F.aggregate`` expression
       and the DuckDB ``list_reduce`` oracle) and re-filtered at the
       exact ``keep_floor`` — emitted values and the survivor set are
       bit-identical to an all-fold kernel.

    ``keep_floor`` must sit BELOW the operator threshold (slack for
    the final round-to-6): the exact ``F.round`` + threshold filter
    stays in Spark so the final set is decided by the very same
    expression as before.  ``upper`` computes only the i<j triangle of
    one block against itself.  A-rows stream in ``chunk``-sized slices
    so peak memory is chunk × |B| regardless of block size."""
    import numpy as np

    na = np.sqrt(_seq_dot(A, A))
    nb = na if B is A else np.sqrt(_seq_dot(B, B))
    cut = keep_floor - _GEMM_SLACK
    out_i: list = []
    out_j: list = []
    out_c: list = []
    for lo in range(0, A.shape[0], chunk):
        hi = min(lo + chunk, A.shape[0])
        cos_fast = (A[lo:hi] @ B.T) / (na[lo:hi][:, None] * nb[None, :])
        mask = cos_fast >= cut
        if upper:
            # strict upper triangle in ROW ORDER; callers pre-sort by id
            rows = np.arange(lo, hi)[:, None]
            mask &= rows < np.arange(B.shape[0])[None, :]
        ii, jj = np.nonzero(mask)
        if len(ii):
            exact = _seq_dot(A[ii + lo], B[jj]) / (na[ii + lo] * nb[jj])
            keep = exact >= keep_floor
            if keep.any():
                out_i.append(ids_a[ii[keep] + lo])
                out_j.append(ids_b[jj[keep]])
                out_c.append(exact[keep])
    if not out_i:
        return None
    return (
        np.concatenate(out_i),
        np.concatenate(out_j),
        np.concatenate(out_c),
    )


def near_duplicate_pairs_banded(
    embeddings: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = NUM_PLANES,
    n_bands: int = 4,
    dim: int = 64,
    vectorized: bool = True,
) -> DataFrame:
    """Scale-safe embedding near-dup: pairs are enumerated INSIDE each
    LSH band bucket, then the exact cosine filter.  The *contract* is
    ``cos ≥ threshold AND signatures agree on ≥1 of n_bands bands`` —
    band agreement is part of the operator semantics (exactly the d14
    simhash-pairs pattern), so the DuckDB oracle states the same
    condition and the result is fully value-checkable while the plan
    never enumerates all pairs.

    Shuffle shape: each vector ships ONCE PER BAND to its
    (band_id, band_val) bucket (n·n_bands narrow rows); the bucket's
    pairwise cosines run as one Arrow-batched numpy kernel
    (``applyInPandas``) that emits only near-threshold survivors — the
    m²-pair candidate set never leaves the task, which is what the
    earlier band self-JOIN got wrong (it shuffled every candidate pair
    with both 64-float payloads attached: ~50 GB at 20k vectors for a
    137k-pair answer).  Parallelism is bounded by bucket count
    (n_bands · 2^band_bits); per-bucket work is the pigeonhole-required
    m² — chunked so memory stays bounded.  Guarantees every pair within
    Hamming ≤ n_bands-1 by pigeonhole; higher-Hamming pairs are caught
    band-probabilistically — recall tested against the all-pairs twin
    in tests."""
    import numpy as np
    import pandas as pd

    bounds = band_bounds(num_planes, n_bands)
    sigd = spread_for_compute(embeddings).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__v"),
        _signature(F.col(vec_col), num_planes, dim, vectorized).alias("__sig"),
    )
    bands = _explode_bands(sigd, "__sig", bounds).select(
        "band_id", "band_val", "__id", "__v"
    )
    keep_floor = threshold - 1e-6

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_1": pd.Series([], dtype="int64"),
                "id_2": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        V = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
        got = _block_cosines(ids, V, ids, V, keep_floor, upper=True)
        if got is None:
            return empty
        i, j, c = got
        return pd.DataFrame({"id_1": i, "id_2": j, "cos": c})

    pairs = bands.groupBy("band_id", "band_val").applyInPandas(
        bucket_pairs, "id_1 long, id_2 long, cos double"
    )
    return (
        pairs.withColumn("cos_sim", F.round(F.col("cos"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_1", "id_2"])
        .select("id_1", "id_2", "cos_sim")
    )


def near_duplicate_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
    chunk: int = 512,
) -> DataFrame:
    """EXACT all-pairs cosine near-dup (id1 < id2, round6(cos) ≥
    threshold) — same contract and bit-identical values as
    ``near_duplicate_pairs``, restructured for scale: vectors are
    hash-assigned to ``n_blocks`` blocks, every unordered block pair
    becomes one task holding both blocks' vectors ONCE, and the task's
    pairwise cosines run as a chunked numpy kernel that emits only
    near-threshold survivors.

    Data shipped is n·(n_blocks+1) narrow vector rows instead of the
    theta join's n² pair rows with two 64-float payloads each; the
    O(n²·d) arithmetic is unavoidable (the contract IS all pairs) but
    runs vectorized inside tasks instead of per-pair through a join.
    Block assignment uses ``xxhash64`` — it affects only which task
    computes a pair, never the result, so engine-portability of the
    hash is irrelevant here (contrast the banded operator, where
    bucket membership is part of the contract)."""
    import numpy as np
    import pandas as pd

    sc = embeddings.sparkSession.sparkContext
    nb = n_blocks or sc.defaultParallelism
    base = spread_for_compute(embeddings).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("__p"),
    )
    a = base.select(
        F.col("__p").alias("__ka"),
        F.explode(F.sequence(F.col("__p"), F.lit(nb - 1))).alias("__kb"),
        F.lit(0).alias("__side"),
        "__id",
        "__v",
    )
    b = base.select(
        F.explode(F.sequence(F.lit(0), F.col("__p"))).alias("__ka"),
        F.col("__p").alias("__kb"),
        F.lit(1).alias("__side"),
        "__id",
        "__v",
    )
    keep_floor = threshold - 1e-6

    def block_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_1": pd.Series([], dtype="int64"),
                "id_2": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        ka, kb = key
        if ka == kb:
            part = pdf[pdf["__side"] == 0].sort_values("__id")
            if len(part) < 2:
                return empty
            ids = part["__id"].to_numpy()
            V = np.stack(part["__v"].to_numpy()).astype(np.float64)
            got = _block_cosines(ids, V, ids, V, keep_floor, upper=True, chunk=chunk)
        else:
            pa = pdf[pdf["__side"] == 0]
            pb = pdf[pdf["__side"] == 1]
            if len(pa) == 0 or len(pb) == 0:
                return empty
            ia = pa["__id"].to_numpy()
            ib = pb["__id"].to_numpy()
            A = np.stack(pa["__v"].to_numpy()).astype(np.float64)
            B = np.stack(pb["__v"].to_numpy()).astype(np.float64)
            got = _block_cosines(ia, A, ib, B, keep_floor, upper=False, chunk=chunk)
        if got is None:
            return empty
        i, j, c = got
        lo = np.minimum(i, j)
        hi = np.maximum(i, j)
        return pd.DataFrame({"id_1": lo, "id_2": hi, "cos": c})

    pairs = (
        a.unionByName(b)
        .groupBy("__ka", "__kb")
        .applyInPandas(block_pairs, "id_1 long, id_2 long, cos double")
    )
    return (
        pairs.withColumn("cos_sim", F.round(F.col("cos"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_1", "id_2", "cos_sim")
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = NUM_PLANES,
    dim: int = 64,
    max_hamming: int = 4,
    vectorized: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates are pairs whose signatures are
    within ``max_hamming`` bits; they are *enumerated* by an equi-join
    on signature bands, not by a cross join.  Splitting the signature
    into ``max_hamming + 1`` bands guarantees (pigeonhole) that every
    pair within the Hamming budget agrees on at least one whole band,
    so the band join produces the exact same candidate set the naive
    crossJoin+filter would — but as a broadcast HASH join keyed on
    (band_id, band_val).  At 100 TB each corpus row fans out to
    n_bands narrow rows and meets only same-band queries; the exact
    cosine re-rank runs on survivors only."""
    sig = lambda df, idn, vn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vn),
        _signature(F.col(vec_col), num_planes, dim, vectorized).alias(
            f"{idn}_sig"
        ),
    )
    bounds = band_bounds(num_planes, min(max_hamming + 1, num_planes))
    c = _explode_bands(sig(corpus, "neighbor_id", "__cv"), "neighbor_id_sig", bounds)
    q = _explode_bands(sig(queries, "query_id", "__qv"), "query_id_sig", bounds)
    candidates = (
        c.join(F.broadcast(q), ["band_id", "band_val"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "__ham",
            F.bit_count(
                F.col("neighbor_id_sig").bitwiseXOR(F.col("query_id_sig"))
            ),
        )
        .filter(F.col("__ham") <= max_hamming)
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos_sim",
            F.round(_cosine(F.col("__qv"), F.col("__cv"), vectorized), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the cluster-scale path
# ---------------------------------------------------------------------------

def _centroid_matrix(corpus: DataFrame, vec_col: str, n_cells: int, seed: int):
    """Fit the coarse quantizer (distributed KMeans over the corpus) and
    return the centroid matrix as a plain numpy array (n_cells × dim) —
    small by construction, broadcastable into Arrow-batched UDFs."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def _nearest_cells_udf(centroids, n_probe: int):
    """Pandas UDF: embedding → the n_probe nearest centroid ids, one
    numpy matmul per Arrow batch (never per row)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    cn = (centroids * centroids).sum(axis=1)  # |c|^2 per centroid

    def nearest(col):
        mat = np.stack(col.to_numpy())  # batch × dim
        # argmin of ||v - c||^2 = |c|^2 - 2 v·c  (|v|^2 constant per row)
        d2 = cn[None, :] - 2.0 * (mat @ centroids.T)
        order = np.argsort(d2, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    # set hints explicitly: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf can't introspect
    nearest.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(nearest, "array<int>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    vectorized: bool = True,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_cells
    KMeans cells, probe the n_probe nearest cells per query, exact-score
    only the probed candidates.

    Scale shape: the index assignment is one narrow map over the corpus
    (Arrow-batched matmul against the broadcast centroid matrix); the
    candidate join is an equi-join on cell_id — shuffle keyed by cell,
    never a cross join. Corpus cell sizes bound the work per query:
    ~ n_probe/n_cells of the corpus scored instead of all of it.
    Recall < 100% by construction — rows-only checked (like any ANN).
    """
    centroids = _centroid_matrix(corpus, vec_col, n_cells, seed)
    assign1 = _nearest_cells_udf(centroids, 1)
    probe = _nearest_cells_udf(centroids, n_probe)

    c = spread_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn(
        "cell_id", F.try_element_at(assign1(F.col("__cv")), F.lit(1))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("cell_id", F.explode(probe(F.col("__qv"))))

    candidates = (
        c.join(F.broadcast(q), "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(_cosine(F.col("__qv"), F.col("__cv"), vectorized), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk_fixed_centroids(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool = True,
) -> DataFrame:
    """IVF with a *given* centroid table — the deterministic twin of
    ``ivf_topk`` (which fits KMeans): assignment = argmax cosine to a
    centroid, probing = top-n_probe centroids per query, then exact
    re-rank within probed cells.

    Because the quantizer is data (a DataFrame of (centroid_id, vec)),
    every step is plain relational algebra — fully oracle-checkable,
    and exactly the plan shape a pretrained/loaded IVF index uses in
    production (indexes are fit offline, loaded as a table)."""
    cents = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__ct")
    )

    def best_cells(df: DataFrame, out_id: str, vec_out: str, n: int):
        scored = (
            df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_out))
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "__cscore",
                F.round(_cosine(F.col(vec_out), F.col("__ct"), vectorized), 6),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("__cscore").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n)
            .select(out_id, vec_out, "centroid_id")
        )

    assigned = best_cells(corpus, "neighbor_id", "__cv", 1)
    probed = best_cells(queries, "query_id", "__qv", n_probe)

    candidates = (
        assigned.join(F.broadcast(probed), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(_cosine(F.col("__qv"), F.col("__cv"), vectorized), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk_fixed_centroids_grouped(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool = True,
    chunk: int = 512,
) -> DataFrame:
    """``ivf_topk_fixed_centroids`` with the within-cell scoring moved
    INSIDE the cell tasks — for the all-corpus-queries case.

    The join-based plan broadcasts the probed query table; when the
    query set IS the corpus (self-kNN, e.g. the mutual-kNN edge
    substrate) that shuffles every (query, member) candidate row with
    both vector payloads attached — Σ|cell|·n_probe·|cell| pair rows of
    2·dim doubles each — to keep only k per query. Here members and
    probers are co-grouped by cell (one shuffle of n + n_probe·n
    VECTOR rows, not pair rows) and an Arrow-batched two-phase kernel
    scores each cell in-task (GEMM-speed candidate cut, survivors
    re-scored with the exact sequential fold — see ``_block_cosines``),
    emitting only rows that can still make the rounded top-k.
    Assignment and probing stay the same relational argmax; the exact
    ``F.round`` + row_number cut stays in Spark, so results are
    bit-identical to the join plan (the IEEE-754 fold order of
    ``_seq_dot`` / the DuckDB oracle on every emitted value).

    Parallelism is #cells and in-task memory is chunk × |cell|
    doubles: at production scale raise the centroid count with the
    data (cells ≈ √n is the standard IVF sizing) rather than the
    chunk. 10× measured: 107 s (join plan) → 10 s, value-exact.
    """
    import numpy as np
    import pandas as pd

    cents = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__ct")
    )

    def best_cells(df: DataFrame, out_id: str, vec_out: str, n: int):
        scored = (
            df.select(
                F.col(id_col).cast("long").alias(out_id),
                F.col(vec_col).alias(vec_out),
            )
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "__cscore",
                F.round(_cosine(F.col(vec_out), F.col("__ct"), vectorized), 6),
            )
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("__cscore").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n)
            .select(out_id, vec_out, "centroid_id")
        )

    members = best_cells(corpus, "__id", "__v", 1).select(
        "centroid_id", F.lit(0).alias("__side"), "__id", "__v"
    )
    probers = best_cells(queries, "__id", "__v", n_probe).select(
        "centroid_id", F.lit(1).alias("__side"), "__id", "__v"
    )

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        mem = pdf[pdf["__side"] == 0]
        prb = pdf[pdf["__side"] == 1]
        if len(mem) == 0 or len(prb) == 0:
            return empty
        mid = mem["__id"].to_numpy()
        M = np.stack(mem["__v"].to_numpy()).astype(np.float64)
        nm = np.sqrt(_seq_dot(M, M))
        qid_all = prb["__id"].to_numpy()
        Q = np.stack(prb["__v"].to_numpy()).astype(np.float64)
        nq = np.sqrt(_seq_dot(Q, Q))
        out_q: list = []
        out_n: list = []
        out_c: list = []
        for lo in range(0, Q.shape[0], chunk):
            hi = min(lo + chunk, Q.shape[0])
            # CUT at GEMM speed: exact values aren't needed to decide
            # who might still make the rounded top-k (see
            # ``_block_cosines`` / ``_GEMM_SLACK``)
            cos_fast = (Q[lo:hi] @ M.T) / (nq[lo:hi][:, None] * nm[None, :])
            # a member sits in exactly one cell, so self-pairs can be
            # masked here without a later distinct; at most one self
            # match per row (ids are unique)
            self_mask = qid_all[lo:hi][:, None] == mid[None, :]
            cfc = np.where(self_mask, -np.inf, cos_fast)
            # value cut: keep everything that could still make the
            # ROUNDED top-k. round-to-6 moves a value ≤ 5e-7 and the
            # GEMM cut ≤ _GEMM_SLACK, so any cos below kth - 2e-6 is
            # strictly under ≥ k candidates after rounding. Extra
            # survivors are fine — the Spark-side row_number cut
            # (deterministic neighbor_id tiebreak) decides the final
            # set over exact values.
            if M.shape[0] > k + 1:
                kth = np.partition(cfc, -k, axis=1)[:, -k]
                mask = cfc >= (kth - 2e-6)[:, None]
            else:
                mask = ~self_mask
            ii, jj = np.nonzero(mask)
            if len(ii):
                # EMIT exact: survivors re-scored with the sequential
                # fold — bit-identical to the join-based plan
                exact = _seq_dot(Q[ii + lo], M[jj]) / (nq[ii + lo] * nm[jj])
                out_q.append(qid_all[ii + lo])
                out_n.append(mid[jj])
                out_c.append(exact)
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cos": np.concatenate(out_c),
            }
        )

    cand = (
        members.unionByName(probers)
        .groupBy("centroid_id")
        .applyInPandas(cell_topk, "query_id long, neighbor_id long, cos double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("cos_sim", F.round(F.col("cos"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_cells_fixed_centroids(
    df: DataFrame,
    centroids: DataFrame,
    n: int,
    out_id: str,
    vec_out: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    vectorized: bool = True,
) -> DataFrame:
    """Top-``n`` quantizer cells per row of ``df`` with the vector AND
    the cell rank (``__crank``) carried — the assignment half of
    ``ivf_topk_fixed_centroids`` factored out so adaptive-probe plans
    compute it ONCE, checkpoint it, and derive every probe level from
    the same table (``filter(__crank <= n_probe)``) instead of
    re-assigning the corpus per level (guide §2.4: the repeated
    subtree was 3-4 full assignment passes per query plan).

    Same score expression (rounded sequential-fold cosine), same
    deterministic tiebreak as ``ivf_topk_fixed_centroids`` — a level's
    filtered rows are value-identical to a direct top-``n_probe``
    assignment."""
    cents = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__ct")
    )
    scored = (
        df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(vec_out))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "__cscore",
            F.round(_cosine(F.col(vec_out), F.col("__ct"), vectorized), 6),
        )
    )
    w = Window.partitionBy(out_id).orderBy(
        F.col("__cscore").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__crank", F.row_number().over(w))
        .filter(F.col("__crank") <= n)
        .select(out_id, vec_out, "centroid_id", "__crank")
    )


def ivf_topk_precomputed(
    assigned: DataFrame,
    probed: DataFrame,
    k: int = 5,
    vectorized: bool = True,
) -> DataFrame:
    """The scoring half of ``ivf_topk_fixed_centroids`` over
    PRE-COMPUTED cell tables: ``assigned`` = (neighbor_id, __cv,
    centroid_id) corpus assignment, ``probed`` = (query_id, __qv,
    centroid_id) probe cells (any extra columns must be dropped by the
    caller). Tail is expression-for-expression the fixed-centroids
    join plan — same rounded cosine, same (query, neighbor) dedup,
    same deterministic rank cut — so feeding checkpointed cell tables
    yields bit-identical values while the assignment cost is paid
    once per substrate instead of once per probe level."""
    candidates = (
        assigned.join(F.broadcast(probed), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(_cosine(F.col("__qv"), F.col("__cv"), vectorized), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
