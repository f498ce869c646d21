"""Round-8 wave 56 — progressive (coarse-to-fine) ANN serving:

- d198 — Matryoshka progressive rerank: stage 1 ranks the corpus on
  the FIRST 16 embedding dimensions (a quarter of the bytes moved /
  multiplied) and keeps top-20; stage 2 re-scores only those 20
  candidates on all 64 dimensions and keeps top-5; the output audits
  recall@5 against the exact full-dimension top-5 per query. This is
  the serving pattern d151 measured the feasibility of (prefix
  truncation preserves neighborhoods) — here it runs end-to-end,
  with the candidate sets pinned by id sums so the oracle checks the
  SETS, not just the recall number.

Reference scope: beyond-reference similarity-serving surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity
from .registry import spark_query

_PR_NQ = 8  # query vectors: vec_id < 8
_PR_COARSE_DIMS = 16
_PR_STAGE1_K = 20
_PR_K = 5

_DOT16 = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 17), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
_NORM16 = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 17), "
    "i -> CAST({v}.embedding[i] AS DOUBLE) * CAST({v}.embedding[i] AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)
_DOT64 = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
_NORM64 = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
    "i -> CAST({v}.embedding[i] AS DOUBLE) * CAST({v}.embedding[i] AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)


def _d198_oracle() -> str:
    cos16 = (
        f"round({_DOT16} / ({_NORM16.format(v='a')}"
        f" * {_NORM16.format(v='b')}), 6)"
    )
    cos64 = (
        f"round({_DOT64} / ({_NORM64.format(v='a')}"
        f" * {_NORM64.format(v='b')}), 6)"
    )
    return f"""WITH coarse AS (
      SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
             {cos16} AS c16
      FROM embeddings a, embeddings b
      WHERE b.vec_id < {_PR_NQ} AND a.vec_id != b.vec_id
    ),
    stage1 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY c16 DESC, neighbor_id) AS rn
        FROM coarse
      ) WHERE rn <= {_PR_STAGE1_K}
    ),
    fine AS (
      SELECT s.query_id, s.neighbor_id, {cos64} AS c64
      FROM stage1 s
      JOIN embeddings a ON a.vec_id = s.neighbor_id
      JOIN embeddings b ON b.vec_id = s.query_id
    ),
    prog AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY c64 DESC, neighbor_id) AS rn
        FROM fine
      ) WHERE rn <= {_PR_K}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY {cos64} DESC, a.vec_id) AS rn
        FROM embeddings a, embeddings b
        WHERE b.vec_id < {_PR_NQ} AND a.vec_id != b.vec_id
      ) WHERE rn <= {_PR_K}
    ),
    hits AS (
      SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM prog p JOIN exact e
        ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
      GROUP BY p.query_id
    )
    SELECT e.query_id,
           CAST({_PR_STAGE1_K} AS BIGINT) AS stage1_k,
           round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / {_PR_K}, 6)
             AS recall_at_5,
           (SELECT CAST(sum(neighbor_id) AS BIGINT) FROM prog p
            WHERE p.query_id = e.query_id) AS prog_id_sum,
           CAST(sum(e.neighbor_id) AS BIGINT) AS exact_id_sum
    FROM exact e
    LEFT JOIN hits h ON e.query_id = h.query_id
    GROUP BY e.query_id, h.n_hit
    ORDER BY e.query_id
    """


@spark_query("d198_progressive_rerank", _d198_oracle())
def d198_progressive_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-to-fine ANN serving: 16-dim prefix scores cut the corpus
    to 20 candidates per query (a quarter of the multiply/transfer
    cost of the full vectors — at 100 TB the stage-1 index holds ONLY
    the 16-dim prefixes); the 64-dim exact re-score runs on 20 rows
    per query. Output: recall@5 vs the exact full-dimension top-5,
    with both candidate sets pinned by neighbor-id sums. Stage-1
    top-k is the WindowGroupLimit shape (k rows per partition ship);
    stage 2 and the audit run on query-bounded tables."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < _PR_NQ)
    q16 = queries.select(
        F.col("vec_id").alias("query_id"),
        F.slice("embedding", 1, _PR_COARSE_DIMS).alias("__qv"),
    )
    c16 = embs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.slice("embedding", 1, _PR_COARSE_DIMS).alias("__cv"),
    )
    coarse = (
        c16.crossJoin(F.broadcast(q16))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                similarity._cosine(F.col("__qv"), F.col("__cv"), True), 6
            ).alias("c16"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("c16").desc(), "neighbor_id"
    )
    stage1 = (
        coarse.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _PR_STAGE1_K)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    ev = embs.select("vec_id", "embedding")
    fine = (
        stage1.join(
            ev.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("__cv"),
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                ev.filter(F.col("vec_id") < _PR_NQ).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("__qv"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                similarity._cosine(F.col("__qv"), F.col("__cv"), True), 6
            ).alias("c64"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("c64").desc(), "neighbor_id"
    )
    prog = (
        fine.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _PR_K)
        .select("query_id", "neighbor_id")
    )
    exact = similarity.brute_force_topk(embs, queries, k=_PR_K).select(
        "query_id", "neighbor_id"
    )
    hits = prog.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count("*").alias("n_hit"))
    psum = prog.groupBy("query_id").agg(
        F.sum("neighbor_id").alias("prog_id_sum")
    )
    esum = exact.groupBy("query_id").agg(
        F.sum("neighbor_id").alias("exact_id_sum")
    )
    return (
        esum.join(psum, "query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(_PR_STAGE1_K).cast("long").alias("stage1_k"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / _PR_K,
                6,
            ).alias("recall_at_5"),
            "prog_id_sum",
            "exact_id_sum",
        )
        .orderBy("query_id")
    )
