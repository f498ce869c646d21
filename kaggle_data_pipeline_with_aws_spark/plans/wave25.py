"""Round-4 sixteenth wave:

- d126 — dedup-threshold sweep: how many near-dup pairs (and how
  many distinct documents) a Jaccard threshold of 0.7/0.8/0.9 would
  implicate — ONE exact PPJoin run at the loosest threshold feeds
  all three policy points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text_substrate
from ..sources.readers import load_table
from .registry import spark_query

_SWEEP_TS = (0.7, 0.8, 0.9)


def _d126_oracle() -> str:
    pair_cte = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM toks
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_id_1, doc_id_2,
             round(CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common), 6)
               AS jaccard
      FROM inter
      JOIN cnt ca ON inter.doc_id_1 = ca.doc_id
      JOIN cnt cb ON inter.doc_id_2 = cb.doc_id
      WHERE round(CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common), 6)
            >= 0.7
    )
    """
    blocks = []
    for t in _SWEEP_TS:
        blocks.append(
            f"""
      SELECT {t} AS threshold,
             CAST(count(*) // 2 AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT d) AS BIGINT) AS n_docs_implicated
      FROM (
        SELECT doc_id_1 AS d, jaccard FROM pairs
        UNION ALL SELECT doc_id_2, jaccard FROM pairs
      ) WHERE jaccard >= {t}"""
        )
    return (
        pair_cte
        + "SELECT CAST(threshold AS DOUBLE) AS threshold, n_pairs,"
        " n_docs_implicated FROM ("
        + " UNION ALL ".join(blocks)
        + ") ORDER BY threshold"
    )


@spark_query("d126_dedup_threshold_sweep", _d126_oracle())
def d126_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before committing to a dedup threshold, see the curve: pair
    count and distinct implicated documents at 0.7/0.8/0.9 Jaccard.
    ONE exact PPJoin pass at the LOOSEST threshold (0.7 — exactness
    at 0.7 implies the pair list is a superset of every tighter
    policy) produces a near-dup-sized pair table; the three policy
    points are conditional aggregates over it. The wrong way is three
    full similarity joins; the curve costs one."""
    pairs = text_substrate.jaccard_pairs(spark, sf_dir, threshold=0.7).select(
        "doc_id_1", "doc_id_2", "jaccard"
    )
    sym = pairs.select(
        F.col("doc_id_1").alias("d"), "jaccard"
    ).unionByName(pairs.select(F.col("doc_id_2").alias("d"), "jaccard"))
    out = None
    for t in _SWEEP_TS:
        agg = sym.filter(F.col("jaccard") >= t).agg(
            F.lit(float(t)).alias("threshold"),
            (F.count("*") / 2).cast("long").alias("n_pairs"),
            F.countDistinct("d").alias("n_docs_implicated"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("threshold")
