"""Round-8 wave 45 — budget allocation across domains:

- d170 — exact token-budget waterfilling: given a global token budget
  (60% of the corpus), allocate per-domain token quotas by the
  waterfilling rule — small domains keep everything, large domains are
  levelled at a common cap L chosen so allocations sum to EXACTLY the
  budget (integer L plus a deterministic +1 distribution of the
  remainder). This is the allocator behind "domain-balanced" training
  mixes: the continuous waterfill is standard; the point here is the
  all-integer closed form that two engines reproduce bit-for-bit.

Algorithm (all BIGINT): sort domains by token count ascending with
running sums; S_i = cum_i + (k−i)·t_i is the budget a level of t_i
consumes (non-decreasing, constant across ties); anchor at
i* = max{i : S_i ≤ B}; with m = k−i* unsaturated domains,
L = t_i* + (B−S_i*) DIV m and r = (B−S_i*) MOD m; every domain gets
min(t_d, L), and the first r unsaturated domains (by name) get +1.
Σ alloc = B exactly (tested), because no domain saturates strictly
between t_i* and L (S_{i*+1} > B bounds L below t_{i*+1}).

Reference scope: beyond-reference LLM-data-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import token_count
from .registry import spark_query
from .wave41 import _base_cte, _with_domain

_BUDGET_PCT = 60


def _d170_oracle() -> str:
    return f"""{_base_cte()},
    tok AS MATERIALIZED (
      SELECT domain,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
      FROM d GROUP BY domain
    ),
    tot AS (
      SELECT sum(t) AS total, count(*) AS k,
             sum(t) * {_BUDGET_PCT} // 100 AS b
      FROM tok
    ),
    rs AS MATERIALIZED (
      SELECT domain, t,
             row_number() OVER (ORDER BY t, domain) AS i,
             sum(t) OVER (ORDER BY t, domain) AS cum
      FROM tok
    ),
    s AS MATERIALIZED (
      SELECT rs.*, cum + (k - i) * t AS si FROM rs, tot
    ),
    anchor AS (
      SELECT coalesce(max(i), 0) AS i0,
             coalesce(max(si), 0) AS s0,
             coalesce(max(CASE WHEN rnk = 1 THEN t END), 0) AS t0
      FROM (
        SELECT i, si, t,
               row_number() OVER (ORDER BY i DESC) AS rnk
        FROM s, tot WHERE si <= b
      )
    ),
    lvl AS MATERIALIZED (
      SELECT CASE WHEN k - i0 = 0 THEN NULL
                  ELSE t0 + (b - s0) // (k - i0) END AS lev,
             CASE WHEN k - i0 = 0 THEN 0
                  ELSE (b - s0) % (k - i0) END AS rem
      FROM anchor, tot
    ),
    marked AS (
      SELECT s.domain, s.t, lvl.lev, lvl.rem,
             (lvl.lev IS NOT NULL AND s.t > lvl.lev) AS unsat,
             CASE WHEN lvl.lev IS NOT NULL AND s.t > lvl.lev THEN
               row_number() OVER (
                 PARTITION BY (lvl.lev IS NOT NULL AND s.t > lvl.lev)
                 ORDER BY s.domain)
             END AS bonus_rank
      FROM s, lvl
    )
    SELECT domain,
           CAST(t AS BIGINT) AS tokens,
           CAST(CASE WHEN NOT unsat THEN t ELSE lev END
                + CASE WHEN unsat AND bonus_rank <= rem THEN 1 ELSE 0 END
                AS BIGINT) AS alloc,
           NOT unsat AS saturated
    FROM marked
    ORDER BY domain
    """


@spark_query("d170_domain_token_waterfill", _d170_oracle())
def d170_domain_token_waterfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact integer waterfilling of a 60%-of-corpus token budget
    across registrable domains (see module docstring for the closed
    form). The corpus collapses to per-domain token sums (one
    shuffle); every later step — ranks, running sums, the anchor
    search, the level arithmetic, the remainder distribution — runs
    over the domain-bounded table with 1-row broadcast scalars, and
    every quantity is BIGINT so the allocation is engine-exact."""
    d = _with_domain(spark, sf_dir)
    tok = d.groupBy("domain").agg(
        F.sum(token_count("text")).cast("long").alias("t")
    )
    unb = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = Window.orderBy(F.col("t"), F.col("domain"))
    rs = tok.select(
        "domain",
        "t",
        F.row_number().over(w).alias("i"),
        F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("t").over(unb).alias("total"),
        F.count("*").over(unb).alias("k"),
    ).withColumn(
        "b", F.expr(f"total * {_BUDGET_PCT} DIV 100")
    ).withColumn(
        "si", F.col("cum") + (F.col("k") - F.col("i")) * F.col("t")
    )
    anchor = (
        rs.filter(F.col("si") <= F.col("b"))
        .orderBy(F.col("i").desc())
        .limit(1)
        .select(
            F.col("i").alias("i0"),
            F.col("si").alias("s0"),
            F.col("t").alias("t0"),
        )
    )
    # no row ⇒ level starts at 0 (anchor defaults via outer-join-less
    # crossJoin: synthesize the zero row when the filter is empty)
    zero = spark.range(1).select(
        F.lit(0).cast("long").alias("i0"),
        F.lit(0).cast("long").alias("s0"),
        F.lit(0).cast("long").alias("t0"),
    )
    anchor_or_zero = F.broadcast(
        anchor.unionByName(zero)
        .orderBy(F.col("i0").desc())
        .limit(1)
    )
    lvl = rs.crossJoin(anchor_or_zero).withColumn(
        "lev",
        F.when(
            F.col("k") - F.col("i0") == 0, F.lit(None).cast("long")
        ).otherwise(
            F.col("t0")
            + F.expr("(b - s0) DIV (k - i0)")
        ),
    ).withColumn(
        "rem",
        F.when(F.col("k") - F.col("i0") == 0, F.lit(0)).otherwise(
            F.expr("(b - s0) % (k - i0)")
        ),
    )
    marked = lvl.withColumn(
        "unsat", F.col("lev").isNotNull() & (F.col("t") > F.col("lev"))
    ).withColumn(
        "bonus_rank",
        F.when(
            F.col("unsat"),
            F.row_number().over(
                Window.partitionBy("unsat").orderBy("domain")
            ),
        ),
    )
    return marked.select(
        "domain",
        F.col("t").alias("tokens"),
        (
            F.when(~F.col("unsat"), F.col("t")).otherwise(F.col("lev"))
            + F.when(
                F.col("unsat") & (F.col("bonus_rank") <= F.col("rem")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        (~F.col("unsat")).alias("saturated"),
    ).orderBy("domain")
