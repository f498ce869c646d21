"""Round-8 wave 46 — URL path rules:

- d171 — per-domain path-prefix exclusion screen: the robots/CCNet-
  style URL filter ("on site0.com, drop everything under /s0/").
  Rules are a dimension-sized (domain, path-prefix) table; the screen
  is a broadcast LEFT ANTI join with an equi domain key plus the
  startswith residual, so the corpus never shuffles and the hash
  lookup narrows each row to one domain's rules before the prefix
  check.

Reference scope: beyond-reference LLM-data-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import domains
from .registry import spark_query
from .wave41 import _base_cte, domain_map

_PATH_RULES = (
    ("site0.com", "/s0/"),
    ("site0.co.uk", "/s1/"),
    ("site1.net", "/s2/"),
    ("site2.ac.uk", "/s3/"),
    ("site3.io", "/s4/"),
)


def _d171_oracle() -> str:
    vals = ", ".join(f"('{d}', '{p}')" for d, p in _PATH_RULES)
    return f"""{_base_cte()},
    rules(rule_domain, path_prefix) AS (VALUES {vals}),
    blocked AS MATERIALIZED (
      SELECT DISTINCT d.doc_id
      FROM d JOIN rules r
        ON d.domain = r.rule_domain
       AND d.path LIKE r.path_prefix || '%'
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(b.doc_id) AS BIGINT) AS n_blocked,
           CAST(count(*) - count(b.doc_id) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN b.doc_id IS NULL THEN d.n_chars ELSE 0 END)
                AS BIGINT) AS chars_kept
    FROM d LEFT JOIN blocked b ON d.doc_id = b.doc_id
    GROUP BY domain
    ORDER BY domain
    """


@spark_query("d171_path_rule_screen", _d171_oracle())
def d171_path_rule_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per registrable domain: documents dropped vs kept by the
    (domain, path-prefix) exclusion rules, with the surviving char
    mass. The screen is ``operators/domains.path_rule_screen`` — a
    broadcast LEFT ANTI whose equi key is the domain (the startswith
    is a residual condition on the hash match); pre/post counts join
    on the bounded domain key."""
    d = domain_map(spark, sf_dir).select(
        "doc_id", "domain", "path", "n_chars"
    )
    rules = spark.createDataFrame(
        list(_PATH_RULES), "rule_domain string, path_prefix string"
    )
    kept = domains.path_rule_screen(d, "domain", "path", rules)
    totals = d.groupBy("domain").agg(F.count("*").alias("n_docs"))
    kept_agg = kept.groupBy("domain").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )
    return (
        totals.join(kept_agg, "domain", "left")
        .select(
            "domain",
            "n_docs",
            (
                F.col("n_docs") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).alias("n_blocked"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("chars_kept"), F.lit(0)).alias("chars_kept"),
        )
        .orderBy("domain")
    )
