"""Round-8 wave 46 — URL path rules:

- d171 — per-domain path-prefix exclusion screen: the robots/CCNet-
  style URL filter ("on site0.com, drop everything under /s0/").
  Rules are a dimension-sized (domain, path-prefix) table; the screen
  is a broadcast LEFT ANTI join with an equi domain key plus the
  startswith residual, so the corpus never shuffles and the hash
  lookup narrows each row to one domain's rules before the prefix
  check.
- d172 — domain mirror candidates: DOMAIN-level shingle Jaccard — the
  crawl staple that finds site mirrors (the same content republished
  under two hosts) which per-document dedup sees only pair-by-pair.
  Each domain collapses to its distinct shingle set first; shingles
  present in more than STOP_DF domains are excluded from the
  similarity universe on BOTH engines (they carry no mirror signal
  and are exactly the inverted-index hot keys that would cost f² in
  the self-join — the d06 stop-shingle lever at domain granularity).

Reference scope: beyond-reference LLM-data-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# d172 — domain mirror candidates.
# ---------------------------------------------------------------------------
_MIRROR_T = 0.05
_STOP_DF = 50  # shingles in more than this many domains are excluded


def _d172_oracle() -> str:
    return f"""{_base_cte()},
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    dm AS MATERIALIZED (SELECT doc_id, domain FROM d),
    ds AS MATERIALIZED (
      SELECT DISTINCT dm.domain, sh.shingle
      FROM sh JOIN dm ON sh.doc_id = dm.doc_id
    ),
    keep AS MATERIALIZED (
      SELECT shingle FROM ds GROUP BY shingle
      HAVING count(*) <= {_STOP_DF}
    ),
    ds2 AS MATERIALIZED (
      SELECT ds.domain, ds.shingle FROM ds JOIN keep USING (shingle)
    ),
    cnt AS (SELECT domain, count(*) AS n FROM ds2 GROUP BY domain),
    inter AS (
      SELECT a.domain AS d1, b.domain AS d2, count(*) AS nc
      FROM ds2 a JOIN ds2 b
        ON a.shingle = b.shingle AND a.domain < b.domain
      GROUP BY 1, 2
    )
    SELECT d1 AS domain_1, d2 AS domain_2,
           CAST(nc AS BIGINT) AS n_common,
           round(CAST(nc AS DOUBLE) / (c1.n + c2.n - nc), 6) AS jaccard
    FROM inter
    JOIN cnt c1 ON inter.d1 = c1.domain
    JOIN cnt c2 ON inter.d2 = c2.domain
    WHERE round(CAST(nc AS DOUBLE) / (c1.n + c2.n - nc), 6)
          >= {_MIRROR_T}
    ORDER BY 1, 2
    """


@spark_query("d172_domain_mirror_candidates", _d172_oracle())
def d172_domain_mirror_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Domain pairs whose distinct-shingle sets overlap above the
    mirror threshold (Jaccard ≥ 0.05), with the exact common-shingle
    count. The corpus collapses to (domain, shingle) distinct rows
    first; stop-shingles (> STOP_DF domains) leave the universe on
    both engines before the inverted-index self-join, so no posting
    list longer than STOP_DF ever enters the pair enumeration — the
    d06 discipline applied at domain granularity, where the domain
    count (not the corpus) bounds every aggregate."""
    from ..operators.dedup import shingle_table
    from ..sources.readers import load_table

    sh = shingle_table(load_table(spark, sf_dir, "documents"), "text", 3)
    dm = domain_map(spark, sf_dir).select("doc_id", "domain")
    ds = sh.join(dm, "doc_id").select("domain", "shingle").distinct()
    keep = (
        ds.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") <= _STOP_DF)
        .select("shingle")
    )
    ds2 = ds.join(keep, "shingle")
    cnt = ds2.groupBy("domain").agg(F.count("*").alias("n"))
    a, b = ds2.alias("a"), ds2.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.domain") < F.col("b.domain")),
        )
        .groupBy(
            F.col("a.domain").alias("d1"), F.col("b.domain").alias("d2")
        )
        .agg(F.count("*").alias("nc"))
    )
    jac = F.round(
        F.col("nc").cast("double")
        / (F.col("n1") + F.col("n2") - F.col("nc")),
        6,
    )
    return (
        inter.join(
            cnt.select(F.col("domain").alias("d1"), F.col("n").alias("n1")),
            "d1",
        )
        .join(
            cnt.select(F.col("domain").alias("d2"), F.col("n").alias("n2")),
            "d2",
        )
        .filter(jac >= _MIRROR_T)
        .select(
            F.col("d1").alias("domain_1"),
            F.col("d2").alias("domain_2"),
            F.col("nc").cast("long").alias("n_common"),
            jac.alias("jaccard"),
        )
        .orderBy("domain_1", "domain_2")
    )


# ---------------------------------------------------------------------------
# d173 — the domain curation funnel (capstone composition).
# ---------------------------------------------------------------------------
def _d173_oracle() -> str:
    from .wave41 import _BLOCKLIST, _CAP
    from ..operators.text import portable_hash_sql

    bl = ", ".join(f"'{b}'" for b in _BLOCKLIST)
    vals = ", ".join(f"('{d}', '{p}')" for d, p in _PATH_RULES)
    cap_hash = portable_hash_sql("'cap|' || CAST(doc_id AS VARCHAR)")
    return f"""{_base_cte()},
    rules(rule_domain, path_prefix) AS (VALUES {vals}),
    flagged AS MATERIALIZED (
      SELECT d.doc_id, d.domain, d.path,
             d.domain IN ({bl}) AS bl_hit,
             EXISTS (SELECT 1 FROM rules r
                     WHERE r.rule_domain = d.domain
                       AND d.path LIKE r.path_prefix || '%') AS rule_hit
      FROM d
    ),
    ranked AS (
      SELECT domain, doc_id, bl_hit, rule_hit,
             CASE WHEN NOT bl_hit AND NOT rule_hit THEN
               row_number() OVER (
                 PARTITION BY domain, (NOT bl_hit AND NOT rule_hit)
                 ORDER BY {cap_hash}, doc_id)
             END AS rn
      FROM flagged
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN NOT bl_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after_blocklist,
           CAST(sum(CASE WHEN NOT bl_hit AND NOT rule_hit THEN 1
                    ELSE 0 END) AS BIGINT) AS n_after_rules,
           CAST(sum(CASE WHEN rn <= {_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_final
    FROM ranked
    GROUP BY domain
    ORDER BY domain
    """


@spark_query("d173_domain_curation_funnel", _d173_oracle())
def d173_domain_curation_funnel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The whole domain-curation pipeline as one funnel report: per
    registrable domain, the doc count entering, surviving the
    blocklist, surviving the path-prefix rules, and surviving the
    frequency cap — the table an operator reads to see WHICH stage
    removes what before committing a curation config. Composes this
    round's operators in their real order (screens before the cap, so
    capped slots never go to rows a screen would drop); stages are
    flag columns over one domain-map scan plus the same
    WindowGroupLimit rank the cap uses, restricted to screen
    survivors."""
    from .wave41 import _BLOCKLIST, _CAP
    from ..operators.text import portable_hash

    d = domain_map(spark, sf_dir).select("doc_id", "domain", "path")
    bl = [F.lit(b) for b in _BLOCKLIST]
    rule_hit = F.lit(False)
    for dom, pre in _PATH_RULES:
        rule_hit = rule_hit | (
            (F.col("domain") == dom) & F.col("path").startswith(pre)
        )
    flagged = d.select(
        "doc_id",
        "domain",
        F.col("domain").isin(*[b.cast("string") for b in bl]).alias(
            "bl_hit"
        ),
        rule_hit.alias("rule_hit"),
    )
    survives = ~F.col("bl_hit") & ~F.col("rule_hit")
    w = Window.partitionBy("domain", survives).orderBy(
        portable_hash(
            F.concat(F.lit("cap|"), F.col("doc_id").cast("string"))
        ),
        F.col("doc_id"),
    )
    ranked = flagged.withColumn(
        "rn", F.when(survives, F.row_number().over(w))
    )
    return (
        ranked.groupBy("domain")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(~F.col("bl_hit"), 1).otherwise(0)).alias(
                "n_after_blocklist"
            ),
            F.sum(
                F.when(~F.col("bl_hit") & ~F.col("rule_hit"), 1).otherwise(
                    0
                )
            ).alias("n_after_rules"),
            F.sum(
                F.when(F.col("rn") <= _CAP, 1).otherwise(0)
            ).alias("n_final"),
        )
        .orderBy("domain")
    )
