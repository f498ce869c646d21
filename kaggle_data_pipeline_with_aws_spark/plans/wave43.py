"""Round-8 wave 43 — domain-aware curation, second tier (composes the
wave-41 domain key with quality, sampling, and the dedup substrate):

- d163 — quality top-k per domain: keep the BEST k docs per domain by
  a deterministic quality score (RefinedWeb's quality-aware cap, vs
  d158's uniform hash cap). Same WindowGroupLimit shape, score-ordered.
- d164 — domain-stratified sample with exact largest-remainder quotas
  (Hamilton apportionment): proportional integer quotas that sum to
  EXACTLY the requested sample size — the balanced-eval-set builder.
- d165 — public-suffix rollup: per matched suffix, domain/doc counts
  and subdomain rate (the registry-level view above d157's domains).
- d166 — near-dup locality per domain: how many LSH near-dup pairs
  are intra-domain vs cross-domain — tells a curation run whether
  per-domain caps alone would remove most duplication (intra-heavy)
  or a global dedup pass is required (cross-heavy). Reads the shared
  MinHash pair substrate; the domain map joins once per endpoint.

Reference scope: beyond-reference LLM-data-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import portable_hash, portable_hash_sql
from .registry import spark_query
from .wave41 import _base_cte, _with_domain, domain_map

_TOPK = 2
_SAMPLE_N = 100


# ---------------------------------------------------------------------------
# d163 — quality top-k per domain.
# ---------------------------------------------------------------------------
def _qscore_sql() -> str:
    return (
        "round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
        " / len(string_split(text, ' ')), 6)"
    )


def _d163_oracle() -> str:
    return f"""{_base_cte()},
    scored AS (
      SELECT domain, doc_id, {_qscore_sql()} AS qscore FROM d
    ),
    ranked AS (
      SELECT domain, doc_id, qscore,
             row_number() OVER (PARTITION BY domain
                 ORDER BY qscore DESC, doc_id) AS rn
      FROM scored
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(max(qscore), 6) AS best_score,
           round(min(qscore), 6) AS worst_kept_score,
           CAST(sum(doc_id) AS BIGINT) AS kept_key_sum
    FROM ranked WHERE rn <= {_TOPK}
    GROUP BY domain
    ORDER BY domain
    """


@spark_query("d163_domain_quality_topk", _d163_oracle())
def d163_domain_quality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the best ≤ k documents per registrable domain by a
    deterministic quality score (distinct-token ratio — an exact
    integer ratio, identical in both engines), ties broken by doc_id.
    The rank ≤ k predicate compiles to the same Partial
    WindowGroupLimit as d158's uniform cap, so hot domains forward k
    rows per input partition; per domain the output pins which docs
    survived (key sum) and the kept score range."""
    toks = F.split(F.col("text"), " ")
    qscore = F.round(
        F.array_size(F.array_distinct(toks)).cast("double")
        / F.array_size(toks),
        6,
    )
    d = _with_domain(spark, sf_dir).select(
        "domain", "doc_id", qscore.alias("qscore")
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("qscore").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.max("qscore"), 6).alias("best_score"),
            F.round(F.min("qscore"), 6).alias("worst_kept_score"),
            F.sum("doc_id").alias("kept_key_sum"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# d164 — domain-stratified sample, largest-remainder quotas.
# ---------------------------------------------------------------------------
def _d164_oracle() -> str:
    smp_hash = portable_hash_sql("'smp|' || CAST(doc_id AS VARCHAR)")
    return f"""{_base_cte()},
    c AS MATERIALIZED (
      SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY domain
    ),
    t AS (SELECT sum(n_docs) AS total FROM c),
    q AS MATERIALIZED (
      SELECT domain, n_docs,
             CAST((n_docs * {_SAMPLE_N}) // total AS BIGINT) AS base_quota,
             CAST((n_docs * {_SAMPLE_N}) % total AS BIGINT) AS rem
      FROM c, t
    ),
    alloc AS (
      SELECT domain, n_docs,
             base_quota + CASE WHEN
               row_number() OVER (ORDER BY rem DESC, domain)
                 <= {_SAMPLE_N} - (SELECT sum(base_quota) FROM q)
               THEN 1 ELSE 0 END AS quota
      FROM q
    ),
    ranked AS (
      SELECT domain, doc_id,
             row_number() OVER (PARTITION BY domain
                 ORDER BY {smp_hash}, doc_id) AS rn
      FROM d
    )
    SELECT a.domain,
           CAST(a.n_docs AS BIGINT) AS n_docs,
           CAST(a.quota AS BIGINT) AS quota,
           CAST(count(r.doc_id) AS BIGINT) AS n_sampled,
           CAST(coalesce(sum(r.doc_id), 0) AS BIGINT) AS sample_key_sum
    FROM alloc a LEFT JOIN ranked r
      ON r.domain = a.domain AND r.rn <= a.quota
    GROUP BY a.domain, a.n_docs, a.quota
    ORDER BY a.domain
    """


@spark_query("d164_domain_stratified_sample", _d164_oracle())
def d164_domain_stratified_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Proportional stratified sample keyed by registrable domain with
    EXACT integer quotas (largest-remainder / Hamilton apportionment):
    base quota = floor(share·N) — all integer arithmetic — and the
    leftover seats go to the largest remainders (ties by domain), so
    quotas sum to exactly N whenever the corpus has ≥ N docs. Row
    selection within a domain is the deterministic salted-hash order.
    The apportionment windows run over the domain-count-bounded table;
    only the per-domain rank touches corpus-sized data."""
    d = domain_map(spark, sf_dir).select("doc_id", "domain")
    c = d.groupBy("domain").agg(F.count("*").alias("n_docs"))
    unb = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    q = c.withColumn("total", F.sum("n_docs").over(unb)).select(
        "domain",
        "n_docs",
        F.expr(f"(n_docs * {_SAMPLE_N}) DIV total").alias("base_quota"),
        F.expr(f"(n_docs * {_SAMPLE_N}) % total").alias("rem"),
    )
    wrem = Window.orderBy(F.col("rem").desc(), F.col("domain"))
    alloc = (
        q.withColumn("deficit", F.lit(_SAMPLE_N) - F.sum("base_quota").over(unb))
        .withColumn(
            "quota",
            F.col("base_quota")
            + F.when(
                F.row_number().over(wrem) <= F.col("deficit"), 1
            ).otherwise(0),
        )
        .select("domain", "n_docs", "quota")
    )
    wd = Window.partitionBy("domain").orderBy(
        portable_hash(
            F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))
        ),
        F.col("doc_id"),
    )
    ranked = d.withColumn("rn", F.row_number().over(wd))
    a, r = alloc.alias("a"), ranked.alias("r")
    return (
        a.join(
            r,
            (F.col("r.domain") == F.col("a.domain"))
            & (F.col("r.rn") <= F.col("a.quota")),
            "left",
        )
        .groupBy(F.col("a.domain").alias("domain"), "n_docs", "quota")
        .agg(
            F.count(F.col("r.doc_id")).alias("n_sampled"),
            F.coalesce(F.sum(F.col("r.doc_id")), F.lit(0)).alias(
                "sample_key_sum"
            ),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# d165 — public-suffix rollup.
# ---------------------------------------------------------------------------
def _d165_oracle() -> str:
    return f"""{_base_cte()}
    SELECT array_to_string((string_split(domain, '.'))[2:], '.') AS suffix,
           CAST(count(DISTINCT domain) AS BIGINT) AS n_domains,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN host <> domain THEN 1 ELSE 0 END)
                AS BIGINT) AS n_subdomain_docs
    FROM d
    GROUP BY 1
    ORDER BY 1
    """


@spark_query("d165_public_suffix_rollup", _d165_oracle())
def d165_public_suffix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry-level view one label above d157: per matched public
    suffix, how many registrable domains and documents sit under it
    and how many docs arrive via subdomains. The suffix is the domain
    minus its first label (the domain was built by longest-suffix
    match, so this recovers exactly the matched rule). One rollup
    bounded by the suffix list."""
    d = domain_map(spark, sf_dir)
    suffix = F.array_join(
        F.slice(F.split(F.col("domain"), r"\."), 2, 100), "."
    )
    return (
        d.groupBy(suffix.alias("suffix"))
        .agg(
            F.countDistinct("domain").alias("n_domains"),
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("host") != F.col("domain"), 1).otherwise(0)
            ).alias("n_subdomain_docs"),
        )
        .orderBy("suffix")
    )


# ---------------------------------------------------------------------------
# d166 — near-dup locality per domain.
# ---------------------------------------------------------------------------
def _d166_oracle() -> str:
    from .llm_data import _minhash_pairs_cte

    cte = _minhash_pairs_cte(0.5).replace(
        "pairs AS (", "pairs AS MATERIALIZED (", 1
    )
    url = _base_cte()[len("WITH ") :]  # reuse u/h/d bodies after WITH
    return f"""{cte},
    {url},
    dm AS MATERIALIZED (SELECT doc_id, domain FROM d),
    pj AS MATERIALIZED (
      SELECT ma.domain AS da, mb.domain AS db
      FROM pairs p
      JOIN dm ma ON p.doc_id_1 = ma.doc_id
      JOIN dm mb ON p.doc_id_2 = mb.doc_id
    ),
    contrib AS (
      SELECT da AS domain,
             CASE WHEN da = db THEN 1 ELSE 0 END AS intra,
             CASE WHEN da = db THEN 0 ELSE 1 END AS crossd
      FROM pj
      UNION ALL
      SELECT db, 0, 1 FROM pj WHERE da <> db
    )
    SELECT domain,
           CAST(sum(intra) AS BIGINT) AS intra_pairs,
           CAST(sum(crossd) AS BIGINT) AS cross_pairs
    FROM contrib
    GROUP BY domain
    ORDER BY domain
    """


@spark_query("d166_domain_dup_locality", _d166_oracle())
def d166_domain_dup_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup locality: per registrable domain, how many MinHash
    near-dup pairs (threshold 0.5) are intra-domain vs cross-domain.
    Intra-heavy corpora dedup adequately under per-domain caps;
    cross-heavy ones need the global pass. The pair list comes from
    the shared signature substrate (near-dup-sized, built once per
    dataset); the domain map joins once per endpoint — two equi-joins
    of a pair-sized table against a doc-sized map, then a
    domain-bounded rollup."""
    from ..operators import text_substrate

    pairs = text_substrate.lsh_pairs(spark, sf_dir, threshold=0.5).select(
        "doc_id_1", "doc_id_2"
    )
    dm = domain_map(spark, sf_dir).select("doc_id", "domain")
    pj = (
        pairs.join(
            dm.select(
                F.col("doc_id").alias("doc_id_1"),
                F.col("domain").alias("da"),
            ),
            "doc_id_1",
        )
        .join(
            dm.select(
                F.col("doc_id").alias("doc_id_2"),
                F.col("domain").alias("db"),
            ),
            "doc_id_2",
        )
        .select("da", "db")
    )
    same = F.col("da") == F.col("db")
    contrib = pj.select(
        F.col("da").alias("domain"),
        F.when(same, 1).otherwise(0).alias("intra"),
        F.when(same, 0).otherwise(1).alias("crossd"),
    ).unionByName(
        pj.filter(~same).select(
            F.col("db").alias("domain"),
            F.lit(0).alias("intra"),
            F.lit(1).alias("crossd"),
        )
    )
    return (
        contrib.groupBy("domain")
        .agg(
            F.sum("intra").cast("long").alias("intra_pairs"),
            F.sum("crossd").cast("long").alias("cross_pairs"),
        )
        .orderBy("domain")
    )
