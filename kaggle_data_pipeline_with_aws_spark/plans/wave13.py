"""Round-4 fourth wave: training-data curation audits over the
documents corpus —

- d98 — PII screen: regex hit counts (URL / email / long digit run)
  plus the md5 of the scrubbed text, per document.
- d99 — Gopher-style quality rule matrix: per-source pass/fail
  counts for four heuristic quality rules.
- d100 — padding-waste audit: if docs are padded to 16-token bucket
  boundaries for batched inference/training, how many tokens are
  wasted per bucket.
- d101 — distinct-bigram diversity ratio per source (the repetition
  complement of d46's novelty).
- d102 — language-ID ambiguity margin: top-1 vs top-2 marker-score
  gap per document (composes d05's scorer).
- d103 — curation filter funnel: cumulative survivor counts through
  the d99 rule chain, in order.

Shared scale notes: every op is one documents scan with row-local
array expressions (no explode except d101's bigram count, which
aggregates immediately); outputs are doc-sized or tiny. Nothing
shuffles more than once. The PII regexes run JVM-side
(`regexp_count` / chained `regexp_replace` — single codegen stage,
no Python). The corpus here contains no PII by construction, so d98's
counts are zero at every SF — the constructed-fixture pytest is what
exercises the positive path; the oracle twin proves the zero-path
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text
from ..sources.readers import load_table
from .registry import spark_query

URL_PAT = r"https?://\S+"
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGITS_PAT = r"\d{7,}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# d98 — PII screen + scrub.
# ---------------------------------------------------------------------------
@spark_query(
    "d98_pii_screen",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{URL_PAT}')) AS BIGINT)
             AS n_urls,
           CAST(len(regexp_extract_all(text, '{EMAIL_PAT}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{DIGITS_PAT}')) AS BIGINT)
             AS n_digit_runs,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 text, '{URL_PAT}', '<URL>', 'g'),
                 '{EMAIL_PAT}', '<EMAIL>', 'g'),
                 '{DIGITS_PAT}', '<NUM>', 'g')) AS scrubbed_md5
    FROM documents
    """,
)
def d98_pii_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count URL / email / long-digit-run hits per document and hash
    the scrubbed text (patterns shared with `text.CLEAN_PATTERNS`,
    applied in the same fixed order — order matters, an email inside
    a URL must already be gone). All three counts and the three
    chained replaces fuse into one whole-stage-codegen pass over the
    scan; nothing leaves the row. At 100 TB this is the pure-map
    shape: zero shuffles, output co-partitioned with the input."""
    d = _docs(spark, sf_dir)
    scrubbed = F.col("text")
    for pat, rep in [
        (URL_PAT, "<URL>"),
        (EMAIL_PAT, "<EMAIL>"),
        (DIGITS_PAT, "<NUM>"),
    ]:
        scrubbed = F.regexp_replace(scrubbed, pat, rep)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(URL_PAT)).cast("long").alias("n_urls"),
        F.regexp_count("text", F.lit(EMAIL_PAT))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count("text", F.lit(DIGITS_PAT))
        .cast("long")
        .alias("n_digit_runs"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
# d99 — Gopher-style quality rule matrix. The four rules, row-local:
#   r1: 30 <= word count <= 80
#   r2: 4.2 <= mean word length <= 4.8
#   r3: contains an English stopword ('the' or 'a')
#   r4: type-token ratio >= 0.5 (distinct words / words)
# ---------------------------------------------------------------------------
_RULES_SQL = """
      SELECT source,
             len(string_split(text, ' ')) BETWEEN 30 AND 80 AS r1,
             list_avg(list_transform(string_split(text, ' '), w -> len(w)))
               BETWEEN 4.2 AND 4.8 AS r2,
             list_contains(string_split(text, ' '), 'the')
               OR list_contains(string_split(text, ' '), 'a') AS r3,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) >= 0.5 AS r4
      FROM documents
"""


def _rule_cols() -> list[Column]:
    tok = text.tokens("text")
    n = F.size(tok)
    mean_len = F.aggregate(
        tok, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ) / n
    return [
        (n >= 30) & (n <= 80),
        (mean_len >= 4.2) & (mean_len <= 4.8),
        F.array_contains(tok, "the") | F.array_contains(tok, "a"),
        (F.size(F.array_distinct(tok)).cast("double") / n) >= 0.5,
    ]


@spark_query(
    "d99_gopher_quality_rules",
    f"""
    WITH r AS ({_RULES_SQL})
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS fail_wordcount,
           CAST(sum(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) AS fail_meanlen,
           CAST(sum(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) AS fail_stopword,
           CAST(sum(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) AS fail_ttr,
           CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep
    FROM r GROUP BY source ORDER BY source
    """,
)
def d99_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation report: how many docs fail each heuristic
    quality rule, and how many pass all four (the kept set). The rule
    battery is the Gopher/C4 shape — length fences, mean-word-length
    fence, stopword evidence, type-token repetition fence — each a
    row-local array expression; the only shuffle is the source-sized
    final aggregate, partial-aggregated map-side. Rules are evaluated
    once per doc via a shared tokens() array (Catalyst CSEs the
    split)."""
    r1, r2, r3, r4 = _rule_cols()
    return (
        _docs(spark, sf_dir)
        .select("source", r1.alias("r1"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("r1"), 0).otherwise(1)).alias("fail_wordcount"),
            F.sum(F.when(F.col("r2"), 0).otherwise(1)).alias("fail_meanlen"),
            F.sum(F.when(F.col("r3"), 0).otherwise(1)).alias("fail_stopword"),
            F.sum(F.when(F.col("r4"), 0).otherwise(1)).alias("fail_ttr"),
            F.sum(
                F.when(
                    F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4"), 1
                ).otherwise(0)
            ).alias("n_keep"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# d100 — padding-waste audit for 16-token batch buckets.
# ---------------------------------------------------------------------------
@spark_query(
    "d100_padding_waste",
    """
    WITH t AS (
      SELECT ((len(string_split(text, ' ')) + 15) // 16) * 16 AS bucket,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS real_tokens,
           CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
           CAST(round(1.0 - CAST(sum(n_tok) AS DOUBLE) / (bucket * count(*)),
                      6) AS DOUBLE) AS waste_frac
    FROM t GROUP BY bucket ORDER BY bucket
    """,
)
def d100_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """If every document is padded up to the next 16-token boundary
    (fixed-shape inference/training batches), how much compute is
    padding per bucket. Bucket assignment is integer row-local
    arithmetic ((n+15) div 16 — no float ceil, so both engines agree
    bit-for-bit); the aggregate output has one row per occupied
    bucket (≤ max_len/16 rows). This is the measurement that
    justifies d68-style length-bucketed batching."""
    n_tok = text.token_count("text")
    bucket = (F.floor((n_tok + 15) / 16) * 16).cast("long")
    return (
        _docs(spark, sf_dir)
        .select(bucket.alias("bucket"), n_tok.alias("n_tok"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("real_tokens"),
            (F.first("bucket") * F.count("*")).alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("n_tok").cast("double")
                / (F.first("bucket") * F.count("*")),
                6,
            ).alias("waste_frac"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# d101 — distinct-bigram diversity per source.
# ---------------------------------------------------------------------------
@spark_query(
    "d101_bigram_diversity",
    """
    WITH b AS (
      SELECT source,
             unnest(list_transform(range(1, len(string_split(text, ' '))),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i+1])) AS bigram
      FROM documents
    )
    SELECT source,
           CAST(count(DISTINCT bigram) AS BIGINT) AS distinct_bigrams,
           count(*) AS total_bigrams,
           CAST(round(CAST(count(DISTINCT bigram) AS DOUBLE) / count(*), 6)
                AS DOUBLE) AS diversity
    FROM b GROUP BY source ORDER BY source
    """,
)
def d101_bigram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (the self-BLEU complement): what fraction
    of a source's emitted bigrams are unique. Low diversity = the
    source repeats itself = dedup/quality attention. One explode of
    the bigram stream feeding straight into a (source, bigram)
    partial aggregate — the exploded rows never persist; the
    count-distinct re-shuffle carries one row per DISTINCT bigram per
    source, not per occurrence. Compare d46 (first-occurrence novelty
    per doc) and d94 (coverage vs vocab rank) — this is the corpus-
    level repetition dial."""
    tok = text.tokens("text")
    d = _docs(spark, sf_dir).select(
        "source", F.explode(text.word_ngrams(tok, 2)).alias("bigram")
    )
    return (
        d.groupBy("source")
        .agg(
            F.countDistinct("bigram").alias("distinct_bigrams"),
            F.count("*").alias("total_bigrams"),
        )
        .select(
            "source",
            "distinct_bigrams",
            "total_bigrams",
            F.round(
                F.col("distinct_bigrams").cast("double")
                / F.col("total_bigrams"),
                6,
            ).alias("diversity"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# d102 — language-ID ambiguity margin (top-1 vs top-2 marker score).
# ---------------------------------------------------------------------------
def _lang_margin_oracle() -> str:
    structs = []
    for lang, words in sorted(text.LANG_MARKERS.items()):
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        structs.append(
            f"{{'neg_hits': -len(list_filter(toks, x -> list_contains({lst}, x))),"
            f" 'lang': '{lang}'}}"
        )
    arr = "[" + ", ".join(structs) + "]"
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, list_sort({arr}) AS ss FROM t)
    SELECT doc_id,
           ss[1].lang AS top_lang,
           ss[2].lang AS second_lang,
           CAST(ss[2].neg_hits - ss[1].neg_hits AS BIGINT) AS margin,
           ss[2].neg_hits - ss[1].neg_hits <= 1 AS ambiguous
    FROM s
    """


@spark_query("d102_lang_margin", _lang_margin_oracle())
def d102_lang_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How confidently does the d05 marker scorer separate its top
    two languages? margin = hits(top1) − hits(top2); docs with margin
    ≤ 1 are flagged ambiguous (the code-switching / mislabel review
    queue). Reuses d05's exact scoring structs — sorted asc on
    (neg_hits, lang), so the ranking and its tiebreak are identical
    to the predictor's, and the oracle rebuilds the same struct sort
    in SQL. Row-local array sort of a 5-element array: zero
    shuffles."""
    tok = text.tokens("text")
    neg = [
        F.struct(
            (-F.size(F.filter(tok, lambda t: t.isin(*words)))).alias(
                "neg_hits"
            ),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(text.LANG_MARKERS.items())
    ]
    ss = F.sort_array(F.array(*neg))
    first = F.element_at(ss, 1)
    second = F.element_at(ss, 2)
    margin = (
        second.getField("neg_hits") - first.getField("neg_hits")
    ).cast("long")
    return _docs(spark, sf_dir).select(
        "doc_id",
        first.getField("lang").alias("top_lang"),
        second.getField("lang").alias("second_lang"),
        margin.alias("margin"),
        (margin <= 1).alias("ambiguous"),
    )


# ---------------------------------------------------------------------------
# d103 — curation filter funnel (cumulative survivors through d99's
# rule chain, in order).
# ---------------------------------------------------------------------------
@spark_query(
    "d103_filter_funnel",
    f"""
    WITH r AS ({_RULES_SQL})
    SELECT stage, n_surviving FROM (
      SELECT '0_input' AS stage, count(*) AS n_surviving, 0 AS ord FROM r
      UNION ALL
      SELECT '1_wordcount', CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END)
             AS BIGINT), 1 FROM r
      UNION ALL
      SELECT '2_meanlen', CAST(sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END)
             AS BIGINT), 2 FROM r
      UNION ALL
      SELECT '3_stopword', CAST(sum(CASE WHEN r1 AND r2 AND r3 THEN 1
             ELSE 0 END) AS BIGINT), 3 FROM r
      UNION ALL
      SELECT '4_ttr', CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1
             ELSE 0 END) AS BIGINT), 4 FROM r
    ) ORDER BY ord
    """,
)
def d103_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard number: how many documents survive each
    successive quality filter (rules applied in d99's order — funnels
    are order-sensitive and this one states its order in the stage
    names). ONE documents scan computes all four cumulative survival
    flags as conditional sums in a single partial aggregate — never
    one pass per stage — then a 5-row literal unpivot. The oracle
    mirrors stage-by-stage with cumulative CASE conjunctions."""
    r1, r2, r3, r4 = _rule_cols()
    agg = (
        _docs(spark, sf_dir)
        .select(r1.alias("r1"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4"))
        .agg(
            F.count("*").alias("s0"),
            F.sum(F.when(F.col("r1"), 1).otherwise(0)).alias("s1"),
            F.sum(F.when(F.col("r1") & F.col("r2"), 1).otherwise(0)).alias(
                "s2"
            ),
            F.sum(
                F.when(F.col("r1") & F.col("r2") & F.col("r3"), 1).otherwise(0)
            ).alias("s3"),
            F.sum(
                F.when(
                    F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4"), 1
                ).otherwise(0)
            ).alias("s4"),
        )
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(name).alias("stage"), F.col(c).alias("n_surviving")
            )
            for name, c in [
                ("0_input", "s0"),
                ("1_wordcount", "s1"),
                ("2_meanlen", "s2"),
                ("3_stopword", "s3"),
                ("4_ttr", "s4"),
            ]
        ]
    )
    return (
        agg.select(F.explode(stages).alias("s"))
        .select("s.stage", "s.n_surviving")
        .orderBy("stage")
    )
