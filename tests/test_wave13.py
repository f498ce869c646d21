"""Semantic unit tests for wave 13 (d98-d103, curation audits)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave13 import (
    DIGITS_PAT,
    EMAIL_PAT,
    URL_PAT,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").collect()


def test_d98_positive_path_counts_and_scrubs(spark):
    # the corpus has no PII by construction — drive the positive path
    # on constructed rows through the same column expressions.
    rows = [
        (1, "mail me at alice@example.com or bob@test.org today"),
        (2, "see https://spark.apache.org/docs and http://a.io/x?q=1"),
        (3, "call 12345678 about account 999999999 not 123"),
        (4, "clean text with no sensitive content at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scrubbed = F.col("text")
    for pat, rep in [
        (URL_PAT, "<URL>"),
        (EMAIL_PAT, "<EMAIL>"),
        (DIGITS_PAT, "<NUM>"),
    ]:
        scrubbed = F.regexp_replace(scrubbed, pat, rep)
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.regexp_count("text", F.lit(URL_PAT)).alias("u"),
            F.regexp_count("text", F.lit(EMAIL_PAT)).alias("e"),
            F.regexp_count("text", F.lit(DIGITS_PAT)).alias("d"),
            scrubbed.alias("scrubbed"),
        ).collect()
    }
    assert (out[1]["u"], out[1]["e"], out[1]["d"]) == (0, 2, 0)
    assert out[1]["scrubbed"] == "mail me at <EMAIL> or <EMAIL> today"
    assert (out[2]["u"], out[2]["e"]) == (2, 0)
    assert out[2]["scrubbed"] == "see <URL> and <URL>"
    assert (out[3]["d"], out[3]["u"]) == (2, 0)
    assert out[3]["scrubbed"] == "call <NUM> about account <NUM> not 123"
    assert out[4]["scrubbed"] == rows[3][1]


def test_d98_corpus_is_clean_and_hash_is_md5_of_text(spark):
    rows = Q["d98_pii_screen"](spark, SF).collect()
    texts = {d["doc_id"]: d["text"] for d in _docs(spark)}
    assert all(
        r["n_urls"] == r["n_emails"] == r["n_digit_runs"] == 0 for r in rows
    )
    # no PII -> scrub is identity -> md5(text)
    for r in rows[:20]:
        want = hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()
        assert r["scrubbed_md5"] == want


def _rule_flags(text_):
    tok = text_.split(" ")
    n = len(tok)
    mean_len = sum(len(w) for w in tok) / n
    return (
        30 <= n <= 80,
        4.2 <= mean_len <= 4.8,
        "the" in tok or "a" in tok,
        len(set(tok)) / n >= 0.5,
    )


def test_d99_matches_python_rules(spark):
    rows = {r["source"]: r for r in Q["d99_gopher_quality_rules"](spark, SF).collect()}
    per_source = {}
    for d in _docs(spark):
        per_source.setdefault(d["source"], []).append(_rule_flags(d["text"]))
    for src, flags in per_source.items():
        r = rows[src]
        assert r["n_docs"] == len(flags)
        assert r["fail_wordcount"] == sum(1 for f in flags if not f[0])
        assert r["fail_meanlen"] == sum(1 for f in flags if not f[1])
        assert r["fail_stopword"] == sum(1 for f in flags if not f[2])
        assert r["fail_ttr"] == sum(1 for f in flags if not f[3])
        assert r["n_keep"] == sum(1 for f in flags if all(f))


def test_d100_buckets_account_for_all_tokens(spark):
    rows = Q["d100_padding_waste"](spark, SF).collect()
    docs = _docs(spark)
    total_tokens = sum(len(d["text"].split(" ")) for d in docs)
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert sum(r["real_tokens"] for r in rows) == total_tokens
    for r in rows:
        assert r["bucket"] % 16 == 0
        assert r["padded_tokens"] == r["bucket"] * r["n_docs"]
        assert r["padded_tokens"] >= r["real_tokens"]
        # every doc in the bucket is within 15 tokens of the boundary
        assert r["padded_tokens"] - r["real_tokens"] <= 15 * r["n_docs"]
        assert 0.0 <= r["waste_frac"] < 1.0


def test_d101_matches_python_bigrams(spark):
    rows = {r["source"]: r for r in Q["d101_bigram_diversity"](spark, SF).collect()}
    per_source: dict[str, list[str]] = {}
    for d in _docs(spark):
        tok = d["text"].split(" ")
        per_source.setdefault(d["source"], []).extend(
            f"{a} {b}" for a, b in zip(tok, tok[1:])
        )
    for src, bigrams in per_source.items():
        r = rows[src]
        assert r["total_bigrams"] == len(bigrams)
        assert r["distinct_bigrams"] == len(set(bigrams))
        assert abs(r["diversity"] - round(len(set(bigrams)) / len(bigrams), 6)) < 1e-12


def test_d102_margin_consistent_with_d05_prediction(spark):
    margins = {r["doc_id"]: r for r in Q["d102_lang_margin"](spark, SF).collect()}
    preds = {r["doc_id"]: r for r in Q["d05_lang_id"](spark, SF).collect()}
    assert margins.keys() == preds.keys()
    for doc_id, m in margins.items():
        assert m["top_lang"] == preds[doc_id]["predicted_lang"]
        assert m["margin"] >= 0
        assert m["ambiguous"] == (m["margin"] <= 1)
        assert m["top_lang"] != m["second_lang"]


def test_d103_funnel_is_monotone_and_matches_d99(spark):
    rows = {r["stage"]: r["n_surviving"] for r in Q["d103_filter_funnel"](spark, SF).collect()}
    order = ["0_input", "1_wordcount", "2_meanlen", "3_stopword", "4_ttr"]
    vals = [rows[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    assert vals[0] == len(_docs(spark))
    total_keep = sum(
        r["n_keep"] for r in Q["d99_gopher_quality_rules"](spark, SF).collect()
    )
    assert vals[-1] == total_keep
