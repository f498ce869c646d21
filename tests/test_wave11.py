"""Semantic unit tests for wave 11 (q85-q86, d93-d97)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q85_counter_resets_at_purchases(spark):
    rows = Q["q85_events_since_purchase"](spark, SF).collect()
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda e: (e["user_id"], e["ts"], e["event_id"]),
    )
    got = {r["event_id"]: (r["seg"], r["n_since"]) for r in rows}
    seg, n_since, cur_user = 0, -1, None
    for e in ev:
        if e["user_id"] != cur_user:
            cur_user, seg, n_since = e["user_id"], 0, -1
        if e["event_type"] == "purchase":
            seg += 1
            n_since = 0
        else:
            n_since += 1
        # purchase rows open their own segment at n_since = 0
        want = (seg, 0) if e["event_type"] == "purchase" else (seg, n_since)
        assert got[e["event_id"]] == want, e["event_id"]


def test_q86_multiplicity_is_bag_difference(spark):
    from collections import Counter

    rows = Counter(
        r["user_id"] for r in Q["q86_except_all_views"](spark, SF).collect()
    )
    ev = load_table(spark, SF, "events").collect()
    views = Counter(e["user_id"] for e in ev if e["event_type"] == "view")
    clicks = Counter(e["user_id"] for e in ev if e["event_type"] == "click")
    expected = Counter(
        {u: views[u] - clicks[u] for u in views if views[u] > clicks[u]}
    )
    assert rows == expected


def test_d93_quantile_is_percent_rank(spark):
    rows = sorted(
        Q["d93_quantile_normalize"](spark, SF).collect(),
        key=lambda r: (r["n_chars"], r["doc_id"]),
    )
    n = len(rows)
    for i, r in enumerate(rows):
        assert abs(r["quantile"] - round(i / (n - 1), 6)) < 1e-9
    assert rows[0]["quantile"] == 0.0
    assert rows[-1]["quantile"] == 1.0


def test_d94_coverage_monotone_in_k(spark):
    rows = sorted(Q["d94_vocab_coverage"](spark, SF).collect(), key=lambda r: r["k"])
    assert rows, "sf0.001 bigram vocab must exceed the smallest checkpoint"
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)
    assert all(0 < c <= 1 for c in covs)


def test_d95_zscores_match_definition(spark):
    """Replays the QUANTIZED + MIN-CENTERED definition (round 5):
    norms in integer 1e-10 units (finer than the corpus's ~3e-8
    normalization noise), μ/σ from the exact centered integer moments
    — the cross-engine determinism fix after native avg/stddev_pop
    diverged at 10×."""
    import math

    rows = {r["vec_id"]: r for r in Q["d95_embedding_norm_outliers"](spark, SF).collect()}
    embs = load_table(spark, SF, "embeddings").collect()
    micro = {
        e["vec_id"]: math.floor(
            sum(float(x) * float(x) for x in e["embedding"]) ** 0.5 * 1e10
            + 0.5
        )
        for e in embs
    }
    m0 = min(micro.values())
    d = {v: m - m0 for v, m in micro.items()}
    n = len(d)
    s1 = float(sum(d.values()))
    s2 = float(sum(x * x for x in d.values()))
    mu = s1 / n
    sigma = math.sqrt(s2 / n - mu * mu)
    assert sigma > 0, "corpus noise must survive the quantization"
    expected = {
        v: (x - mu) / sigma for v, x in d.items() if abs((x - mu) / sigma) > 2
    }
    assert expected, "no outliers at sf0.001 — semantic collapsed"
    assert set(rows) == set(expected)
    for v, z in expected.items():
        assert abs(rows[v]["z"] - round(z, 6)) < 1e-9
        assert abs(rows[v]["l2_norm"] - micro[v] / 1e10) < 1e-12


def test_d96_cosine_bounds_and_symmetry_convention(spark):
    rows = Q["d96_lang_profile_cosine"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["cosine"] <= 1.0
        assert r["lang_1"] < r["lang_2"]  # canonical orientation, no dupes
    pairs = {(r["lang_1"], r["lang_2"]) for r in rows}
    assert len(pairs) == len(rows)


def test_d97_correlation_in_bounds(spark):
    rows = Q["d97_length_token_correlation"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["chars_tokens_corr"] <= 1.0
        assert r["n_docs"] > 0
