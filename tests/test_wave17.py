"""Semantic unit tests for wave 17 (q103, d113-d115)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q103_matches_python_replay(spark):
    import statistics

    row = Q["q103_conversion_latency"](spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").collect()
    fv, fp = {}, {}
    for e in ev:
        if e["event_type"] == "view":
            fv[e["user_id"]] = min(fv.get(e["user_id"], e["ts"]), e["ts"])
        elif e["event_type"] == "purchase":
            fp[e["user_id"]] = min(fp.get(e["user_id"], e["ts"]), e["ts"])
    lats = sorted(
        (fp[u] - fv[u]).total_seconds()
        for u in fv
        if u in fp and fp[u] >= fv[u]
    )
    assert row["n_converted"] == len(lats)
    assert abs(row["max_s"] - lats[-1]) < 1e-6
    # interpolated median, the quantile_cont/percentile definition
    want_p50 = statistics.quantiles(lats, n=100, method="inclusive")[49]
    assert abs(row["p50_s"] - want_p50) < 1e-3
    assert row["p50_s"] <= row["p90_s"] <= row["max_s"]


def test_d113_card_matches_corpus(spark):
    row = Q["d113_dataset_card"](spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents").collect()
    toks = [d["text"].split(" ") for d in docs]
    assert row["n_docs"] == len(docs)
    assert row["n_sources"] == len({d["source"] for d in docs})
    assert row["n_langs"] == len({d["lang"] for d in docs})
    assert row["total_tokens"] == sum(len(t) for t in toks)
    assert row["vocab_size"] == len({w for t in toks for w in t})
    n_dup = len(docs) - len({d["text"] for d in docs})
    assert row["exact_dup_docs"] == n_dup
    assert abs(row["exact_dup_rate"] - round(n_dup / len(docs), 6)) < 1e-12


def test_d114_exposure_matches_python(spark):
    rows = {r["source"]: r for r in Q["d114_tail_token_exposure"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    df: dict[str, int] = {}
    for d in docs:
        for w in set(d["text"].split(" ")):
            df[w] = df.get(w, 0) + 1
    rare = {w for w, n in df.items() if n < 0.1 * len(docs)}
    per_src: dict[str, list] = {}
    for d in docs:
        per_src.setdefault(d["source"], []).append(
            bool(rare & set(d["text"].split(" ")))
        )
    assert set(rows) == set(per_src)
    for src, hits in per_src.items():
        assert rows[src]["n_docs"] == len(hits)
        assert rows[src]["n_exposed"] == sum(hits)


def test_d115_matrix_accounts_for_all_pairs(spark):
    rows = Q["d115_cross_source_dup_matrix"](spark, SF).collect()
    pairs = Q["d07_minhash_lsh"](spark, SF).collect()
    src = {
        d["doc_id"]: d["source"]
        for d in load_table(spark, SF, "documents").collect()
    }
    from collections import Counter

    want = Counter()
    for p in pairs:
        a, b = sorted((src[p["doc_id_1"]], src[p["doc_id_2"]]))
        want[(a, b)] += 1
    got = {(r["source_a"], r["source_b"]): r["n_pairs"] for r in rows}
    assert got == dict(want)
    assert sum(got.values()) == len(pairs)
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert 0.5 <= r["mean_est_jaccard"] <= 1.0
