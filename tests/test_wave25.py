"""Semantic unit tests for wave 25 (d126)."""

from __future__ import annotations

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave25 import _SWEEP_TS
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_d126_matches_bruteforce_and_is_monotone(spark):
    rows = {r["threshold"]: r for r in Q["d126_dedup_threshold_sweep"](spark, SF).collect()}
    assert set(rows) == set(_SWEEP_TS)
    # brute-force trigram Jaccard over the corpus
    docs = load_table(spark, SF, "documents").collect()
    sh = {}
    for d in docs:
        t = d["text"].split(" ")
        sh[d["doc_id"]] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    ids = sorted(sh)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter:
                j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
                if j >= min(_SWEEP_TS):
                    pairs.append((a, b, j))
    for t in _SWEEP_TS:
        keep = [(a, b) for a, b, j in pairs if j >= t]
        docs_hit = {x for p in keep for x in p}
        assert rows[t]["n_pairs"] == len(keep), t
        assert rows[t]["n_docs_implicated"] == len(docs_hit), t
    # tightening the threshold can only shrink both counts
    ts = sorted(_SWEEP_TS)
    assert [rows[t]["n_pairs"] for t in ts] == sorted(
        [rows[t]["n_pairs"] for t in ts], reverse=True
    )
    assert [rows[t]["n_docs_implicated"] for t in ts] == sorted(
        [rows[t]["n_docs_implicated"] for t in ts], reverse=True
    )
