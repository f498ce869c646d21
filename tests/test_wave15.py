"""Semantic unit tests for wave 15 (q99-q100, d107-d109)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave15 import (
    _BATCH_SOURCE,
    _N_CENT,
    _N_SUB,
    _SUB_DIM,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q99_ecdf_is_monotone_and_ends_at_one(spark):
    rows = Q["q99_value_ecdf"](spark, SF).collect()
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
    ev = load_table(spark, SF, "events").collect()
    for t, rs in per_type.items():
        rs.sort(key=lambda r: r["bucket"])
        ecdfs = [r["ecdf"] for r in rs]
        assert ecdfs == sorted(ecdfs)
        assert abs(ecdfs[-1] - 1.0) < 1e-9
        n_events = sum(1 for e in ev if e["event_type"] == t)
        assert sum(r["n"] for r in rs) == n_events
        # spot-check one interior point against the raw data
        mid = rs[len(rs) // 2]
        want = sum(
            1
            for e in ev
            if e["event_type"] == t and round(e["value"], 1) <= mid["bucket"]
        )
        assert abs(mid["ecdf"] - round(want / n_events, 6)) < 1e-9


def test_q100_rollup_margins_reconcile(spark):
    rows = Q["q100_region_nation_rollup"](spark, SF).collect()
    leaves = [r for r in rows if r["gid"] == 0]
    subtotals = {r["r_name"]: r for r in rows if r["gid"] == 1}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    # rollup emits no nation-without-region margin (gid == 2 absent)
    assert not [r for r in rows if r["gid"] == 2]
    for region, sub in subtotals.items():
        mine = [r for r in leaves if r["r_name"] == region]
        assert sum(r["n_lines"] for r in mine) == sub["n_lines"]
        assert abs(sum(r["revenue"] for r in mine) - sub["revenue"]) < 0.05
    assert sum(r["n_lines"] for r in leaves) == grand[0]["n_lines"]


def test_d107_codes_match_numpy_pq(spark):
    rows = {r["vec_id"]: r for r in Q["d107_pq_codes"](spark, SF).collect()}
    embs = {
        e["vec_id"]: np.array(e["embedding"], dtype=np.float64)
        for e in load_table(spark, SF, "embeddings").collect()
    }
    cents = {cid: embs[cid] for cid in range(_N_CENT)}
    for vid, x in embs.items():
        r = rows[vid]
        total = 0.0
        for s in range(_N_SUB):
            sl = slice(s * _SUB_DIM, (s + 1) * _SUB_DIM)
            dists = {
                cid: round(float(((x[sl] - c[sl]) ** 2).sum()), 6)
                for cid, c in cents.items()
            }
            best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
            assert r[f"code_{s}"] == best[0], (vid, s)
            total += best[1]
        assert abs(r["recon_err"] - round(total, 6)) < 1e-9
    # seed vectors must self-assign with zero error
    for cid in range(_N_CENT):
        assert rows[cid]["recon_err"] == 0.0
        assert all(rows[cid][f"code_{s}"] == cid for s in range(_N_SUB))


def test_d108_decisions_follow_pair_evidence(spark):
    rows = {r["doc_id"]: r for r in Q["d108_incremental_dedup"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    batch = {d["doc_id"] for d in docs if d["source"] == _BATCH_SOURCE}
    corpus = {d["doc_id"] for d in docs if d["source"] != _BATCH_SOURCE}
    assert set(rows) == batch
    texts = {d["doc_id"]: d["text"] for d in docs}
    exact = {
        b
        for b in batch
        if any(texts[b] == texts[c] for c in corpus)
    }
    pairs = Q["d07_minhash_lsh"](spark, SF).collect()
    near: dict[int, int] = {}
    for p in pairs:
        a, b = p["doc_id_1"], p["doc_id_2"]
        for x, y in ((a, b), (b, a)):
            if x in batch and y in corpus:
                near[x] = min(near.get(x, y), y)
    for doc_id, r in rows.items():
        assert r["is_exact_dup"] == (doc_id in exact)
        assert r["near_dup_of"] == near.get(doc_id)
        want = (
            "drop_exact"
            if doc_id in exact
            else "drop_near"
            if doc_id in near
            else "keep"
        )
        assert r["decision"] == want


def test_d109_matches_python_counter(spark):
    from collections import Counter

    rows = {r["source"]: r for r in Q["d109_hapax_ratio"](spark, SF).collect()}
    per_src: dict[str, Counter] = {}
    for d in load_table(spark, SF, "documents").collect():
        per_src.setdefault(d["source"], Counter()).update(
            d["text"].split(" ")
        )
    for src, cnt in per_src.items():
        r = rows[src]
        hapax = sum(1 for v in cnt.values() if v == 1)
        assert r["vocab_size"] == len(cnt)
        assert r["hapax_count"] == hapax
        assert abs(r["hapax_ratio"] - round(hapax / len(cnt), 6)) < 1e-12
