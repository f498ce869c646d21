"""Semantic unit tests for wave 32 (d137, d138, d139) — each query
checked against an independent pure-Python model at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def _md5_hash(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _l2(a, b, lo, hi):
    acc = 0.0
    for i in range(lo, hi):
        d = float(a[i]) - float(b[i])
        acc = acc + d * d
    return round(acc, 6)


def test_d137_matches_python_ivfpq(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave32 import (
        _N_CENT,
        _N_COARSE,
        _N_PROBE,
        _N_QUERY,
        _N_SUB,
        _SUB_DIM,
        _TOPK,
    )

    rows = Q["d137_ivfpq_adc"](spark, SF).collect()
    embs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    cents = {i: embs[i] for i in range(_N_CENT)}
    coarse = {i: embs[i] for i in range(_N_COARSE)}
    queries = {i: embs[i] for i in range(_N_QUERY)}

    # index: cell + PQ codes per vector
    cell = {
        v: min(coarse, key=lambda c: (_l2(e, coarse[c], 0, 64), c))
        for v, e in embs.items()
    }
    codes = {
        v: [
            min(
                cents,
                key=lambda c: (
                    _l2(e, cents[c], s * _SUB_DIM, (s + 1) * _SUB_DIM),
                    c,
                ),
            )
            for s in range(_N_SUB)
        ]
        for v, e in embs.items()
    }
    got = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got[r["query_id"]].append(r)

    for q, qe in queries.items():
        probed = sorted(
            coarse, key=lambda c: (_l2(qe, coarse[c], 0, 64), c)
        )[:_N_PROBE]
        dtab = {
            (s, c): _l2(qe, cents[c], s * _SUB_DIM, (s + 1) * _SUB_DIM)
            for s in range(_N_SUB)
            for c in cents
        }
        cand = [
            v for v in embs if cell[v] in probed and v != q
        ]
        scored = sorted(
            (
                (
                    round(
                        dtab[(0, codes[v][0])]
                        + dtab[(1, codes[v][1])]
                        + dtab[(2, codes[v][2])]
                        + dtab[(3, codes[v][3])],
                        6,
                    ),
                    v,
                )
                for v in cand
            ),
        )[:_TOPK]
        want_ids = [v for _, v in scored]
        assert [r["neighbor_id"] for r in got[q]] == want_ids, q
        for r, (d, _) in zip(got[q], scored):
            assert abs(r["adc_dist"] - d) < 1e-6
        assert [r["rank"] for r in got[q]] == list(
            range(1, len(want_ids) + 1)
        )


def test_d138_matches_python_dsir(spark):
    from kaggle_data_pipeline_with_aws_spark.plans.wave32 import (
        _DSIR_BUCKETS,
        _DSIR_TARGET,
    )

    rows = Q["d138_dsir_importance"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    ct: Counter = Counter()
    cr: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for d in docs:
        c = Counter(
            _md5_hash(t, _DSIR_BUCKETS)
            for t in d["text"].split(" ")
            if t != ""
        )
        per_doc[d["doc_id"]] = c
        (ct if d["source"] == _DSIR_TARGET else cr).update(c)
    nt, nr = sum(ct.values()), sum(cr.values())
    ratio = {
        b: round(
            math.log2(
                ((ct[b] + 1) / (nt + _DSIR_BUCKETS))
                / ((cr[b] + 1) / (nr + _DSIR_BUCKETS))
            ),
            6,
        )
        for b in set(ct) | set(cr)
    }
    got = {r["doc_id"]: r for r in rows}
    assert set(got) == set(per_doc)
    for doc_id, c in per_doc.items():
        r = got[doc_id]
        assert r["n_tokens"] == sum(c.values())
        want = sum(n * ratio[b] for b, n in c.items())
        assert abs(r["dsir_weight"] - want) < 1e-4
        assert r["target_like"] == (round(want, 6) > 0)
    # target-source documents should skew positive vs the rest
    by_src = {d["doc_id"]: d["source"] for d in docs}
    tgt_mean = sum(
        r["dsir_weight"] for i, r in got.items() if by_src[i] == _DSIR_TARGET
    ) / sum(1 for i in got if by_src[i] == _DSIR_TARGET)
    raw_mean = sum(
        r["dsir_weight"] for i, r in got.items() if by_src[i] != _DSIR_TARGET
    ) / sum(1 for i in got if by_src[i] != _DSIR_TARGET)
    assert tgt_mean > raw_mean


def test_d139_matches_python_curriculum(spark):
    from kaggle_data_pipeline_with_aws_spark.operators.text import HASH_MOD
    from kaggle_data_pipeline_with_aws_spark.plans.wave32 import _DECILES

    rows = Q["d139_curriculum_order"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    toks = {d["doc_id"]: len(d["text"].split(" ")) for d in docs}
    n = len(toks)
    ranked = sorted(toks, key=lambda i: (toks[i], i))
    decile = {
        i: math.ceil((rk + 1) * _DECILES / n) for rk, i in enumerate(ranked)
    }
    h = {i: _md5_hash(str(i), HASH_MOD) for i in toks}
    order = sorted(toks, key=lambda i: (decile[i], h[i], i))
    pos = {i: p + 1 for p, i in enumerate(order)}

    got = {r["doc_id"]: r for r in rows}
    assert set(got) == set(toks)
    for i, r in got.items():
        assert r["tok_n"] == toks[i]
        assert r["decile"] == decile[i], i
        assert r["curriculum_pos"] == pos[i], i
    # positions are a permutation of 1..n and deciles are monotone in it
    seq = sorted(got.values(), key=lambda r: r["curriculum_pos"])
    assert [r["curriculum_pos"] for r in seq] == list(range(1, n + 1))
    assert [r["decile"] for r in seq] == sorted(r["decile"] for r in seq)


# ---------------------------------------------------------------------------
# Plan-shape regressions (the 100 TB evidence for wave 32).
# ---------------------------------------------------------------------------
def _plan(spark, sf_dir, name: str) -> str:
    df = Q[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_d137_probe_join_broadcasts_and_pushes_group_limit(spark, sf_dir):
    """The probe list must BROADCAST into the cells table (an SMJ here
    repartitions the whole corpus onto <=8 cell-key values — skew), the
    four ADC lookups must be broadcast hash joins, and the per-query
    top-k must push a WindowGroupLimit below its exchange so candidate
    partitions emit at most k rows each."""
    plan = _plan(spark, sf_dir, "d137_ivfpq_adc")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "WindowGroupLimit" in plan
    # the single allowed SMJ is cand |><| codes on neighbor_id
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_d138_model_is_broadcast(spark, sf_dir):
    """The 64-row bucket log-ratio model joins back by broadcast; the
    token stream is never sort-merge-joined against it."""
    plan = _plan(spark, sf_dir, "d138_dsir_importance")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_d139_has_no_data_sized_single_partition_window(spark, sf_dir):
    """Both global orderings run through the quantile-bucket prefix-sum;
    any single-partition window must be over bucket-count-sized input
    (the offsets table), never the document stream."""
    plan = _plan(spark, sf_dir, "d139_curriculum_order")
    # the bucket-local row_number windows are partitioned by __bucket
    assert "row_number" in plan
    assert "CartesianProduct" not in plan
    # document-stream windows would show an Exchange SinglePartition
    # directly over a parquet scan of documents; the only SinglePartition
    # exchanges here are bucket-count offsets (2 per renumber pass) and
    # the scalar total-count broadcast
    assert plan.count("Exchange SinglePartition") <= 5
