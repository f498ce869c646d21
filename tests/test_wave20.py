"""Semantic unit tests for wave 20 (q106, d119-d120)."""

from __future__ import annotations

import math

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave20 import (
    _PSI_BUCKETS,
    _PSI_WIDTH,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q106_cells_match_counter(spark):
    from collections import Counter

    rows = Q["q106_dynamic_pivot"](spark, SF).collect()
    ev = load_table(spark, SF, "events").collect()
    want = Counter(
        (e["ts"].replace(hour=0, minute=0, second=0, microsecond=0), e["event_type"])
        for e in ev
    )
    types = sorted({e["event_type"] for e in ev})
    assert set(rows[0].asDict()) == {"day", *types}
    for r in rows:
        for t in types:
            assert r[t] == want.get((r["day"], t), 0)
    total = sum(r[t] for r in rows for t in types)
    assert total == len(ev)


def test_d119_matches_numpy_corr(spark):
    import numpy as np

    rows = {
        (r["feat_a"], r["feat_b"]): r["pearson"]
        for r in Q["d119_feature_corr_matrix"](spark, SF).collect()
    }
    stop = {"the", "a", "an", "and", "or", "is", "of", "to", "in"}
    feats = []
    for d in load_table(spark, SF, "documents").collect():
        tok = d["text"].split(" ")
        feats.append(
            [
                float(len(tok)),
                sum(len(w) for w in tok) / len(tok),
                len(set(tok)) / len(tok),
                sum(1 for w in tok if w in stop) / len(tok),
            ]
        )
    X = np.array(feats)
    names = ["n_tokens", "mean_len", "ttr", "stop_ratio"]
    C = np.corrcoef(X.T)
    for (a, b), got in rows.items():
        want = C[names.index(a), names.index(b)]
        assert abs(got - want) < 1e-5, (a, b)
        assert -1.0 <= got <= 1.0
    assert len(rows) == 6


def test_d120_psi_matches_python(spark):
    rows = {r["bucket"]: r for r in Q["d120_psi_drift"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    mid = max(d["doc_id"] for d in docs) // 2
    ref: dict[int, int] = {}
    cur: dict[int, int] = {}
    for d in docs:
        b = min(d["n_chars"] // _PSI_WIDTH, _PSI_BUCKETS - 1)
        (ref if d["doc_id"] <= mid else cur)[b] = (
            (ref if d["doc_id"] <= mid else cur).get(b, 0) + 1
        )
    n_ref, n_cur = sum(ref.values()), sum(cur.values())
    assert len(rows) == _PSI_BUCKETS
    psi = 0.0
    for b in range(_PSI_BUCKETS):
        rs = (ref.get(b, 0) + 0.5) / (n_ref + _PSI_BUCKETS * 0.5)
        qs = (cur.get(b, 0) + 0.5) / (n_cur + _PSI_BUCKETS * 0.5)
        term = (qs - rs) * math.log(qs / rs)
        assert abs(rows[b]["psi_term"] - term) < 1e-5, b
        assert rows[b]["psi_term"] >= -1e-12  # PSI terms are nonnegative
        psi += term
    # both halves come from the same generator — drift must be small
    assert psi < 0.25
    assert abs(sum(r["ref_share"] for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r["cur_share"] for r in rows.values()) - 1.0) < 1e-4
