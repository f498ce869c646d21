"""Semantic unit tests for wave 18 (q104, d116)."""

from __future__ import annotations

import datetime

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_q104_matches_python_sessionizer(spark):
    rows = Q["q104_lag_gap_sessions"](spark, SF).collect()
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda e: (e["user_id"], e["ts"], e["event_id"]),
    )
    sessions: dict[tuple, list] = {}
    cur_user, sno, last_ts = None, 0, None
    for e in ev:
        if e["user_id"] != cur_user:
            cur_user, sno, last_ts = e["user_id"], 0, None
        if last_ts is None or (e["ts"] - last_ts) > datetime.timedelta(
            minutes=30
        ):
            sno += 1
        last_ts = e["ts"]
        sessions.setdefault((e["user_id"], sno), []).append(e["ts"])
    got = {(r["user_id"], r["session_no"]): r for r in rows}
    assert set(got) == set(sessions)
    for key, tss in sessions.items():
        assert got[key]["n_events"] == len(tss)
        want_dur = (max(tss) - min(tss)).total_seconds()
        assert abs(got[key]["duration_s"] - want_dur) < 1e-6
    # session numbering is 1-based and contiguous per user
    by_user: dict[int, list[int]] = {}
    for u, s in sessions:
        by_user.setdefault(u, []).append(s)
    for u, ss in by_user.items():
        assert sorted(ss) == list(range(1, len(ss) + 1))


def test_q104_agrees_with_session_window_counts(spark):
    """The lag-gap sessionizer and s02's session_window use the same
    30-min timeout — total event accounting must agree."""
    rows = Q["q104_lag_gap_sessions"](spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events


def test_d116_cells_partition_corpus_and_match_signals(spark):
    rows = Q["d116_signal_agreement"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    keys = {(r["rules_pass"], r["dedup_keep"], r["lang_confident"]) for r in rows}
    assert len(keys) == len(rows)
    # marginal reconciliation against the source queries
    rules_total = sum(
        r["n_keep"]
        for r in Q["d99_gopher_quality_rules"](spark, SF).collect()
    )
    assert sum(r["n_docs"] for r in rows if r["rules_pass"]) == rules_total
    keepers = len({d["text"] for d in docs})
    assert sum(r["n_docs"] for r in rows if r["dedup_keep"]) == keepers
    confident = sum(
        1
        for m in Q["d102_lang_margin"](spark, SF).collect()
        if m["margin"] > 1
    )
    assert (
        sum(r["n_docs"] for r in rows if r["lang_confident"]) == confident
    )


def test_q105_sql_face_matches_dataframe_twin(spark):
    """The spark.sql face must produce the same result as the
    equivalent DataFrame-API build — same logical plan machinery."""
    from pyspark.sql import functions as F

    got = {
        r["o_orderstatus"]: r
        for r in Q["q105_sql_face"](spark, SF).collect()
    }
    want = {
        r["o_orderstatus"]: r
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k]["n_orders"] == want[k]["n_orders"]
        assert abs(got[k]["total_price"] - want[k]["total_price"]) < 1e-9
        assert abs(got[k]["avg_price"] - want[k]["avg_price"]) < 1e-9
