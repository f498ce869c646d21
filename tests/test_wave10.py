"""Semantic unit tests for wave 10 (q80-q84, d86-d92) and the
merge_upsert operator face."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators.ledger import merge_upsert
from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_merge_upsert_all_clauses(spark):
    """One MERGE expression: matched-update, matched-delete,
    not-matched-insert, not-matched-by-source carryover, and typed
    NULL for target columns absent from the source."""
    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k LONG, bal DOUBLE, tag STRING",
    )
    source = spark.createDataFrame(
        [(2, 5.0), (3, 99.0), (4, 7.0)], "k LONG, delta DOUBLE"
    )
    out = merge_upsert(
        target,
        source,
        keys=["k"],
        when_matched={"bal": F.col("t.bal") + F.col("s.delta")},
        insert_values={"bal": F.col("s.delta")},
        delete_condition=F.col("s.delta") > 50,
    )
    got = {r.k: (r.bal, r.tag) for r in out.collect()}
    assert got == {
        1: (10.0, "a"),  # not matched by source: carried unchanged
        2: (25.0, "b"),  # matched: updated
        # 3 deleted (delta 99 > 50)
        4: (7.0, None),  # inserted; tag absent from source -> NULL
    }


def test_q82_division_matches_brute_force(spark):
    rows = {r.c_custkey for r in Q["q82_relational_division"](spark, SF).collect()}
    o = load_table(spark, SF, "orders").collect()
    by_cust: dict[int, set] = {}
    for r in o:
        by_cust.setdefault(r["o_custkey"], set()).add(r["o_orderpriority"])
    universe = {r["o_orderpriority"] for r in o}
    expected = {c for c, ps in by_cust.items() if ps == universe}
    assert rows == expected


def test_q84_range_frame_matches_brute_force(spark):
    got = {
        r.event_id: (r.n_trailing, r.trailing_sum)
        for r in Q["q84_range_frame_totals"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    for es in by_user.values():
        for e in es:
            frame = [
                x
                for x in es
                if 0 <= (e["ts"] - x["ts"]).total_seconds() <= 600
            ]
            n = len(frame)
            s = round(sum(x["value"] for x in frame), 6)
            gn, gs = got[e["event_id"]]
            assert gn == n
            assert abs(gs - s) < 1e-6, (e["event_id"], gs, s)


def test_d86_split_shares_are_sane(spark):
    rows = Q["d86_train_split"](spark, SF).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    assert total == load_table(spark, SF, "documents").count()
    # deterministic hash split: train must dominate, all three present
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] / total > 0.8


def test_d86_split_is_deterministic(spark):
    a = {
        (r["source"], r["split"]): r["n_docs"]
        for r in Q["d86_train_split"](spark, SF).collect()
    }
    b = {
        (r["source"], r["split"]): r["n_docs"]
        for r in Q["d86_train_split"](spark, SF).collect()
    }
    assert a == b


def test_d87_chunks_cover_every_token_with_overlap(spark):
    rows = Q["d87_overlap_chunks"](spark, SF).collect()
    docs = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in load_table(spark, SF, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n_tok in docs.items():
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # stride-24 starts; all but the last chunk are full 32-token
        for i, c in enumerate(chunks):
            assert c["start_tok"] == i * 24 + 1
            if i < len(chunks) - 1:
                assert c["chunk_tokens"] == 32
        last = chunks[-1]
        # last chunk reaches the end of the doc exactly
        assert last["start_tok"] + last["chunk_tokens"] - 1 == n_tok
        # consecutive chunks overlap by 8 tokens
        if len(chunks) > 1:
            assert chunks[0]["start_tok"] + 32 - chunks[1]["start_tok"] == 8


def test_d88_winnowing_shared_run_guarantee(spark):
    """Winnowing's core guarantee: two docs sharing a token run of at
    least w+k-1 (= 7) tokens share at least one fingerprint. Rebuild
    the fingerprint SETS (the registered query returns counts) from
    the same operator expressions on a crafted pair."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (0, f"one two three {shared} four five"),
            (1, f"{shared} six seven eight nine"),
        ],
        "doc_id LONG, text STRING",
    )
    from kaggle_data_pipeline_with_aws_spark.operators.text import (
        portable_hash,
        tokens,
    )

    t = docs.select("doc_id", tokens("text").alias("t"))
    kg = F.transform(
        F.sequence(F.lit(1), F.array_size("t") - 4 + 1),
        lambda i: portable_hash(F.array_join(F.slice(F.col("t"), i, 4), " ")),
    )
    h = t.select("doc_id", kg.alias("h"))
    mins = F.transform(
        F.sequence(F.lit(1), F.array_size("h") - 4 + 1),
        lambda i: F.array_min(F.slice(F.col("h"), i, 4)),
    )
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in h.select(
            "doc_id", F.array_distinct(mins).alias("fp")
        ).collect()
    }
    assert fps[0] & fps[1], "7-token shared run must share a fingerprint"


def test_d89_contamination_score_bounds_and_benchmark_excluded(spark):
    rows = Q["d89_contamination_score"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] >= 20
        assert 0 < r["contamination"] <= 1.0
        assert r["n_contaminated"] <= r["n_shingles"]


def test_d90_dim_variance_full_grid(spark):
    rows = Q["d90_embedding_dim_variance"](spark, SF).collect()
    assert sorted(r["dim"] for r in rows) == list(range(1, 65))
    for r in rows:
        assert r["dim_var"] >= 0
        assert r["near_zero"] == (r["dim_var"] < 0.001)


def test_d91_hard_negatives_labels_differ(spark):
    rows = Q["d91_hard_negatives"](spark, SF).collect()
    embs = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    assert rows
    by_anchor: dict[int, list] = {}
    for r in rows:
        assert embs[r["negative_id"]] != r["anchor_label"]
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for anchor, rs in by_anchor.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_d92_vocab_growth_is_monotone(spark):
    rows = sorted(
        Q["d92_vocab_growth"](spark, SF).collect(), key=lambda r: r["n_docs"]
    )
    assert rows
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    assert all(a < b for a, b in zip(sizes, sizes[1:]))  # strictly new terms


def test_q80_grouping_sets_consistency(spark):
    rows = Q["q80_grouping_sets_revenue"](spark, SF).collect()
    detail = [r for r in rows if r["gid"] == 0]
    subtotal = {r["n_name"]: r for r in rows if r["gid"] == 1}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    # nation subtotals == sum of their year rows
    per_nation: dict[str, float] = {}
    for r in detail:
        per_nation[r["n_name"]] = per_nation.get(r["n_name"], 0.0) + r["revenue"]
    for n_name, rev in per_nation.items():
        assert abs(subtotal[n_name]["revenue"] - rev) < 1e-4
    assert abs(grand[0]["revenue"] - sum(per_nation.values())) < 1e-3
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)


def test_q83_pivot_matches_long_form(spark):
    rows = {r["n_name"]: r for r in Q["q83_priority_pivot"](spark, SF).collect()}
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    long = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "o_orderpriority")
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    )
    for r in long:
        col = {
            "1-URGENT": "p_urgent",
            "2-HIGH": "p_high",
            "3-MEDIUM": "p_medium",
            "4-NOT SPECIFIED": "p_notspec",
            "5-LOW": "p_low",
        }[r["o_orderpriority"]]
        assert abs(rows[r["n_name"]][col] - round(r["rev"], 6)) < 1e-5
