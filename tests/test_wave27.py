"""Semantic unit tests for wave 27 (d127-d128, q111)."""

from __future__ import annotations

import hashlib

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave27 import (
    _MANIFEST_SHARDS,
    _TEMPS,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def test_d127_manifest_matches_python_and_is_rerun_stable(spark):
    rows = {
        (r["source"], r["shard"]): r
        for r in Q["d127_shard_manifest"](spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").collect()
    shards: dict[tuple, list] = {}
    for d in docs:
        shards.setdefault(
            (d["source"], d["doc_id"] % _MANIFEST_SHARDS), []
        ).append(d)
    assert set(rows) == set(shards)
    for key, ds in shards.items():
        ds.sort(key=lambda d: d["doc_id"])
        concat = "".join(
            hashlib.md5(d["text"].encode()).hexdigest() for d in ds
        )
        want = hashlib.md5(concat.encode()).hexdigest()
        assert rows[key]["manifest_md5"] == want
        assert rows[key]["n_docs"] == len(ds)
    # rerun: bit-identical manifests
    again = {
        (r["source"], r["shard"]): r["manifest_md5"]
        for r in Q["d127_shard_manifest"](spark, SF).collect()
    }
    assert again == {k: r["manifest_md5"] for k, r in rows.items()}


def test_d128_weights_normalize_and_flatten_with_temperature(spark):
    rows = Q["d128_temperature_weights"](spark, SF).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for a in _TEMPS:
        col = f"w_t{str(a).replace('.', '')}"
        total = sum(r[col] for r in rows)
        assert abs(total - 1.0) < 1e-4, a
    # sf0.001's mixture is exactly uniform (25 docs/source), so the
    # weights must equal the shares at EVERY temperature…
    big = max(rows, key=lambda r: r["share"])
    small = min(rows, key=lambda r: r["share"])
    if abs(big["share"] - small["share"]) < 1e-9:
        for r in rows:
            for a in _TEMPS:
                col = f"w_t{str(a).replace('.', '')}"
                assert abs(r[col] - r["share"]) < 1e-6
    # …and the flattening property is exercised on a constructed
    # skewed mixture through the same formula
    shares = [0.7, 0.2, 0.1]
    for a in _TEMPS:
        ws = [s**a for s in shares]
        ws = [w / sum(ws) for w in ws]
        assert ws[0] < shares[0]  # head shrinks
        assert ws[-1] > shares[-1]  # tail grows
    w03 = [s**0.3 for s in shares]
    w03 = [w / sum(w03) for w in w03]
    w07 = [s**0.7 for s in shares]
    w07 = [w / sum(w07) for w in w07]
    assert w03[0] < w07[0]  # lower temperature flattens harder
    assert w03[-1] > w07[-1]


def test_q111_deciles_partition_and_lift_reconciles(spark):
    rows = {r["decile"]: r for r in Q["q111_decile_lift"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    assert sum(r["n"] for r in rows.values()) == len(docs)
    assert set(rows) <= set(range(1, 11))
    base = sum(
        1 for d in docs if "the" in d["text"].split(" ")
    ) / len(docs)
    # weighted pos_rate over deciles reconstructs the base rate
    weighted = sum(r["pos_rate"] * r["n"] for r in rows.values()) / len(docs)
    assert abs(weighted - base) < 1e-4
    for r in rows.values():
        assert abs(r["lift"] - round(r["pos_rate"] / base, 6)) < 2e-6


def test_d129_reconciles_with_exact_dedup(spark):
    row = Q["d129_dedup_impact"](spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents").collect()
    texts = [d["text"] for d in docs]
    kept = len(set(texts))
    assert row["docs_before"] == len(docs)
    assert row["docs_after"] == kept
    assert row["tokens_before"] == sum(len(t.split(" ")) for t in texts)
    assert row["tokens_after"] == sum(len(t.split(" ")) for t in set(texts))
    assert 0.0 <= row["token_reduction"] < 1.0
    want_red = 1.0 - row["tokens_after"] / row["tokens_before"]
    assert abs(row["token_reduction"] - want_red) < 1e-6
