"""Semantic unit tests for wave 19 (d117-d118)."""

from __future__ import annotations

import hashlib

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.retrieval import (
    _PACK_CAP,
    _PACK_SHARDS,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def _python_pack(spark):
    docs = sorted(
        load_table(spark, SF, "documents").collect(), key=lambda d: d["doc_id"]
    )
    groups: dict[tuple, list] = {}
    for d in docs:
        groups.setdefault((d["source"], d["doc_id"] % _PACK_SHARDS), []).append(d)
    out: dict[tuple, list] = {}
    for key, ds in groups.items():
        fill, cur = 0, 0
        for d in ds:
            if out.get((*key, cur)) and fill + d["n_chars"] > _PACK_CAP:
                cur += 1
                fill = 0
            fill += d["n_chars"]
            out.setdefault((*key, cur), []).append(d)
    return out


def test_d117_hashes_match_python_concat(spark):
    rows = {
        (r["source"], r["shard"], r["bin_id"]): r
        for r in Q["d117_packed_sequences"](spark, SF).collect()
    }
    want = _python_pack(spark)
    assert set(rows) == set(want)
    for key, ds in want.items():
        seq = "<eos>".join(d["text"] for d in ds)
        assert rows[key]["packed_md5"] == hashlib.md5(seq.encode()).hexdigest()
        assert rows[key]["n_docs"] == len(ds)
        assert rows[key]["total_chars"] == sum(d["n_chars"] for d in ds)


def test_d118_reconciles_with_d117(spark):
    eff = {
        (r["source"], r["shard"]): r
        for r in Q["d118_packing_efficiency"](spark, SF).collect()
    }
    seqs = Q["d117_packed_sequences"](spark, SF).collect()
    per_shard: dict[tuple, list] = {}
    for r in seqs:
        per_shard.setdefault((r["source"], r["shard"]), []).append(r)
    assert set(eff) == set(per_shard)
    for key, bins in per_shard.items():
        e = eff[key]
        assert e["n_bins"] == len(bins)
        assert e["total_chars"] == sum(b["total_chars"] for b in bins)
        assert 0.0 < e["utilization"] <= max(
            1.0, max(b["total_chars"] for b in bins) / _PACK_CAP
        )
        # a bin only exceeds capacity when it holds a single oversize doc
        for b in bins:
            if b["total_chars"] > _PACK_CAP:
                assert b["n_docs"] == 1
        assert e["n_oversize"] == sum(
            1 for b in bins if b["total_chars"] > _PACK_CAP
        )
