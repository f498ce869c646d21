"""Semantic unit tests for wave 21 (d121, q107)."""

from __future__ import annotations

import json

from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.plans.wave21 import (
    _Z_BITS,
    _Z_FILES,
)
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
Q = registry.QUERIES
SF = "/root/testdata/sf0.001"


def _interleave(a: int, b: int) -> int:
    z = 0
    for i in range(_Z_BITS):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_d121_matches_python_morton_layout(spark):
    rows = {r["file_id"]: r for r in Q["d121_zorder_layout"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem").collect()
    scale = 1 << _Z_BITS
    mp = max(l["l_partkey"] for l in li)
    ms = max(l["l_suppkey"] for l in li)
    keyed = sorted(
        (
            _interleave(
                l["l_partkey"] * scale // (mp + 1),
                l["l_suppkey"] * scale // (ms + 1),
            ),
            l["l_partkey"],
            l["l_suppkey"],
        )
        for l in li
    )
    total = len(keyed)
    files: dict[int, list] = {}
    for rn, (_z, pk, sk) in enumerate(keyed):
        files.setdefault(min(rn * _Z_FILES // total, _Z_FILES - 1), []).append(
            (pk, sk)
        )
    assert set(rows) == set(files)
    for fid, members in files.items():
        r = rows[fid]
        assert r["n_rows"] == len(members)
        pks = [p for p, _ in members]
        sks = [s for _, s in members]
        assert r["part_span"] == max(pks) - min(pks)
        assert r["supp_span"] == max(sks) - min(sks)


def test_d121_zorder_beats_single_column_sort_on_second_key(spark):
    """The point of the layout: under a plain partkey sort every file
    spans ~the full suppkey domain; the z-layout must do better on
    average."""
    rows = Q["d121_zorder_layout"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem").collect()
    supp_domain = max(l["l_suppkey"] for l in li) - min(
        l["l_suppkey"] for l in li
    )
    mean_supp_span = sum(r["supp_span"] for r in rows) / len(rows)
    assert mean_supp_span < supp_domain * 0.9


def test_q107_profile_matches_python(spark):
    rows = {r["key"]: r for r in Q["q107_json_key_profile"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    per_key: dict[str, list] = {}
    for e in ev:
        if e["props"] is None:
            continue
        for k, v in json.loads(e["props"]).items():
            per_key.setdefault(k, []).append(v)
    assert set(rows) == set(per_key)
    for k, vals in per_key.items():
        r = rows[k]
        assert r["n_rows"] == len(vals)
        assert r["n_distinct"] == len({str(v) for v in vals})
        nums = [float(v) for v in vals]
        assert abs(r["min_num"] - min(nums)) < 1e-9
        assert abs(r["max_num"] - max(nums)) < 1e-9
