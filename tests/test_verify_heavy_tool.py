"""Unit tests for tools/verify_heavy_10x.py's pure pieces.

The tool carries the heavy-set 10x exactness evidence, so its two
replication claims are pinned here: (1) `_round6_half_up` is
bit-identical to Spark's `F.round(double, 6)` including the HALF_UP
ties the sf0.1 sweep caught (q61), and (2) the numpy d10 oracle
reproduces the registered Spark result on the driver's own parquet.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from verify_heavy_10x import (  # noqa: E402
    _d14_alt,
    _d63_alt,
    _round6_half_up,
    _round6_vec,
    numpy_oracle_d10,
    numpy_oracle_d62,
)

SF0001 = "/root/testdata/sf0.001"


def test_round6_half_up_matches_spark_round(spark):
    from pyspark.sql import functions as F

    # exact .5 tie at the 7th decimal (the q61 class), representable
    # doubles, negatives, and a spread of ordinary values
    vals = [
        1046.3109375,
        0.1234565,
        0.12345650000001,
        0.9999995,
        -0.1234565,
        0.4,
        0.3999995,
        2.5e-7,
        1.0,
        0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(F.round("x", 6)).collect()]
    assert got == [_round6_half_up(v) for v in vals]


def test_alt_oracle_builders_shape():
    d14 = _d14_alt()
    assert "chunk = b.chunk" in d14 and "32767" in d14
    stmts = _d63_alt()
    assert len(stmts) == 3
    assert stmts[1].startswith("CREATE TEMP TABLE __edges_t")
    assert "__edges_t e3" in stmts[2]


def test_row_alignment_floats_do_not_lead_sort():
    # two rows identical in label columns; one engine's float is an
    # ulp off — rows must still align by label, not swap (the q23@10x
    # artifact)
    from check_correctness import normalize

    cols = ["ts", "val"]
    spark_rows = [("t1", 16413.499999999996), ("t2", 16413.5)]
    duck_rows = [("t2", 16413.5), ("t1", 16413.5)]
    sn, _ = normalize(spark_rows, cols)
    on, _ = normalize(duck_rows, cols)
    assert [r[0] for r in sn] == [r[0] for r in on] == ["t1", "t2"]


def test_round6_vec_matches_scalar():
    import numpy as np

    vals = np.array(
        [1046.3109375, 0.1234565, -0.1234565, 0.4, 0.3999995, 0.0, -0.9999995]
    )
    got = _round6_vec(vals.copy())
    want = [_round6_half_up(v) for v in vals]
    assert list(got) == want


def test_numpy_d62_oracle_matches_spark(spark):
    pytest.importorskip("numpy")
    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    sdf = registry.QUERIES["d62_knn_graph"](spark, SF0001)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    o_rows, o_cols = numpy_oracle_d62(SF0001)
    assert o_cols == ["node_a", "node_b", "cos_sim"]
    assert sorted(tuple(r) for r in o_rows) == s_rows


def test_numpy_d10_oracle_matches_spark(spark):
    pytest.importorskip("numpy")
    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    sdf = registry.QUERIES["d10_embedding_neardup"](spark, SF0001)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    o_rows, o_cols = numpy_oracle_d10(SF0001)
    assert o_cols == ["id_1", "id_2", "cos_sim"]
    assert sorted(o_rows) == s_rows


def _oracle_equiv(alt_stmts, name):
    """ALT/registered equivalence at sf0.001 through the tool's own
    connect/run_sql/compare path (the same code the sweep trusts)."""
    from kaggle_data_pipeline_with_aws_spark.plans import registry
    from verify_heavy_10x import compare, connect, run_sql

    registry.load_all()
    con = connect(SF0001)
    try:
        a_rows, a_cols = run_sql(con, alt_stmts)
        r_rows, r_cols = run_sql(con, [registry.ORACLE_SQL[name]])
    finally:
        con.close()
    ok, note = compare(a_rows, a_cols, r_rows, r_cols)
    assert ok and note == "exact", (name, note)
    return len(a_rows)


def test_alt_d66_matches_registered_oracle():
    from verify_heavy_10x import _d66_alt

    assert _oracle_equiv(_d66_alt(), "d66_sorted_neighborhood") > 0


def test_alt_d40_matches_registered_oracle():
    from verify_heavy_10x import _d40_alt

    assert _oracle_equiv(_d40_alt(), "d40_pagerank") > 0


def test_numpy_d132_oracle_matches_registered_oracle():
    pytest.importorskip("numpy")
    from kaggle_data_pipeline_with_aws_spark.plans import registry
    from verify_heavy_10x import compare, connect, numpy_oracle_d132, run_sql

    registry.load_all()
    n_rows, n_cols = numpy_oracle_d132(SF0001)
    con = connect(SF0001)
    try:
        r_rows, r_cols = run_sql(
            con, [registry.ORACLE_SQL["d132_bfs_hops"]]
        )
    finally:
        con.close()
    ok, note = compare(n_rows, n_cols, r_rows, r_cols)
    assert ok and note == "exact", note
    assert n_cols == ["node", "hops"] and len(n_rows) > 16


def test_numpy_d132_oracle_matches_registered_oracle_sf001():
    """The sf0.01 half of the BENCH_SCALING claim, pinned: unlike ALT
    oracles, the sweep performs no per-run equivalence proof for numpy
    oracles, so the cross-scale claim lives here."""
    pytest.importorskip("numpy")
    from kaggle_data_pipeline_with_aws_spark.plans import registry
    from verify_heavy_10x import compare, connect, numpy_oracle_d132, run_sql

    registry.load_all()
    sf = "/root/testdata/sf0.01"
    n_rows, n_cols = numpy_oracle_d132(sf)
    con = connect(sf)
    try:
        r_rows, r_cols = run_sql(con, [registry.ORACLE_SQL["d132_bfs_hops"]])
    finally:
        con.close()
    ok, note = compare(n_rows, n_cols, r_rows, r_cols)
    assert ok and note == "exact", note
    assert len(n_rows) > 0 and n_cols == ["node", "hops"]
