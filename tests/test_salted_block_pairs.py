"""``dedup.salted_block_pairs`` — the skew-splitting pair enumerator
behind d69/d43 (the 100×-sweep straggler fix). The contract: every
unordered intra-key pair exactly once, regardless of how rows hash
across salts; salts appear in the join's equi-keys so a hot block is
many join groups, not one."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import dedup
from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {
        (min(r["i"], r["j"]), max(r["i"], r["j"]))
        for r in df.select(
            F.col("a.__id").alias("i"), F.col("b.__id").alias("j")
        ).collect()
    }


def test_every_intra_key_pair_exactly_once(spark):
    """One hot block (60 rows), several small ones, a singleton — the
    enumerated set must equal the brute-force combinations, with no
    duplicates under any salt assignment."""
    rows = (
        [(i, "hot") for i in range(60)]
        + [(100 + i, "small") for i in range(5)]
        + [(200, "single")]
    )
    df = spark.createDataFrame(rows, "__id long, k string")
    for n_salts in (1, 3, 8):
        out = dedup.salted_block_pairs(df, ["k"], n_salts=n_salts)
        got = [
            (min(r["i"], r["j"]), max(r["i"], r["j"]))
            for r in out.select(
                F.col("a.__id").alias("i"), F.col("b.__id").alias("j")
            ).collect()
        ]
        want = set(combinations(range(60), 2)) | set(
            combinations(range(100, 105), 2)
        )
        assert len(got) == len(set(got)), f"duplicate pairs at S={n_salts}"
        assert set(got) == want, f"pair set mismatch at S={n_salts}"


def test_two_key_blocking_matches_naive(spark):
    """Composite (lang, bucket) keys — the d69 shape — against the
    naive self-join on real data."""
    d = (
        load_table(spark, SF, "documents")
        .select(
            F.col("doc_id").alias("__id"),
            "lang",
            F.floor(F.col("n_chars") / 16).cast("long").alias("bucket"),
        )
    )
    a = d.select(
        F.col("__id").alias("i"), F.col("lang").alias("l1"),
        F.col("bucket").alias("b1"),
    )
    b = d.select(
        F.col("__id").alias("j"), F.col("lang").alias("l2"),
        F.col("bucket").alias("b2"),
    )
    naive = {
        (r["i"], r["j"])
        for r in a.join(
            b,
            (F.col("l1") == F.col("l2"))
            & (F.col("b1") == F.col("b2"))
            & (F.col("i") < F.col("j")),
        ).collect()
    }
    assert _pairs(dedup.salted_block_pairs(d, ["lang", "bucket"])) == naive
    assert naive, "fixture produced no intra-block pairs"


def test_salts_are_join_keys(spark):
    """The physical join must carry the salt columns as equi-keys —
    that is the whole point (a hot block becomes n_salts·(n_salts+1)/2
    join groups). Guards against a refactor downgrading the salts to a
    post-join filter."""
    d = load_table(spark, SF, "documents").select(
        F.col("doc_id").alias("__id"), "lang"
    )
    plan = (
        dedup.salted_block_pairs(d, ["lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines, "no join in salted_block_pairs plan"
    assert any(
        "__ka" in l and "__kb" in l for l in join_lines
    ), f"salts not in join keys: {join_lines}"
    assert "NestedLoop" not in plan and "Cartesian" not in plan
