"""Parameterized public-suffix resolution (round-8 verdict #3).

Three implementations of the PSL algorithm — the compiled column
expression, its DuckDB SQL twin, and the broadcast-dimension join —
are each checked against the plain-python reference
(``psl_registrable_py``) on a generated 1,000-rule list exercising
normal, wildcard (``*.``), and exception (``!``) rules at depths 1-3,
over hosts that hit every path: exact suffix, wildcard child,
exception override, unknown TLD (default-``*`` on and off), too-few
labels, NULL/empty/IP-ish hosts.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import domains as D


def make_rules_1k() -> list[str]:
    """1,000 PSL-format rules: 400 TLDs, 300 two-label, 150 wildcard,
    150 exceptions (one per wildcard, so override paths are dense)."""
    rules: list[str] = [f"t{i}" for i in range(400)]
    rules += [f"co.t{i}" for i in range(300)]
    rules += [f"*.w.t{i}" for i in range(150)]
    rules += [f"!x.w.t{i}" for i in range(150)]
    assert len(rules) == 1000
    return rules


def make_hosts(n: int, seed: int = 0) -> list[str | None]:
    rng = random.Random(seed)
    subs = ["", "a", "b.a", "c.b.a", "www"]
    mids = ["", "co", "w", "x.w", "y.w", "z"]
    tlds = [f"t{i}" for i in range(0, 500, 7)] + ["unknowntld", "localhost"]
    hosts: list[str | None] = [None, "", "t0", "co.t0", "w.t1", "x.w.t1",
                               "1.2.3.4", "a..t0"]
    while len(hosts) < n:
        parts = [p for p in (rng.choice(subs), rng.choice(mids),
                             rng.choice(tlds)) if p]
        hosts.append(".".join(parts))
    return hosts


@pytest.mark.parametrize("default_rule", [True, False])
def test_compiled_and_join_match_python_1k_rules(spark, default_rule):
    rules = make_rules_1k()
    hosts = make_hosts(400)
    want = [D.psl_registrable_py(h, rules, default_rule) for h in hosts]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, h string"
    )
    got = [
        r.d
        for r in df.select(
            "i", D.compile_registrable_domain(F.col("h"), rules,
                                              default_rule).alias("d")
        ).orderBy("i").collect()
    ]
    assert got == want
    rules_df = spark.createDataFrame([(r,) for r in rules], "rule string")
    joined = D.resolve_domains_psl_join(
        df, "h", rules_df, out_col="d", default_rule=default_rule
    )
    got_join = [r.d for r in joined.select("i", "d").orderBy("i").collect()]
    assert got_join == want


@pytest.mark.parametrize("default_rule", [True, False])
def test_sql_twin_matches_python_1k_rules(default_rule):
    rules = make_rules_1k()
    hosts = make_hosts(400, seed=1)
    want = [D.psl_registrable_py(h, rules, default_rule) for h in hosts]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(hosts)))
    sql = D.compile_registrable_domain_sql("h", rules, default_rule)
    got = [r[0] for r in con.execute(f"SELECT {sql} FROM t ORDER BY i").fetchall()]
    assert got == want


def test_wildcard_and_exception_semantics(spark):
    """The PSL spec's own ck examples: *.ck makes foo.ck a public
    suffix; !www.ck restores www.ck as registrable."""
    rules = ["com", "*.ck", "!www.ck"]
    cases = {
        "foo.ck": None,             # foo.ck IS a public suffix
        "bar.foo.ck": "bar.foo.ck",
        "www.ck": "www.ck",         # exception: registrable itself
        "x.www.ck": "www.ck",
        "a.com": "a.com",
        "zz": None,                 # default '*': zz is a public suffix
        "q.zz": "q.zz",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r.h: r.d
        for r in df.select(
            "h", D.compile_registrable_domain(F.col("h"), rules).alias("d")
        ).collect()
    }
    assert got == cases


def test_comment_and_blank_lines_parse_as_file(spark):
    rules = ["// the list", "", "com", "  ", "*.ck", "// tail", "!www.ck"]
    assert D.psl_registrable_py("a.com", rules) == "a.com"
    assert D.psl_registrable_py("foo.ck", rules) is None
    rules_df = spark.createDataFrame([(r,) for r in rules], "rule string")
    dim = D.psl_rules_dim(rules_df)
    keys = {r.psl_key for r in dim.collect()}
    assert keys == {"com", "ck", "www.ck"}


def test_embedded_subset_face_unchanged(spark):
    """registrable_domain (the d157-family face) keeps its closed-
    vocabulary semantics through the generalized compiler."""
    cases = {
        "a.com": "a.com",
        "www.b.co.uk": "b.co.uk",
        "co.uk": None,
        "com": None,
        "localhost": None,
        "foo.localhost": None,  # no default '*' on the embedded subset
        "m.site.com.au": "site.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r.h: r.d
        for r in df.select(
            "h", D.registrable_domain(F.col("h")).alias("d")
        ).collect()
    }
    assert got == cases


def test_join_path_is_broadcast_no_shuffle(spark):
    """The join resolver's physical plan: every PSL probe is a
    BroadcastHashJoin; the fact side never exchanges."""
    df = spark.range(100).select(
        F.concat(F.lit("a.b"), (F.col("id") % 3).cast("string"),
                 F.lit(".com")).alias("h")
    )
    rules_df = spark.createDataFrame([("com",), ("org",)], "rule string")
    plan = D.resolve_domains_psl_join(df, "h", rules_df)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_join_resolution_rejects_rules_deeper_than_max(spark):
    """Round-9 ADVICE: a rule deeper than max_rule_labels must fail
    loudly, not silently resolve hosts as if the rule were absent."""
    import pytest
    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.operators.domains import (
        resolve_domains_psl_join,
    )

    rules = spark.createDataFrame(
        [("com",), ("a.b.c.d.e.f",)], "rule string"
    )
    hosts = spark.createDataFrame([("x.example.com",)], "host string")
    out = resolve_domains_psl_join(
        hosts, "host", rules, max_rule_labels=5
    )
    with pytest.raises(Exception, match="deeper than max_rule_labels"):
        out.collect()
    # the same rule set resolves fine once the parameter covers it
    ok = resolve_domains_psl_join(
        hosts, "host", rules, max_rule_labels=6
    )
    assert [r.domain for r in ok.collect()] == ["example.com"]
