"""Property tests: the transaction log against a python model, and
the PSL compiler against the python PSL reference on RANDOM rule sets
(the fixed 1k-rule list lives in tests/test_psl.py; these generate
adversarial grammars — overlapping wildcards/exceptions at mixed
depths — and random hosts)."""

from __future__ import annotations

import tempfile

from hypothesis import given, settings, strategies as st

from kaggle_data_pipeline_with_aws_spark.operators import domains as D
from kaggle_data_pipeline_with_aws_spark.operators.txnlog import (
    VersionedTable,
)

# ---------------------------------------------------------------------------
# txnlog vs a python model: random commit sequences replay identically
# ---------------------------------------------------------------------------
commit_op = st.tuples(
    st.sampled_from(["append", "overwrite"]),
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 99)),
        min_size=1,
        max_size=4,
    ),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(commit_op, min_size=1, max_size=5))
def test_snapshot_replay_matches_python_model(spark_session, ops):
    spark = spark_session
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="txnprop-"))
    model_states: list[list[tuple[int, int]]] = []
    model: list[tuple[int, int]] = []
    for mode, rows in ops:
        model = (model if mode == "append" else []) + rows
        model_states.append(sorted(model))
        vt.commit(
            spark.createDataFrame(rows, "k int, v int"), mode=mode
        )
    for version, want in enumerate(model_states):
        got = sorted((r.k, r.v) for r in vt.snapshot(version).collect())
        assert got == want, f"version {version}"
    # incremental reads: files added in (v, v+1] carry exactly that
    # commit's rows regardless of append/overwrite
    for version, (_, rows) in enumerate(ops):
        got = sorted(
            (r.k, r.v)
            for r in vt.read_incremental(version - 1, version).collect()
        )
        assert got == sorted(rows), f"increment {version}"


@settings(max_examples=4, deadline=None)
@given(
    st.lists(commit_op, min_size=2, max_size=5),
    st.integers(1, 3),
)
def test_vacuum_safety_model(spark_session, ops, retain):
    """Vacuum-safety property (round-9 verdict #7): after
    ``vacuum(retain_versions=r)``, every RETAINED version still reads
    byte-identically to the pre-vacuum python model, and a time-travel
    read below the retention floor fails loudly at scan time (its file
    list references deleted paths) rather than returning partial
    data. Versions whose live set happens to survive inside a retained
    snapshot (e.g. pure-append histories) legitimately stay readable —
    only reads that WOULD touch a deleted file must fail."""
    spark = spark_session
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="txnvac-"))
    model_states: list[list[tuple[int, int]]] = []
    model: list[tuple[int, int]] = []
    for mode, rows in ops:
        model = (model if mode == "append" else []) + rows
        model_states.append(sorted(model))
        vt.commit(spark.createDataFrame(rows, "k int, v int"), mode=mode)
    head = vt.current_version()
    pre_live = {v: set(vt.live_files(v)) for v in range(head + 1)}
    deleted = set(vt.vacuum(retain_versions=retain))
    floor = max(0, head - retain + 1)
    # nothing referenced by a retained snapshot was deleted
    for v in range(floor, head + 1):
        assert not (pre_live[v] & deleted), f"retained v{v} lost a file"
        got = sorted((r.k, r.v) for r in vt.snapshot(v).collect())
        assert got == model_states[v], f"retained v{v} changed after vacuum"
    # below the floor: either the version's file set survived intact
    # (subset of retained) and reads identically, or the read fails
    # loudly — never a partial result
    for v in range(0, floor):
        if pre_live[v] & deleted:
            try:
                got = sorted(
                    (r.k, r.v) for r in vt.snapshot(v).collect()
                )
            except Exception:
                continue  # failed loudly — the required behavior
            raise AssertionError(
                f"v{v} read past the retention floor returned "
                f"{len(got)} rows instead of failing"
            )
        else:
            got = sorted((r.k, r.v) for r in vt.snapshot(v).collect())
            assert got == model_states[v], f"intact v{v} changed"


# ---------------------------------------------------------------------------
# PSL compiler vs python reference on random rule sets + hosts
# ---------------------------------------------------------------------------
_LABELS = ["a", "b", "cc", "x"]

label = st.sampled_from(_LABELS)
base_suffix = st.lists(label, min_size=1, max_size=3).map(".".join)


def _rule(kind: str, suffix: str) -> str:
    if kind == "wild":
        return f"*.{suffix}"
    if kind == "exc":
        return f"!{suffix}"
    return suffix


rules_strategy = st.lists(
    st.tuples(st.sampled_from(["normal", "wild", "exc"]), base_suffix).map(
        lambda t: _rule(*t)
    ),
    min_size=1,
    max_size=12,
)

host_strategy = st.lists(label, min_size=1, max_size=5).map(".".join)


@settings(max_examples=6, deadline=None)
@given(
    rules_strategy,
    st.lists(host_strategy, min_size=1, max_size=25),
    st.booleans(),
)
def test_compiled_psl_matches_python_on_random_grammars(
    spark_session, rules, hosts, default_rule
):
    from pyspark.sql import functions as F

    spark = spark_session
    want = [D.psl_registrable_py(h, rules, default_rule) for h in hosts]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, h string"
    )
    got = [
        r.d
        for r in df.select(
            "i",
            D.compile_registrable_domain(
                F.col("h"), rules, default_rule
            ).alias("d"),
        )
        .orderBy("i")
        .collect()
    ]
    assert got == want
    rules_df = spark.createDataFrame([(r,) for r in rules], "rule string")
    joined = D.resolve_domains_psl_join(
        df, "h", rules_df, out_col="d", default_rule=default_rule
    )
    got_join = [r.d for r in joined.select("i", "d").orderBy("i").collect()]
    assert got_join == want


@settings(max_examples=6, deadline=None)
@given(
    rules_strategy,
    st.lists(host_strategy, min_size=1, max_size=25),
    st.booleans(),
)
def test_sql_psl_matches_python_on_random_grammars(
    rules, hosts, default_rule
):
    import duckdb

    want = [D.psl_registrable_py(h, rules, default_rule) for h in hosts]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(hosts)))
    sql = D.compile_registrable_domain_sql("h", rules, default_rule)
    got = [
        r[0] for r in con.execute(f"SELECT {sql} FROM t ORDER BY i").fetchall()
    ]
    assert got == want
