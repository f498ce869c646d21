"""Property-based tests (hypothesis) for the engine's invariant-bearing
operators: renumbering, portable hashing, shingling.

Each property runs a bounded number of examples (Spark jobs are not
free); the generators aim at the sharp edges — duplicates in sort
values, empty/short strings, non-ascii-adjacent chars, whitespace runs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators.renumber import (
    contiguous_row_number,
)
from kaggle_data_pipeline_with_aws_spark.operators.text import (
    HASH_MOD,
    portable_hash,
    word_shingles,
    tokens,
)

# printable-ascii text (the portable hash folds ascii codes; the
# documents testdata is ascii — non-ascii would need ascii() parity
# verification against DuckDB, out of the hash's contract)
ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


def py_portable_hash(s: str, mod: int = HASH_MOD) -> int:
    import hashlib

    digest = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(digest[:15], 16) % mod


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 2**31)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    )
)
def test_contiguous_row_number_is_dense_and_order_consistent(
    spark_session, rows
):
    df = spark_session.createDataFrame(rows, "v INT, k LONG")
    out = contiguous_row_number(df, ["v", "k"], out_col="rn").collect()
    assert sorted(r.rn for r in out) == list(range(1, len(rows) + 1))
    by_rn = sorted(out, key=lambda r: r.rn)
    assert [(r.v, r.k) for r in by_rn] == sorted(rows)


@settings(max_examples=8, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=30))
def test_portable_hash_matches_python_model(spark_session, texts):
    df = spark_session.createDataFrame([(t,) for t in texts], "s STRING")
    got = [
        r.h for r in df.select(portable_hash(F.col("s")).alias("h")).collect()
    ]
    assert got == [py_portable_hash(t) for t in texts]


@settings(max_examples=8, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=25))
def test_word_shingles_match_python_model(spark_session, texts):
    df = spark_session.createDataFrame([(t,) for t in texts], "s STRING")
    got = [
        r.sh
        for r in df.select(
            word_shingles(tokens("s"), 3).alias("sh")
        ).collect()
    ]
    for t, sh in zip(texts, got):
        toks = t.split(" ")
        want: list[str] = []
        for i in range(max(0, len(toks) - 2)):
            g = " ".join(toks[i : i + 3])
            if g not in want:
                want.append(g)
        assert sh == want, f"text={t!r}"
