"""EP4 analytics parity on the reference's REAL published artifact.

`/root/reference/matchwise_data.csv` is the actual 3,037-match dataset
the reference pipeline publishes (read-only input here; nothing is
copied). Every notebook query (analysis.ipynb cells 8-22) runs through
our engine's CSV reader + cricket_analytics plans and is checked
against DuckDB computing the same semantics on the same file — the
"switch engines, keep your queries" guarantee on real data, not just
synthetic fixtures.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.plans import cricket_analytics as ca
from kaggle_data_pipeline_with_aws_spark.schemas import MATCHWISE_SCHEMA
from kaggle_data_pipeline_with_aws_spark.sources.readers import read_csv

REF_CSV = "/root/reference/matchwise_data.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CSV), reason="reference artifact not present"
)


@pytest.fixture(scope="module")
def matches(spark):
    return read_csv(spark, REF_CSV, MATCHWISE_SCHEMA).cache()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW m AS SELECT * FROM read_csv('{REF_CSV}', header=true, "
        "nullstr='')"
    )
    return con


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_row_count(matches, ddb):
    assert matches.count() == ddb.execute("SELECT count(*) FROM m").fetchone()[0]


def test_matches_per_year(matches, ddb):
    got = _rows(ca.matches_per_year(matches), "year", "n_matches")
    want = sorted(
        ddb.execute(
            "SELECT year(CAST(date AS DATE)), count(*) FROM m GROUP BY 1"
        ).fetchall()
    )
    assert got == want


def test_matches_per_year_for_team(matches, ddb):
    got = _rows(
        ca.matches_per_year_for_team(matches, "India"), "year", "n_matches"
    )
    want = sorted(
        ddb.execute(
            "SELECT year(CAST(date AS DATE)), count(*) FROM m "
            "WHERE team_1 = 'India' OR team_2 = 'India' GROUP BY 1"
        ).fetchall()
    )
    assert got == want and len(got) > 10


def test_all_teams(matches, ddb):
    got = [r["team"] for r in ca.all_teams(matches).collect()]
    want = [
        r[0]
        for r in ddb.execute(
            "SELECT team_1 FROM m UNION SELECT team_2 FROM m ORDER BY 1"
        ).fetchall()
    ]
    assert got == want


def test_result_share(matches, ddb):
    got = _rows(ca.result_share(matches), "is_no_result", "n", "pct")
    want = sorted(
        ddb.execute(
            """
            SELECT lower(winner) = 'no result' AS is_no_result, count(*) AS n,
                   round(100.0 * count(*) / (SELECT count(*) FROM m), 6)
            FROM m GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


def test_toss_decision_distribution(matches, ddb):
    got = _rows(ca.toss_decision_distribution(matches), "toss_decision", "n")
    want = sorted(
        ddb.execute(
            "SELECT toss_decision, count(*) FROM m GROUP BY 1"
        ).fetchall()
    )
    assert got == want


def test_toss_winner_outcome(matches, ddb):
    got = _rows(ca.toss_winner_outcome(matches), "toss_winner_won", "n")
    want = sorted(
        ddb.execute(
            """
            SELECT CASE WHEN toss_winner = winner THEN 'Won Match'
                        ELSE 'Lost Match' END, count(*) FROM m
            WHERE lower(winner) <> 'no result' GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


def test_decision_outcome_breakdown(matches, ddb):
    got = _rows(
        ca.decision_outcome_breakdown(matches),
        "toss_decision",
        "toss_winner_won",
        "n",
    )
    want = sorted(
        ddb.execute(
            """
            SELECT toss_decision,
                   CASE WHEN toss_winner = winner THEN 'Won Match'
                        ELSE 'Lost Match' END,
                   count(*)
            FROM m WHERE lower(winner) <> 'no result' GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want


def test_margin_type_split(matches, ddb):
    row = ca.margin_type_split(matches).collect()[0]
    runs, wkts = ddb.execute(
        "SELECT count(margin_runs), count(margin_wickets) FROM m"
    ).fetchone()
    assert row["wins_by_runs"] == runs and row["wins_by_wickets"] == wkts
    assert runs > 1000 and wkts > 1000  # real-data sanity


def test_null_profile(matches, ddb):
    row = ca.null_profile(matches).collect()[0]
    for col in ("event_name", "ground_city", "winner"):
        want = ddb.execute(
            f"SELECT count(*) - count({col}) FROM m"
        ).fetchone()[0]
        assert row[col] == want
