"""EP4 analytical suite vs a DuckDB oracle over the same cricket data.

The matchwise table is produced by the engine's own flatten, registered
in DuckDB, and each notebook query is checked value-for-value against
its ANSI-SQL twin — same methodology as the driver's gate, applied to
the cricket domain.
"""

from __future__ import annotations

import duckdb
import pytest

from kaggle_data_pipeline_with_aws_spark.operators import flatten
from kaggle_data_pipeline_with_aws_spark.plans import cricket_analytics as ca
from kaggle_data_pipeline_with_aws_spark.schemas import CRICSHEET_MATCH_SCHEMA
from kaggle_data_pipeline_with_aws_spark.sources.readers import read_json_documents

from cricket_fixtures import write_fixture_dir


@pytest.fixture(scope="module")
def matches(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("landing_an")
    write_fixture_dir(str(d), n_matches=40, seed=7)
    raw = read_json_documents(spark, str(d), CRICSHEET_MATCH_SCHEMA)
    return flatten.matchwise(raw).cache()


@pytest.fixture(scope="module")
def oracle(matches):
    con = duckdb.connect()
    pdf = matches.toPandas()
    con.register("matches", pdf)
    return con


def _check(sdf, con, sql):
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_matches_per_year(matches, oracle):
    _check(
        ca.matches_per_year(matches),
        oracle,
        """SELECT CAST(year(CAST(date AS DATE)) AS INT) AS year,
                  count(*) AS n FROM matches GROUP BY 1""",
    )


def test_matches_per_year_for_team(matches, oracle):
    _check(
        ca.matches_per_year_for_team(matches, "India"),
        oracle,
        """SELECT CAST(year(CAST(date AS DATE)) AS INT), count(*)
           FROM matches WHERE team_1='India' OR team_2='India' GROUP BY 1""",
    )


def test_all_teams(matches, oracle):
    _check(
        ca.all_teams(matches),
        oracle,
        "SELECT team_1 FROM matches UNION SELECT team_2 FROM matches",
    )


def test_result_share(matches, oracle):
    _check(
        ca.result_share(matches),
        oracle,
        """SELECT lower(winner)='no result' AS f, count(*) AS n,
                  round(100.0*count(*)/(SELECT count(*) FROM matches), 6) AS pct
           FROM matches GROUP BY 1""",
    )


def test_toss_decision_distribution(matches, oracle):
    _check(
        ca.toss_decision_distribution(matches),
        oracle,
        "SELECT toss_decision, count(*) FROM matches GROUP BY 1",
    )


def test_toss_winner_outcome(matches, oracle):
    _check(
        ca.toss_winner_outcome(matches),
        oracle,
        """SELECT CASE WHEN toss_winner=winner THEN 'Won Match'
                       ELSE 'Lost Match' END, count(*)
           FROM matches WHERE lower(winner) != 'no result' GROUP BY 1""",
    )


def test_decision_outcome_breakdown(matches, oracle):
    _check(
        ca.decision_outcome_breakdown(matches),
        oracle,
        """SELECT toss_decision,
                  CASE WHEN toss_winner=winner THEN 'Won Match'
                       ELSE 'Lost Match' END, count(*)
           FROM matches WHERE lower(winner) != 'no result' GROUP BY 1, 2""",
    )


def test_margin_type_split(matches, oracle):
    _check(
        ca.margin_type_split(matches),
        oracle,
        "SELECT count(margin_runs), count(margin_wickets) FROM matches",
    )


def test_null_profile(matches, oracle):
    cols = ", ".join(
        f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
        for c in matches.columns
    )
    _check(ca.null_profile(matches), oracle, f"SELECT {cols} FROM matches")
