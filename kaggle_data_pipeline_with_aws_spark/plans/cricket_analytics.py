"""The reference notebook's analytical workload (SURVEY §3 EP4;
``analysis.ipynb`` cells 8-22) as library functions over the matchwise
table — the engine's flagship domain query suite.

Each function takes the published matchwise DataFrame (17 cols,
SURVEY §1.3) and returns a DataFrame. All pure built-in column
expressions; every aggregation is partial+final hash agg; the only
scalar subquery-ish shape (percent-of-total) broadcasts a 1-row total.

These run against cricket fixtures in tests/test_cricket_analytics.py
with a DuckDB oracle; the structurally-equivalent star-schema versions
live in plans/relational.py for the driver's correctness gate
(FIXTURES.md §5 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(matches: DataFrame) -> DataFrame:
    """Cell 8 (A6): per-column null counts, one row."""
    return matches.select(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in matches.columns
        ]
    )


def matches_per_year(matches: DataFrame) -> DataFrame:
    """Cell 10 (A3+F2+F3): match count by calendar year."""
    return (
        matches.withColumn("year", F.year(F.to_date("date", "yyyy-MM-dd")))
        .groupBy("year")
        .agg(F.count("*").alias("n_matches"))
        .orderBy("year")
    )


def matches_per_year_for_team(matches: DataFrame, team: str) -> DataFrame:
    """Cell 10 (P6): per-year counts where the team played on either side."""
    return matches_per_year(
        matches.filter((F.col("team_1") == team) | (F.col("team_2") == team))
    )


def all_teams(matches: DataFrame) -> DataFrame:
    """Cell 10 (A8): the team dimension — distinct union of both columns."""
    return (
        matches.select(F.col("team_1").alias("team"))
        .union(matches.select(F.col("team_2").alias("team")))
        .distinct()
        .orderBy("team")
    )


def result_share(matches: DataFrame) -> DataFrame:
    """Cells 12-13 (P7+A2+A9): completed vs no-result counts and share."""
    flagged = matches.withColumn(
        "is_no_result", F.lower(F.col("winner")) == "no result"
    )
    counts = flagged.groupBy("is_no_result").agg(F.count("*").alias("n"))
    total = flagged.agg(F.count("*").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("pct", F.round(F.lit(100.0) * F.col("n") / F.col("__total"), 6))
        .drop("__total")
    )


def toss_decision_distribution(matches: DataFrame) -> DataFrame:
    """Cell 15 (A3): counts of bat-first vs field-first toss decisions."""
    return matches.groupBy("toss_decision").agg(F.count("*").alias("n"))


def toss_winner_outcome(matches: DataFrame) -> DataFrame:
    """Cell 17 (P7+F12+A5): did the toss winner win the match? Excludes
    no-result games, as the notebook does."""
    return (
        matches.filter(F.lower(F.col("winner")) != "no result")
        .withColumn(
            "toss_winner_won",
            F.when(F.col("toss_winner") == F.col("winner"), "Won Match")
            .otherwise("Lost Match"),
        )
        .groupBy("toss_winner_won")
        .agg(F.count("*").alias("n"))
    )


def decision_outcome_breakdown(matches: DataFrame) -> DataFrame:
    """Cell 19 (A4+F14): toss decision × toss-winner-won counts."""
    return (
        matches.filter(F.lower(F.col("winner")) != "no result")
        .withColumn(
            "toss_winner_won",
            F.when(F.col("toss_winner") == F.col("winner"), "Won Match")
            .otherwise("Lost Match"),
        )
        .groupBy("toss_decision", "toss_winner_won")
        .agg(F.count("*").alias("n"))
    )


def margin_type_split(matches: DataFrame) -> DataFrame:
    """Cells 21-22 (P8+A7): wins by runs vs wins by wickets."""
    return matches.agg(
        F.count("margin_runs").alias("wins_by_runs"),
        F.count("margin_wickets").alias("wins_by_wickets"),
    )
