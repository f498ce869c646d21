"""Dataset materialization (SURVEY §3 EP3; convert_mongo_db_data_to_csv_lambda.py).

The reference's convert Lambda: Mongo full scan → drop ``_id`` → rename
``index``→``match_number`` → sort ``(date, match_id)`` → reassign
contiguous ``match_number`` (:37-45); deliverywise: drop key columns →
left-join matchwise ``[match_number, match_id]`` → sort on the 4-part
key (:47-55). Its accidental double evaluation of the matchwise pipeline
(:53 re-invoking :37) is *not* reproduced — ``matchwise_numbered`` is
computed once and reused.

Scale notes:
- ``match_number`` uses the two-stage prefix-sum renumber operator, not
  a single-partition window.
- The deliverywise enrich join broadcasts the (match_id, match_number)
  projection — header-table-sized.
- Published CSV order is part of the artifact (convert...py:43,54):
  writes range-repartition on the sort key so files are globally ordered
  (file i < file j), each file internally sorted; ``single_file=True``
  coalesces to 1 only when byte-compat with the reference CSV matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.renumber import contiguous_row_number


def matchwise_numbered(matches: DataFrame) -> DataFrame:
    """W1+W2: sort by (date, match_id), assign contiguous match_number,
    publish in the reference's 17-column order (convert...py:42-44)."""
    numbered = contiguous_row_number(
        matches, ["date", "match_id"], out_col="match_number"
    )
    return numbered.select(
        "match_number",
        "match_id",
        "date",
        "event_name",
        "ground_name",
        "ground_city",
        "team_1",
        "team_2",
        "toss_winner",
        "toss_decision",
        "team_1_total_runs",
        "team_2_total_runs",
        "winner",
        "margin_runs",
        "margin_wickets",
        "winning_method",
        "player_of_the_match",
    )


def deliverywise_published(
    deliveries: DataFrame, matches_numbered: DataFrame
) -> DataFrame:
    """P2+J1+W1: drop internal key, enrich with match_number via broadcast
    left join, order by the 4-part key (convert...py:47-55)."""
    match_ids = matches_numbered.select("match_number", "match_id")
    enriched = (
        deliveries.drop("composite_delivery_key")
        .join(F.broadcast(match_ids), "match_id", "left")
    )
    return enriched


def write_sorted_csv(
    df: DataFrame, out_dir: str, sort_cols: list[str], single_file: bool = False
) -> None:
    """K5: CSV publish with order as part of the artifact.

    ``single_file`` reproduces the reference's one-object S3 upload
    (convert...py:63-75) for golden-output comparison; the scale path
    writes many globally-range-ordered files.
    """
    if single_file:
        out = df.orderBy(*sort_cols).coalesce(1)
    else:
        out = df.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism, *sort_cols
        ).sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option("header", True).csv(out_dir)
