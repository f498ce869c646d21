"""Round-10 wave 64 — the lakehouse face's streaming SOURCE side
(round-9 verdict #3; the sink side is s12's foreachBatch MERGE):

- s15 — the transaction-log CDC tailer
  (``streaming/cdc_source.py::TxnLogStream``) drained over the wave-60
  staged table: one micro-batch per committed version, each batch
  exactly the rows in that version's ADDED files. The oracle states
  the three batch contents directly against ``orders`` (v0 bootstrap =
  pre-cutoff spend, v1 increment = the one-year delta, v2 rewrite =
  the full-history state — a rewrite's adds are the new STATE, which
  is why the tailer's default mode refuses rewrites and this face
  opts into ``on_rewrite='adds'`` and labels them).

Stream-vs-batch equality on a LIVE log (a writer thread committing
while the tailer drains) is tests/test_streaming_cdc.py — the
s10/s11 bar; this face gives the tailer's batch semantics a DuckDB
value oracle.

Reference scope: the reference's T1–T3 trigger/incremental semantics
upgraded to a lakehouse CDC source — beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.cdc_source import TxnLogStream
from .registry import spark_query
from .wave60 import _RESUM_SQL, _SPEND_SQL, _CUT1, _CUT2, _staged_table


def _s15_oracle() -> str:
    return f"""WITH s0 AS (
      SELECT o_custkey AS custkey, {_SPEND_SQL} AS spend
      FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT1}'
      GROUP BY 1
    ),
    s1 AS (
      SELECT o_custkey AS custkey, {_SPEND_SQL} AS spend
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUT1}'
                    AND o_orderdate < TIMESTAMP '{_CUT2}'
      GROUP BY 1
    ),
    sall AS (
      SELECT o_custkey AS custkey, {_SPEND_SQL} AS spend
      FROM orders
      GROUP BY 1
    )
    SELECT CAST(0 AS BIGINT) AS version, 'bootstrap' AS op,
           CAST(FALSE AS BOOLEAN) AS is_rewrite,
           CAST(count(*) AS BIGINT) AS n_rows,
           {_RESUM_SQL} AS batch_spend
    FROM s0
    UNION ALL
    SELECT 1, 'increment', FALSE, count(*), {_RESUM_SQL} FROM s1
    UNION ALL
    SELECT 2, 'rewrite', TRUE, count(*), {_RESUM_SQL} FROM sall
    ORDER BY version
    """


@spark_query("s15_txnlog_cdc_batches", _s15_oracle())
def s15_txnlog_cdc_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the transaction-log CDC source over the staged
    three-commit table: the tailer emits one micro-batch per version
    (files added by that commit only — delta bytes, never a full
    scan), labeled with the commit's op and whether it was a rewrite
    (removed files — the adds are a state, not row changes). Per-batch
    aggregates follow the exact-decimal-cents rule. The poll itself
    moves only metadata; each batch is a DataFrame whose scan is the
    version's explicit file list (pushdown intact)."""
    vt = _staged_table(spark, sf_dir)
    ops = {e["version"]: (e["op"], bool(e["remove"])) for e in vt.entries()}
    out: DataFrame | None = None
    for version, batch in TxnLogStream(vt, on_rewrite="adds").poll():
        op, is_rewrite = ops[version]
        agg = batch.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.sum(F.col("spend").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("batch_spend"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            F.lit(op).alias("op"),
            F.lit(is_rewrite).alias("is_rewrite"),
            "*",
        )
        out = agg if out is None else out.unionByName(agg)
    assert out is not None, "staged table has no commits"
    return out.orderBy("version")
