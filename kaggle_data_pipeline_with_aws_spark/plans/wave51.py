"""Round-8 wave 51 — streaming HLL face:

- s14 — windowed distinct-user HLL: the explicit-register sketch
  (d174) as a STREAMING aggregate. The register build is one
  streamable groupBy(window, idx).max(rho) with at most m counters of
  state per window — the bounded-state alternative to s10's KMV
  (whose collect_set state grows with distinct ids); estimation is
  per-window batch post-processing (s13's sketch-vs-serving split).
  The operator lives in streaming/incremental.py and runs identically
  under readStream (tests/test_wave51.py drives the real stream).

Reference scope: beyond-reference streaming tier (T-rows analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketch
from ..operators.text import portable_hash60_sql
from ..sources.readers import load_table
from .registry import spark_query
from .wave48 import _est_sql

_M = sketch.HLL_M


def _s14_oracle() -> str:
    h60 = portable_hash60_sql("'hll|' || CAST(user_id AS VARCHAR)")
    return f"""WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             user_id
      FROM events
    ),
    h AS (SELECT window_start, {h60} AS hh FROM e),
    f AS (
      SELECT window_start, hh % {_M} AS idx, hh // {_M} AS w FROM h
    ),
    r AS (
      SELECT window_start, idx, {sketch.hll_rho_sql('w')} AS rho FROM f
    ),
    reg AS (
      SELECT window_start, idx, max(rho) AS mrho
      FROM r GROUP BY 1, 2
    ),
    wins AS (SELECT DISTINCT window_start FROM e),
    grid AS (
      SELECT w.window_start, g.idx FROM wins w
      CROSS JOIN (SELECT unnest(generate_series(0, {_M - 1})) AS idx) g
    ),
    dense AS (
      SELECT grid.window_start, grid.idx, coalesce(reg.mrho, 0) AS mrho
      FROM grid LEFT JOIN reg
        ON grid.window_start = reg.window_start AND grid.idx = reg.idx
    ),
    agg AS (
      SELECT window_start,
             CAST(sum(CAST(1 AS BIGINT) << (55 - mrho)) AS BIGINT)
               AS register_sum,
             CAST(sum(CASE WHEN mrho = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_registers
      FROM dense GROUP BY window_start
    ),
    ex AS (
      SELECT window_start, count(DISTINCT user_id) AS exact_distinct
      FROM e GROUP BY window_start
    )
    SELECT agg.window_start, register_sum, n_zero_registers,
           {_est_sql('register_sum', 'n_zero_registers')} AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM agg JOIN ex ON agg.window_start = ex.window_start
    ORDER BY agg.window_start
    """


@spark_query("s14_windowed_hll_users", _s14_oracle())
def s14_windowed_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per tumbling hour via the explicit-register HLL
    — the batch face of the streaming operator
    (streaming/incremental.py::windowed_hll_registers). The register
    build is the ONLY stateful step and ships <= 64 counters per
    window; the dense fill + harmonic estimate here is the
    foreachBatch serving half. The exact count rides along as the
    audit column. Versus s10's KMV face: identical question, but
    state is O(m) instead of O(distinct), and windows MAX-merge with
    any other register table (d178's roll-forward)."""
    from ..streaming.incremental import windowed_hll_registers

    events = load_table(spark, sf_dir, "events")
    # windows x 64 rows — materialize once (it feeds both the window
    # list and the dense fill; without this the corpus hash scan runs
    # twice: 64 s -> 13 s at 100x). In the streaming deployment the
    # sink table plays this role.
    regs = windowed_hll_registers(events, timestamp_col="ts").localCheckpoint()
    wins = regs.select("window_start").distinct()
    grid = wins.select(
        "window_start",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(_M - 1).cast("long"))
        ).alias("idx"),
    )
    dense = grid.join(regs, ["window_start", "idx"], "left").select(
        "window_start", "idx", F.coalesce("mrho", F.lit(0)).alias("mrho")
    )
    est = sketch.hll_estimate(dense, "window_start")
    ex = events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start")
    ).agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.join(ex, "window_start").orderBy("window_start")
