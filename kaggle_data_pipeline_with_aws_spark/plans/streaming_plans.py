"""Oracle-checkable faces of the streaming operators (SURVEY §2.9).

The streaming module's transformations are built unified-batch-first:
the same plan runs under ``readStream`` (with watermark-bounded state)
and under a batch read (watermark is a no-op). That lets the DuckDB
oracle check the *semantics* of the streaming operator; the
stream-specific behaviors (checkpoint exactly-once, AvailableNow
drains, state expiry) are covered by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import load_table
from ..streaming.incremental import windowed_event_counts
from .registry import spark_query


@spark_query(
    "s01_windowed_event_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
)
def s01_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-series semantics as a query: watermarked tumbling-window count
    (streaming/incremental.py::windowed_event_counts run in batch mode,
    where ``withWatermark`` is a no-op — identical plan either way)."""
    events = load_table(spark, sf_dir, "events")
    return windowed_event_counts(
        events, timestamp_col="ts", key_col="event_type"
    ).orderBy("window_start", "event_type")


@spark_query(
    "s02_session_windows",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def s02_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with F.session_window (30-min gap) on the events
    stream shape — the oracle expresses the same semantics as
    gaps-and-islands SQL (session_end = last event + gap, matching
    Spark's session_window end)."""
    from ..streaming.incremental import session_event_counts

    events = load_table(spark, sf_dir, "events")
    return session_event_counts(
        events, timestamp_col="ts", key_col="user_id"
    ).orderBy("user_id", "session_start")


@spark_query(
    "s03_first_arrival_dedup",
    """
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def s03_first_arrival_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7's record-stream face: first arrival per (user, type) wins —
    the deterministic batch statement of what
    ``streaming/incremental.py::dedup_within_watermark`` enforces
    incrementally (watermark-bounded state, exactly-once per key within
    the lateness horizon; state expiry is what makes it viable on an
    unbounded stream). Batch form: per-key min-(ts, id) via window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@spark_query(
    "s04_click_view_attribution",
    """
    SELECT a.event_id AS left_id, b.event_id AS right_id,
           a.user_id AS user_id,
           date_diff('microsecond', b.ts, a.ts) AS gap_us
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE a.event_type = 'click' AND b.event_type = 'view'
      AND b.ts >= a.ts - INTERVAL 2 HOUR AND b.ts <= a.ts
    """,
)
def s04_click_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join semantics as a query: every click
    paired with the same user's views from the preceding 2 hours
    (streaming/incremental.py::correlate_event_pairs run in batch mode,
    where the watermarks are no-ops and the plan is a plain range
    join). The streaming execution of the SAME plan — watermark-bounded
    join state, AvailableNow drain — is covered in
    tests/test_streaming.py."""
    from ..streaming.incremental import correlate_event_pairs

    events = load_table(spark, sf_dir, "events")
    return correlate_event_pairs(events)


@spark_query(
    "s05_unattributed_clicks",
    """
    SELECT a.event_id AS left_id, a.user_id AS user_id
    FROM events a
    WHERE a.event_type = 'click' AND NOT EXISTS (
      SELECT 1 FROM events b
      WHERE b.event_type = 'view' AND b.user_id = a.user_id
        AND b.ts >= a.ts - INTERVAL 2 HOUR AND b.ts <= a.ts
    )
    """,
)
def s05_unattributed_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of s04: clicks with NO view from the same user in
    the preceding 2 hours. Expressed as the LEFT OUTER interval join
    filtered to null matches — the form that also runs as a streaming
    query (stream-stream left-outer joins emit the unmatched row once
    the watermark closes its window; a direct anti join is not
    streamable). The oracle states the same thing as NOT EXISTS."""
    from pyspark.sql import functions as F

    from ..streaming.incremental import correlate_event_pairs

    events = load_table(spark, sf_dir, "events")
    pairs = correlate_event_pairs(events, how="left_outer")
    return pairs.filter(F.col("right_id").isNull()).select(
        "left_id", "user_id"
    )


@spark_query(
    "s06_trending_topk",
    """
    WITH w AS (
      SELECT date_trunc('hour', ts) AS win_start, event_type,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT win_start, event_type, n_events, rk
    FROM (
      SELECT win_start, event_type, n_events,
             CAST(row_number() OVER (PARTITION BY win_start
                 ORDER BY n_events DESC, event_type ASC) AS BIGINT) AS rk
      FROM w
    ) WHERE rk <= 3
    """,
)
def s06_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-3 event types per tumbling hour. The
    windowed count is the streamable aggregate (watermark + tumbling
    window — identical to s01's shape); the per-window rank is the
    foreachBatch post-processing step, exactly how a streaming top-k
    is deployed (rank inside the micro-batch over the window's closed
    aggregate). The rank window partitions by window start, so state
    is one window's key set — bounded regardless of stream length."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("win").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "rk",
        )
    )


def _s10_oracle() -> str:
    from ..operators.text import HASH_MOD, portable_hash_sql

    h = portable_hash_sql("'kmv|' || CAST(user_id AS VARCHAR)")
    return f"""
    WITH e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             {h} AS h
      FROM events
    ),
    d AS (SELECT DISTINCT window_start, h FROM e),
    ranked AS (
      SELECT window_start, h,
             row_number() OVER (PARTITION BY window_start ORDER BY h) AS rn
      FROM d
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS k_used,
           CAST(max(h) AS BIGINT) AS kth,
           round((count(*) - 1) * {HASH_MOD}.0 / max(h), 6) AS est_distinct
    FROM ranked WHERE rn <= 64
    GROUP BY window_start
    """


@spark_query("s10_windowed_kmv_users", _s10_oracle())
def s10_windowed_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per tumbling hour, estimated by a deterministic
    KMV sketch inside a SINGLE streamable aggregate
    (streaming/incremental.py::windowed_kmv_distinct) — no window
    function, no second stateful op, so the identical plan runs under
    readStream with append mode. d48 is the batch-audit twin (daily,
    with the exact count joined alongside); this face is the one a
    100-TB event stream actually deploys, where an exact distinct per
    window would hold unbounded state."""
    events = load_table(spark, sf_dir, "events")
    from ..streaming.incremental import windowed_kmv_distinct

    return windowed_kmv_distinct(events, timestamp_col="ts")


@spark_query(
    "s11_segment_event_counts",
    """
    SELECT CAST(date_trunc('hour', e.ts) AS TIMESTAMP) AS window_start,
           c.c_mktsegment, count(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def s11_segment_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrich + windowed rollup: events gain
    their customer's market segment (the dimension is broadcast —
    re-read per micro-batch, the stream side never repartitions for
    the join) and count per (hour, segment)
    (streaming/incremental.py::segment_windowed_counts). The
    streaming deployment of J1's left-enrich; state is
    (windows × 5 segments)-sized."""
    events = load_table(spark, sf_dir, "events")
    customers = load_table(spark, sf_dir, "customer")
    from ..streaming.incremental import segment_windowed_counts

    return segment_windowed_counts(events, customers, timestamp_col="ts")
