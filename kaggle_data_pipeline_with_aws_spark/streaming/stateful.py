"""Custom stateful streaming operator: per-key running session stats.

The reference carries no record-level state between cycles — its only
"state" is the per-file ledger (SURVEY §2.9). This module supplies the
operator a large-scale streaming pipeline needs instead: arbitrary
per-key running aggregates maintained across micro-batches with
``applyInPandasWithState`` (Arrow-batched; state lives in the Spark
state store, partitioned by key, so it scales horizontally — never a
driver-side dict).

Shape: events keyed by ``user_id`` → one running record per user
(event count, value sum, last timestamp), emitted each micro-batch the
key appears in. A processing-time timeout expires idle keys so state
stays bounded on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _fold_batches(
    state_tuple: tuple, batch_iter: Iterable[pd.DataFrame]
) -> tuple:
    """The shared aggregation fold both stateful APIs apply: add each
    Arrow batch's (count, value sum, max ts) into the running
    (n, vsum, last_us) tuple. One definition so the legacy
    applyInPandasWithState operator and its transformWithState twin
    cannot drift while the TWS test is environment-gated."""
    n, vsum, last_us = state_tuple
    for pdf in batch_iter:
        n += len(pdf)
        vsum += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
    return n, vsum, last_us


def _output_row(key: tuple, state_tuple: tuple) -> pd.DataFrame:
    """The shared one-row output frame (RUNNING_STATS_SCHEMA shape)."""
    n, vsum, last_us = state_tuple
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [vsum],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def _make_update_fn(idle_timeout_ms: int | None):
    def _update_user_stats(
        key: tuple, batch_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        folded = _fold_batches(
            state.get if state.exists else (0, 0.0, 0), batch_iter
        )
        state.update(folded)
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _output_row(key, folded)

    return _update_user_stats


def running_user_stats(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame of per-user running stats.

    Input must be a *streaming* DataFrame with columns
    ``user_id, ts, value`` (the driver testdata ``events`` shape).

    ``idle_timeout_ms``: expire state for keys idle that long — set it
    on unbounded resident streams so state stays bounded. Leave ``None``
    for drain-the-backlog (``Trigger.AvailableNow``) runs: a processing
    -time timeout forces the query to keep scheduling batches until the
    timeout can fire, which defeats run-and-terminate semantics.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``running_user_stats`` on the new transformWithState API
    (Spark 4.x): same output schema, same semantics, state held as a
    typed named ValueState (RocksDB-capable) instead of the legacy
    GroupState tuple blob. Supports multiple state variables, TTL and
    timers — but NOT the legacy form's idle-timeout parameter: expiry
    here would use named timers (``handle.registerTimer``), which this
    twin deliberately omits to stay a minimal semantic mirror. Both
    operators share ``_fold_batches`` / ``_output_row``, so the
    aggregation cannot drift while the TWS equivalence test is
    environment-gated (the TWS Python worker needs protobuf at
    runtime, absent in this sandbox). The StatefulProcessor subclass
    is declared inside the factory because Spark type-checks the
    instance against the lazily-imported ABC."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            folded = _fold_batches(
                self._stats.get() if self._stats.exists() else (0, 0.0, 0),
                rows,
            )
            self._stats.update(folded)
            yield _output_row(key, folded)

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
