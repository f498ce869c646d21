"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key
and ``right.ts <= left.ts``. The standard time-series enrichment
(trade←quote, event←config-change); the reference has no such operator,
but a training-data pipeline joining events to slowly-changing metadata
needs it.

Implemented as a composition of existing DataFrame ops (no UDF), the
union-and-carry-forward form:

1. Tag both sides and union them on (key, ts) — right rows carry their
   payload as ONE struct (atomic: a left row receives a whole right
   row, never a column-wise mix), left rows carry a null struct.
2. One window per key ordered by (ts, side): ``last(payload,
   ignoreNulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT carries
   the latest right payload forward onto every left row.
3. Keep the left rows.

Scale shape: exactly ONE shuffle (hash partition by key for the
window); within a key the sort is local. Contrast with the naive
``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + argmax, which
explodes to O(|l|·|r|) per key before pruning. Right rows tagged 0
sort BEFORE a left row at the identical timestamp, so ties resolve
inclusively (right.ts == left.ts matches), same as DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right payload at-or-before each left row.

    ``on``: equality key(s); ``ts_col`` must exist on both sides;
    ``payload_cols``: right columns to carry (default: all non-key,
    non-ts columns). Left rows with no prior right row get nulls. If
    several right rows share (key, ts), the carried one is the last in
    the window's (stable) sort — dedupe the right side first when that
    ambiguity matters.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in keys and c != ts_col
        ]

    rhs = right.select(
        *keys,
        ts_col,
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
    )
    lhs = left.select(
        *keys,
        ts_col,
        F.lit(1).alias("__side"),
        F.lit(None).cast(rhs.schema["__p"].dataType).alias("__p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    rhs = rhs.withColumn(
        "__row", F.lit(None).cast(lhs.schema["__row"].dataType)
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__side",
        "__row",
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
