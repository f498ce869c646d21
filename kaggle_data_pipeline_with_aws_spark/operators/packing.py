"""Sequence packing — greedy next-fit bin assignment for training
batches.

Pre-training pipelines pack variable-length documents into fixed
token-budget sequences to avoid padding waste. The assignment is
inherently sequential *within* an ordered stream (bin fill state
carries forward), so the scale contract is: pick a sharding key, pack
each shard independently, and let shards be the parallel unit. At
100 TB that means thousands of (source, shard) groups running
concurrently, each a small in-memory loop over its own docs — no
global state, no driver involvement.

The per-group loop runs in ``applyInPandas`` (Arrow-batched, one
pandas frame per group). This is the documented "imperative state
machine over an ordered group" case where a UDF is the right tool —
the recursion on bin fill has no closed relational form (the DuckDB
oracle states it as a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def next_fit_pack(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    size_col: str,
    capacity: int,
    out_col: str = "bin_id",
) -> DataFrame:
    """Assign each row a 0-based ``bin_id`` per group: rows are taken
    in ``order_col`` order and appended to the current bin until the
    next row would overflow ``capacity``, which opens a new bin.
    Oversized rows (> capacity) get a bin of their own, like the
    overflow case — the stream never stalls."""
    import pandas as pd

    schema_cols = [f for f in df.schema.fields]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema_cols
    ) + f", {out_col} long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        bins, fill, cur = [], 0, 0
        for s in pdf[size_col]:
            if bins and fill + s > capacity:
                cur += 1
                fill = 0
            fill += s
            bins.append(cur)
        pdf[out_col] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(*[F.col(c) for c in group_cols]).applyInPandas(
        pack, out_schema
    )
