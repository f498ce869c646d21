"""Wave 51 — s14 windowed HLL: stream-vs-batch equivalence, bounded
state, late-data MAX-merge, and a python register replay."""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kaggle_data_pipeline_with_aws_spark.operators.sketch import HLL_M
from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.streaming import (
    run_stream_to_memory,
    windowed_hll_registers,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_time", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_events(path: str, rows: list[dict], name: str = "events.jsonl"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _event_rows(n: int) -> list[dict]:
    return [
        {
            "event_id": i,
            "event_time": (
                f"2024-01-01T{(i * 3) // 60:02d}:{(i * 3) % 60:02d}:00.000Z"
            ),
            "user_id": (i * 7) % 37,
            "event_type": ["click", "view", "purchase"][i % 3],
            "value": float(i),
        }
        for i in range(n)
    ]


def _regs_key(rows):
    return sorted((r.window_start, r.idx, r.mrho) for r in rows)


def test_s14_stream_vs_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(src, _event_rows(120))
    stream = spark.readStream.schema(EVENT_SCHEMA).json(src)
    q = run_stream_to_memory(
        windowed_hll_registers(stream), "hll_regs", output_mode="complete"
    )
    q.awaitTermination()
    got = _regs_key(spark.table("hll_regs").collect())
    batch = windowed_hll_registers(
        spark.read.schema(EVENT_SCHEMA).json(src)
    )
    assert got == _regs_key(batch.collect())
    # bounded state: <= m register rows per window
    from collections import Counter

    per_win = Counter(w for (w, _, _) in got)
    assert all(c <= HLL_M for c in per_win.values())


def test_s14_late_data_max_merges(spark, tmp_path):
    """Replaying a subset of events (late/duplicate arrivals) cannot
    change the registers — MAX is idempotent and order-insensitive."""
    src = str(tmp_path / "events")
    rows = _event_rows(60)
    _write_events(src, rows)
    base = _regs_key(
        windowed_hll_registers(
            spark.read.schema(EVENT_SCHEMA).json(src)
        ).collect()
    )
    _write_events(src, rows[:20], name="late.jsonl")
    merged = _regs_key(
        windowed_hll_registers(
            spark.read.schema(EVENT_SCHEMA).json(src)
        ).collect()
    )
    assert merged == base


def test_s14_face_matches_python_replay(spark):
    registry.load_all()
    from collections import defaultdict

    from kaggle_data_pipeline_with_aws_spark.sources.readers import (
        load_table,
    )

    rows = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .selectExpr("date_trunc('hour', ts) AS w", "user_id")
        .collect()
    )
    regs: dict = defaultdict(lambda: [0] * HLL_M)
    exact: dict = defaultdict(set)
    for r in rows:
        d = hashlib.md5(f"hll|{r.user_id}".encode()).hexdigest()
        h = (int(d[:8], 16) % (1 << 30)) + (
            (int(d[8:16], 16) % (1 << 30)) << 30
        )
        idx, w = h % HLL_M, h // HLL_M
        if w == 0:
            rho = 55
        else:
            rho = 1
            while w % 2 == 0:
                w //= 2
                rho += 1
        regs[r.w][idx] = max(regs[r.w][idx], rho)
        exact[r.w].add(r.user_id)

    out = registry.QUERIES["s14_windowed_hll_users"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == len(regs)
    for row in out:
        rs = sum(1 << (55 - rho) for rho in regs[row.window_start])
        assert row.register_sum == rs
        assert row.exact_distinct == len(exact[row.window_start])
