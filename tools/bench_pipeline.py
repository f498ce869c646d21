"""End-to-end pipeline benchmark at the reference's full data scale.

The reference processes 3,037 matches (~700k deliveries) with a weekly
serverless pipeline whose operational budget is minutes per stage
(SURVEY §6: 1 min / 300 MB per per-file extract Lambda ×2 per file,
10 min / 3000 MB for the CSV rebuild). This script runs the SAME
capability — full ingest-extract-materialize-publish over a
reference-scale synthetic dataset — as one Spark driver program and
prints a single JSON line of stage timings.

Usage: python tools/bench_pipeline.py [n_matches] [--streaming]
(default 3037 matches, batch-ledger mode)

``--streaming`` runs the extract phase as a Structured Streaming
``Trigger.AvailableNow`` drain over the landing zone (checkpoint
exactly-once instead of the ledger anti-join) and then materializes
from the streamed silver tables — the same contract through the
engine's second incremental mechanism.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--streaming"]
    streaming = "--streaming" in sys.argv[1:]
    n_matches = int(args[0]) if args else 3037
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))

    from cricket_fixtures import write_fixture_dir

    from kaggle_data_pipeline_with_aws_spark.pipeline import (
        run_incremental,
        version_notes,
    )
    from kaggle_data_pipeline_with_aws_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="bench_pipeline_")
    landing = os.path.join(work, "landing")
    state = os.path.join(work, "state")
    output = os.path.join(work, "output")

    timings: dict[str, float] = {}
    t = time.time()
    write_fixture_dir(landing, n_matches=n_matches, seed=42)
    timings["generate_fixtures"] = round(time.time() - t, 3)

    spark = get_spark("bench_pipeline")
    if streaming:
        from kaggle_data_pipeline_with_aws_spark.materialize import (
            deliverywise_published,
            matchwise_numbered,
            write_sorted_csv,
        )
        from kaggle_data_pipeline_with_aws_spark.streaming.incremental import (
            stream_extract,
        )

        silver = os.path.join(work, "silver")
        t = time.time()
        q = stream_extract(
            spark,
            landing,
            silver,
            os.path.join(work, "ckpt"),
            max_files_per_trigger=500,
        )
        q.awaitTermination()
        timings["stream_extract_drain"] = round(time.time() - t, 3)

        t = time.time()
        matches = spark.read.parquet(os.path.join(silver, "matchwise"))
        deliveries = spark.read.parquet(os.path.join(silver, "deliverywise"))
        numbered = matchwise_numbered(matches)
        published = deliverywise_published(deliveries, numbered)
        write_sorted_csv(
            numbered, f"{output}/matchwise_data", ["match_number"]
        )
        write_sorted_csv(
            published,
            f"{output}/deliverywise_data",
            ["match_number", "innings_number", "over_number", "ball_number"],
        )
        timings["materialize"] = round(time.time() - t, 3)

        class _R:  # same reporting shape as the batch branch
            matchwise = numbered
            deliverywise = published
            n_new_files = n_matches

        result = _R()
        timings["pipeline_full"] = round(
            timings["stream_extract_drain"] + timings["materialize"], 3
        )
    else:
        t = time.time()
        result = run_incremental(
            spark,
            landing,
            state,
            output,
            max_files_per_cycle=n_matches,  # one cycle, full history
        )
        timings["pipeline_full"] = round(time.time() - t, 3)

    t = time.time()
    notes = version_notes(result.matchwise)
    timings["publish_metadata"] = round(time.time() - t, 3)

    n_deliveries = result.deliverywise.count()
    out = {
        "metric": "pipeline_e2e_streaming_sec" if streaming else "pipeline_e2e_sec",
        "value": round(
            timings["pipeline_full"] + timings["publish_metadata"], 3
        ),
        "unit": "sec",
        "n_matches": result.n_new_files,
        "n_deliveries": n_deliveries,
        "stages": timings,
        "notes": notes["notes"][:60],
        "reference_budget_sec": {
            "comment": (
                "reference stage budgets (SURVEY §6): 60s x 2 lambdas "
                "per file + 600s rebuild"
            ),
            "rebuild_alone": 600,
        },
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
