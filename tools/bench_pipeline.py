"""End-to-end pipeline benchmark at the reference's full data scale.

The reference processes 3,037 matches (~700k deliveries) with a weekly
serverless pipeline whose operational budget is minutes per stage
(SURVEY §6: 1 min / 300 MB per per-file extract Lambda ×2 per file,
10 min / 3000 MB for the CSV rebuild). This script runs the SAME
capability — full ingest-extract-materialize-publish over a
reference-scale synthetic dataset — as one Spark driver program and
prints a single JSON line of stage timings.

Usage: python tools/bench_pipeline.py [n_matches]  (default 3037)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_matches = int(sys.argv[1]) if len(sys.argv) > 1 else 3037
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
        "metric": "pipeline_e2e_sec",
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
