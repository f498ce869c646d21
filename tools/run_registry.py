"""Execute every registered query at a given scale directory and log
per-query wall seconds — the Spark-side scale smoke (no oracles; the
value gate is tools/check_correctness.py at driver scales).

Resumable: a query already present in the log is skipped, so an
interrupted run continues where it left off.

Usage:
    python tools/run_registry.py SF_DIR LOG_PATH [START_AFTER]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    log_path = sys.argv[2]

    from kaggle_data_pipeline_with_aws_spark.plans import registry
    from kaggle_data_pipeline_with_aws_spark.session import get_spark
    from kaggle_data_pipeline_with_aws_spark.sources.readers import (
        TABLES,
        load_table,
    )

    registry.load_all()
    done = set()
    if os.path.exists(log_path):
        with open(log_path) as fh:
            done = {line.split("\t")[0] for line in fh if "\t" in line}

    spark = get_spark("registry-run")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    todo = [n for n in registry.QUERIES if n not in done]
    print(f"{len(done)} logged, {len(todo)} to run", flush=True)
    for name in todo:
        t0 = time.time()
        try:
            rows = registry.QUERIES[name](spark, sf_dir).count()
            status = f"{rows}"
        except Exception as exc:  # log and continue: coverage > abort
            status = f"ERROR {type(exc).__name__}: {exc}"[:200].replace(
                "\n", " "
            )
        wall = time.time() - t0
        with open(log_path, "a") as fh:
            fh.write(f"{name}\t{wall:.1f}\t{status}\n")
        print(f"{name}: {wall:.1f}s {status}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
