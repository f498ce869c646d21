"""Round-11 optimization harness: isolate one query at a time.

For each named query (default: the bench headline + extras set):

- time ``fn(spark, sf_dir)`` + a noop-sink write (guide §1.4 — forces
  every column of every row without collecting or letting count()
  prune), min over ``--reps`` passes, first pass reported separately
  (substrate builds / localCheckpoint warm-up land there);
- capture ``explain("formatted")`` to ``plans/r11/<query>_<tag>.txt``
  when ``--tag`` is given;
- print per-query JSON lines with Exchange / BatchEvalPython /
  ArrowEvalPython node counts so plan-shape diffs are greppable.

Usage:
  python tools/opt_bench.py [--sf DIR] [--reps N] [--tag before] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", default="r12", help="plans/<round>/ output dir")
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from kaggle_data_pipeline_with_aws_spark.session import get_spark

    spark = get_spark("opt_bench")
    qs = entry_mod.queries()
    if args.queries:
        names = args.queries
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in qs]
        names += [
            n
            for n in qs
            if n not in names and n in getattr(entry_mod, "BENCH_EXTRA", [])
        ]

    from kaggle_data_pipeline_with_aws_spark.sources.readers import (
        TABLES,
        load_table,
    )

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    plandir = os.path.join(REPO, "plans", args.round)
    if args.tag:
        os.makedirs(plandir, exist_ok=True)

    results = {}
    for name in names:
        fn = qs[name]
        walls = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        nodes = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "bpy": len(re.findall(r"BatchEvalPython", plan)),
            "apy": len(re.findall(r"ArrowEvalPython|MapInArrow|MapInPandas", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        }
        if args.tag:
            with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
        rec = {
            "q": name,
            "first": walls[0],
            "min_warm": min(walls[1:]) if len(walls) > 1 else walls[0],
            "walls": walls,
            **nodes,
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)
    total_warm = round(sum(r["min_warm"] for r in results.values()), 3)
    print(json.dumps({"total_min_warm": total_warm, "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
