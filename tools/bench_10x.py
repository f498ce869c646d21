"""10× lower-envelope bench (round-11 verdict #5, promoted to a
first-class committed series in round 12 — BENCH_10X.md).

sf0.1 is 17 MB: after two optimization rounds its walls are fixed
overhead (every 8-vs-32-core ratio ≈ 1), so plan-level wins are
invisible there. This tool measures the ~heaviest queries on the
10× derived set (tools/make_scale_data.py, default /tmp/sf1.0) with:

- WALL seconds per isolated noop-sink run (guide §1.4), min over
  ``--reps`` warm passes, first pass reported separately;
- PROCESS-TREE CPU seconds per run (utime+stime delta summed over
  this process and every descendant — driver JVM + python workers —
  from /proc), the box-noise-robust metric the round-11 sessions
  used: wall tracks host contention, CPU-seconds tracks work.

Usage:
  python tools/bench_10x.py [--sf /tmp/sf1.0] [--reps 3] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLK_TCK = os.sysconf("SC_CLK_TCK")

# The committed series set: the heaviest bench/extras queries plus the
# audit faces whose round-11 wins were only measurable at 10×.
DEFAULT_QUERIES = [
    "d202_unigram_train",
    "d203_unigram_segment_stats",
    "d210_unigram_viterbi_encode",
    "d162_bpe_train",
    "d06_ngram_jaccard",
    "d42_shingle_containment",
    "d126_dedup_threshold_sweep",
    "d155_ppjoin_cost_estimate",
    "d204_nsw_beam_search",
    "d208_nsw_augmented_search",
    "d209_nsw_augmented_recall",
    "d216_nsw_layered_search",
    "d217_nsw_layered_recall",
    "d214_ann_adaptive_probe_search",
    "d215_ann_adaptive_probe_sweep",
    "d15_ann_ivf",
]


def _tree_cpu_seconds() -> float:
    """utime+stime of this process and every /proc-visible descendant."""
    me = os.getpid()
    procs: dict[int, tuple[int, float]] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            # fields after comm: state(0) ppid(1) ... utime(11) stime(12)
            ppid = int(parts[1])
            cpu = (int(parts[11]) + int(parts[12])) / CLK_TCK
            procs[int(pid_s)] = (ppid, cpu)
        except (OSError, IndexError, ValueError):
            continue
    total = 0.0
    for pid, (ppid, cpu) in procs.items():
        p = pid
        while p > 1:
            if p == me:
                total += cpu
                break
            p = procs.get(p, (0, 0.0))[0]
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1.0")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from kaggle_data_pipeline_with_aws_spark.session import get_spark
    from kaggle_data_pipeline_with_aws_spark.sources.readers import (
        TABLES,
        load_table,
    )

    spark = get_spark("bench_10x")
    qs = entry_mod.queries()
    names = args.queries or [n for n in DEFAULT_QUERIES if n in qs]

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    out = {}
    for name in names:
        fn = qs[name]
        walls, cpus = [], []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"10x {name} rep{rep}")
            c0, t0 = _tree_cpu_seconds(), time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            cpus.append(round(_tree_cpu_seconds() - c0, 1))
        spark.sparkContext.setJobDescription(None)
        rec = {
            "q": name,
            "first_wall": walls[0],
            "min_wall": min(walls[1:]) if len(walls) > 1 else walls[0],
            "min_cpu": min(cpus[1:]) if len(cpus) > 1 else cpus[0],
            "walls": walls,
            "cpus": cpus,
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "total_min_wall": round(
                    sum(r["min_wall"] for r in out.values()), 3
                ),
                "total_min_cpu": round(
                    sum(r["min_cpu"] for r in out.values()), 1
                ),
                "n": len(out),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
