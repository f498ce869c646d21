"""Derive a larger benchmark dataset by key-shifted replication.

The harness ships sf0.001/0.01/0.1; VERDICT r2 asked for one larger
datapoint to expose skew/memory behavior the 17 MB sf0.1 can't. This
derives sfN (default 10x => "sf1.0") from sf0.1 by replicating every
non-dimension table with per-replica key offsets:

- join keys (orderkey, custkey, partkey, suppkey, doc_id, vec_id,
  event_id, user_id) shift by replica * 10^10, so FK joins keep exactly
  the base data's fan-out — the join graph scales, it doesn't densify;
- nation/region (true dimensions) stay fixed, and nationkey columns are
  NOT shifted so the replicated customers/suppliers still hit them;
- document text: every 3rd word is REPLACED by a replica-salted
  variant, so EVERY 3-shingle differs across replicas (gap between
  perturbed positions is 2 < 3) and token counts are unchanged: exact
  AND near-dup cliques keep their base size instead of growing 10x.
  (Two rejected forms: a suffix-only perturbation leaves cross-replica
  Jaccard ~1 and pair output grows ~100x; a token SPLICED after every
  3rd word leaves 1-in-4 trigram windows shared across all replicas,
  so their doc-frequency grows ×N and set-similarity candidate
  generation grows ×N² — both are different workloads, not scale-ups);
- timestamps and measures are unchanged.

This is BENCH-ONLY data (correctness runs exclusively on the driver's
parquet). Usage:

    python tools/make_scale_data.py [factor] [out_dir]
    # default: factor=10, out_dir=/tmp/sf1.0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BASE = "/root/testdata/sf0.1"
OFFSET = 10_000_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from kaggle_data_pipeline_with_aws_spark.session import get_spark
    from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

    spark = get_spark("make-scale-data")
    for t in COPY_TABLES:
        load_table(spark, BASE, t).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in SHIFT_COLS.items():
        base = load_table(spark, BASE, t)
        reps = []
        for i in range(factor):
            r = base
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if t == "documents":
                # Perturb by REPLACING every 3rd word with a replica-
                # salted variant. A splice-after-every-3rd-word scheme
                # (the original form) leaves 1-in-4 trigram windows
                # with no replica token — those shingles stay shared
                # across ALL replicas, their doc-frequency grows ×N,
                # and PPJoin candidate generation grows ×N² (a
                # stressor artifact the 30× run exposed, not a plan
                # property). Replacement puts a replica-distinct token
                # inside EVERY 3-token window (gap between replaced
                # positions is 2 < 3) and keeps token counts exactly.
                toks = F.split(F.col("text"), " ")
                perturbed = F.array_join(
                    F.zip_with(
                        toks,
                        F.sequence(F.lit(1), F.size(toks)),
                        lambda x, j: F.when(
                            j % 3 == 0, F.concat(x, F.lit(f"r{i}"))
                        ).otherwise(x),
                    ),
                    " ",
                )
                r = r.withColumn("text", perturbed)
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"{t}: {factor}x written")
    spark.stop()


if __name__ == "__main__":
    main()
