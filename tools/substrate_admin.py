"""Substrate store admin CLI: list artifacts, prune superseded ones.

The store (operators/substrate_store.py) prunes opportunistically after
each publish; this tool is the operator-facing face of the same
machinery — inspect what the store holds (family, artifact, age, size,
health) and run an explicit prune pass, e.g. from a cron on the
warehouse root a long-lived cluster deployment uses.

Usage:
    python tools/substrate_admin.py list  [--root URI]
    python tools/substrate_admin.py prune [--root URI] [--keep N]
                                          [--min-age-sec S] [--dry-run]

The root defaults to $SPARK_GRAFT_SUBSTRATE_ROOT (or the repo's
spark-warehouse); any Hadoop-FS URI works — the same JVM FileSystem
code path the store itself uses.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if n < 1024 or unit == "TB":
            return f"{n:.0f}{unit}" if unit == "B" else f"{n:.1f}{unit}"
        n /= 1024.0
    return f"{n}B"


def _tree_size(fs, jvm, path: str) -> int:
    P = jvm.org.apache.hadoop.fs.Path
    try:
        return int(fs.getContentSummary(P(path)).getLength())
    except Exception:
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["list", "prune"])
    ap.add_argument("--root", default=None)
    ap.add_argument("--keep", type=int, default=1)
    ap.add_argument("--min-age-sec", type=int, default=3600)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    if args.root:
        os.environ["SPARK_GRAFT_SUBSTRATE_ROOT"] = args.root

    from kaggle_data_pipeline_with_aws_spark.operators import substrate_store
    from kaggle_data_pipeline_with_aws_spark.session import get_spark

    spark = get_spark("substrate-admin")
    root = substrate_store.store_root()
    fs, jvm = substrate_store._fs(spark, root)
    P = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(P(root)):
        print(f"store root {root}: empty (does not exist)")
        spark.stop()
        return 0

    now_ms = int(jvm.java.lang.System.currentTimeMillis())
    families = sorted(
        st.getPath().getName()
        for st in fs.listStatus(P(root))
        if st.isDirectory()
    )
    if args.cmd == "list":
        print(f"store root: {root}")
        for fam in families:
            fam_path = f"{root.rstrip('/')}/{fam}"
            for st in fs.listStatus(P(fam_path)):
                name = st.getPath().getName()
                full = f"{fam_path}/{name}"
                age_h = (now_ms - int(st.getModificationTime())) / 3_600_000
                published = fs.exists(P(full + "/_SUCCESS"))
                group = substrate_store._artifact_group(name)
                health = (
                    "published"
                    if published
                    else ("tmp" if ".tmp-" in name else "NO-SUCCESS")
                )
                size = _tree_size(fs, jvm, full)
                print(
                    f"  {fam}/{name}  group={group or '?'}  "
                    f"{_fmt_bytes(size)}  age={age_h:.1f}h  {health}"
                )
    else:  # prune
        total = []
        for fam in families:
            if args.dry_run:
                # replicate selection without deleting: list entries the
                # prune pass WOULD remove (age-eligible, over budget)
                fam_path = f"{root.rstrip('/')}/{fam}"
                groups: dict[str, list[tuple[int, str]]] = {}
                for st in fs.listStatus(P(fam_path)):
                    name = st.getPath().getName()
                    full = f"{fam_path}/{name}"
                    age_ms = now_ms - int(st.getModificationTime())
                    if age_ms < args.min_age_sec * 1000:
                        continue
                    if ".tmp-" in name or not fs.exists(P(full + "/_SUCCESS")):
                        print(f"  would delete (stale writer): {full}")
                        total.append(full)
                        continue
                    g = substrate_store._artifact_group(name)
                    if g is None:
                        continue
                    groups.setdefault(g, []).append(
                        (int(st.getModificationTime()), full)
                    )
                for _, entries in groups.items():
                    entries.sort(reverse=True)
                    for _, full in entries[max(args.keep, 0):]:
                        print(f"  would delete (superseded): {full}")
                        total.append(full)
            else:
                deleted = substrate_store.prune_superseded(
                    spark,
                    fam,
                    keep=args.keep,
                    min_age_ms=args.min_age_sec * 1000,
                )
                for p in deleted:
                    print(f"  deleted: {p}")
                total.extend(deleted)
        verb = "would delete" if args.dry_run else "deleted"
        print(f"{verb} {len(total)} artifact dir(s) under {root}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
