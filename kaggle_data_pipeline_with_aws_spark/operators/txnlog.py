"""Versioned-table face: a minimal parquet transaction log with
snapshot (time-travel) reads, incremental file-level reads between
versions, and a row-level CDC diff (round-8 verdict #4 — ties the
existing MERGE face (q81), compaction (``sinks.compact_parquet``) and
snapshot-reconcile diff (q60) together into one lakehouse semantic).

Log layout (the public Delta/Iceberg idea, reduced to its core):

    <root>/_txn/00000000.json     one entry per committed version
    <root>/data/v0-<uuid>/part-*.parquet   immutable data files

Each log entry is one JSON document: ``{"version": N, "op": ...,
"schema": <ddl>, "add": [relpath, ...], "remove": [relpath, ...],
"rows_added": N}``. The live file set at version V is the replay of
add/remove actions for entries 0..V; a snapshot read is a plain
parquet scan of exactly those files. Data files are IMMUTABLE — an
overwrite commits new files and logs removes; nothing is deleted
until an explicit ``vacuum`` (so every historical version stays
readable until then).

Commit protocol: write the entry to ``_txn/.tmp-<uuid>`` then
``os.rename`` into place — atomic on POSIX, so a concurrent reader
sees either the old or the new log, never a partial entry. Version
assignment is single-writer by design (rename onto an existing path
would clobber, so ``commit`` re-checks the version after the rename
slot is claimed via ``os.link`` semantics — here: O_EXCL create);
multi-writer coordination (optimistic retry on conflict) is the
documented production upgrade, exactly Delta's OSS protocol.

Scale notes: the log is metadata (KB per commit — file paths and
counts, never data); snapshot reads hand Spark an explicit file list,
so partition pruning / predicate pushdown on the scan work unchanged;
``read_incremental`` turns an append-only table into a CDC source
reading ONLY the files added in the version window (the streaming
fast path); ``row_diff`` is one full-outer join of two snapshots on
the key — shuffle bounded by the two snapshots, the general path when
commits rewrite rows.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_txn"
_DATA_DIR = "data"


class VersionedTable:
    """Handle on a transaction-logged parquet table rooted at
    ``root`` (a local path in this sandbox; the layout and protocol
    are FS-agnostic)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)

    # -- log plumbing --------------------------------------------------
    def _entry_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.json")

    def entries(self) -> list[dict]:
        """All committed log entries in version order."""
        names = sorted(
            n
            for n in os.listdir(self.log_dir)
            if n.endswith(".json") and not n.startswith(".")
        )
        out = []
        for n in names:
            with open(os.path.join(self.log_dir, n)) as fh:
                out.append(json.load(fh))
        return out

    def current_version(self) -> int:
        """Latest committed version, -1 for an empty table."""
        es = self.entries()
        return es[-1]["version"] if es else -1

    # -- commit --------------------------------------------------------
    def commit(
        self, df: DataFrame, mode: str = "append", op: str | None = None
    ) -> int:
        """Commit ``df`` as the next version. ``mode``: ``append``
        adds files; ``overwrite`` adds files and removes every
        previously-live file (logically — bytes stay for time
        travel). Returns the committed version."""
        assert mode in ("append", "overwrite"), mode
        version = self.current_version() + 1
        commit_rel = os.path.join(_DATA_DIR, f"v{version}-{uuid.uuid4().hex[:8]}")
        commit_dir = os.path.join(self.root, commit_rel)
        df.write.mode("errorifexists").parquet(commit_dir)
        added = sorted(
            os.path.join(commit_rel, f)
            for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )
        rows_added = sum(
            r.n
            for r in self.spark.read.parquet(
                *[os.path.join(self.root, a) for a in added]
            )
            .groupBy()
            .agg(F.count("*").alias("n"))
            .collect()
        ) if added else 0
        removed = self.live_files() if mode == "overwrite" else []
        entry = {
            "version": version,
            "op": op or mode,
            "schema": df.schema.json(),
            "add": added,
            "remove": removed,
            "rows_added": rows_added,
        }
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        final = self._entry_path(version)
        # O_EXCL claim of the version slot, then atomic rename: a
        # losing concurrent writer raises instead of clobbering.
        fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        os.rename(tmp, final)
        return version

    # -- reads ---------------------------------------------------------
    def live_files(self, version: int | None = None) -> list[str]:
        """Replay add/remove actions through ``version`` (default:
        head) → the live file set, sorted for determinism."""
        live: set[str] = set()
        for e in self.entries():
            if version is not None and e["version"] > version:
                break
            live.difference_update(e["remove"])
            live.update(e["add"])
        return sorted(live)

    def _schema_at(self, version: int | None) -> StructType | None:
        es = [
            e
            for e in self.entries()
            if version is None or e["version"] <= version
        ]
        return (
            StructType.fromJson(json.loads(es[-1]["schema"])) if es else None
        )

    def snapshot(
        self, version: int | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """The table AS OF ``version`` (default: latest) — a plain
        parquet scan of exactly the live files, so pushdown and
        pruning behave like any parquet read. ``merge_schema`` unions
        the live files' schemas (schema evolution: columns added by a
        later commit read as NULL on earlier files)."""
        files = self.live_files(version)
        if not files:
            schema = self._schema_at(version)
            assert schema is not None, "snapshot of an empty log"
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(
            *[os.path.join(self.root, f) for f in files]
        )

    def read_incremental(self, v0: int, v1: int) -> DataFrame:
        """Rows in files ADDED in versions (v0, v1] — the append-only
        CDC fast path (reads only the delta's bytes). For commits that
        also removed files (rewrites), pair with ``row_diff``."""
        added: list[str] = []
        for e in self.entries():
            if v0 < e["version"] <= v1:
                added.extend(e["add"])
        if not added:
            schema = self._schema_at(v1)
            assert schema is not None, "incremental read of an empty log"
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(
            *[os.path.join(self.root, f) for f in sorted(added)]
        )

    def row_diff(
        self, v0: int, v1: int, keys: list[str]
    ) -> DataFrame:
        """Row-level CDC between two snapshots with unique ``keys``:
        one full-outer join keyed on ``keys`` classifying every key as
        insert / delete / update / unchanged (update = any non-key
        column differs; NULL-safe comparison). Output: key columns +
        ``change_type``."""
        a = self.snapshot(v0)
        b = self.snapshot(v1)
        val_cols = [c for c in b.columns if c not in keys]
        an = a.select(
            *[F.col(k).alias(f"k0_{k}") for k in keys],
            *[F.col(c).alias(f"a_{c}") for c in val_cols],
        )
        bn = b.select(
            *[F.col(k).alias(f"k1_{k}") for k in keys],
            *[F.col(c).alias(f"b_{c}") for c in val_cols],
        )
        cond = None
        for k in keys:
            c = F.col(f"k0_{k}") == F.col(f"k1_{k}")
            cond = c if cond is None else cond & c
        j = an.join(bn, cond, "full_outer")
        in_a = F.col(f"k0_{keys[0]}").isNotNull()
        in_b = F.col(f"k1_{keys[0]}").isNotNull()
        changed = None
        for c in val_cols:
            d = ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
            changed = d if changed is None else changed | d
        change = (
            F.when(~in_a, F.lit("insert"))
            .when(~in_b, F.lit("delete"))
            .when(changed if changed is not None else F.lit(False),
                  F.lit("update"))
            .otherwise(F.lit("unchanged"))
        )
        return j.select(
            *[
                F.coalesce(F.col(f"k0_{k}"), F.col(f"k1_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change_type"),
        )

    def commit_merge(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched=None,
        insert_values=None,
        delete_condition=None,
    ) -> int:
        """MERGE as a committed version: the q81/K4 face
        (``ledger.merge_upsert`` — one full-outer shuffle, all clauses
        as projections) applied to the current snapshot and committed
        as an overwrite with ``op='merge'``. Under a production table
        format this is ``DeltaTable.merge``; here the transaction log
        supplies the same read-isolation and time-travel around the
        identical relational plan."""
        from .ledger import merge_upsert

        merged = merge_upsert(
            self.snapshot(),
            source,
            keys,
            when_matched=when_matched,
            insert_values=insert_values,
            delete_condition=delete_condition,
        )
        return self.commit(merged, mode="overwrite", op="merge")

    def commit_compact(self, target_files: int = 1) -> int:
        """OPTIMIZE as a committed version: rewrite the current live
        file set into ``target_files`` files (``op='compact'``) —
        row-identical by construction, so ``row_diff`` across the
        commit is empty while small-file scan overhead drops (the
        ``sinks.compact_parquet`` rationale, now with time travel:
        pre-compaction versions stay readable until vacuum)."""
        snap = self.snapshot()
        return self.commit(
            snap.repartition(target_files), mode="overwrite", op="compact"
        )

    def history(self) -> list[dict]:
        """Commit metadata: version, op, files added/removed, rows."""
        return [
            {
                "version": e["version"],
                "op": e["op"],
                "n_added": len(e["add"]),
                "n_removed": len(e["remove"]),
                "rows_added": e["rows_added"],
            }
            for e in self.entries()
        ]

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Delete data files not live in any of the last
        ``retain_versions`` versions (and no longer referenced by any
        retained snapshot). Returns the deleted relative paths."""
        head = self.current_version()
        keep: set[str] = set()
        for v in range(max(0, head - retain_versions + 1), head + 1):
            keep.update(self.live_files(v))
        deleted = []
        all_files: set[str] = set()
        for e in self.entries():
            all_files.update(e["add"])
        for rel in sorted(all_files - keep):
            p = os.path.join(self.root, rel)
            if os.path.exists(p):
                os.remove(p)
                deleted.append(rel)
        return deleted
