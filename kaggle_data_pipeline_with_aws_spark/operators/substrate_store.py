"""Generic materialize-once substrate store (build once, read many).

Round 5 introduced the idiom for the mutual-kNN edge list
(operators/knn_substrate.py); this module generalizes it so every
expensive, deterministic, multiply-consumed intermediate — kNN edges,
the ranked shingle table, MinHash signatures — shares one store
contract:

- **Configurable root** (the cluster deployment story): artifacts live
  under ``$SPARK_GRAFT_SUBSTRATE_ROOT`` (default
  ``<repo>/spark-warehouse``). Any Hadoop-FileSystem URI works —
  a plain local path, ``file:///…``, ``hdfs://…``, ``s3a://…`` —
  because existence checks, publication renames, and cleanup all go
  through the JVM Hadoop ``FileSystem`` API rather than ``os.*``, so
  the exact code path that runs here runs against a cluster object
  store.
- **Content addressing**: path = ``root/family/version-dataset-token``
  where token hashes the absolute dataset location PLUS a listing
  fingerprint of the dataset's files (name, length, modification
  time via the Hadoop FS) — so regenerating a dataset IN PLACE
  changes the token and the old artifact becomes unreachable instead
  of silently serving stale results. ``version`` is baked in by each
  family and bumped whenever the builder plan changes, so a stale
  artifact from an older plan is likewise unreachable. Two builders
  on DIFFERENT datasets resolve to different paths and can never
  cross-contaminate (tested). The fingerprint is listing metadata,
  not a content hash: one FS listing per (dataset, process), cached.
- **Atomic publication**: write to a builder-unique temp dir, rename
  into place. The loser of a concurrent same-dataset race discards its
  temp dir and reads the winner's artifact — byte-equivalent, because
  builders are deterministic plans. A directory without ``_SUCCESS``
  is a crashed writer: deleted and rebuilt.
- **Fallback**: a store that cannot be written (read-only checkout,
  full disk) never affects correctness — ``materialize_once`` serves
  the direct builder plan; only the cache speedup is lost.
- **Version GC** (round-6 verdict #3): superseded artifacts — older
  tokens after an in-place dataset regeneration, older versions after
  a builder-plan bump — are pruned keep-latest-N per (family, dataset
  basename) after each successful publish, behind a grace window so a
  concurrent reader of a just-superseded path can finish its scan.
  See ``prune_superseded``.

Reference scope: the reference pipeline (five pandas/boto3 Lambdas) has
no shared-intermediate store; this is part of the beyond-reference
LLM-data-curation surface, and the warehouse pattern any 100 TB
deployment would use (run the builder as a writer job; point every
consumer at the published table).
"""

from __future__ import annotations

import hashlib
import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# process-local memo of paths whose _SUCCESS this process has confirmed,
# to skip even the existence check after the first read in a session
_MEMO: set[str] = set()


def store_root() -> str:
    """Artifact store root — any Hadoop-FS URI. Resolved per call (not
    at import) so tests and deployments can repoint it with an env
    var without re-importing the package."""
    return os.environ.get(
        "SPARK_GRAFT_SUBSTRATE_ROOT",
        os.path.join(_REPO_ROOT, "spark-warehouse"),
    )


# (dataset location) -> (listing fingerprint, monotonic expiry).
# Entries EXPIRE (round-7 ADVICE): a long-lived driver process must
# eventually observe an in-place dataset regeneration, otherwise it
# keeps resolving the pre-regeneration token forever and serves a
# stale artifact for the process lifetime. One FS listing per
# (dataset, process, TTL window).
_FPRINT_TTL_S = 600.0
_FPRINT_MEMO: dict[str, tuple[str, float]] = {}


def _dataset_fingerprint(spark: SparkSession | None, sf_abs: str) -> str:
    """Listing metadata digest of the dataset directory: sorted
    (name, length, mtime) of its entries. Catches in-place
    regeneration (new files or rewritten files shift length/mtime)
    without reading any data. Empty string when the location can't be
    listed (the path still keys the artifact)."""
    import time

    memo = _FPRINT_MEMO.get(sf_abs)
    if memo is not None and time.monotonic() < memo[1]:
        return memo[0]
    if spark is None and "://" in sf_abs:
        # A remote URI can't be listed without the JVM FileSystem.
        # Return the empty fingerprint WITHOUT memoizing it, so a later
        # spark-backed call can still populate the real listing digest
        # — otherwise two processes could resolve the same remote
        # dataset to different artifact paths depending on call order,
        # and the staleness check would be silently disabled.
        return ""
    entries: list[tuple[str, int, int]] = []
    try:
        if spark is not None and "://" in sf_abs:
            fs, jvm = _fs(spark, sf_abs)
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(sf_abs)):
                entries.append(
                    (
                        st.getPath().getName(),
                        int(st.getLen()),
                        int(st.getModificationTime()),
                    )
                )
        else:
            with os.scandir(sf_abs) as it:
                for de in it:
                    st = de.stat()
                    entries.append(
                        (de.name, st.st_size, st.st_mtime_ns // 1_000_000)
                    )
    except Exception:
        _FPRINT_MEMO[sf_abs] = ("", time.monotonic() + _FPRINT_TTL_S)
        return ""
    digest = hashlib.md5(repr(sorted(entries)).encode("utf-8")).hexdigest()[
        :10
    ]
    _FPRINT_MEMO[sf_abs] = (digest, time.monotonic() + _FPRINT_TTL_S)
    return digest


def artifact_path(
    family: str, version: str, sf_dir: str, spark: SparkSession | None = None
) -> str:
    """``root/family/version-dataset-token`` — content-addressed by
    dataset location + listing fingerprint, version-keyed by
    builder-plan version."""
    sf_abs = (
        sf_dir.rstrip("/") if "://" in sf_dir else os.path.abspath(sf_dir)
    )
    fprint = _dataset_fingerprint(spark, sf_abs)
    token = hashlib.md5(f"{sf_abs}|{fprint}".encode("utf-8")).hexdigest()[:10]
    name = f"{version}-{os.path.basename(sf_abs)}-{token}"
    root = store_root()
    if "://" in root:
        return f"{root.rstrip('/')}/{family}/{name}"
    return os.path.join(root, family, name)


def _fs(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def ensure_artifact(
    spark: SparkSession,
    path: str,
    write_builder: Callable[[str], None],
) -> bool:
    """Publish the artifact at ``path`` unless it already exists.

    ``write_builder(tmp_path)`` must write a parquet directory
    (including Spark's ``_SUCCESS`` marker) at ``tmp_path``. Returns
    True when a complete artifact is readable at ``path`` afterwards,
    False when the store is unusable (caller should fall back to its
    direct plan).
    """
    try:
        fs, jvm = _fs(spark, path)
        P = jvm.org.apache.hadoop.fs.Path
        if fs.exists(P(path + "/_SUCCESS")):
            return True
        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    except Exception:
        return False
    try:
        write_builder(tmp)
        if fs.exists(P(path)) and not fs.exists(P(path + "/_SUCCESS")):
            fs.delete(P(path), True)  # crashed writer: rebuild over it
        fs.mkdirs(P(path).getParent())
        if fs.exists(P(path + "/_SUCCESS")):
            # A concurrent winner published while we were building.
            # Renaming now would land our tmp INSIDE the published
            # artifact (Hadoop rename(src, existing-dir) has mv-into
            # semantics), opening a window in which a concurrent
            # reader lists a foreign subdirectory — skip the rename
            # entirely and discard the loser's tmp.
            fs.delete(P(tmp), True)
        elif fs.rename(P(tmp), P(path)):
            # Defense-in-depth for the residual race (a winner landing
            # between the recheck above and the rename): if our tmp
            # ended up inside the artifact anyway, remove the stray so
            # the parquet scan never sees a foreign subdirectory.
            stray = P(path + "/" + os.path.basename(tmp))
            if fs.exists(stray):
                fs.delete(stray, True)
        else:
            # lost the publication race; the winner's artifact is
            # byte-equivalent (deterministic builder plan)
            fs.delete(P(tmp), True)
        return bool(fs.exists(P(path + "/_SUCCESS")))
    except Exception:
        try:
            fs.delete(P(tmp), True)
        except Exception:
            pass
        return False


_HEX = frozenset("0123456789abcdef")


def _artifact_group(name: str) -> str | None:
    """Dataset-basename group of a published artifact directory name
    (``{version}-{basename}-{token}``): the middle segment, i.e. the
    dataset directory's basename. Returns None when the name doesn't
    parse as something this store published — such entries are never
    pruned (don't delete what we don't own)."""
    parts = name.split("-")
    if len(parts) < 3:
        return None
    token = parts[-1]
    if len(token) != 10 or not set(token) <= _HEX:
        return None
    return "-".join(parts[1:-1])


def prune_superseded(
    spark: SparkSession,
    family: str,
    keep: int = 1,
    active_path: str | None = None,
    min_age_ms: int = 3_600_000,
) -> list[str]:
    """Garbage-collect superseded artifact versions under
    ``root/family`` (round-6 verdict #3: without this, every dataset
    regeneration or builder-version bump orphans a content-addressed
    directory forever — an unbounded storage leak at production scale).

    Keeps, per dataset-basename group, the ``keep`` most recently
    modified published artifacts; deletes the rest. The default
    ``keep=1`` retains only the current artifact per dataset: a
    superseded token/version is unreachable by construction (consumers
    re-resolve the current token on every call), so extra copies have
    no reader value past the grace window. Grouping by the dataset
    basename (not the whole family) keeps differently-named datasets —
    sf0.001 / sf0.01 / sf0.1 side by side — out of each other's
    budget. Two DISTINCT datasets that share a basename (/a/data and
    /b/data) do share a group: the worst case is an evicted cache
    entry that rebuilds on next use, never a correctness effect,
    because reads always resolve the current content-addressed token.

    Race discipline (same bar as the publish path):

    - the ``active_path`` just resolved/published by the caller is
      never deleted, whatever its age;
    - nothing younger than ``min_age_ms`` is deleted — a concurrent
      reader that resolved a now-superseded token gets a full grace
      window to finish its scan (readers re-resolve the current token
      on their next call, so staleness is bounded by one read);
    - crashed-writer litter (``.tmp-*`` dirs and published dirs
      without ``_SUCCESS``) older than the grace window is collected
      too — but ONLY when the name (or the tmp name's stem) parses as
      this store's layout;
    - names that don't parse as this store's layout are left alone,
      whatever their age or ``_SUCCESS`` state.

    Best-effort: any FS error leaves the store as-is (the publish/read
    contract never depends on pruning). Returns the deleted paths.
    """
    deleted: list[str] = []
    root = store_root()
    fam = (
        f"{root.rstrip('/')}/{family}"
        if "://" in root
        else os.path.join(root, family)
    )
    try:
        fs, jvm = _fs(spark, fam)
        P = jvm.org.apache.hadoop.fs.Path
        if not fs.exists(P(fam)):
            return deleted
        now = int(jvm.java.lang.System.currentTimeMillis())
        active = active_path.rstrip("/") if active_path else None
        groups: dict[str, list[tuple[int, str, str]]] = {}
        for st in fs.listStatus(P(fam)):
            name = st.getPath().getName()
            full = f"{fam}/{name}"
            if active and full.rstrip("/") == active:
                continue
            age = now - int(st.getModificationTime())
            if age < min_age_ms:
                continue
            # Ownership gate FIRST (round-7 ADVICE): an entry whose
            # name doesn't parse as this store's layout — directly or
            # as the stem of a builder tmp dir — is never deleted,
            # whatever its _SUCCESS state. Without this, any foreign
            # file older than the grace window that happens to lack
            # _SUCCESS would be collected as "crashed-writer litter".
            stem, is_tmp, _rest = name.partition(".tmp-")
            group = _artifact_group(stem)
            if group is None:
                continue
            if is_tmp or not fs.exists(P(full + "/_SUCCESS")):
                # stale crashed writer / abandoned tmp: collect now
                if fs.delete(P(full), True):
                    deleted.append(full)
                continue
            groups.setdefault(group, []).append(
                (int(st.getModificationTime()), name, full)
            )
        active_group = (
            _artifact_group(os.path.basename(active)) if active else None
        )
        for group, entries in groups.items():
            entries.sort(reverse=True)  # newest first
            # the (never-listed) active artifact occupies one of the
            # group's keep slots when it belongs to this group
            budget = max(keep - (1 if group == active_group else 0), 0)
            for _mtime, _name, full in entries[budget:]:
                if fs.delete(P(full), True):
                    deleted.append(full)
                    _MEMO.discard(full)
    except Exception:
        return deleted
    return deleted


def materialize_once(
    spark: SparkSession,
    family: str,
    version: str,
    sf_dir: str,
    plan_fn: Callable[[], DataFrame],
) -> DataFrame:
    """The substrate contract: return ``plan_fn()``'s result as a
    published parquet scan, building it on first use; serve the direct
    plan if the store is unusable. Parquet round-trips the long/double/
    string columns these artifacts carry bit-exactly, so consumers'
    results are unchanged either way."""
    path = artifact_path(family, version, sf_dir, spark)
    if path in _MEMO:
        # The memo only says THIS process confirmed _SUCCESS once; in a
        # shared-root deployment a peer process's prune_superseded may
        # have collected the path since (its grace window bounds
        # concurrent scans, not process-lifetime memos — round-7
        # ADVICE). spark.read.parquet resolves the footer eagerly, so
        # a deleted artifact raises here: drop the memo and fall
        # through to ensure_artifact, which rebuilds or degrades.
        try:
            return spark.read.parquet(path)
        except Exception:
            _MEMO.discard(path)
    ok = ensure_artifact(
        spark,
        path,
        lambda tmp: plan_fn().write.mode("overwrite").parquet(tmp),
    )
    if not ok:
        # degraded path: the store can't hold the artifact, so cache
        # the builder plan in-session instead — consumers reference it
        # several times (the standalone dedup plans cached the same
        # subtree), and Spark's CacheManager dedupes by logical plan
        # so repeated fallback calls share one materialization
        return plan_fn().cache()
    _MEMO.add(path)
    # keep the store bounded: superseded versions/tokens of this
    # family are collected past the grace window (best-effort; see
    # prune_superseded for the race discipline)
    prune_superseded(spark, family, active_path=path)
    return spark.read.parquet(path)
