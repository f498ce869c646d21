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


# (dataset location) -> listing fingerprint, computed once per process
_FPRINT_MEMO: dict[str, str] = {}


def _dataset_fingerprint(spark: SparkSession | None, sf_abs: str) -> str:
    """Listing metadata digest of the dataset directory: sorted
    (name, length, mtime) of its entries. Catches in-place
    regeneration (new files or rewritten files shift length/mtime)
    without reading any data. Empty string when the location can't be
    listed (the path still keys the artifact)."""
    memo = _FPRINT_MEMO.get(sf_abs)
    if memo is not None:
        return memo
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
        _FPRINT_MEMO[sf_abs] = ""
        return ""
    digest = hashlib.md5(repr(sorted(entries)).encode("utf-8")).hexdigest()[
        :10
    ]
    _FPRINT_MEMO[sf_abs] = digest
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
        if fs.rename(P(tmp), P(path)):
            # Hadoop rename(src, existing-dir) has mv-into semantics:
            # if a concurrent winner published between our exists()
            # check and the rename, our tmp landed INSIDE the
            # artifact — remove the stray so the parquet scan never
            # sees a foreign subdirectory.
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
        return spark.read.parquet(path)
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
    return spark.read.parquet(path)
