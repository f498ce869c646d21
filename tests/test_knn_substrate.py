"""Materialize-once semantics of the mutual-kNN edge substrate
(operators/knn_substrate.py) — the round-5 fix for the cross-query
recomputation flagged by the round-4 verdict (d62/d63/d64/d122/d132
each re-derived the same deterministic edge list)."""

from __future__ import annotations

import os
import shutil

from kaggle_data_pipeline_with_aws_spark.operators import (
    knn_substrate,
    substrate_store,
)
from kaggle_data_pipeline_with_aws_spark.plans import registry
from kaggle_data_pipeline_with_aws_spark.sources.readers import load_table

registry.load_all()
SF = "/root/testdata/sf0.001"


def _fresh_artifact(spark):
    path = knn_substrate.edges_artifact_path(SF)
    substrate_store._MEMO.discard(path)
    shutil.rmtree(path, ignore_errors=True)
    return path


def test_substrate_matches_direct_plan(spark):
    """Parquet round-trip is value-exact vs the builder plan."""
    _fresh_artifact(spark)
    embs = load_table(spark, SF, "embeddings")
    direct = {
        (r["node_a"], r["node_b"], r["cos_sim"])
        for r in knn_substrate.build_edges_plan(embs).collect()
    }
    served = {
        (r["node_a"], r["node_b"], r["cos_sim"])
        for r in knn_substrate.mutual_knn_edges(spark, SF).collect()
    }
    assert direct == served
    assert served, "edge substrate unexpectedly empty"


def test_substrate_builds_once(spark):
    """Second call reads the published artifact — no rebuild."""
    path = _fresh_artifact(spark)
    knn_substrate.mutual_knn_edges(spark, SF).count()
    marker = os.path.join(path, "_SUCCESS")
    assert os.path.exists(marker)
    mtime = os.path.getmtime(marker)
    # second call: memo hit, artifact untouched
    knn_substrate.mutual_knn_edges(spark, SF).count()
    assert os.path.getmtime(marker) == mtime
    # even with the process memo cleared (a NEW process), the artifact
    # is reused, not rebuilt
    substrate_store._MEMO.discard(path)
    knn_substrate.mutual_knn_edges(spark, SF).count()
    assert os.path.getmtime(marker) == mtime


def test_substrate_artifact_is_version_and_dataset_keyed(spark):
    p1 = knn_substrate.edges_artifact_path("/root/testdata/sf0.001")
    p2 = knn_substrate.edges_artifact_path("/root/testdata/sf0.01")
    assert p1 != p2
    assert knn_substrate._VERSION in os.path.basename(p1)


def test_unwritable_store_falls_back_to_direct_plan(spark, monkeypatch):
    """If the artifact can't be written, the reader serves the direct
    deterministic plan — correctness never depends on the cache."""
    _fresh_artifact(spark)

    orig = knn_substrate.build_edges_plan
    calls = {"n": 0}

    def counting(embs):
        calls["n"] += 1
        df = orig(embs)

        class _W:
            def __getattr__(self, item):
                return getattr(df, item)

            @property
            def write(self):
                raise OSError("read-only store")

        return _W() if calls["n"] == 1 else df

    monkeypatch.setattr(knn_substrate, "build_edges_plan", counting)
    df = knn_substrate.mutual_knn_edges(spark, SF)
    assert df.count() > 0
    assert calls["n"] == 2  # write attempt failed -> direct plan served
    # and the failure was not memoized as a published artifact
    assert knn_substrate.edges_artifact_path(SF) not in substrate_store._MEMO


def test_corrupt_artifact_is_rebuilt(spark):
    """A directory without _SUCCESS (crashed writer) is replaced."""
    path = _fresh_artifact(spark)
    os.makedirs(path, exist_ok=True)  # corrupt: exists, no _SUCCESS
    df = knn_substrate.mutual_knn_edges(spark, SF)
    assert df.count() > 0
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
