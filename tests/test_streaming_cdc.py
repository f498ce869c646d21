"""Transaction-log CDC source (streaming/cdc_source.py): live-log
stream-vs-batch equality and the rewrite-commit contract. The s15
registry face gives the batch semantics a DuckDB value oracle; these
drive a REAL tail — a writer thread committing while the tailer
drains."""

from __future__ import annotations

import tempfile
import threading
import time

import pytest

from kaggle_data_pipeline_with_aws_spark.operators.txnlog import (
    VersionedTable,
)
from kaggle_data_pipeline_with_aws_spark.streaming.cdc_source import (
    RewriteCommitError,
    TxnLogStream,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_stream_equals_batch_on_live_log(spark):
    """Tail a log while another thread commits: the concatenation of
    the emitted micro-batches equals the batch incremental read of the
    whole window, version by version."""
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="cdc-live-"))
    vt.commit(_df(spark, [(0, "seed")]), "append")

    def writer():
        w = VersionedTable(spark, vt.root)
        for k in (1, 2, 3):
            time.sleep(0.15)
            w.commit(_df(spark, [(k, f"w{k}"), (k + 100, f"x{k}")]),
                     "append")

    t = threading.Thread(target=writer)
    t.start()
    got: dict[int, list[tuple[int, str]]] = {}
    for version, batch in TxnLogStream(vt).tail(until_version=3):
        got[version] = sorted((r.k, r.v) for r in batch.collect())
    t.join()
    assert sorted(got) == [0, 1, 2, 3]
    for v in range(4):
        want = sorted(
            (r.k, r.v) for r in vt.read_incremental(v - 1, v).collect()
        )
        assert got[v] == want, f"version {v}"
    # append-only ⇒ the stream's union IS the head snapshot
    stream_union = sorted(sum(got.values(), []))
    head = sorted((r.k, r.v) for r in vt.snapshot().collect())
    assert stream_union == head


def test_poll_is_incremental_and_checkpointed(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="cdc-poll-"))
    vt.commit(_df(spark, [(1, "a")]), "append")
    s = TxnLogStream(vt)
    assert [v for v, _ in s.poll()] == [0]
    assert s.poll() == []  # head unmoved: no batches, no reads
    vt.commit(_df(spark, [(2, "b")]), "append")
    vt.commit(_df(spark, [(3, "c")]), "append")
    assert [v for v, _ in s.poll()] == [1, 2]
    # resuming from a persisted checkpoint (one integer) re-emits
    # nothing already processed
    resumed = TxnLogStream(vt, start_after=s.last_version)
    assert resumed.poll() == []


def test_rewrite_commit_contract(spark):
    vt = VersionedTable(spark, tempfile.mkdtemp(prefix="cdc-rw-"))
    vt.commit(_df(spark, [(1, "a")]), "append")
    vt.commit(_df(spark, [(9, "x")]), "overwrite")  # removes v0's files
    with pytest.raises(RewriteCommitError):
        TxnLogStream(vt).poll()  # default: refuse silently-wrong CDC
    skipped = TxnLogStream(vt, on_rewrite="skip").poll()
    assert [v for v, _ in skipped] == [0]
    adds = TxnLogStream(vt, on_rewrite="adds").poll()
    assert [v for v, _ in adds] == [0, 1]
    assert sorted(r.k for r in adds[1][1].collect()) == [9]
