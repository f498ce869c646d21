"""Streaming per-domain cap (streaming/curation.py): cross-batch
admission state, deterministic in-batch ranking, batch-operator
equivalence when everything arrives in one batch."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kaggle_data_pipeline_with_aws_spark.streaming.curation import (
    _cap_hash,
    streaming_domain_cap,
)
from kaggle_data_pipeline_with_aws_spark.streaming.incremental import (
    run_stream_to_memory,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("domain", StringType()),
    ]
)

CAP = 3


def _write_file(path: str, rows: list[tuple[int, str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for doc_id, domain in rows:
            f.write(json.dumps({"doc_id": doc_id, "domain": domain}) + "\n")


def _rows(i: int, n: int, doms=("a.com", "b.com")):
    return [(i * 100 + j, doms[j % len(doms)]) for j in range(n)]


def test_single_batch_equals_batch_operator(spark, tmp_path):
    """With the whole corpus in ONE micro-batch, the stream admits
    exactly the rows the batch cap operator selects."""
    from kaggle_data_pipeline_with_aws_spark.operators.domains import (
        cap_per_domain,
    )

    src = str(tmp_path / "docs")
    rows = _rows(0, 40)
    _write_file(src + "/f0.json", rows)
    stream = spark.readStream.schema(DOC_SCHEMA).json(src)
    q = run_stream_to_memory(streaming_domain_cap(stream, CAP), "cap_1b")
    q.awaitTermination()
    got = {
        (r.domain, r.doc_id)
        for r in spark.sql("SELECT * FROM cap_1b").collect()
    }
    batch = spark.createDataFrame(rows, "doc_id long, domain string")
    expect = {
        (r.domain, r.doc_id)
        for r in cap_per_domain(batch, "domain", "doc_id", CAP).collect()
    }
    assert got == expect


def test_cross_batch_state_and_arrival_order(spark, tmp_path):
    """maxFilesPerTrigger=1: earlier batches consume the slots; later
    batches only fill what remains — replayed in python."""
    src = str(tmp_path / "docs")
    batches = [_rows(0, 4), _rows(1, 4), _rows(2, 4)]
    for i, rows in enumerate(batches):
        _write_file(f"{src}/f{i}.json", rows)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = run_stream_to_memory(streaming_domain_cap(stream, CAP), "cap_mb")
    q.awaitTermination()
    got = {
        (r.domain, r.doc_id, r.admit_rank)
        for r in spark.sql("SELECT * FROM cap_mb").collect()
    }
    # python replay: per batch (file order), per domain, hash-ranked
    admitted: dict[str, int] = {}
    expect = set()
    for rows in batches:
        per_dom: dict[str, list[int]] = {}
        for doc_id, dom in rows:
            per_dom.setdefault(dom, []).append(doc_id)
        for dom, ids in per_dom.items():
            ids.sort(key=lambda i: (_cap_hash(i), i))
            n = admitted.get(dom, 0)
            for doc_id in ids[: max(CAP - n, 0)]:
                n += 1
                expect.add((dom, doc_id, n))
            admitted[dom] = n
    assert got == expect
    # each domain capped and ranks contiguous from 1
    for dom in {d for d, _, _ in got}:
        ranks = sorted(r for d, _, r in got if d == dom)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= CAP


def test_restart_resumes_admission_counts(spark, tmp_path):
    """A second AvailableNow run over NEW files resumes from the
    checkpointed per-domain counts instead of re-admitting."""
    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "admitted")
    _write_file(src + "/f0.json", _rows(0, 4))

    def run():
        stream = spark.readStream.schema(DOC_SCHEMA).json(src)
        return (
            streaming_domain_cap(stream, CAP)
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    run().awaitTermination()
    first = spark.read.schema(
        "domain string, doc_id long, admit_rank long"
    ).json(out).collect()
    assert len(first) == 4  # 2 domains x 2 docs each, under cap
    _write_file(src + "/f1.json", _rows(1, 40))
    run().awaitTermination()
    rows2 = spark.read.schema(
        "domain string, doc_id long, admit_rank long"
    ).json(out).collect()
    # first run admitted 2 per domain; the restart resumes the counts
    # and tops each domain up to CAP exactly (never re-admits)
    per_dom: dict[str, list[int]] = {}
    for r in rows2:
        per_dom.setdefault(r.domain, []).append(r.admit_rank)
    assert {d: len(v) for d, v in per_dom.items()} == {
        "a.com": CAP,
        "b.com": CAP,
    }
    for ranks in per_dom.values():
        assert sorted(ranks) == list(range(1, CAP + 1))
