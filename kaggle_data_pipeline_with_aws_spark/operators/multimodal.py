"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested — binary payload column,
explicit output schema, Arrow-batched ``mapInPandas`` iteration, bounded
batch sizes — while the actual codec calls are stubbed behind
``DECODERS`` (the image/audio libraries are not in this container): the
default "decoder" derives deterministic fake features from the bytes, so
plans are verifiable end-to-end; swapping in Pillow/librosa is a
one-function change, not a plan change.

Scale notes: ``mapInPandas`` streams Arrow record batches — the decode
stage never materializes a partition in Python memory at once;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch size for
fat binary rows. Decode is a narrow map: no shuffle, parallelism = input
splits. For petabyte media, store payloads as separate objects and keep
(path, byte_range) here — same schema, decode UDF fetches lazily.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("byte_len", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def fake_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: features derived purely
    from payload length (so oracles can reproduce them). A real decoder
    (PIL.Image.open, soundfile.read, av.open) drops in here."""
    n = len(payload)
    return {
        "byte_len": n,
        "width": 64 + n % 64,
        "height": 64 + (n * 7) % 64,
        "n_frames": 1 if media_type == "image" else 1 + n % 16,
    }


def _unavailable_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    raise NotImplementedError(
        "real media codecs are not available in this environment; "
        "register one via DECODERS['real'] = your_decoder"
    )


DECODERS: dict[str, Callable[[bytes, str], dict[str, Any]]] = {
    "fake": fake_decode,
    "real": _unavailable_decode,
}


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Manufacture a media table from the documents table: utf-8 payload
    bytes + typed metadata. Stands in for a real (id, binary, meta)
    ingest; schema and partitioning match the real thing. Spread before
    the downstream Pandas-UDF stages: Arrow batches inherit the scan's
    partitioning, so an unsplittable single-file scan would serialize
    every decode."""
    from ..sources.readers import spread_for_compute

    return spread_for_compute(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("format"),
            F.octet_length(F.encode("text", "utf-8"))
            .cast("long")
            .alias("byte_len"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decoder: str = "fake"
) -> DataFrame:
    """Decode / feature-extract over Arrow batches (mapInPandas).

    The iterator contract: consume record batches lazily, emit result
    batches of the declared FEATURE_SCHEMA — constant memory per task
    regardless of partition size."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(payload, mtype)
                for payload, mtype in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[
                [
                    "doc_id",
                    "media_type",
                    "byte_len",
                    "width",
                    "height",
                    "n_frames",
                ]
            ]

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resample: size the payload to
    width*height bytes (tile-or-truncate). A real implementation calls
    PIL `Image.open(...).resize(...)` here — same signature."""
    target = width * height
    if not payload:
        return b"\x00" * target
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_media(
    media: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize stage: one narrow Arrow-batched map, payload in →
    payload out, no shuffle. Constant memory per task (batch iterator)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": [
                        fake_resize(p, width, height) for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling: one input video row fans out to one row per
    sampled frame (payload sliced per frame) — the mapInPandas contract
    where output cardinality ≠ input cardinality. Non-video rows pass
    through as a single frame 0.

    A real implementation decodes with ``av``/ffmpeg and emits every
    k-th frame; the slicing stand-in keeps batch shape and fan-out
    semantics identical and deterministic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            payloads: list[bytes] = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype == "video" and payload:
                    n_frames = max(1, len(payload) // every_n_bytes)
                    for i in range(n_frames):
                        ids.append(doc_id)
                        idxs.append(i)
                        payloads.append(
                            payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                        )
                else:
                    ids.append(doc_id)
                    idxs.append(0)
                    payloads.append(payload)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": payloads}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("patch_row", T.LongType()),
        T.StructField("patch_col", T.LongType()),
        T.StructField("patch_w", T.LongType()),
        T.StructField("patch_h", T.LongType()),
    ]
)


def extract_patches(
    media: DataFrame, patch: int = 16, decoder: str = "fake"
) -> DataFrame:
    """ViT-style patch grid per image: one input row fans out to
    ceil(w/p)·ceil(h/p) output rows — the 1:N Arrow batch shape (vs the
    1:1 of ``extract_features``). Edge patches carry their clipped
    dimensions. Non-image rows are dropped inside the iterator, so the
    filter costs no extra pass. The real decoder would also emit pixel
    tensors; the stub stops at geometry, which is what the downstream
    partitioning/packing logic consumes."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, int, int, int]] = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image":
                    continue
                feats = decode(payload, mtype)
                w, h = feats["width"], feats["height"]
                for pr in range((h + patch - 1) // patch):
                    for pc in range((w + patch - 1) // patch):
                        rows.append(
                            (
                                doc_id,
                                pr,
                                pc,
                                min(patch, w - pc * patch),
                                min(patch, h - pr * patch),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "patch_row",
                    "patch_col",
                    "patch_w",
                    "patch_h",
                ],
            )

    return media.mapInPandas(run, PATCH_SCHEMA)
