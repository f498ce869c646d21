"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested — binary payload column,
explicit output schema, Arrow-batched ``mapInPandas`` iteration, bounded
batch sizes. Codecs come in two tiers:

- REAL decode for stdlib-decodable container formats: BMP
  (width/height parsed from the BITMAPINFOHEADER with ``struct``),
  WAV (sample layout from the RIFF fmt/data chunks), and — round 6 —
  PNG (chunk walk with CRC verification, zlib inflate of the IDAT
  stream, full scanline filter reconstruction for all five filter
  types). ``encode_bmp`` / ``encode_wav`` / ``encode_png`` build
  genuine files for fixtures, so decode is tested against real bytes,
  not length arithmetic.
- The deterministic ``fake_decode`` stand-in remains ONLY for formats
  whose codecs are genuinely absent from this container (JPEG/MP3/MP4):
  features derived purely from payload length, so oracles can still
  reproduce them. Swapping in Pillow/librosa is a one-function change,
  not a plan change.

Scale notes: ``mapInPandas`` streams Arrow record batches — the decode
stage never materializes a partition in Python memory at once;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch size for
fat binary rows. Decode is a narrow map: no shuffle, parallelism = input
splits. For petabyte media, store payloads as separate objects and keep
(path, byte_range) here — same schema, decode UDF fetches lazily.
"""

from __future__ import annotations

import struct
import zlib
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


# --- real uncompressed-format codecs (stdlib struct, no deps) -------------


def encode_bmp(width: int, height: int) -> bytes:
    """A genuine bottom-up 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + zeroed pixel rows padded to 4 bytes)."""
    row = (3 * width + 3) // 4 * 4
    data_len = row * height
    file_len = 14 + 40 + data_len
    header = struct.pack("<2sIHHI", b"BM", file_len, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_len, 2835, 2835, 0, 0
    )
    return header + info + b"\x00" * data_len


def decode_bmp(payload: bytes) -> dict[str, Any]:
    """Parse width/height from the BITMAPINFOHEADER — the real decode
    path for uncompressed images. Height is stored negative for
    top-down rows; geometry is its magnitude. Single still: 1 frame."""
    if payload[:2] != b"BM" or len(payload) < 26:
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    return {
        "byte_len": len(payload),
        "width": abs(width),
        "height": abs(height),
        "n_frames": 1,
    }


def encode_wav(sample_rate: int, n_frames: int) -> bytes:
    """A genuine RIFF/WAVE file: PCM16 mono fmt chunk + zeroed data."""
    data_len = 2 * n_frames  # 16-bit mono
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data = struct.pack("<4sI", b"data", data_len) + b"\x00" * data_len
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(payload: bytes) -> dict[str, Any]:
    """Walk the RIFF chunk list for fmt/data — the real decode path for
    uncompressed audio. ``n_frames`` = PCM frames (data bytes / block
    align); width/height are 0 (no spatial geometry for audio)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, block_align, n_frames = 12, None, 0
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            if pos + 22 > len(payload):  # truncated fmt chunk
                raise ValueError("malformed WAV: truncated fmt chunk")
            block_align = struct.unpack_from("<H", payload, pos + 20)[0]
        elif cid == b"data" and block_align:
            n_frames = size // block_align
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return {
        "byte_len": len(payload),
        "width": 0,
        "height": 0,
        "n_frames": n_frames,
    }


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    """One PNG chunk: big-endian length, type, body, CRC32(type+body)."""
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """A genuine zlib stream of STORED (uncompressed) DEFLATE blocks:
    2-byte zlib header + per-block 5-byte stored header + raw bytes +
    adler32 trailer. Any inflater decodes it; its size is exactly
    ``len(data) + 6 + 5 * n_blocks`` — arithmetic the DuckDB oracle can
    reproduce, which compression levels > 0 (size depends on the
    compressor's match heuristics) could not."""
    out = [b"\x78\x01"]
    pos, n = 0, len(data)
    while True:
        block = data[pos : pos + 65535]
        pos += len(block)
        final = 1 if pos >= n else 0
        out.append(struct.pack("<BHH", final, len(block), 0xFFFF ^ len(block)))
        out.append(block)
        if final:
            break
    out.append(struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF))
    return b"".join(out)


def encode_png(width: int, height: int, pixels: bytes | None = None) -> bytes:
    """A genuine 8-bit RGB non-interlaced PNG: signature, IHDR, one IDAT
    holding the filter-0 scanlines in a stored-block zlib stream, IEND —
    all chunk CRCs real. ``pixels`` = height*width*3 raw RGB bytes
    (zeroed when omitted). File size is deterministic:
    ``68 + height * (3*width + 1)`` while the scanline buffer fits one
    stored block (+5 per extra 64 KiB block beyond that)."""
    stride = 3 * width
    if pixels is None:
        pixels = b"\x00" * (stride * height)
    if len(pixels) != stride * height:
        raise ValueError("pixels must be height*width*3 bytes")
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib_stored(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_pixels(payload: bytes) -> tuple[bytes, int, int]:
    """Full PNG decode to raw RGB bytes: chunk walk with CRC
    verification, zlib inflate of the concatenated IDAT stream, then
    per-scanline reconstruction of all five PNG filter types
    (None/Sub/Up/Average/Paeth). 8-bit RGB non-interlaced only — the
    variant ``encode_png`` emits; palette/alpha/interlace raise."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("malformed PNG: truncated chunk")
        body = payload[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError("malformed PNG: chunk CRC mismatch")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("malformed PNG: bad IHDR length")
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    if (bit_depth, color_type, interlace) != (8, 2, 0):
        raise ValueError("unsupported PNG variant (8-bit RGB only)")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"malformed PNG: bad IDAT stream ({exc})") from exc
    stride, bpp = 3 * width, 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("malformed PNG: scanline buffer length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"malformed PNG: unknown filter type {ftype}")
        out += line
        prev = line
    return bytes(out), width, height


def decode_png(payload: bytes) -> dict[str, Any]:
    """Real PNG decode — geometry is asserted against the fully
    reconstructed pixel buffer (inflate + filter reconstruction in
    ``_png_pixels``), not just read off the IHDR. Single still:
    1 frame."""
    _, width, height = _png_pixels(payload)
    return {
        "byte_len": len(payload),
        "width": width,
        "height": height,
        "n_frames": 1,
    }


def real_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Magic-sniffing dispatcher: real struct/zlib parse for the
    stdlib-decodable containers (BMP, WAV, PNG); anything else — i.e.
    compressed formats whose codec libraries are not in this container
    (JPEG/MP3/MP4) — falls through to the documented deterministic
    stand-in."""
    if payload[:2] == b"BM" and len(payload) >= 26:
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    return fake_decode(payload, media_type)


DECODERS: dict[str, Callable[[bytes, str], dict[str, Any]]] = {
    "fake": fake_decode,
    "real": real_decode,
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


def documents_as_real_media(docs: DataFrame) -> DataFrame:
    """Like ``documents_as_media`` but the image/audio payloads are
    REAL container files (uncompressed BMP / PCM16 WAV / stored-block
    PNG built by the stdlib encoders), so the decode stage exercises
    genuine header parsing — and, for PNG, genuine zlib inflate +
    scanline filter reconstruction. Geometry derives deterministically
    from the utf-8 text length n (oracle-reproducible):

    - image, doc_id % 6 == 0 → BMP, width = 8 + n % 16,
      height = 8 + (n*7) % 16
    - image, doc_id % 6 == 3 → PNG, same width/height formulas
      (file size = 68 + height * (3*width + 1), stored-block zlib)
    - audio → WAV, 16 kHz, n_frames = 1 + n % 256
    - video → raw utf-8 bytes (compressed video codecs are the
      documented stub tier — ``real_decode`` falls back to the fake)

    Payload construction is itself an Arrow-batched mapInPandas — the
    same narrow-map shape a real binary ingest has.
    """
    from ..sources.readers import spread_for_compute

    base = spread_for_compute(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("text_bytes"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads: list[bytes] = []
            fmts: list[str] = []
            for doc_id, mtype, tb in zip(
                pdf["doc_id"], pdf["media_type"], pdf["text_bytes"]
            ):
                n = len(tb)
                if mtype == "image":
                    w, h = 8 + n % 16, 8 + (n * 7) % 16
                    if doc_id % 6 == 0:
                        payloads.append(encode_bmp(w, h))
                        fmts.append("bmp")
                    else:  # doc_id % 6 == 3
                        payloads.append(encode_png(w, h))
                        fmts.append("png")
                elif mtype == "audio":
                    payloads.append(encode_wav(16_000, 1 + n % 256))
                    fmts.append("wav")
                else:
                    payloads.append(bytes(tb))
                    fmts.append("synthetic")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": payloads,
                    "meta": [
                        {"format": f, "byte_len": len(p)}
                        for f, p in zip(fmts, payloads)
                    ],
                }
            )

    return base.mapInPandas(run, MEDIA_SCHEMA)


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
