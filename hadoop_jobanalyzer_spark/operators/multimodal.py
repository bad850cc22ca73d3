"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata beside them. The Spark-side mechanics here are real and tested —
schema, Arrow batch transfer, ``mapInPandas`` signatures, partition
behavior — while the actual media decode is stubbed (codec libraries are
not in this environment): ``decode_image`` raises ``NotImplementedError``
and ``fake_image_features`` is the deterministic stand-in used by tests.

At scale this is the pattern for a 100 TB media corpus: payloads stay
columnar in parquet, metadata predicates prune before any byte of media is
decoded, and decode itself is an Arrow-batched pandas stage (one Python
roundtrip per batch, not per row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", LongType()),
        StructField("header_hex", StringType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build an (id, payload binary) frame. In production the payload column
    comes straight from parquet; here the UTF-8 bytes of ``text`` stand in.

    The frame is spread to session parallelism first: downstream decode /
    feature-extract stages are CPU-bound per payload, so one narrow input
    split must not serialize the whole Arrow-batched pipeline.
    """
    from hadoop_jobanalyzer_spark.util import spread

    return spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
    )


def payload_meta(payloads: DataFrame) -> DataFrame:
    """Byte-level metadata via an Arrow-batched pandas stage.

    ``mapInPandas`` receives binary cells as Python ``bytes`` per Arrow
    batch — this is the exact plumbing a real decoder uses, minus the codec.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": pdf["payload"].map(len).astype("int64"),
                    "header_hex": pdf["payload"].map(lambda b: bytes(b[:4]).hex()),
                }
            )

    return payloads.mapInPandas(extract, PAYLOAD_META_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_mean_x100", LongType()),
        StructField("byte_max", LongType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload to pixels. STUB: image codecs are not
    available in this environment; a real deployment plugs Pillow/libvips in
    here and keeps everything around it unchanged."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(payloads: DataFrame, frame_len: int = 64, stride: int = 32) -> DataFrame:
    """Sample fixed-length frames from each payload at a stride — the
    video-frame-extraction batch shape: one input row fans out to N output
    rows *inside* the Arrow stage (no Spark-side explode of a decoded
    column, so undecoded bytes never shuffle). A real deployment replaces
    the byte slicing with a container demuxer; partitioning, schema, and
    the 1->N batch contract are exactly this.

    Frames start at offsets 0, stride, 2*stride, ... < len(payload); the
    tail frame may be short. Output: (doc_id, frame_idx, frame binary).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for k, off in enumerate(range(0, len(b), stride)):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(b[off : off + frame_len])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return payloads.mapInPandas(sample, FRAME_SCHEMA)


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover
    """Resize an image payload. STUB: requires a codec library (Pillow/
    libvips) not present in this environment; `fake_thumbnail` exercises
    the identical binary->binary batch path."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this environment"
    )


THUMBNAIL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def fake_thumbnail(payloads: DataFrame, factor: int = 8) -> DataFrame:
    """Deterministic stand-in for resize: keep every ``factor``-th byte.
    Binary in, smaller binary out, per Arrow batch — the resize contract
    without the codec."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": pdf["payload"].map(lambda b: bytes(b)[::factor]),
                }
            )

    return payloads.mapInPandas(shrink, THUMBNAIL_SCHEMA)


def fake_image_features(payloads: DataFrame) -> DataFrame:
    """Deterministic stand-in feature extractor exercising the same batch
    path as a real decoder: per payload, mean (x100, floored) and max of the
    raw bytes."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads_b = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_mean_x100": payloads_b.map(
                        lambda b: sum(b) * 100 // len(b) if b else 0
                    ).astype("int64"),
                    "byte_max": payloads_b.map(lambda b: max(b) if b else 0).astype(
                        "int64"
                    ),
                }
            )

    return payloads.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)
