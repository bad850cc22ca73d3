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
