"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata beside them. The Spark-side mechanics here are real and tested —
schema, Arrow batch transfer, ``mapInPandas`` signatures, partition
behavior. Image decode resolves through a three-tier codec chain:
an explicitly registered codec (``set_image_codec``), auto-detected
Pillow, then the vendored pure-Python PNG codec
(``functions/png_codec``) — so the real-decode path executes even in a
library-free environment (PNG only there; other formats need a
registered codec). ``fake_image_features`` remains the format-agnostic
deterministic stand-in.

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


# --- pluggable image codec ---------------------------------------------------
#
# The decode/resize entry points consult a registered codec so an environment
# WITH image libraries lights them up without code changes: Pillow is picked
# up automatically when importable (import-try only — never a hard dep), and
# any deployment can register its own (libvips, turbojpeg, a GPU decoder)
# via ``set_image_codec``. With neither, the vendored pure-Python PNG codec
# (functions/png_codec) is the floor — PNG payloads always decode; other
# formats raise ValueError from it until a richer codec is registered.

_image_decoder = None  # Callable[[bytes], ndarray-like HxWxC uint8]
_image_resizer = None  # Callable[[bytes, int, int], bytes]


def set_image_codec(decoder=None, resizer=None) -> None:
    """Register (or clear, with None) the image decode/resize callables.
    Callables must be picklable — they are shipped to executors inside the
    Arrow-stage closures."""
    global _image_decoder, _image_resizer
    _image_decoder, _image_resizer = decoder, resizer


def _pillow_codec():  # pragma: no cover - environment-dependent
    """(decoder, resizer) built on Pillow when importable, else None."""
    try:
        import io

        import numpy as np
        from PIL import Image
    except ImportError:
        return None

    def decode(payload: bytes):
        return np.asarray(Image.open(io.BytesIO(payload)))

    def resize(payload: bytes, width: int, height: int) -> bytes:
        out = io.BytesIO()
        Image.open(io.BytesIO(payload)).resize((width, height)).save(out, "PNG")
        return out.getvalue()

    return decode, resize


def _pure_png_codec():
    """The vendored stdlib-only PNG codec — always available."""
    from hadoop_jobanalyzer_spark.functions.png_codec import (
        decode_png,
        resize_nearest,
    )

    return decode_png, resize_nearest


def _codec():
    """The active codec: explicitly registered first, then auto-Pillow,
    then the vendored pure-Python PNG fallback."""
    if _image_decoder is not None or _image_resizer is not None:
        return _image_decoder, _image_resizer
    return _pillow_codec() or _pure_png_codec()


def decode_image(payload: bytes):
    """Decode an image payload to a pixel array via the active codec
    (``set_image_codec``, auto-Pillow, or the vendored PNG fallback —
    the fallback raises ValueError for non-PNG payloads)."""
    decoder, _ = _codec()
    if decoder is None:
        raise NotImplementedError(
            "image decode requires a codec: none registered via "
            "set_image_codec() and Pillow is not importable"
        )
    return decoder(payload)


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


def resize_image(payload: bytes, width: int, height: int):
    """Resize an image payload via the active codec (``set_image_codec``,
    auto-Pillow, or the vendored PNG fallback's nearest-neighbor);
    `fake_thumbnail` exercises the identical binary->binary batch path
    format-agnostically."""
    _, resizer = _codec()
    if resizer is None:
        raise NotImplementedError(
            "image resize requires a codec: none registered via "
            "set_image_codec() and Pillow is not importable"
        )
    return resizer(payload, width, height)


DECODED_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", LongType()),
        StructField("width", LongType()),
        StructField("mean_px_x100", LongType()),
    ]
)


def decoded_image_features(payloads: DataFrame) -> DataFrame:
    """Decode every payload with the active codec and emit per-image shape +
    mean-pixel stats — the real-decoder counterpart of
    :func:`fake_image_features`, same Arrow-batched partition contract.

    The codec is resolved at PLAN time and captured into the stage closure,
    so executors never consult driver-side globals; a one-sided
    registration (resizer only) raises immediately rather than at runtime
    on the cluster. With nothing registered the PNG fallback decodes.
    """
    decoder, _ = _codec()
    if decoder is None:
        raise NotImplementedError(
            "decoded_image_features requires an image codec "
            "(set_image_codec() or Pillow)"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "height": [], "width": [], "mean_px_x100": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decoder(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["height"].append(int(px.shape[0]))
                rows["width"].append(int(px.shape[1]) if px.ndim > 1 else 1)
                rows["mean_px_x100"].append(int(px.mean() * 100))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    return payloads.mapInPandas(extract, DECODED_FEATURE_SCHEMA)


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
