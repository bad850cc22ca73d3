"""Dependency-free PNG codec — the vendored decode fallback for the
multimodal image tier.

The engine's rasterizer (sinks.py) already *writes* PNG with nothing but
stdlib ``zlib``/``struct``; this module is the matching reader, so the
real-decode multimodal path (``operators/multimodal.decoded_image_features``)
executes even where no image library is installed. Scope is deliberately
the still-image subset a data pipeline actually meets in practice and the
rasterizer emits:

* 8-bit samples, non-interlaced, all five scanline filters (None / Sub /
  Up / Average / Paeth, RFC 2083 §6);
* color types 0 (grayscale), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA);
* 16-bit, interlaced (Adam7), and ancillary-chunk-dependent images raise
  ``ValueError`` — a deployment with Pillow/libvips registers that codec
  via ``set_image_codec`` and this module steps aside automatically.

Performance note: the sequential filters (Sub/Average/Paeth) are
unfiltered in a per-byte Python loop — correct and adequate for the
fallback tier (thumbnails, fixtures, smoke decodes). Decode still happens
*inside* the Arrow-batched executor stage, so a cluster decodes in
parallel across payloads even though each payload is pure Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to a uint8 pixel array.

    Returns shape ``(h, w)`` for grayscale, ``(h, w, 3)`` for RGB and
    palette, ``(h, w, 2)`` for gray+alpha, ``(h, w, 4)`` for RGBA.
    Raises ``ValueError`` on anything that is not a supported PNG.
    """
    payload = bytes(payload)
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    channels = _CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported color type {ctype}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")

    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        cur = bytearray(raw[off + 1 : off + 1 + stride])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur

    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette image without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — ``(h, w)`` gray, ``(h, w, 2)`` gray+alpha,
    ``(h, w, 3)`` RGB, or ``(h, w, 4)`` RGBA — as a filter-0 PNG (the
    same minimal emitter shape as the rasterizer's sinks._png_bytes)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        ctype, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        ctype = {2: 4, 3: 2, 4: 6}[a.shape[2]]
        channels = a.shape[2]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, PNG in → PNG out — the fallback
    implementation of the multimodal resize contract (pixel-center
    sampling; a registered Pillow/libvips codec supplies real
    resampling filters)."""
    if width < 1 or height < 1:
        raise ValueError(f"target dimensions must be >= 1, got {width}x{height}")
    px = decode_png(payload)
    h, w = px.shape[0], px.shape[1]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return encode_png(px[rows][:, cols])
