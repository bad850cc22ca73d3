"""Vendored pure-Python PNG codec (functions/png_codec).

Round-trips cover every supported color type; decode correctness for the
five scanline filters is checked against hand-filtered streams built by
an independent in-test filterer (the codec's encoder only emits filter 0,
so the filter paths need their own adversarial fixtures)."""

import struct
import zlib

import numpy as np
import pytest

from hadoop_jobanalyzer_spark.functions.png_codec import (
    decode_png,
    encode_png,
    resize_nearest,
)


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize(
    "shape",
    [(1, 1), (3, 5), (7, 2, 2), (4, 6, 3), (2, 9, 4)],
    ids=["gray-1x1", "gray", "gray-alpha", "rgb", "rgba"],
)
def test_roundtrip_all_color_types(shape):
    arr = _rng(hash(shape) & 0xFFFF).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape and out.dtype == np.uint8
    assert np.array_equal(out, arr)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Independent encoder applying a chosen filter per scanline —
    forward-filters with plain int math so the codec's unfilterer is
    tested against a second implementation, not itself."""
    h, w = arr.shape[0], arr.shape[1]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(int)
    raw = bytearray()
    prev = [0] * (w * ch)
    for y, f in zip(range(h), filters):
        line = list(flat[y])
        filt = [0] * len(line)
        for i in range(len(line)):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                filt[i] = line[i]
            elif f == 1:
                filt[i] = line[i] - left
            elif f == 2:
                filt[i] = line[i] - up
            elif f == 3:
                filt[i] = line[i] - ((left + up) >> 1)
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                filt[i] = line[i] - pred
        raw.append(f)
        raw.extend(v & 0xFF for v in filt)
        prev = list(flat[y])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3, 4], ids=["gray", "rgb", "rgba"])
def test_all_five_filters_unfilter_exactly(ch):
    shape = (5, 7) if ch == 1 else (5, 7, ch)
    arr = _rng(ch).integers(0, 256, size=shape, dtype=np.uint8)
    payload = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), arr)


def test_palette_images_expand_to_rgb():
    pal = _rng(9).integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = _rng(10).integers(0, 4, size=(3, 5), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 5, 3, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (3, 5, 3)
    assert np.array_equal(out, pal[idx])


def test_corrupt_and_unsupported_inputs_raise_valueerror():
    good = encode_png(np.zeros((2, 2), dtype=np.uint8))
    # flip one IDAT byte -> CRC mismatch
    bad_crc = bytearray(good)
    bad_crc[-20] ^= 0xFF
    cases = [
        b"",
        b"\x89PNG",
        b"not a png at all",
        bytes(bad_crc),
        good[: len(good) // 2],  # truncated
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            decode_png(payload)
    # 16-bit depth and interlace are declared out of scope, not mis-decoded
    for depth, interlace in ((16, 0), (8, 1)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 0, 0, 0, interlace)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(payload)


def _gray_png(idat_body: bytes, w: int = 2, h: int = 2, extra=()) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    mid = b"".join(extra)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + mid
        + _chunk(b"IDAT", idat_body)
        + _chunk(b"IEND", b"")
    )


def test_trns_rejected_not_silently_opaque():
    # a transparent gray PNG must raise (step-aside contract), not decode
    # as opaque pixels the Pillow tier would report as transparent
    raw = b"".join(b"\x00" + bytes([y, y + 1]) for y in range(2))
    payload = _gray_png(zlib.compress(raw), extra=[_chunk(b"tRNS", b"\x00\x01")])
    with pytest.raises(ValueError, match="tRNS"):
        decode_png(payload)
    # other ancillary chunks are ignored, not rejected
    ok = _gray_png(zlib.compress(raw), extra=[_chunk(b"pHYs", b"\x00" * 9)])
    assert decode_png(ok).shape == (2, 2)


def test_idat_bomb_rejected_at_declared_geometry():
    # declared 2x2 gray, but the ~1 KB IDAT inflates to 1 MiB: the capped
    # decompressobj must reject without materializing the expansion
    bomb = zlib.compress(b"\x00" * (1 << 20), 9)
    assert len(bomb) < 2048
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(_gray_png(bomb))
    # corrupt deflate raises ValueError (contract), never a raw zlib.error
    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(_gray_png(b"\x00not-a-deflate-stream"))


def test_resize_nearest_geometry_and_determinism():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_png(resize_nearest(encode_png(arr), 4, 2))
    assert out.shape == (2, 4)
    # pixel-center sampling: rows [2,6], cols [1,3,5,7]
    assert np.array_equal(out, arr[[2, 6]][:, [1, 3, 5, 7]])
    # upscale replicates
    up = decode_png(resize_nearest(encode_png(arr[:2, :2]), 4, 4))
    assert up.shape == (4, 4)
    assert np.array_equal(up[:2, :2], np.full((2, 2), arr[0, 0]))
    with pytest.raises(ValueError):
        resize_nearest(encode_png(arr), 0, 4)
