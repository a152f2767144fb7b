"""PNG codec (ops/multimodal.decode_png / png_from_array): filter
round-trips, palette path, dispatch, and loud failures."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dish_data_pipeline_spark.ops.multimodal import (
    decode_image,
    decode_png,
    decoded_feature_extract,
    png_from_array,
)


def _rng():
    return np.random.RandomState(1234)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(5, 4), (6, 3, 2), (8, 5, 3), (4, 4, 4), (1, 1)]
)
def test_roundtrip_every_filter_every_colortype(filt, shape):
    arr = _rng().randint(0, 256, size=shape).astype(np.uint8)
    back = decode_png(png_from_array(arr, row_filters=filt))
    assert back.shape == arr.shape
    assert (back == arr).all()


def test_roundtrip_mixed_filters_and_dispatch():
    arr = _rng().randint(0, 256, size=(10, 7, 3)).astype(np.uint8)
    blob = png_from_array(arr, row_filters=[y % 5 for y in range(10)])
    assert (decode_png(blob) == arr).all()
    # magic-byte dispatch routes PNGs without PIL
    assert (decode_image(blob) == arr).all()
    feats = decoded_feature_extract([blob])[0]
    assert feats[:3] == [10.0, 7.0, 3.0]
    assert feats[4] == float(arr.min()) and feats[5] == float(arr.max())


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def test_palette_png_decodes_to_rgb():
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    body = bytearray()
    for y in range(2):
        body.append(0)
        body += idx[y].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[0, 1]) == (0, 255, 0)
    assert tuple(out[1, 0]) == (0, 0, 255)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG")
    arr = np.zeros((2, 2), dtype=np.uint8)
    good = png_from_array(arr)
    # 16-bit depth refused loudly
    bad_ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
    bad = good[:8] + bad_ihdr + good[8 + 12 + 13 :]
    with pytest.raises(ValueError, match="only 8-bit"):
        decode_png(bad)
    # truncated raster
    with pytest.raises(ValueError):
        decode_png(
            good[:8]
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="row_filters"):
        png_from_array(arr, row_filters=[0])
    with pytest.raises(ValueError, match="shape"):
        png_from_array(np.zeros((2, 2, 5), dtype=np.uint8))
