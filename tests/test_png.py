"""PNG codec (docprompt_spark.png): spec-level round-trips, no image libs."""

import struct
import zlib

import numpy as np
import pytest

from docprompt_spark import png


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_gray_all_filters(filter_type):
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (23, 31), dtype=np.uint8)
    assert (png.decode(png.encode(arr, filter_type)) == arr).all()


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_rgb_all_filters(filter_type):
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (9, 16, 3), dtype=np.uint8)
    assert (png.decode(png.encode(arr, filter_type)) == arr).all()


def test_signature_and_chunks_are_valid():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = png.encode(arr)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks, verify CRCs
    pos = 8
    tags = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF)
        tags.append(tag)
        pos += 12 + length
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def test_multi_idat_decode():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = png.encode(arr)
    # split the single IDAT into two
    pos = 8
    (ihdr_len,) = struct.unpack(">I", data[pos : pos + 4])
    ihdr_end = pos + 12 + ihdr_len
    (idat_len,) = struct.unpack(">I", data[ihdr_end : ihdr_end + 4])
    idat_payload = data[ihdr_end + 8 : ihdr_end + 8 + idat_len]
    half = len(idat_payload) // 2
    chunks = b""
    for part in (idat_payload[:half], idat_payload[half:]):
        crc = zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF
        chunks += struct.pack(">I", len(part)) + b"IDAT" + part + struct.pack(">I", crc)
    rebuilt = data[:ihdr_end] + chunks + data[ihdr_end + 12 + idat_len :]
    assert (png.decode(rebuilt) == arr).all()


def test_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError):
        png.decode(b"JFIF not a png")
    arr = np.zeros((2, 2, 4), dtype=np.uint8)  # RGBA unsupported
    with pytest.raises(ValueError):
        png.encode(arr)
