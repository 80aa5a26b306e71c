"""Real, dependency-free PNG codec (zlib + numpy only).

The container has no image libraries, but PNG is just zlib behind chunk
framing and per-row filters — all implementable from the public spec
(RFC 2083 / W3C PNG). This gives the multimodal pipeline a REAL codec for
lossless artifacts:

* :func:`encode` — grayscale (h,w) or RGB (h,w,3) uint8 -> PNG bytes
  (8-bit, non-interlaced, any of the 5 row filters; default 0)
* :func:`decode` — PNG bytes -> numpy array; handles color types 0 (gray)
  and 2 (RGB), bit depth 8, all 5 row filters, multi-IDAT; rejects
  interlaced/paletted images explicitly.

The reference library gets this from PIL (rasterize.py); this is the
from-scratch equivalent for the subset the pipeline emits.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 grayscale (h,w) or RGB (h,w,3) -> PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    bpp = channels
    rows = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for r in range(h):
        row = raw[r]
        rows.append(filter_type)
        if filter_type == 0:  # None
            filt = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = (
                row.astype(np.int16)
                - ((left.astype(np.int16) + prev.astype(np.int16)) >> 1)
            ).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            filt = (row.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        else:
            raise ValueError(f"bad filter {filter_type}")
        rows += filt.tobytes()
        prev = row
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    a16, b16, c16 = a.astype(np.int16), b.astype(np.int16), c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out


def decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h,w) for grayscale, (h,w,3) for RGB."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + payload + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if color_type not in (0, 2):
        raise ValueError(f"unsupported color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = 1 if color_type == 0 else 3
    bpp = channels
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub — sequential in-row dependency
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad row filter {ft}")
        out[r] = row
        prev = out[r]
    if channels == 1:
        return out
    return out.reshape(height, width, 3)
