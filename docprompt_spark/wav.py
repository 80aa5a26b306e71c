"""RIFF/WAVE PCM codec + audio feature kernels — from scratch (struct+numpy).

The multimodal surface treats audio as opaque binary columns with typed
metadata; this module makes the decode step REAL for PCM WAV (the lossless
audio analog of the raw/Flate image paths): RIFF chunk walk, fmt parsing
(PCM, 8/16-bit, mono/stereo), sample extraction, and the standard analysis
features a training-data pipeline computes (duration, RMS, zero-crossing
rate, peak). Compressed codecs (MP3/AAC) would need external libraries and
are rejected explicitly, mirroring the image-side JPX policy.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim != 1:
        raise ValueError("mono 1-D int16 samples only")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode(data: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (float64 samples in [-1, 1] mono-mixed,
    sample_rate). Handles 8-bit unsigned and 16-bit signed PCM, any channel
    count (averaged to mono)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _bps, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM audio format {audio_format} needs external codecs")
    if bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels).mean(axis=1)
    return arr, rate


def features(data: bytes) -> dict:
    """Standard analysis features over a PCM WAV payload."""
    samples, rate = decode(data)
    n = len(samples)
    duration = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    peak = float(np.abs(samples).max()) if n else 0.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(np.int8))))) if n > 1 else 0.0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "duration_sec": duration,
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zc,
    }
