"""RIFF/WAVE codec (docprompt_spark.wav)."""

import numpy as np
import pytest

from docprompt_spark import wav


def test_roundtrip_16bit_mono():
    rng = np.random.RandomState(2)
    samples = (rng.randn(1000) * 8000).astype(np.int16)
    data = wav.encode(samples, 16000)
    dec, rate = wav.decode(data)
    assert rate == 16000
    assert len(dec) == 1000
    assert np.allclose(dec, samples / 32768.0)


def test_8bit_and_stereo_decode():
    import struct

    # hand-build an 8-bit stereo WAV: 4 frames, L=R
    raw = bytes([128, 128, 255, 255, 0, 0, 192, 192])
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    data = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    dec, rate = wav.decode(data)
    assert rate == 8000 and len(dec) == 4
    assert abs(dec[0]) < 1e-9 and dec[1] > 0.9 and dec[2] < -0.9


def test_features_shape():
    t = np.arange(8000) / 8000.0
    sig = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    f = wav.features(wav.encode(sig, 8000))
    assert f["sample_rate"] == 8000
    assert abs(f["duration_sec"] - 1.0) < 1e-9
    assert 0.4 < f["rms"] < 0.5  # amplitude 20000/32768 = 0.61; sine rms = 0.61/sqrt(2) = 0.432
    assert f["zero_crossing_rate"] > 0


def test_rejects_non_wav_and_compressed():
    with pytest.raises(ValueError):
        wav.decode(b"ID3 not a wav stream")
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # format 85 = MP3
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 0)
    data = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    with pytest.raises(ValueError):
        wav.decode(data)
