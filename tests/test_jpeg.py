"""Baseline JPEG codec (docprompt_spark.jpeg) — ITU-T T.81 from scratch."""

import numpy as np
import pytest

from docprompt_spark import jpeg


def test_flat_image_roundtrips_exactly():
    arr = np.full((16, 24), 77, np.uint8)
    assert (jpeg.decode(jpeg.encode(arr, 95)) == arr).all()


def test_gradient_high_quality_near_lossless():
    arr = np.clip(np.add.outer(np.arange(24) * 3, np.arange(40) * 2), 0, 255).astype(
        np.uint8
    )
    dec = jpeg.decode(jpeg.encode(arr, quality=90))
    assert dec.shape == arr.shape
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= 2


def test_lossy_but_bounded_on_noise():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (17, 23), dtype=np.uint8)
    dec = jpeg.decode(jpeg.encode(arr, 85))
    assert dec.shape == arr.shape
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert float(err.mean()) < 24.0  # random noise is worst-case for DCT


def test_non_multiple_of_8_dims():
    rng = np.random.RandomState(9)
    arr = (rng.randint(0, 32, (13, 9)) * 8).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(arr, 90))
    assert dec.shape == (13, 9)


def test_deterministic_encode():
    arr = np.clip(np.add.outer(np.arange(16), np.arange(16)) * 7, 0, 255).astype(
        np.uint8
    )
    assert jpeg.encode(arr, 85) == jpeg.encode(arr, 85)


def test_quality_controls_size():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    assert len(jpeg.encode(arr, 30)) < len(jpeg.encode(arr, 95))


def test_rejects_non_jpeg_and_unsupported():
    with pytest.raises(ValueError):
        jpeg.decode(b"\x89PNG not jpeg")
    with pytest.raises(ValueError):
        jpeg.encode(np.zeros((4, 4, 3), np.uint8))  # color unsupported


def test_multimodal_dct_path_is_real_now():
    from docprompt_spark import multimodal

    arr = np.clip(np.add.outer(np.arange(16) * 5, np.arange(24) * 3), 0, 255).astype(
        np.uint8
    )
    payload = jpeg.encode(arr, 90)
    dec = multimodal.decode_image(payload, 24, 16, "dct")
    assert dec.shape == (16, 24)
    assert int(np.abs(dec.astype(int) - arr.astype(int)).max()) <= 2


def test_restart_interval_roundtrips_identically():
    """DRI/RSTn streams (scanner-style output) decode to the SAME pixels as
    the restart-free encoding: identical quantized coefficients, only the
    DC prediction resets differ (ADVICE r2: silently-corrupt before)."""
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (24, 40), dtype=np.uint8)  # 3x5 = 15 MCUs
    plain = jpeg.encode(arr, 85)
    for ri in (1, 2, 4, 7):
        with_rst = jpeg.encode(arr, 85, restart_interval=ri)
        assert b"\xff\xdd" in with_rst and with_rst != plain
        assert (jpeg.decode(with_rst) == jpeg.decode(plain)).all()


def test_restart_marker_cycle_wraps_past_d7():
    arr = np.clip(np.add.outer(np.arange(16) * 5, np.arange(96)), 0, 255).astype(
        np.uint8
    )  # 2x12 = 24 MCUs, ri=2 -> 11 RST markers, cycles D0..D7 and wraps
    enc = jpeg.encode(arr, 90, restart_interval=2)
    assert enc.count(b"\xff\xd0") >= 2  # wrapped at least once
    assert (jpeg.decode(enc) == jpeg.decode(jpeg.encode(arr, 90))).all()


def test_color_flat_roundtrips_exactly():
    flat = np.zeros((16, 24, 3), np.uint8)
    flat[:] = (200, 30, 90)
    for sub in (True, False):
        dec = jpeg.decode(jpeg.encode_color(flat, 95, subsample=sub))
        assert dec.shape == (16, 24, 3)
        assert int(np.abs(dec.astype(int) - flat.astype(int)).max()) <= 3


def test_color_gradient_444_near_lossless():
    grad = np.zeros((24, 40, 3), np.uint8)
    grad[:, :, 0] = np.clip(
        np.add.outer(np.arange(24) * 3, np.arange(40) * 2), 0, 255
    )
    grad[:, :, 1] = 128
    grad[:, :, 2] = np.clip(np.arange(40) * 5, 0, 255)[None, :]
    dec = jpeg.decode(jpeg.encode_color(grad, 92, subsample=False))
    err = np.abs(dec.astype(int) - grad.astype(int))
    assert err.max() <= 14 and float(err.mean()) < 3.0


def test_color_odd_sizes_and_subsampling_layouts():
    rng = np.random.RandomState(4)
    for (h, w) in [(1, 1), (7, 9), (8, 16), (17, 31)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (True, False):
            assert jpeg.decode(jpeg.encode_color(img, 85, sub)).shape == (h, w, 3)


def test_color_markers_declare_three_components():
    enc = jpeg.encode_color(np.zeros((8, 8, 3), np.uint8))
    sof_at = enc.find(b"\xff\xc0")
    assert enc[sof_at + 9] == 3  # ncomp
    assert enc[sof_at + 11] == 0x22  # Y sampling 2x2 (4:2:0)
    enc444 = jpeg.encode_color(np.zeros((8, 8, 3), np.uint8), subsample=False)
    sof_at = enc444.find(b"\xff\xc0")
    assert enc444[sof_at + 11] == 0x11


def test_gray_bitstream_unchanged_by_refactor():
    arr = np.clip(np.add.outer(np.arange(16), np.arange(16)) * 7, 0, 255).astype(
        np.uint8
    )
    # deterministic and decodes exactly as before the _emit_block refactor
    assert jpeg.encode(arr, 85) == jpeg.encode(arr, 85)
    assert (jpeg.decode(jpeg.encode(arr, 95)) == jpeg.decode(jpeg.encode(arr, 95))).all()


def test_single_component_scan_ignores_sampling_factors():
    """T.81 SsA.2: a 1-component scan is non-interleaved (MCU = one data
    unit) even if SOF declares 2x2 sampling factors, as external encoders
    sometimes do for grayscale."""
    import numpy as np
    import struct

    from docprompt_spark import jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    data = jpeg.encode(img, quality=90)
    ref = jpeg.decode(data)
    # patch the SOF0 sampling-factor byte 0x11 -> 0x22
    idx = data.find(b"\xff\xc0")
    assert idx >= 0
    (ln,) = struct.unpack(">H", data[idx + 2 : idx + 4])
    payload = bytearray(data[idx + 4 : idx + 2 + ln])
    assert payload[7] == 0x11
    payload[7] = 0x22
    patched = data[: idx + 4] + bytes(payload) + data[idx + 2 + ln :]
    got = jpeg.decode(patched)
    assert np.array_equal(got, ref)


def test_progressive_roundtrip_matches_baseline():
    """encode_progressive produces the same quantized coefficients as the
    baseline encoder, in a 6-scan SOF2 script (spectral selection +
    successive approximation) -> decode must be pixel-identical."""
    import numpy as np

    from docprompt_spark import jpeg

    rng = np.random.default_rng(7)
    for shape in [(8, 8), (17, 23), (64, 64), (40, 100)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for q in (30, 50, 85, 95):
            data = jpeg.encode_progressive(img, q)
            assert b"\xff\xc2" in data  # really SOF2
            assert np.array_equal(jpeg.decode(data), jpeg.decode(jpeg.encode(img, q)))


def test_progressive_structured_images():
    """EOB/ZRL-heavy content: gradients, constants, sparse dots."""
    import numpy as np

    from docprompt_spark import jpeg

    x = np.linspace(0, 255, 80).astype(np.uint8)
    sparse = np.full((64, 64), 128, np.uint8)
    sparse[10, 10] = 255
    sparse[40, 33] = 0
    for img in [
        np.tile(x, (60, 1)),
        np.full((32, 32), 200, np.uint8),
        (np.add.outer(np.arange(50), np.arange(70)) % 256).astype(np.uint8),
        sparse,
    ]:
        for q in (50, 85):
            assert np.array_equal(
                jpeg.decode(jpeg.encode_progressive(img, q)),
                jpeg.decode(jpeg.encode(img, q)),
            )


def test_progressive_bitstream_deterministic():
    import numpy as np

    from docprompt_spark import jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    assert jpeg.encode_progressive(img, 85) == jpeg.encode_progressive(img, 85)
