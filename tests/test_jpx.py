"""JPEG 2000 lossless 5/3 subset (docprompt_spark.jpx): DWT, EBCOT Tier-1,
tag trees, full codestream, and PDF integration — the engine's last
external-codec stub retired."""

import numpy as np
import pytest

from docprompt_spark import jpx


def test_dwt53_roundtrip_exact():
    rng = np.random.default_rng(0)
    for shape in [(8, 8), (16, 24), (17, 23), (1, 1), (5, 1), (1, 7), (31, 2)]:
        img = rng.integers(0, 256, size=shape).astype(np.int32)
        for levels in (1, 2, 3):
            ll, bands = jpx.dwt53_forward(img, levels)
            assert np.array_equal(jpx.dwt53_inverse(ll, bands), img), (shape, levels)


def test_tier1_roundtrip_all_orientations():
    rng = np.random.default_rng(1)
    for trial in range(24):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ori = int(rng.integers(0, 4))
        mode = trial % 3
        if mode == 0:
            c = rng.integers(-1000, 1001, size=(h, w)).astype(np.int32)
        elif mode == 1:
            c = np.zeros((h, w), np.int32)
            c[int(rng.integers(0, h)), int(rng.integers(0, w))] = 517
        else:
            c = np.zeros((h, w), np.int32)
        data, nbps, _ = jpx.t1_encode(c, ori)
        assert np.array_equal(jpx.t1_decode(data, h, w, ori, nbps), c)


def test_codestream_roundtrip_exact():
    rng = np.random.default_rng(2)
    for shape in [(8, 8), (17, 23), (64, 64), (100, 80)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for levels in (1, 2, 3):
            out = jpx.decode(jpx.encode(img, levels))
            assert np.array_equal(out, img), (shape, levels)


def test_multi_codeblock_band():
    """Band > 64px exercises the code-block grid + tag trees over >1 leaf."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(200, 160), dtype=np.uint8)
    assert np.array_equal(jpx.decode(jpx.encode(img, 1)), img)


def test_structured_images():
    x = np.linspace(0, 255, 80).astype(np.uint8)
    for img in [np.tile(x, (60, 1)), np.full((32, 32), 7, np.uint8),
                np.zeros((16, 16), np.uint8)]:
        assert np.array_equal(jpx.decode(jpx.encode(img, 2)), img)


def test_jp2_box_unwrap():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    cs = jpx.encode(img, 1)
    jp2 = (
        b"\x00\x00\x00\x0cjP  \r\n\x87\n"
        + b"\x00\x00\x00\x14ftypjp2 \x00\x00\x00\x00jp2 "
        + (len(cs) + 8).to_bytes(4, "big") + b"jp2c" + cs
    )
    assert np.array_equal(jpx.decode(jp2), img)


def test_bitstream_deterministic():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    assert jpx.encode(img, 2) == jpx.encode(img, 2)


def test_unsupported_features_raise():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    import struct

    # RLCP progression (SGcod byte 0 = 1) is out of profile
    data = bytearray(jpx.encode(img, 1))
    pos = data.find(struct.pack(">H", 0xFF52))
    data[pos + 4 + 1] = 1
    with pytest.raises(ValueError):
        jpx.decode(bytes(data))
    # scalar-derived quantization (Sqcd & 0x1f == 1) is out of profile
    data = bytearray(jpx.encode(img, 1))
    pos = data.find(struct.pack(">H", 0xFF5C))
    data[pos + 4] = (data[pos + 4] & 0xE0) | 1
    with pytest.raises(ValueError):
        jpx.decode(bytes(data))


def test_pdf_integration_jpx_media_decode():
    from docprompt_spark import corpus, multimodal, pdfparse

    n = 0
    for idx in range(40):
        doc = corpus.gen_doc(idx, seed=42, skew_every=0)
        _, gen_pages = corpus._gen_doc_pages(idx, 42, 0)
        gold = {}
        for page_w, _, images_gt in gen_pages:
            for gt, wrec in zip(images_gt, page_w["images"]):
                gold[gt["media_ref"]] = wrec
        pf = pdfparse.PdfFile(bytes(doc["pdf"]))
        for i in range(pf.page_count):
            for im in pf.extract_page(i, with_image_data=True)["images"]:
                if not im["codec"].startswith("jpx"):
                    continue
                px = multimodal.decode_image(
                    bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
                )
                assert px.tobytes() == gold[im["media_ref"]]["samples"]
                n += 1
    assert n >= 2  # rotation produced JPX figures


def test_rgb_roundtrip_exact():
    rng = np.random.default_rng(4)
    for shape in [(8, 8, 3), (17, 23, 3), (40, 32, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for levels in (1, 2):
            out = jpx.decode(jpx.encode(img, levels))
            assert out.shape == img.shape and np.array_equal(out, img)


def test_rgb_media_decode_reduces_to_luma():
    from docprompt_spark import multimodal

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, size=(12, 20, 3), dtype=np.uint8)
    px = multimodal.decode_image(jpx.encode(rgb, 1), 20, 12, "jpx")
    want = np.clip(
        np.round(
            0.299 * rgb[:, :, 0].astype(np.float64)
            + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(px, want)


def test_rct_roundtrip_exact():
    """Reversible RCT (MCT=1, §G.2): integer-exact forward/inverse, and a
    full RGB codestream with the MCT flag decodes bit-exactly."""
    import numpy as np

    from docprompt_spark import jpx

    rng = np.random.RandomState(31)
    rgb = (rng.rand(24, 40, 3) * 255).astype(np.uint8)
    planes = [rgb[:, :, k].astype(np.int32) - 128 for k in range(3)]
    y, u, v = jpx._rct_forward(*planes)
    r, g, b = jpx._rct_inverse(y, u, v)
    assert all(np.array_equal(a, b_) for a, b_ in zip(planes, (r, g, b)))
    enc = jpx.encode(rgb, levels=2, mct=True)
    # COD SGcod MCT byte flags 1
    i = enc.find(b"\xff\x52")
    assert enc[i + 4 + 4] == 1
    assert np.array_equal(jpx.decode(enc), rgb)
    # MCT exists to decorrelate: on CORRELATED planes (a gradient with
    # small per-channel offsets — the photographic case) it must beat
    # coding the components independently
    gy, gx = np.mgrid[0:24, 0:40]
    lum = (4 * gx + 3 * gy).astype(np.int32)
    corr = np.stack(
        [np.clip(lum + d, 0, 255) for d in (0, 7, 13)], axis=-1
    ).astype(np.uint8)
    assert len(jpx.encode(corr, levels=2, mct=True)) < len(
        jpx.encode(corr, levels=2)
    )


def test_multi_tile_roundtrip():
    """Tile grid (multi-SOT codestream): ragged edge tiles, gray + RGB,
    with and without MCT — all bit-exact, and the stream really carries
    one SOT per tile."""
    import numpy as np

    from docprompt_spark import jpx

    rng = np.random.RandomState(33)
    g = (rng.rand(50, 70) * 255).astype(np.uint8)
    enc = jpx.encode(g, levels=2, tile=(32, 32))
    assert enc.count(b"\xff\x90") == 6  # 2x3 grid
    assert np.array_equal(jpx.decode(enc), g)
    rgb = (rng.rand(36, 40, 3) * 255).astype(np.uint8)
    enc2 = jpx.encode(rgb, levels=2, tile=(18, 20), mct=True)
    assert enc2.count(b"\xff\x90") == 4
    assert np.array_equal(jpx.decode(enc2), rgb)


def test_tiny_edge_tile_zero_size_bands():
    """A 2-row image at 2 decomposition levels yields zero-height bands —
    the packet coder must skip them, not hang (round-5 regression)."""
    import numpy as np

    from docprompt_spark import jpx

    rng = np.random.RandomState(35)
    tiny = (rng.rand(2, 96) * 255).astype(np.uint8)
    assert np.array_equal(jpx.decode(jpx.encode(tiny, levels=2)), tiny)
    tall = (rng.rand(96, 2) * 255).astype(np.uint8)
    assert np.array_equal(jpx.decode(jpx.encode(tall, levels=2)), tall)


def test_irreversible_97_roundtrip_quality():
    """9/7 float wavelet + scalar deadzone quantization (Sqcd=2): bounded
    error that shrinks with the step, deterministic decode-of-encode, and
    a properly flagged codestream (COD transform byte 0)."""
    import numpy as np

    from docprompt_spark import jpx

    rng = np.random.RandomState(51)
    gy, gx = np.mgrid[0:40, 0:56]
    img = np.clip(2 * gx + 3 * gy + rng.randint(0, 16, (40, 56)), 0, 255).astype(np.uint8)
    prev_err = None
    for step in (2.0, 1.0, 0.5):
        enc = jpx.encode(img, levels=2, irreversible=step)
        i = enc.find(b"\xff\x52")
        assert enc[i + 4 + 9] == 0  # 9/7 transform
        dec = jpx.decode(enc)
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        if prev_err is not None:
            assert err <= prev_err  # finer step -> no worse
        prev_err = err
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8
        assert np.array_equal(
            jpx.decode(jpx.encode(img, levels=2, irreversible=step)), dec
        )


def test_irreversible_ict_and_tiles():
    """Lossy color: ICT (not RCT) pairs with 9/7; multi-tile lossy streams
    reconstruct within the same error envelope."""
    import numpy as np

    from docprompt_spark import jpx

    gy, gx = np.mgrid[0:36, 0:40]
    base = np.clip(3 * gx + 2 * gy, 0, 255).astype(np.uint8)
    rgb = np.stack([base, np.roll(base, 3, axis=1), 255 - base], axis=-1)
    enc = jpx.encode(rgb, levels=2, irreversible=1.0, mct=True, tile=(18, 20))
    assert enc.count(b"\xff\x90") == 4
    dec = jpx.decode(enc)
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 8
