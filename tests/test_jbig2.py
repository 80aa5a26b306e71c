"""Embedded JBIG2 (T.88 / PDF §7.4.7): MMR generic regions over the shared
T.6 entropy machinery, segment-header walk, and PDF integration."""

import numpy as np
import pytest

from docprompt_spark import jbig2


def test_roundtrip_shapes():
    rng = np.random.default_rng(3)
    for shape in [(8, 16), (20, 33), (64, 64), (1, 1), (5, 100)]:
        bits = (rng.integers(0, 3, size=shape) == 0).astype(np.uint8)
        out = jbig2.decode(jbig2.encode_generic_mmr(bits))
        assert out.shape == bits.shape and np.array_equal(out, bits), shape


def test_segment_stream_structure():
    segs = jbig2.parse_segments(jbig2.encode_generic_mmr(np.ones((4, 4), np.uint8)))
    assert [s.seg_type for s in segs] == [
        jbig2.SEG_PAGE_INFO,
        jbig2.SEG_IMM_LOSSLESS_GENERIC,
        jbig2.SEG_END_OF_PAGE,
    ]
    assert all(s.page == 1 for s in segs)
    assert segs[2].data == b""


def test_region_offset_composites_onto_page():
    """A region placed at (x, y) lands at that offset on the page canvas."""
    import struct

    bits = np.ones((2, 3), np.uint8)
    from docprompt_spark import ccitt

    mmr = ccitt.encode(bits)
    page_info = struct.pack(">IIIIBH", 8, 6, 0, 0, 0, 0)
    region = struct.pack(">IIIIB", 3, 2, 4, 1, 0) + bytes([1]) + mmr
    data = (
        jbig2._segment_header(0, jbig2.SEG_PAGE_INFO, 1, len(page_info))
        + page_info
        + jbig2._segment_header(1, jbig2.SEG_IMM_LOSSLESS_GENERIC, 1, len(region))
        + region
    )
    page = jbig2.decode(data)
    assert page.shape == (6, 8)
    want = np.zeros((6, 8), np.uint8)
    want[1:3, 4:7] = 1
    assert np.array_equal(page, want)


def test_unsupported_gb_template_raises():
    import struct

    page_info = struct.pack(">IIIIBH", 4, 4, 0, 0, 0, 0)
    # flags: MMR=0, GBTEMPLATE=1 (bits 1-2) -> unsupported
    region = struct.pack(">IIIIB", 4, 4, 0, 0, 0) + bytes([0x02]) + b"\x00" * 4
    data = (
        jbig2._segment_header(0, jbig2.SEG_PAGE_INFO, 1, len(page_info))
        + page_info
        + jbig2._segment_header(1, jbig2.SEG_IMM_GENERIC, 1, len(region))
        + region
    )
    with pytest.raises(ValueError, match="template"):
        jbig2.decode(data)


def test_gray8_convenience_matches_ccitt_convention():
    from docprompt_spark import ccitt

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    via_jbig2 = jbig2.decode_to_gray8(jbig2.encode_gray8(arr), 24, 16)
    via_ccitt = ccitt.decode_to_gray8(ccitt.encode_gray8(arr), 24, 16)
    assert np.array_equal(via_jbig2, via_ccitt)


def test_pdf_integration_jbig2_media_decode():
    """Corpus docs with JBIG2 figures: media payloads decode to the
    generator's ground-truth samples through the codec tag."""
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
                if not im["codec"].startswith("jbig2"):
                    continue
                px = multimodal.decode_image(
                    bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
                )
                assert px.tobytes() == gold[im["media_ref"]]["samples"]
                n += 1
    assert n >= 2  # the rotation actually produced JBIG2 figures


def test_mq_coder_roundtrip_stress():
    import random

    from docprompt_spark.mq import MQEncoder, MQDecoder

    rng = random.Random(1)
    for trial in range(60):
        n = rng.randint(1, 2000)
        ncx = rng.choice([1, 16, 512])
        mode = trial % 4
        if mode == 0:
            bits = [int(rng.random() < 0.02) for _ in range(n)]
        elif mode == 1:
            bits = [int(rng.random() < 0.5) for _ in range(n)]
        elif mode == 2:
            bits = [i % 2 for i in range(n)]
        else:
            bits = [1] * n
        cxs = [rng.randrange(ncx) for _ in range(n)]
        enc = MQEncoder(ncx)
        for b, c in zip(bits, cxs):
            enc.encode(b, c)
        data = enc.flush()
        dec = MQDecoder(data, ncx)
        assert [dec.decode(c) for c in cxs] == bits, (trial, n, ncx, mode)


def test_mq_compresses_biased_stream():
    from docprompt_spark.mq import MQEncoder

    enc = MQEncoder(1)
    for _ in range(10000):
        enc.encode(0, 0)
    assert len(enc.flush()) < 10  # ~3 bytes for 10k same-MPS bits


def test_arithmetic_generic_region_roundtrip():
    rng = np.random.default_rng(7)
    for shape in [(8, 16), (20, 33), (64, 64), (1, 1), (16, 100)]:
        bits = (rng.integers(0, 3, size=shape) == 0).astype(np.uint8)
        out = jbig2.decode(jbig2.encode_generic_arith(bits))
        assert np.array_equal(out, bits), shape


def test_arithmetic_beats_mmr_on_text_like_ink():
    text = np.zeros((32, 120), np.uint8)
    for i in range(0, 120, 7):
        text[6:26, i : i + 4] = 1
    a = jbig2.encode_generic_arith(text)
    m = jbig2.encode_generic_mmr(text)
    assert np.array_equal(jbig2.decode(a), text)
    assert len(a) < len(m)


def test_nonnominal_at_raises():
    bits = np.ones((4, 4), np.uint8)
    data = bytearray(jbig2.encode_generic_arith(bits))
    # flip an AT byte inside the generic region segment
    idx = bytes(data).find(jbig2._NOMINAL_AT)
    assert idx > 0
    data[idx] = 5
    with pytest.raises(ValueError, match="nominal"):
        jbig2.decode(bytes(data))
