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


def test_non_nominal_at_pixels_raise():
    import struct

    page_info = struct.pack(">IIIIBH", 4, 4, 0, 0, 0, 0)
    # flags: MMR=0, GBTEMPLATE=1 (bits 1-2) with a NON-nominal AT pixel
    # (5,-1) -> declared out of scope, must raise (never mis-decode)
    region = (
        struct.pack(">IIIIB", 4, 4, 0, 0, 0)
        + bytes([0x02])
        + bytes([5, 0xFF])
    )
    data = (
        jbig2._segment_header(0, jbig2.SEG_PAGE_INFO, 1, len(page_info))
        + page_info
        + jbig2._segment_header(1, jbig2.SEG_IMM_GENERIC, 1, len(region))
        + region
    )
    with pytest.raises(ValueError, match="AT"):
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


# ---------------------------------------------------------------------------
# Symbol dictionaries + text regions (T.88 §6.4-6.5, Annex A)
# ---------------------------------------------------------------------------

def _coder_pair():
    from docprompt_spark.mq import MQDecoder, MQEncoder

    return MQEncoder, MQDecoder


def test_arith_int_roundtrip_bucket_edges():
    """Annex A.2 IAx: every bucket boundary, signs, OOB — one shared
    codestream + context space, like a real segment."""
    MQEncoder, MQDecoder = _coder_pair()
    values = [
        0, 1, 2, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 4437,
        100000, 2**31 - 1,
    ]
    values += [-v for v in values if v] + [jbig2._OOB, 7, jbig2._OOB, -7]
    enc = MQEncoder(1)
    cx = jbig2._new_cx(512)
    for v in values:
        jbig2._int_encode(enc, cx, v)
    data = enc.flush()
    dec = MQDecoder(data, 1)
    cx = jbig2._new_cx(512)
    got = [jbig2._int_decode(dec, cx) for _ in values]
    assert got == values


@pytest.mark.parametrize("n_syms", [1, 2, 3, 4, 5, 8, 9, 16, 100])
def test_iaid_roundtrip_every_id(n_syms):
    MQEncoder, MQDecoder = _coder_pair()
    scl = jbig2._symcodelen(n_syms)
    ids = list(range(n_syms)) * 3
    enc = MQEncoder(1)
    cx = jbig2._new_cx(1 << (scl + 1))
    for i in ids:
        jbig2._iaid_encode(enc, cx, scl, i)
    dec = MQDecoder(enc.flush(), 1)
    cx = jbig2._new_cx(1 << (scl + 1))
    assert [jbig2._iaid_decode(dec, cx, scl) for _ in ids] == ids


def test_symbol_dict_roundtrip_mixed_sizes():
    """Height classes with IADH/IADW deltas; one MQ codestream codes every
    symbol bitmap through a shared GB context set (§6.5.8.2.1)."""
    rng = np.random.default_rng(11)
    sizes = [(3, 5), (3, 7), (4, 4), (4, 9), (4, 9), (7, 2), (12, 20)]
    syms = [(rng.integers(0, 2, size=s)).astype(np.uint8) for s in sizes]
    out = jbig2.decode_symbol_dict(jbig2.encode_symbol_dict(syms))
    assert len(out) == len(syms)
    for a, b in zip(out, syms):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
@pytest.mark.parametrize("transposed", [False, True])
def test_text_region_all_refcorners(refcorner, transposed):
    """§6.4.5 CURS bookkeeping: every REFCORNER × TRANSPOSED combination
    places symbols at their exact top-left pixels."""
    rng = np.random.default_rng(13 + refcorner)
    syms = [(rng.integers(0, 2, size=(h, w))).astype(np.uint8)
            for h, w in [(4, 6), (5, 3), (4, 6), (2, 2)]]
    placements = [(0, 1, 1), (1, 12, 0), (2, 20, 3), (3, 1, 9), (0, 14, 8),
                  (3, 25, 9)]
    W, H = 32, 16
    want = np.zeros((H, W), np.uint8)
    for si, x, y in placements:
        s = syms[si]
        want[y:y + s.shape[0], x:x + s.shape[1]] |= s
    tr = jbig2.encode_text_region(
        syms, placements, W, H, refcorner=refcorner, transposed=transposed)
    rx, ry, got = jbig2.decode_text_region(tr, syms)
    assert (rx, ry) == (0, 0)
    assert np.array_equal(got, want)


def test_symbol_text_full_stream():
    """Full embedded stream: page info + symbol dict + text region + EOP;
    dictionary order is (height, width)-sorted while placements stay in
    input order."""
    rng = np.random.default_rng(17)
    syms = [(rng.integers(0, 2, size=s)).astype(np.uint8)
            for s in [(9, 4), (3, 11), (6, 6)]]  # deliberately unsorted
    placements = [(2, 0, 0), (0, 20, 2), (1, 40, 5), (2, 60, 8), (1, 8, 12)]
    W, H = 72, 22
    want = np.zeros((H, W), np.uint8)
    for si, x, y in placements:
        s = syms[si]
        want[y:y + s.shape[0], x:x + s.shape[1]] |= s
    data = jbig2.encode_symbol_text(syms, placements, W, H)
    segs = jbig2.parse_segments(data)
    assert [s.seg_type for s in segs] == [
        jbig2.SEG_PAGE_INFO, jbig2.SEG_SYMBOL_DICT,
        jbig2.SEG_IMM_LOSSLESS_TEXT, jbig2.SEG_END_OF_PAGE,
    ]
    assert tuple(segs[2].referred) == (1,)
    assert np.array_equal(jbig2.decode(data), want)


def test_gray8_symbols_matches_threshold():
    """Tile-symbol coding is lossless over the thresholded raster: decode
    == the same np.where the CCITT/JBIG2-generic paths guarantee."""
    rng = np.random.default_rng(19)
    arr = (rng.integers(0, 256, size=(16, 24))).astype(np.uint8)
    data = jbig2.encode_gray8_symbols(arr)
    back = jbig2.decode_to_gray8(data, 24, 16)
    assert np.array_equal(back, np.where(arr < 128, 0, 255).astype(np.uint8))
    # and the stream really is symbol-coded
    types = [s.seg_type for s in jbig2.parse_segments(data)]
    assert jbig2.SEG_SYMBOL_DICT in types and jbig2.SEG_IMM_LOSSLESS_TEXT in types


def test_symbol_dict_rejects_huffman_and_refinement():
    import struct as _struct

    for flags in (1, 2):  # SDHUFF / SDREFAGG
        data = _struct.pack(">H", flags) + jbig2._NOMINAL_AT + _struct.pack(">II", 0, 0)
        with pytest.raises(ValueError):
            jbig2.decode_symbol_dict(data)


@pytest.mark.parametrize("tpgdon", [False, True])
def test_tpgdon_roundtrip(tpgdon):
    """§6.2.5.7 typical prediction: SLTP bit per row in the pseudo-pixel
    context (0x9B25 under the pdf.js 16-bit composition), typical rows
    copied not coded — exact either way, flags bit 3 set iff enabled."""
    rng = np.random.default_rng(47)
    bits = np.zeros((40, 64), np.uint8)
    bits[8:10, 4:60] = 1
    bits[20] = (rng.integers(0, 2, 64)).astype(np.uint8)
    bits[21] = bits[20]  # typical row
    data = jbig2.encode_generic_arith(bits, tpgdon=tpgdon)
    segs = jbig2.parse_segments(data)
    gflags = segs[1].data[17]
    assert bool(gflags & 0x08) == tpgdon
    assert np.array_equal(jbig2.decode(data), bits)


def test_tpgdon_wins_on_blank_heavy_ink():
    """On scanned-text-like content (mostly blank/repeated rows) TPGDON
    must not lose to plain coding — that's why producers enable it."""
    rng = np.random.default_rng(49)
    bits = np.zeros((60, 80), np.uint8)
    for r in (10, 11, 12, 30, 31, 32):
        bits[r, 5:75] = (rng.integers(0, 2, 70)).astype(np.uint8)
    bits[40:44] = bits[30:34]  # repeated band: typical rows
    plain = jbig2.encode_generic_arith(bits)
    tp = jbig2.encode_generic_arith(bits, tpgdon=True)
    assert len(tp) < len(plain)
    assert np.array_equal(jbig2.decode(tp), bits)


def test_generic_templates_1_2_3_roundtrip():
    """GB templates 1-3 (§6.2.5.3, nominal AT): bit-exact roundtrip with
    and without TPGDON, context compositions in pdf.js CodingTemplates
    order so streams interoperate with the open readers."""
    import numpy as np

    from docprompt_spark import jbig2

    rng = np.random.RandomState(9)
    for t in (1, 2, 3):
        for tp in (False, True):
            bits = (rng.rand(37, 61) < 0.35).astype(np.uint8)
            bits[::4, :] = 0  # blank rows exercise TPGDON row-skips
            data = jbig2.encode_generic_arith(bits, tpgdon=tp, template=t)
            out = jbig2.decode(data, 61, 37)
            assert np.array_equal(out, bits), (t, tp)


def test_generic_template_flag_bits_on_wire():
    """The segment flags byte carries the template in bits 1-2 and the
    right AT-pixel count follows (4 pairs for template 0, 1 pair for
    templates 1-3)."""
    import numpy as np

    from docprompt_spark import jbig2

    img = np.zeros((16, 16), np.uint8)
    img[4:12, 4:12] = 1
    for t in range(4):
        data = jbig2.encode_generic_arith(img, template=t)
        segs = jbig2.parse_segments(data)
        gen = next(s for s in segs if s.seg_type == 39)
        flags = gen.data[17]
        assert (flags >> 1) & 3 == t
        assert flags & 1 == 0
        n_at = 8 if t == 0 else 2
        assert gen.data[18 : 18 + n_at] == jbig2._NOMINAL_AT_T[t]
        out = jbig2.decode(data, 16, 16)
        assert np.array_equal(out, img)
