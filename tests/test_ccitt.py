"""CCITT Group 4 / ITU-T T.6 codec (docprompt_spark.ccitt).

The mode/run tables are asserted prefix-free at import; these tests pin
hand-computed bit patterns (all-white row = V0; all-black 8px row =
H + white-0 + black-8 codes), torture the coder across mode and makeup
boundaries, and check the PDF integration profile.
"""

import numpy as np
import pytest

from docprompt_spark import ccitt


def _bits(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


def test_all_white_row_is_v0():
    enc = ccitt.encode(np.zeros((1, 8), np.uint8))
    assert _bits(enc).startswith("1" + ccitt.EOFB)


def test_all_black_row_is_horizontal_with_known_codes():
    enc = ccitt.encode(np.ones((1, 8), np.uint8))
    # H(001) + white run 0 (00110101) + black run 8 (000101)
    assert _bits(enc).startswith("001" + "00110101" + "000101")
    assert (ccitt.decode(enc, 8, 1) == 1).all()


def test_vertical_modes_all_offsets():
    # row 2 shifts row 1's single transition by -3..+3 -> every V code
    for d in range(-3, 4):
        img = np.zeros((2, 32), np.uint8)
        img[0, 10:] = 1
        img[1, 10 + d :] = 1
        got = ccitt.decode(ccitt.encode(img), 32, 2)
        assert (got == img).all(), d


def test_pass_mode():
    # ref row has a black island that the coding row skips entirely
    img = np.zeros((2, 40), np.uint8)
    img[0, 8:12] = 1
    img[0, 30:] = 1
    img[1, 30:] = 1
    assert (ccitt.decode(ccitt.encode(img), 40, 2) == img).all()


def test_makeup_code_boundaries():
    # runs crossing 63/64, 1728/1792, 2560 chaining
    for w in (63, 64, 65, 128, 1727, 1728, 1729, 1792, 2559, 2560, 2561, 5200):
        img = np.zeros((1, w + 5), np.uint8)
        img[0, :w] = 1  # black run of exactly w
        assert (ccitt.decode(ccitt.encode(img), w + 5, 1) == img).all(), w
        img2 = np.zeros((1, w + 5), np.uint8)
        img2[0, w:] = 1  # white run of exactly w first
        assert (ccitt.decode(ccitt.encode(img2), w + 5, 1) == img2).all(), w


def test_roundtrip_torture():
    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (5, 8), (13, 64), (64, 64), (40, 257), (3, 2700)]:
        for img in (
            (rng.rand(h, w) < 0.5).astype(np.uint8),
            np.zeros((h, w), np.uint8),
            np.ones((h, w), np.uint8),
            (np.add.outer(np.arange(h), np.arange(w)) % 9 < 4).astype(np.uint8),
        ):
            got = ccitt.decode(ccitt.encode(img), w, h)
            assert (got == img).all(), (h, w)


def test_compresses_structured_scans():
    img = np.zeros((64, 512), np.uint8)
    img[10:20, 50:400] = 1
    img[30:32, :] = 1
    enc = ccitt.encode(img)
    assert len(enc) < 64 * 512 // 8 / 4  # far below raw bilevel


def test_truncated_stream_raises():
    img = (np.random.RandomState(1).rand(8, 64) < 0.5).astype(np.uint8)
    enc = ccitt.encode(img)
    with pytest.raises(ValueError):
        ccitt.decode(enc[: len(enc) // 3], 64, 8)


def test_gray8_profile():
    rng = np.random.RandomState(2)
    g = (rng.rand(24, 40) * 255).astype(np.uint8)
    back = ccitt.decode_to_gray8(ccitt.encode_gray8(g), 40, 24)
    assert ((back == 0) == (g < 128)).all()
    assert set(np.unique(back)) <= {0, 255}


def test_pdf_integration_media_ref_and_decode():
    """A forced-CCITT corpus doc parses; its media payloads decode to the
    generator's ground-truth samples via the multimodal codec path."""
    from docprompt_spark import multimodal, pdfparse
    from docprompt_spark.corpus import gen_doc, golden_page_layouts

    # find a doc with images under the forced codec
    idx = next(
        i for i in range(30)
        if any(
            im
            for _, _, _, imgs in [
                next(iter(golden_page_layouts(1, seed=200 + i, skew_every=0)))
            ]
            for im in imgs
        )
    )
    seed = 200 + idx
    doc = gen_doc(0, seed=seed, skew_every=0, envelope="ccitt")
    pages = pdfparse.extract_pages(bytes(doc["pdf"]), with_image_data=True)
    gold = {
        im["media_ref"]: im
        for _, _, _, imgs in golden_page_layouts(
            1, seed=seed, skew_every=0, img_codec="ccitt"
        )
        for im in imgs
    }
    n = 0
    for p in pages:
        for im in p["images"]:
            # the corpus rotates some CCITT figures as /ImageMask stencils
            # ((base>>5)%2): same payload/decode, compositing-only flag
            assert im["codec"] in ("ccitt-g4", "ccitt-g4;mask")
            g = gold[im["media_ref"]]
            px = multimodal.decode_image(
                bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
            )
            assert px.tobytes() == g["samples"]
            n += 1
    assert n >= 1


def test_g3_1d_roundtrip_and_known_codes():
    """T.4 one-dimensional (K=0 /Modified Huffman) rows: round-trip with
    and without EOL prefixes; all-black 8px row = white-0 + black-8."""
    rng = np.random.RandomState(5)
    for h, w in [(1, 8), (3, 64), (16, 257), (4, 2600)]:
        for img in (
            (rng.rand(h, w) < 0.5).astype(np.uint8),
            np.zeros((h, w), np.uint8),
            np.ones((h, w), np.uint8),
        ):
            for eol in (True, False):
                enc = ccitt.encode_g3_1d(img, with_eol=eol)
                assert (ccitt.decode_g3_1d(enc, w, h) == img).all()
    enc = ccitt.encode_g3_1d(np.ones((1, 8), np.uint8), with_eol=False)
    assert _bits(enc).startswith("00110101" + "000101")
    enc = ccitt.encode_g3_1d(np.ones((1, 8), np.uint8), with_eol=True)
    assert _bits(enc).startswith(ccitt.EOL)


def test_g3_mixed_mode_roundtrip_all_k():
    """T.4 mixed 1D/2D (/K k): EOL + tag bit per row, k-1 consecutive 2-D
    rows per 1-D anchor; round-trips for every k and image class."""
    rng = np.random.RandomState(8)
    for k in (1, 2, 4, 8):
        for h, w in [(1, 8), (5, 64), (17, 257)]:
            for img in (
                (rng.rand(h, w) < 0.5).astype(np.uint8),
                np.zeros((h, w), np.uint8),
                np.ones((h, w), np.uint8),
            ):
                enc = ccitt.encode_g3_mixed(img, k=k)
                assert (ccitt.decode_g3_mixed(enc, w, h) == img).all(), (k, h, w)
    # k=1: every row tagged 1-D
    enc = ccitt.encode_g3_mixed(np.zeros((3, 16), np.uint8), k=1)
    assert _bits(enc).startswith(ccitt.EOL + "1")
    with pytest.raises(ValueError):
        ccitt.encode_g3_mixed(np.zeros((2, 4), np.uint8), k=0)
    with pytest.raises(ValueError):
        ccitt.decode_g3_mixed(b"\xff\xff", 4, 1)  # no EOL


def test_g4_bitstream_stable_after_row_coder_refactor():
    img = (np.add.outer(np.arange(9), np.arange(33)) % 7 < 3).astype(np.uint8)
    enc = ccitt.encode(img)
    # pinned digest: G4 output bytes must never drift (corpus media_refs
    # content-address these exact payloads)
    import hashlib

    assert (ccitt.decode(enc, 33, 9) == img).all()
    assert hashlib.md5(enc).hexdigest() == "59cc01c889d12c255795677e5ab8d05d"
