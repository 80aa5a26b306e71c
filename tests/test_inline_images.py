"""BI/ID/EI inline images: tokenizer lift, length determination (/L,
computed, EI-delimiter search), abbreviation expansion, interpreter
placement, media-table rows, and golden span parity over the forced-inline
envelope. Reference: pdfium renders inline images for docprompt transparently
(docprompt rasterize.py); here they are first-class media spans."""

import hashlib
import zlib

import numpy as np
import pytest

from docprompt_spark import corpus, multimodal, pdfparse


def test_tokenizer_lifts_inline_image_raw():
    # 4x2 gray8, unfiltered: length computed from W*H*BPC
    samples = bytes(range(8))
    content = (
        b"q 96 0 0 48 100 500 cm BI /W 4 /H 2 /BPC 8 /CS /G ID\n"
        + samples
        + b" EI Q\nBT ET"
    )
    toks = pdfparse._tokenize_content(content)
    iis = [t for t in toks if type(t) is pdfparse.InlineImage]
    assert len(iis) == 1
    ii = iis[0]
    assert ii.raw == samples
    assert ii.dict["Width"] == 4 and ii.dict["Height"] == 2
    assert ii.dict["BitsPerComponent"] == 8
    assert str(ii.dict["ColorSpace"]) == "DeviceGray"
    # tokens after EI still parse (Q, BT, ET survive)
    ops = [t for t in toks if isinstance(t, pdfparse.Op)]
    assert pdfparse.Op(b"BT") in ops and pdfparse.Op(b"ET") in ops


def test_inline_flate_with_L_length():
    samples = bytes((i * 37) % 256 for i in range(64))
    payload = zlib.compress(samples, 6)
    content = (
        b"BI /W 8 /H 8 /BPC 8 /CS /G /F /Fl /L "
        + str(len(payload)).encode()
        + b" ID\n"
        + payload
        + b" EI"
    )
    (ii,) = pdfparse.inline_images(content)
    assert ii.raw == payload
    assert str(ii.dict["Filter"]) == "FlateDecode"
    assert zlib.decompress(ii.raw) == samples


def test_inline_flate_ei_search_without_L():
    """No /L: the reader must find the ws-EI-ws delimiter."""
    samples = bytes((i * 11) % 256 for i in range(48))
    payload = zlib.compress(samples, 6)
    assert b" EI " not in payload  # this payload can use the search path
    content = b"BI /W 6 /H 8 /BPC 8 /CS /G /F /Fl ID\n" + payload + b"\nEI\nQ"
    (ii,) = pdfparse.inline_images(content)
    assert zlib.decompress(ii.raw) == samples


def test_inline_ccitt_with_decodeparms():
    from docprompt_spark import ccitt

    bits = (np.arange(16 * 8).reshape(8, 16) % 3 == 0).astype(np.uint8)
    payload = ccitt.encode(bits)
    content = (
        b"BI /W 16 /H 8 /BPC 1 /CS /G /F /CCF"
        b" /DP << /K -1 /Columns 16 /Rows 8 /BlackIs1 true >> /L "
        + str(len(payload)).encode()
        + b" ID\n" + payload + b" EI"
    )
    (ii,) = pdfparse.inline_images(content)
    assert str(ii.dict["Filter"]) == "CCITTFaxDecode"
    dp = ii.dict["DecodeParms"]
    assert dp["K"] == -1 and dp["Columns"] == 16 and dp["BlackIs1"] is True
    codec = multimodal._codec_of(ii.dict, lambda x: x)
    assert codec == "ccitt-g4"
    px = multimodal.decode_image(ii.raw, 16, 8, codec)
    assert np.array_equal(px, ((1 - bits) * 255).astype(np.uint8))


def test_interpreter_places_inline_image():
    samples = bytes(range(8))
    content = (
        b"q 96 0 0 48 100 500 cm BI /W 4 /H 2 /BPC 8 /CS /G ID\n"
        + samples
        + b" EI Q"
    )
    words, images, _vecs = pdfparse._interpret_content(
        content, fonts={}, xobjects={}, resolve=lambda x: x,
        page_w=612.0, page_h=792.0, with_image_data=True,
    )
    assert len(images) == 1
    im = images[0]
    assert im["media_ref"] == hashlib.md5(samples).hexdigest()
    assert im["px_w"] == 4 and im["px_h"] == 2
    assert im["codec"] == "gray8"
    x0, top, x1, bottom = im["bbox"]
    assert 0 <= x0 < x1 <= 1 and 0 <= top < bottom <= 1


def test_forced_inline_envelope_spans_match_golden():
    """gen_doc(envelope='inline') writes EVERY image as BI/ID/EI; the
    parse must reproduce the generator's golden span sequence exactly."""
    for idx in range(6):
        doc = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="inline")
        pages = pdfparse.extract_pages(doc["pdf"])
        from docprompt_spark import kernels

        page_results = []
        for p in pages:
            layout = kernels.build_page_layout(p["words"])
            spans = kernels.assemble_page_spans(layout, p["images"])
            page_results.append(
                {"page_number": p["page_number"],
                 "page_text": layout["page_text"], "spans": spans}
            )
        got = kernels.assemble_doc_spans(page_results)
        want = doc["spans"]
        assert got == want, f"doc {idx}: span mismatch"


def test_default_rotation_mixes_inline_and_xobject():
    n_inline = n_xobj = 0
    for idx in range(40):
        doc = corpus.gen_doc(idx, seed=42, skew_every=0)
        pf = pdfparse.PdfFile(doc["pdf"])
        for i in range(pf.page_count):
            page = pf.resolve(pf.page_refs[i])
            res = pf._inherited(page, "Resources") or {}
            xobjs = pf.resolve(res.get("XObject", {})) or {}
            n_xobj += sum(
                1 for r in xobjs.values()
                if pf.resolve(r).dict.get("Subtype") == "Image"
            )
            contents = pf.resolve(page.get("Contents"))
            if contents is None:
                continue
            data = (
                b"\n".join(pf.resolve(c).data(pf.resolve) for c in contents)
                if isinstance(contents, list)
                else contents.data(pf.resolve)
            )
            n_inline += len(pdfparse.inline_images(data))
    assert n_inline > 0 and n_xobj > 0
