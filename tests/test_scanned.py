"""Scanned-document profile: a full-page scan image under an INVISIBLE
text layer (text rendering mode 3, §9.3.6) — the shape OCR
post-processors emit and the most common real-world scanned PDF.
Extraction keeps the invisible text (pdfium's text extraction does, so
the reference sees it); rasterization must leave it unpainted."""

import hashlib

import numpy as np
import pytest

from docprompt_spark import kernels, multimodal, pdfparse, rasterize
from docprompt_spark.corpus import (
    _gen_doc_pages,
    _scanned_page_overlay,
    gen_doc,
)
from tests.test_pdf_roundtrip import spans_from_pdf


@pytest.mark.parametrize("idx", list(range(6)))
def test_scanned_envelope_spans_match_golden(idx):
    # invisible text + the full-page scan media span, both in the golden
    # sequence (span-sequence equality, the north-rule contract)
    d = gen_doc(idx, skew_every=0, envelope="scanned")
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert spans_from_pdf(raw) == d["spans"]
    # the scan is the top-left-most media span of each page
    assert any(s["kind"] == "media" for s in d["spans"])


def test_tr3_words_carry_invisible_flag():
    d = gen_doc(0, skew_every=0, envelope="scanned")
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    for p in pdfparse.extract_pages(raw):
        assert p["words"] and all(w["inv"] for w in p["words"])
    # the default corpus text stays visible
    d0 = gen_doc(0, skew_every=0)
    p0 = pdfparse.extract_pages(pdfparse.unwrap_pdf_bytes(d0["pdf"]))[0]
    assert p0["words"] and not any(w.get("inv") for w in p0["words"])


def _parser_raster(raw: bytes, page_i: int = 0):
    pf = pdfparse.PdfFile(raw)
    glyphs = pf.glyph_outline_pool()
    pg = pf.extract_page(page_i, with_image_data=True)
    imgs = [
        {
            "bbox": im["bbox"],
            "pixels": multimodal.decode_image(
                bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
            ),
            "stencil": multimodal.is_stencil(im["codec"]),
        }
        for im in pg["images"]
    ]
    layout = kernels.build_page_layout(pg["words"])
    wds = rasterize.layout_words(layout)
    visible = not (pg["words"] and all(w.get("inv") for w in pg["words"]))
    return rasterize.render_page(
        wds, imgs, pg["width"], pg["height"],
        glyphs=glyphs, vectors=pg.get("vectors"), paint_text=visible,
    ), wds


@pytest.mark.parametrize("idx", [0, 1])  # even: CCITT G4 scan; odd: DCT
def test_scanned_raster_matches_generator_ground_truth(idx):
    d = gen_doc(idx, skew_every=0, envelope="scanned")
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    got, wds = _parser_raster(raw)

    _, pages = _gen_doc_pages(idx, 42, 0, tiles=False)  # scanned envelope: no tile slice
    page, words_gt, images_gt = pages[0]
    _scanned_page_overlay(idx, 0, page, images_gt)
    gt_imgs = [
        {
            "bbox": im["bbox"],
            "pixels": np.frombuffer(w["samples"], np.uint8).reshape(
                w["height"], w["width"]
            ),
            "stencil": bool(w.get("imagemask")),
        }
        for im, w in zip(images_gt, page["images"])
    ]
    gl = kernels.build_page_layout(words_gt)
    gt = rasterize.render_page(
        rasterize.layout_words(gl), gt_imgs,
        vectors=page.get("vectors_gt"), paint_text=False,
    )
    assert hashlib.md5(got.tobytes()).hexdigest() == hashlib.md5(gt.tobytes()).hexdigest()
    # and the invisible layer genuinely leaves no ink: painting it changes
    # the canvas
    painted = rasterize.render_page(
        rasterize.layout_words(gl), gt_imgs,
        vectors=page.get("vectors_gt"),
    )
    assert (
        hashlib.md5(painted.tobytes()).hexdigest()
        != hashlib.md5(gt.tobytes()).hexdigest()
    )
    # masking still targets the (invisible) word boxes — resumable redaction
    masked = rasterize.mask_bboxes(got, [w["bbox"] for w in wds])
    assert (masked != got).any()


def test_tr_mode_saved_and_restored_by_q_Q():
    # Tr is graphics state: q ... 3 Tr ... Q restores visibility
    from docprompt_spark.pdfwrite import write_pdf

    _, pages = _gen_doc_pages(2, 42, 0)
    pages_w = [p for p, _w, _i in pages]
    pdf = write_pdf(pages_w, doc_title="t")
    # splice a q/3 Tr/Q around nothing before the text: visibility must
    # be unaffected (the content stream is raw on idx 2... instead test
    # the interpreter directly)
    content = b"q 3 Tr Q BT /F1 10 Tf 1 0 0 1 72 700 Tm (hi) Tj ET"
    out = pdfparse._interpret_content(
        content,
        fonts={"F1": {"widths": {}, "dw": 500.0, "glyphmap": {},
                      "ascent": 800.0, "descent": -200.0, "type0": False}},
        xobjects={}, resolve=lambda x: x, page_w=612.0, page_h=792.0,
    )
    words = out[0]
    assert [w["text"] for w in words] == ["hi"]
    assert not words[0]["inv"]
