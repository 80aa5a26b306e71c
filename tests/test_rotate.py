"""Page /Rotate (PDF §7.7.3.3) — the scanner profile: documents STORED
sideways/upside-down with the upright-correction /Rotate on the page-tree
root (inheritable). The writer pre-rotates every placement into the stored
frame (canceling Tm for text, rotated cm for images, point-mapped vector
paths); the parser composes the viewing rotation into the base CTM — the
same flip pdfium composes into its device matrix before rendering, which
is how the reference (docprompt schema/document.py rasterization +
provider OCR) sees rotated scans upright.

On the corpus's dyadic coordinate grid the round-trip is bit-exact:
spans, layouts and raster md5s are rotation-INVARIANT, which these tests
pin for all three angles across envelopes, font formats and form
XObjects."""

import hashlib

import numpy as np
import pytest

from docprompt_spark import kernels, multimodal, pdfparse, rasterize
from docprompt_spark.corpus import gen_doc
from docprompt_spark.pdfparse import _image_bbox, _page_rotation_ctm
from tests.test_pdf_roundtrip import spans_from_pdf


def _unwrap(b: bytes) -> bytes:
    return pdfparse.unwrap_pdf_bytes(b)


@pytest.mark.parametrize("idx", list(range(9)))
def test_rotated_envelope_spans_match_golden(idx):
    # envelope="rotated" cycles 90/180/270 over classic and xref-stream
    # envelopes; goldens are computed in the VISUAL frame and must match
    # bit-exactly (span-sequence equality, the north-rule contract)
    d = gen_doc(idx, skew_every=0, envelope="rotated")
    assert spans_from_pdf(_unwrap(d["pdf"])) == d["spans"]


@pytest.mark.parametrize("rot", [90, 180, 270])
def test_rotation_is_span_invariant_vs_unrotated_twin(rot):
    # same document authored upright and rotated: identical spans
    from docprompt_spark.corpus import _gen_doc_pages
    from docprompt_spark.pdfwrite import write_pdf

    _, pages = _gen_doc_pages(5, 42, 0)
    pages_w = [p for p, _w, _i in pages]
    upright = write_pdf(pages_w, doc_title="t")
    rotated = write_pdf(pages_w, doc_title="t", rotate=rot)
    assert spans_from_pdf(upright) == spans_from_pdf(rotated)


@pytest.mark.parametrize("rot", [90, 270])
def test_visual_dims_swap(rot):
    from docprompt_spark.corpus import _gen_doc_pages
    from docprompt_spark.pdfwrite import write_pdf

    _, pages = _gen_doc_pages(0, 42, 0)
    pages_w = [p for p, _w, _i in pages]
    pg = pdfparse.extract_pages(write_pdf(pages_w, doc_title="t", rotate=rot))[0]
    # visual frame: 612x792 portrait regardless of the stored orientation
    assert (pg["width"], pg["height"]) == (612.0, 792.0)
    raw = write_pdf(pages_w, doc_title="t", rotate=rot)
    # the stored MediaBox is landscape and /Rotate rides the page-tree ROOT
    assert b"/MediaBox [0 0 792 612]" in raw
    assert raw.count(b"/Rotate") == 1


def test_rotate_inherited_from_pages_root():
    # multi-page doc: ONE /Rotate on the root corrects every page via the
    # inheritance walk (no per-page /Rotate entries)
    d = gen_doc(2, skew_every=0, envelope="rotated")  # idx 2 -> 270, classic
    raw = _unwrap(d["pdf"])
    assert raw.count(b"/Rotate 270") == 1
    assert spans_from_pdf(raw) == d["spans"]


@pytest.mark.parametrize("rot", [90, 180, 270])
def test_rotated_raster_md5_invariant(rot):
    # rasters (canvas + masked) are bit-identical to the upright twin:
    # text, decoded images, vector art and stencils all compose through
    # the viewing CTM back to the same device pixels
    from docprompt_spark.corpus import _gen_doc_pages
    from docprompt_spark.pdfwrite import write_pdf

    _, pages = _gen_doc_pages(3, 11, 0)  # idx 3 carries images + vectors
    pages_w = [p for p, _w, _i in pages]

    def digests(pdf_bytes):
        pf = pdfparse.PdfFile(pdf_bytes)
        glyphs = pf.glyph_outline_pool()
        out = []
        for i in range(pf.page_count):
            pg = pf.extract_page(i, with_image_data=True)
            imgs = []
            for im in pg["images"]:
                px = multimodal.decode_image(
                    bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
                )
                imgs.append(
                    {
                        "bbox": im["bbox"],
                        "pixels": px,
                        "stencil": multimodal.is_stencil(im["codec"]),
                    }
                )
            layout = kernels.build_page_layout(pg["words"])
            wds = rasterize.layout_words(layout)
            canvas = rasterize.render_page(
                wds, imgs, pg["width"], pg["height"],
                glyphs=glyphs, vectors=pg.get("vectors"),
            )
            out.append(hashlib.md5(canvas.tobytes()).hexdigest())
        return out

    upright = digests(write_pdf(pages_w, doc_title="t"))
    rotated = digests(write_pdf(pages_w, doc_title="t", rotate=rot))
    assert upright == rotated


def test_image_bbox_rotated_ctm_quad():
    # non-axis-aligned placement: bbox of the transformed unit square
    # (a 90-degree cm: unit image spans [x-h, x] x [y, y+w] visually)
    bbox = _image_bbox((0.0, 128.0, -64.0, 0.0, 100.0, 200.0), 612.0, 792.0)
    x0, top, x1, bottom = bbox
    assert (x0, x1) == (kernels.round5(36.0 / 612.0), kernels.round5(100.0 / 612.0))
    assert (top, bottom) == (
        kernels.round5((792.0 - 328.0) / 792.0),
        kernels.round5((792.0 - 200.0) / 792.0),
    )


def test_page_rotation_ctm_roundtrip_is_exact_on_dyadic_grid():
    # the parser's viewing CTM must invert the writer's stored-frame
    # placement bit-exactly for dyadic coordinates (the corpus grid)
    from docprompt_spark.pdfwrite import _rot_point

    vw, vh = 612.0, 792.0
    pts = [(72.0, 720.0), (540.0 - 1 / 16, 110.5), (91.0625, 333.25)]
    for rot in (90, 180, 270):
        sw, sh = (vh, vw) if rot in (90, 270) else (vw, vh)
        ctm, w, h = _page_rotation_ctm(rot, sw, sh)
        assert (w, h) == (vw, vh)
        for x, y in pts:
            sx, sy = _rot_point(rot, x, y, vw, vh)
            gx = ctm[0] * sx + ctm[2] * sy + ctm[4]
            gy = ctm[1] * sx + ctm[3] * sy + ctm[5]
            assert (gx, gy) == (x, y)  # bit-exact, not approx


def test_uncorrected_rotated_text_takes_quad_path():
    # a page whose text is STORED rotated but carries no /Rotate (the
    # "sideways scan nobody fixed" case): the interpreter's quad fallback
    # still extracts every word, with the tall-narrow bbox of the rotated
    # quad — the reference emits rotated 4-vertex BoundingPolys the same
    # way (schema/layout.py)
    from docprompt_spark.corpus import _gen_doc_pages
    from docprompt_spark.pdfwrite import write_pdf

    _, pages = _gen_doc_pages(1, 42, 0)
    pages_w = [p for p, _w, _i in pages]
    rotated = write_pdf(pages_w, doc_title="t", rotate=90)
    # neutralize the correction in place (same byte length keeps the xref
    # offsets valid)
    assert rotated.count(b"/Rotate 90") == 1
    broken = rotated.replace(b"/Rotate 90", b"/Rotate  0")
    up_pages = pdfparse.extract_pages(write_pdf(pages_w, doc_title="t"))
    got_pages = pdfparse.extract_pages(broken)
    assert len(got_pages) == len(up_pages)
    for up, got in zip(up_pages, got_pages):
        # every word survives with its text (order differs: stored-frame
        # reading order), as a standalone quad-bbox word
        up_texts = sorted(w["text"] for w in up["words"])
        got_texts = sorted(w["text"] for w in got["words"])
        assert got_texts == up_texts
        for w in got["words"]:
            assert 0.0 <= w["x0"] <= w["x1"] <= 1.0
            assert 0.0 <= w["top"] <= w["bottom"] <= 1.0
        # rotated words are TALLER than wide once longer than ~2 chars
        tall = [
            w for w in got["words"]
            if len(w["text"]) >= 4
            and (w["bottom"] - w["top"]) > (w["x1"] - w["x0"])
        ]
        long_words = [w for w in got["words"] if len(w["text"]) >= 4]
        assert len(tall) == len(long_words)


@pytest.mark.parametrize("rot,origin", [
    (0, (16.0, 8.5)), (90, (32.0, 17.0)), (180, (48.0, 0.0)),
    (270, (16.0, 8.5)), (90, (48.5, 24.0625)),
])
def test_mediabox_origin_is_span_and_dim_invariant(rot, origin):
    # non-zero MediaBox origin (cropped/offset scans), alone and composed
    # with /Rotate: identical spans and visual dims to the (0,0) twin
    from docprompt_spark.corpus import _gen_doc_pages
    from docprompt_spark.pdfwrite import write_pdf

    _, pages = _gen_doc_pages(5, 42, 0)
    pages_w = [p for p, _w, _i in pages]
    upright = write_pdf(pages_w, doc_title="t")
    offset = write_pdf(
        pages_w, doc_title="t", rotate=rot, media_origin=origin
    )
    assert spans_from_pdf(upright) == spans_from_pdf(offset)
    pg = pdfparse.extract_pages(offset)[0]
    assert (pg["width"], pg["height"]) == (612.0, 792.0)


def test_default_corpus_rotation_and_origin_mix():
    # the default corpus itself carries rotated (idx%4==3) and
    # origin-offset (idx%5==2) documents — golden spans hold across all
    from docprompt_spark.corpus import gen_doc

    for idx in (2, 3, 7, 12, 15):  # covers origin-only, rot-only, both off
        d = gen_doc(idx, skew_every=0)
        raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
        assert spans_from_pdf(raw) == d["spans"]
    d = gen_doc(7, skew_every=0, envelope="rotated")  # rot+origin composed
    # idx 7 is odd -> no origin on the rotated envelope; idx 4 has both
    d = gen_doc(4, skew_every=0, envelope="rotated")
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert b"/MediaBox [0 0" not in raw
    assert spans_from_pdf(raw) == d["spans"]
