"""/CropBox (§7.7.3.3, §14.11.2): the region a conforming viewer shows
and pdfium renders. The writer keeps press-sheet bleed margins in the
MediaBox with /CropBox marking the visible region; the parser extracts
in the CropBox frame — bit-exactly the same output as the un-cropped
document, alone and composed with /Rotate and a non-zero origin."""

import pytest

from docprompt_spark import corpus, kernels, pdfparse, pdfwrite


def _pages():
    return [
        {
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [
                {"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0,
                 "mode": "Tm", "segments": ["hello cropped world"]}
            ],
        }
    ]


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
@pytest.mark.parametrize(
    "bleed", [(18.0, 12.5, 24.0, 9.0), (36.0, 0.0, 0.0, 36.0)]
)
def test_crop_invariance_bit_exact(rot, bleed):
    base = pdfparse.PdfFile(
        pdfwrite.write_pdf(_pages(), doc_title="t")
    ).extract_page(0)
    pdf = pdfwrite.write_pdf(
        _pages(), doc_title="t", crop_bleed=bleed, rotate=rot,
        media_origin=(16.0, 8.5),
    )
    got = pdfparse.PdfFile(pdf).extract_page(0)
    assert (got["width"], got["height"]) == (612.0, 792.0)
    assert got["words"] == base["words"]


def test_cropbox_clamped_to_mediabox():
    """A CropBox sticking past the MediaBox intersects with it
    (§14.11.2) — never extract in a frame larger than the sheet."""
    pdf = pdfwrite.write_pdf(_pages(), doc_title="t")
    # splice an oversized CropBox into the page-tree root
    assert b"/MediaBox [0 0 612 792]" in pdf
    pdf2 = pdf.replace(
        b"/MediaBox [0 0 612 792]",
        b"/MediaBox [0 0 612 792] /CropBox [-50 -9 700 900]",
    )
    got = pdfparse.PdfFile(pdf2).extract_page(0)
    assert (got["width"], got["height"]) == (612.0, 792.0)
    base = pdfparse.PdfFile(pdf).extract_page(0)
    assert got["words"] == base["words"]


def test_default_corpus_crop_slice():
    """idx%5==4 default-rotation docs carry the bleed; their golden spans
    are crop-invariant (the flagship oracle proves it at the gate)."""
    d = corpus.gen_doc(4, seed=42, skew_every=0)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert b"/CropBox" in raw
    pf = pdfparse.PdfFile(raw)
    page_results = []
    for p in range(d["n_pages"]):
        ep = pf.extract_page(p)
        layout = kernels.build_page_layout(ep["words"])
        spans = kernels.assemble_page_spans(layout, ep["images"])
        page_results.append(
            {"page_number": p + 1, "page_text": layout["page_text"],
             "spans": spans}
        )
    assert kernels.assemble_doc_spans(page_results) == d["spans"]
    d3 = corpus.gen_doc(3, seed=42, skew_every=0)
    assert b"/CropBox" not in pdfparse.unwrap_pdf_bytes(d3["pdf"])
