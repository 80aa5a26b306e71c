"""Annotation appearance streams (§12.5.5): widget /AP /N form XObjects
run through the appearance algorithm (/BBox through /Matrix mapped onto
/Rect) — the on-page rendering of filled form values that pdfium paints
under FPDF_ANNOT and docprompt's OCR providers read."""

import pytest

from docprompt_spark import corpus, pdfparse, pdfwrite


def _parse(b):
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(b))


@pytest.mark.parametrize("idx", range(12))
def test_widget_appearance_text_equals_value(idx):
    """Every filled text/choice widget's rendered appearance text equals
    its /V value across all structured envelopes (incl. the AES-128
    quarter — AP stream content is object-key-encrypted)."""
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="structured")
    gt = corpus._doc_structure_gt(d["doc_id"], idx, d["n_pages"])
    pf = _parse(d["pdf"])
    want = {
        f["name"].split(".")[-1]: (f["value"], f["page"])
        for f in gt["fields"]
        if f["ftype"] in ("Tx", "Ch") and f["value"]
    }
    got = {}
    for p in range(d["n_pages"]):
        for a in pf.annotation_appearances(p):
            if a["subtype"] == "Widget" and a["text"]:
                got[a["field_name"]] = (a["text"], p)
    assert got == want


def test_page_text_excludes_appearance_content():
    """Page extraction must NOT absorb appearance text (pdfium's text
    API excludes annotations); the appearance surface is separate."""
    d = corpus.gen_doc(0, seed=7, skew_every=0, envelope="structured")
    gt = corpus._doc_structure_gt(d["doc_id"], 0, d["n_pages"])
    pf = _parse(d["pdf"])
    vals = [
        f["value"] for f in gt["fields"]
        if f["ftype"] in ("Tx", "Ch") and f["value"]
    ]
    assert vals
    page_text = " ".join(
        w["text"] for p in range(d["n_pages"])
        for w in pf.extract_page(p)["words"]
    )
    for v in vals:
        assert v not in page_text


def test_appearance_algorithm_matrix_and_bbox_mapping():
    """§12.5.5 with a non-trivial /BBox origin and a scaling /Matrix: the
    drawn text still lands inside /Rect and decodes exactly."""
    pages = [{
        "width": 612.0, "height": 792.0, "images": [],
        "text_ops": [{"font": "F1", "size": 10.0, "x": 72.0, "y": 700.0,
                      "mode": "Tm", "segments": ["Quarterly Report body"]}],
    }]
    pdf = pdfwrite.write_pdf(pages, doc_title="t")
    # splice a hand-built annot: AP form with BBox offset + 2x Matrix
    pf0 = pdfparse.PdfFile(pdf)
    n = int(pf0.resolve(pf0.trailer["Size"]))
    pref = pf0.page_refs[0]
    page = dict(pf0.resolve(pref))
    page["Annots"] = [pdfparse.Ref(n + 1, 0)]
    f1 = None
    res = pf0.resolve(pf0._inherited(pf0.resolve(pref), "Resources"))
    f1 = res["Font"]["F1"]
    ap_content = b"BT /F1 12 Tf 10 14 Td (Approved) Tj ET"
    extra = (
        f"{n} 0 obj\n<< /Type /XObject /Subtype /Form"
        f" /BBox [10 10 110 60] /Matrix [2 0 0 2 0 0]"
        f" /Resources << /Font << /F1 {f1.num} 0 R >> >>"
        f" /Length {len(ap_content)} >>\nstream\n".encode()
        + ap_content
        + b"\nendstream\nendobj\n"
        + (
            f"{n + 1} 0 obj\n<< /Type /Annot /Subtype /Widget /FT /Tx"
            f" /T (Stamp) /Rect [400 600 500 650]"
            f" /AP << /N {n} 0 R >> >>\nendobj\n"
        ).encode()
        + f"{pref.num} 0 obj\n{pdfwrite._ser_parsed(page)}\nendobj\n".encode()
    )
    import re

    prev = int(list(re.finditer(rb"startxref\s+(\d+)", pdf))[-1].group(1))
    base = pdf if pdf.endswith(b"\n") else pdf + b"\n"
    o0 = len(base)
    o1 = o0 + extra.index(f"{n + 1} 0 obj".encode())
    o2 = o0 + extra.index(f"{pref.num} 0 obj".encode())
    root = pf0.trailer["Root"]
    tail = (
        f"xref\n{pref.num} 1\n{o2:010d} 00000 n \n"
        f"{n} 2\n{o0:010d} 00000 n \n{o1:010d} 00000 n \n"
        f"trailer\n<< /Size {n + 2} /Root {root.num} 0 R /Prev {prev} >>\n"
        f"startxref\n{o0 + len(extra)}\n%%EOF\n"
    ).encode()
    pf = pdfparse.PdfFile(base + extra + tail)
    aps = pf.annotation_appearances(0)
    assert len(aps) == 1
    a = aps[0]
    assert a["text"] == "Approved" and a["field_name"] == "Stamp"
    assert a["rect"] == [400.0, 600.0, 500.0, 650.0]
