"""Optional content (§8.11): OCG layers authored as /OC /OCn BDC…EMC
marked-content sequences with /OCProperties default configuration; the
interpreter suppresses emission (words/images/vectors) inside sequences
whose group is OFF by default while pen/graphics state advance normally.

Reference parity: pdfium hides default-off layers when rasterizing
(FPDF_SetRenderOCGFlags default), which is what docprompt's providers
OCR — so extraction from a layered PDF must match the visible frame."""

import pytest

from docprompt_spark import corpus, kernels, pdfparse, pdfwrite


def _parse(pdf_bytes):
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(pdf_bytes))


def _page(ops):
    return [{"width": 612.0, "height": 792.0, "images": [], "text_ops": ops}]


def _op(text, y, oc=None, x=72.0, size=10.0):
    d = {"font": "F1", "size": size, "x": x, "y": y, "mode": "Tm",
         "segments": [text]}
    if oc is not None:
        d["oc"] = oc
    return d


@pytest.mark.parametrize("idx", range(12))
def test_ocg_envelope_golden_span_parity(idx):
    """Both xref envelopes, all three filters, both watermark polarities:
    parsed spans equal the generator's visibility-aware golden spans."""
    d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="ocg")
    pf = _parse(d["pdf"])
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
    txt = " ".join(pr["page_text"] for pr in page_results)
    assert ("DRAFT" in txt) == corpus._ocg_watermark_on(idx)
    assert "review" in txt  # always-on layer extracted


def test_ocg_layer_listing():
    for idx in (0, 2):
        d = corpus.gen_doc(idx, seed=7, skew_every=0, envelope="ocg")
        layers = _parse(d["pdf"]).ocg_layers()
        assert layers == [
            {"name": "Annotations", "default_on": True},
            {"name": "Watermark",
             "default_on": corpus._ocg_watermark_on(idx)},
        ]


def test_hidden_layer_does_not_break_pen_state():
    """A hidden op between two visible ops on the same line must not
    perturb the visible words' geometry (state advances through hidden
    sequences)."""
    visible_only = _page([_op("alpha", 700.0), _op("beta", 660.0)])
    with_hidden = _page(
        [_op("alpha", 700.0), _op("SECRET", 680.0, oc=0),
         _op("beta", 660.0)]
    )
    p1 = pdfwrite.write_pdf(visible_only, doc_title="t")
    p2 = pdfwrite.write_pdf(
        with_hidden, doc_title="t",
        ocgs=[{"name": "Hidden", "on": False}],
    )
    w1 = _parse(p1).extract_page(0)["words"]
    w2 = _parse(p2).extract_page(0)["words"]
    assert w1 == w2


def test_ocmd_any_on_policy():
    """/OC may name an /OCMD membership dict: default /AnyOn policy —
    visible if ANY member group is on, hidden only when all are off."""
    ops = [_op("base", 700.0), _op("mixed", 680.0, oc=2),
           _op("gone", 660.0, oc=3)]
    pdf = pdfwrite.write_pdf(
        _page(ops), doc_title="t",
        ocgs=[{"name": "On", "on": True}, {"name": "Off", "on": False}],
    )
    # splice /OCMD objects in place of the direct OCG refs: build a doc
    # whose /Properties has /OC2 -> OCMD[On,Off] (visible) and
    # /OC3 -> OCMD[Off] (hidden)
    pf0 = _parse(pdf)
    ocp = pf0.resolve(pf0.root["OCProperties"])
    g_on, g_off = ocp["OCGs"][0], ocp["OCGs"][1]
    raw = pdf
    n = int(pf0.resolve(pf0.trailer["Size"]))
    extra = (
        f"{n} 0 obj\n<< /Type /OCMD /OCGs [{g_on.num} 0 R"
        f" {g_off.num} 0 R] >>\nendobj\n"
        f"{n + 1} 0 obj\n<< /Type /OCMD /OCGs [{g_off.num} 0 R] >>\n"
        f"endobj\n"
    ).encode()
    # rewrite /Properties to add OC2/OC3 and re-append a classic xref
    old = b"/Properties << /OC0"
    assert old in raw
    raw2 = raw.replace(
        old, f"/Properties << /OC2 {n} 0 R /OC3 {n + 1} 0 R /OC0".encode()
    )
    base = raw2 if raw2.endswith(b"\n") else raw2 + b"\n"
    import re

    prev = int(list(re.finditer(rb"startxref\s+(\d+)", raw2))[-1].group(1))
    off0 = len(base)
    off1 = off0 + extra.index(f"{n + 1} 0 obj".encode())
    root = pf0.trailer["Root"]
    tail = (
        f"xref\n{n} 2\n{off0:010d} 00000 n \n{off1:010d} 00000 n \n"
        f"trailer\n<< /Size {n + 2} /Root {root.num} 0 R /Prev {prev} >>\n"
        f"startxref\n{off0 + len(extra)}\n%%EOF\n"
    ).encode()
    pf = pdfparse.PdfFile(base + extra + tail)
    words = [w["text"] for w in pf.extract_page(0)["words"]]
    assert "base" in words and "mixed" in words
    assert "gone" not in words


def test_no_ocproperties_everything_visible():
    """/OC sequences in a doc WITHOUT /OCProperties (or with an unknown
    property name) stay visible — never hide content on a guess."""
    pdf = pdfwrite.write_pdf(
        _page([_op("kept", 700.0, oc=0)]), doc_title="t",
        ocgs=[{"name": "L", "on": True}],
    )
    words = [w["text"] for w in _parse(pdf).extract_page(0)["words"]]
    assert words == ["kept"]
