"""Unembedded standard-14 fonts (§9.6.2.2): /Helvetica, /Times-Roman,
/Courier referenced with NO font program and NO /Widths — the pre-2008
real-world form. The reader supplies the published Adobe AFM metrics
(docprompt_spark.standard14; pdfium ships the same numbers)."""

import pytest

import docprompt_spark.pdfwrite as W
from docprompt_spark import pdfparse, pdfwrite, standard14


def _doc(face, text="Hello standard world", size=12.0):
    old = W._BASE14_NAME
    W._BASE14_NAME = face
    try:
        pages = [{
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [{"font": "F1", "size": size, "x": 72.0,
                          "y": 700.0, "mode": "Tm", "segments": [text]}],
        }]
        return pdfwrite.write_pdf(pages, doc_title="t",
                                  font_format="base14")
    finally:
        W._BASE14_NAME = old


@pytest.mark.parametrize(
    "face",
    ["Helvetica", "Times-Roman", "Courier", "Courier-BoldOblique",
     "Helvetica-Bold", "Arial"],
)
def test_base14_word_geometry_matches_afm(face):
    pdf = _doc(face)
    assert b"FontFile" not in pdf and b"/Widths" not in pdf
    words = pdfparse.PdfFile(pdf).extract_page(0)["words"]
    assert [w["text"] for w in words] == ["Hello", "standard", "world"]
    m = standard14.metrics_for(face)
    for w, txt in zip(words, ["Hello", "standard", "world"]):
        afm = sum(m["widths"][ord(c)] for c in txt) * 12.0 / 1000.0
        got = (w["x1"] - w["x0"]) * 612.0
        assert got == pytest.approx(afm, abs=1e-2), (face, txt)


def test_courier_family_exact_fixed_pitch():
    for face in ("Courier", "Courier-Bold", "Courier-Oblique",
                 "Courier-BoldOblique", "CourierNew"):
        m = standard14.metrics_for(face)
        assert set(m["widths"].values()) == {600.0}


def test_subset_prefix_stripped():
    m = standard14.metrics_for("ABCDEF+Helvetica")
    assert m is not None and m["widths"][ord("A")] == 667.0


def test_unknown_font_returns_none_and_missingwidth_fallback():
    assert standard14.metrics_for("SomeCustomFont") is None
    # a non-standard unembedded font without /Widths still parses — every
    # glyph falls back to /MissingWidth (deterministic, degraded)
    pdf = _doc("Helvetica").replace(b"/Helvetica", b"/NotAFont1")
    words = pdfparse.PdfFile(pdf).extract_page(0)["words"]
    assert [w["text"] for w in words] == ["Hello", "standard", "world"]


def test_afm_spot_values():
    """Spot-check canonical AFM numbers (the values every open reader
    carries): Helvetica space 278 / A 667 / m 833; Times space 250 /
    W 944 / i 278."""
    h = standard14.metrics_for("Helvetica")["widths"]
    assert (h[32], h[ord("A")], h[ord("m")]) == (278.0, 667.0, 833.0)
    t = standard14.metrics_for("Times-Roman")["widths"]
    assert (t[32], t[ord("W")], t[ord("i")]) == (250.0, 944.0, 278.0)
