"""Embedded CID CMap streams as Type0 /Encoding (PDF 32000 §9.7.5.3): the
form real CJK subset fonts carry instead of /Identity-H. Show-string CODES
map through begincidrange/begincidchar sections to CIDs (here code =
CID + 0x100); per spec the split of responsibilities is exact — ToUnicode
(§9.10.3) is keyed by CODE so TEXT survives an Encoding misread, but /W
widths are keyed by CID so word GEOMETRY only comes out right if the
reader actually walks the CMap, and the raster glyph pool's CID→char
mapping composes through its inverse. The reference resolves these via
pdfium's CPDF_CMap machinery."""

import re

from docprompt_spark import pdfparse, pdfwrite
from docprompt_spark.pdfparse import _parse_cid_cmap


def _pages():
    return [
        {
            "width": 612.0,
            "height": 792.0,
            "images": [],
            "vectors": [],
            "text_ops": [
                {
                    "font": "F1",
                    "size": 12,
                    "x": 72,
                    "y": 700,
                    "mode": "Tm",
                    "segments": ["Plain ascii line"],
                },
                {
                    "font": "F2",
                    "size": 12,
                    "x": 72,
                    "y": 660,
                    "mode": "Tm",
                    "segments": ["Unicode Δλ 文書 line"],
                },
            ],
        }
    ]


def _words(pdf):
    pf = pdfparse.PdfFile(pdf)
    return pf, [
        (w["text"], round(w["x0"], 6), round(w["x1"], 6))
        for w in pf.extract_page(0)["words"]
    ]


def test_cid_cmap_parser_units():
    data = (
        b"2 begincidrange\n<0101> <0103> 1\n<0110> <0110> 16\nendcidrange\n"
        b"1 begincidchar\n<0captured> 0\nendcidchar\n"  # malformed row ignored
        b"1 begincidchar\n<01ff> 255\nendcidchar\n"
    )
    m = _parse_cid_cmap(data)
    assert m[0x0101] == 1 and m[0x0102] == 2 and m[0x0103] == 3
    assert m[0x0110] == 16
    assert m[0x01FF] == 255
    assert len(m) == 5


def test_all_combos_geometry_invariant():
    """Identity-H vs embedded CMap, with and without the CID-keyed
    program, both envelopes, encrypted: identical words AND geometry."""
    base = None
    for prog in (False, True):
        for cmap in (False, True):
            for enc in (None, "aes-128"):
                for xs in (False, True):
                    pdf = pdfwrite.write_pdf(
                        _pages(),
                        doc_title="cm",
                        cid_font_program=prog,
                        cid_encoding_cmap=cmap,
                        encrypt=enc,
                        xref_stream=xs,
                    )
                    pf, ws = _words(pdf)
                    if base is None:
                        base = ws
                    assert ws == base, (prog, cmap, enc, xs)
                    if prog:
                        assert "文" in pf.glyph_outline_pool()


def test_cmap_is_load_bearing_for_widths():
    """Forcing the same document back to /Identity-H keeps the TEXT
    (ToUnicode is keyed by code) but breaks word geometry (/W is keyed by
    CID) — exactly the §9.7 split of responsibilities."""
    pdf = pdfwrite.write_pdf(
        _pages(), doc_title="cmw", cid_encoding_cmap=True
    )
    _, good = _words(pdf)
    broken = re.sub(rb"/Encoding \d+ 0 R", b"/Encoding /Identity-H", pdf)
    _, bad = _words(broken)
    assert [t for t, _, _ in good] == [t for t, _, _ in bad]
    assert good != bad


def test_cmap_is_load_bearing_for_glyph_pool():
    """Under base14 (no F1 program), CID-text outlines come only from the
    CID-keyed program via CID→code→char; breaking the Encoding breaks the
    composition."""
    pdf = pdfwrite.write_pdf(
        _pages(),
        doc_title="cmp",
        font_format="base14",
        cid_font_program=True,
        cid_encoding_cmap=True,
    )
    assert "文" in pdfparse.PdfFile(pdf).glyph_outline_pool()
    broken = re.sub(rb"/Encoding \d+ 0 R", b"/Encoding /Identity-H", pdf)
    assert "文" not in pdfparse.PdfFile(broken).glyph_outline_pool()


def test_corpus_slice_spans_match_golden():
    """Default-corpus idx%12==0 docs (CID program + embedded CMap) still
    extract exactly their golden spans."""
    from docprompt_spark import corpus
    from docprompt_spark.pdfparse import unwrap_pdf_bytes
    from tests.test_pdf_roundtrip import spans_from_pdf

    found = 0
    for idx in (0, 12, 24, 36):
        doc = corpus.gen_doc(idx, seed=42)
        pdf = unwrap_pdf_bytes(bytes(doc["pdf"]))
        if b"begincidrange" not in pdf and b"/CMapName" not in pdf:
            continue  # no F2 paragraphs drawn, or compressed cmap stream
        found += 1
        assert spans_from_pdf(doc["pdf"]) == doc["spans"], idx
    assert found >= 1
