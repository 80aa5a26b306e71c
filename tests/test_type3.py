"""Type3 (/CharProcs) font roundtrip: author -> embed -> parse -> outline.

The FOURTH embedded font format the corpus rotates (PDF 32000 §9.6.5):
glyphs are tiny content streams painted through the same path machinery as
page vector art. The reference renders Type3 through pdfium's font path
(docprompt _pdfium.py:126-135); here the authored charprocs carry the same
1000-upm rectilinear outlines as CFF/Type1/TrueType, so text decode, the
glyph outline pool, and page rasters must all be format-independent.
"""

import hashlib

import pytest

from docprompt_spark import fontgen, kernels, pdfparse, pdfwrite, rasterize

PAGES = [{
    "width": 612.0, "height": 792.0, "images": [],
    "text_ops": [
        {"font": "F1", "size": 12.0, "x": 72.0, "y": 700.0,
         "segments": ["Type three glyphs!", -250.0, "OK"], "mode": "Tm"},
        {"font": "F1", "size": 9.0, "x": 72.0, "y": 660.0,
         "segments": ["second line, more charset coverage 0123"],
         "mode": "Tm"},
    ],
}]


def _pool_norm(pool):
    return {
        ch: (w, [[tuple(p) for p in c] for c in cons])
        for ch, (w, cons) in pool.items()
    }


class TestType3Charproc:
    def test_charproc_shape(self):
        data = fontgen.type3_charproc("A")
        assert data.startswith(b"750 0 d0") and data.endswith(b" f")
        assert data.count(b" re") == len(fontgen.glyph_contours("A"))

    def test_outline_interpreter_matches_generator(self):
        fm = [0.001, 0, 0, 0.001, 0, 0]
        for ch in "Ag0!~ ":
            wc = pdfparse._type3_glyph_outline(fontgen.type3_charproc(ch), fm)
            w, cons = wc
            assert w == pdfwrite.char_width_pm(ch)
            assert [[tuple(p) for p in c] for c in cons] == [
                [tuple(p) for p in c] for c in fontgen.glyph_contours(ch)
            ]

    def test_outline_interpreter_path_ops(self):
        # m/l/h path form of a rect == the re form (general path support)
        fm = [0.001, 0, 0, 0.001, 0, 0]
        proc = b"600 0 d0 60 -80 m 540 -80 l 540 640 l 60 640 l h f"
        w, cons = pdfparse._type3_glyph_outline(proc, fm)
        assert w == 600
        assert cons == [[(60, -80), (540, -80), (540, 640), (60, 640)]]

    def test_no_metrics_op_returns_none(self):
        assert pdfparse._type3_glyph_outline(b"0 0 100 100 re f", [0.001, 0, 0, 0.001, 0, 0]) is None

    def test_nonstandard_fontmatrix_scales(self):
        # glyph space at 2x: FontMatrix 0.0005 halves coordinates back
        fm = [0.0005, 0, 0, 0.0005, 0, 0]
        proc = b"1200 0 d0 120 -160 1080 1440 re f"
        w, cons = pdfparse._type3_glyph_outline(proc, fm)
        assert w == 600
        assert cons == [[(60, -80), (600, -80), (600, 640), (60, 640)]]


class TestType3Document:
    def test_words_and_pool_match_cff(self):
        pdf_t3 = pdfwrite.write_pdf(PAGES, font_format="type3")
        pdf_cff = pdfwrite.write_pdf(PAGES, font_format="cff")
        assert b"/Subtype /Type3" in pdf_t3 and b"/CharProcs" in pdf_t3
        assert b"/FontFile" not in pdf_t3  # no font *program* at all
        pf3, pfc = pdfparse.PdfFile(pdf_t3), pdfparse.PdfFile(pdf_cff)
        assert pf3.extract_page(0)["words"] == pfc.extract_page(0)["words"]
        assert _pool_norm(pf3.glyph_outline_pool()) == _pool_norm(
            pfc.glyph_outline_pool()
        )

    @pytest.mark.parametrize(
        "kw",
        [
            dict(compress_streams="flate"),
            dict(compress_streams="lzw"),
            dict(xref_stream=True, compress_streams="flate"),
            dict(encrypt="aes-128"),
            dict(encrypt="aes-256", xref_stream=True),
        ],
        ids=["flate", "lzw", "xrefstream", "aes128", "r6-objstm"],
    )
    def test_envelopes(self, kw):
        plain = pdfparse.PdfFile(pdfwrite.write_pdf(PAGES, font_format="type3"))
        pf = pdfparse.PdfFile(
            pdfwrite.write_pdf(PAGES, font_format="type3", doc_title="t", **kw)
        )
        assert pf.extract_page(0)["words"] == plain.extract_page(0)["words"]
        assert _pool_norm(pf.glyph_outline_pool()) == _pool_norm(
            plain.glyph_outline_pool()
        )

    def test_raster_md5_identical_across_all_four_formats(self):
        digests = set()
        for fmt in ("cff", "type1", "truetype", "type3"):
            pf = pdfparse.PdfFile(pdfwrite.write_pdf(PAGES, font_format=fmt))
            pg = pf.extract_page(0, with_image_data=True)
            lay = kernels.build_page_layout(pg["words"])
            canvas = rasterize.render_page(
                rasterize.layout_words(lay),
                [],
                glyphs=pf.glyph_outline_pool(),
                vectors=pg.get("vectors"),
            )
            digests.add(hashlib.md5(canvas.tobytes()).hexdigest())
        assert len(digests) == 1

    def test_corpus_rotates_type3(self):
        from docprompt_spark import corpus

        d = corpus.gen_doc(3)  # idx % 4 == 3 -> type3
        pf = pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(bytes(d["pdf"])))
        page = pf.resolve(pf.page_refs[0])
        fonts = pf.resolve(
            (pf._inherited(page, "Resources") or {}).get("Font", {})
        )
        assert str(pf.resolve(fonts["F1"]).get("Subtype")) == "Type3"
        assert pf.glyph_outline_pool()  # outlines parse out of charprocs
