"""Outline font authoring + Type2 interpretation: the author -> embed ->
parse -> interpret -> fill loop behind real-glyph page rasters (D7)."""

import hashlib

import numpy as np

from docprompt_spark import cff, fontgen, pdfparse, pdfwrite, rasterize


def test_cff_roundtrip_exact():
    chars = [chr(c) for c in range(32, 127)] + ["é", "Ω", "→", "中", "ß"]
    blob = fontgen.build_cff(chars)
    outl = cff.cff_glyph_outlines(blob)
    pool = fontgen.glyph_pool(chars)
    for c in chars:
        w, contours = outl[f"uni{ord(c):04X}"]
        wp, cp = pool[c]
        assert w == wp
        assert [[tuple(p) for p in ct] for ct in contours] == [
            [tuple(p) for p in ct] for ct in cp
        ]


def test_contours_nonoverlapping_and_nonempty():
    for c in "AZaz09 ~é中":
        contours = fontgen.glyph_contours(c)
        assert contours, repr(c)
        rects = []
        for ct in contours:
            xs = [p[0] for p in ct]
            ys = [p[1] for p in ct]
            rects.append((min(xs), min(ys), max(xs), max(ys)))
        for i, a in enumerate(rects):
            for b in rects[i + 1 :]:
                # strict interior disjointness (even-odd == nonzero)
                assert (
                    a[2] <= b[0] or b[2] <= a[0] or a[3] <= b[1] or b[3] <= a[1]
                ), (c, a, b)


def test_curve_ops_interpret():
    """External-font path: hand-build a charstring using curve + subr ops
    and check the interpreter traces it without error."""
    # width 500; 0 0 rmoveto; 100 0 50 50 0 100 rrcurveto; endchar
    cs = (
        fontgen._t2_num(500)
        + fontgen._t2_num(0) + fontgen._t2_num(0) + b"\x15"
        + fontgen._t2_num(100) + fontgen._t2_num(0)
        + fontgen._t2_num(50) + fontgen._t2_num(50)
        + fontgen._t2_num(0) + fontgen._t2_num(100) + b"\x08"
        + b"\x0e"
    )
    interp = cff._T2Interp([], [], 0, 0)
    w, contours = interp.run(cs)
    assert w == 500
    assert len(contours) == 1 and len(contours[0]) == 9  # 1 + 8 flattened


def test_hintmask_skips_data_bytes():
    # width 500; 10 20 hstem; hintmask(1 byte); 0 0 rmoveto; 10 hlineto; endchar
    cs = (
        fontgen._t2_num(500)
        + fontgen._t2_num(10) + fontgen._t2_num(20) + bytes([1])  # hstem
        + bytes([19, 0xFF])  # hintmask + 1 mask byte
        + fontgen._t2_num(0) + fontgen._t2_num(0) + b"\x15"
        + fontgen._t2_num(10) + b"\x06"
        + b"\x0e"
    )
    interp = cff._T2Interp([], [], 0, 0)
    w, contours = interp.run(cs)
    assert w == 500 and contours == [[(0, 0), (10, 0)]]


def test_writer_embeds_fontfile3_and_pool_parses():
    from docprompt_spark.corpus import _gen_doc_pages

    doc_id, pages = _gen_doc_pages(0, 13, 0)  # idx 0 -> F2/CID text present
    pdf = pdfwrite.write_pdf([p for p, _, _ in pages], doc_title=doc_id)
    pf = pdfparse.PdfFile(pdf)
    pool = pf.glyph_outline_pool()
    assert " " in pool  # always embedded, even for a text-free doc
    # every char of every golden word has an outline (the embedded program
    # is SUBSET to the document's used charset, like real producers)
    for _page, words_gt, _ in pages:
        for wd in words_gt:
            for ch in wd["text"]:
                assert ch in pool, repr(ch)
    # and the parsed pool IS the generator's pool
    gen = fontgen.glyph_pool(pool.keys())
    for ch, (w, contours) in pool.items():
        assert gen[ch][0] == w
        assert [[tuple(p) for p in c] for c in contours] == [
            [tuple(p) for p in c] for c in gen[ch][1]
        ]


def test_fill_contours_square_and_evenodd_hole():
    canvas = np.full((10, 10), 255, np.uint8)
    rasterize.fill_contours(canvas, [[(2, 2), (8, 2), (8, 8), (2, 8)]], 0)
    assert (canvas[3:8, 3:8] == 0).all() or (canvas[2:8, 2:8] == 0).all()
    assert canvas[0, 0] == 255 and canvas[9, 9] == 255
    # even-odd: inner square flips back to background
    canvas2 = np.full((12, 12), 255, np.uint8)
    rasterize.fill_contours(
        canvas2,
        [[(1, 1), (11, 1), (11, 11), (1, 11)], [(4, 4), (8, 4), (8, 8), (4, 8)]],
        0,
    )
    assert canvas2[6, 6] == 255 and canvas2[2, 2] == 0


def test_outline_render_deterministic():
    pool = fontgen.glyph_pool("Hello")
    words = [{"text": "Hello", "bbox": (0.1, 0.1, 0.4, 0.14)}]
    a = rasterize.render_page(words, [], glyphs=pool)
    b = rasterize.render_page(words, [], glyphs=pool)
    assert hashlib.md5(a.tobytes()).hexdigest() == hashlib.md5(b.tobytes()).hexdigest()
    assert (a < 255).any()  # ink was laid down


def test_charset_format_1_and_2_roundtrip():
    """Range-coded charsets (Range1 = 3 bytes, Range2 = 4 bytes — nLeft at
    offset +2 in both) must parse identically to the flat format-0 charset,
    through BOTH parse paths (outline harvest and code->name decode)."""
    chars = [chr(c) for c in range(48, 58)] + ["é", "Ω"]
    blobs = {f: fontgen.build_cff(chars, charset_format=f) for f in (0, 1, 2)}
    assert blobs[1] != blobs[0] and blobs[2] != blobs[0] and blobs[2] != blobs[1]

    base_outlines = cff.cff_glyph_outlines(blobs[0])
    base_names = cff.cff_code_to_name(blobs[0])
    assert base_outlines and base_names
    for f in (1, 2):
        assert cff.cff_glyph_outlines(blobs[f]) == base_outlines, f"fmt {f}"
        assert cff.cff_code_to_name(blobs[f]) == base_names, f"fmt {f}"


class TestType1Authoring:
    """build_type1 -> type1_glyph_outlines: the third embedded-format
    loop (original Type1 /FontFile, eexec + charstring encryption)."""

    def test_roundtrip_exact_outlines(self):
        from docprompt_spark import cff, fontgen
        from docprompt_spark.pdfwrite import char_width_pm

        chars = [chr(c) for c in range(32, 127)] + ["é"]
        pool = cff.type1_glyph_outlines(fontgen.build_type1(chars))
        assert ".notdef" in pool
        for ch in chars:
            w, contours = pool[f"uni{ord(ch):04X}"]
            assert w == char_width_pm(ch)
            want = [
                [(float(x), float(y)) for x, y in c]
                for c in fontgen.glyph_contours(ch)
            ]
            assert contours == want, ch

    def test_parts_split_matches_pdf_lengths(self):
        from docprompt_spark import fontgen

        l1, l2, l3 = fontgen.build_type1_parts("Hello")
        assert l1.startswith(b"%!FontType1-1.0")
        assert l1.endswith(b"currentfile eexec\n")
        assert l3.endswith(b"cleartomark\n")
        assert fontgen.build_type1("Hello") == l1 + l2 + l3

    def test_encoding_decodes_via_header(self):
        from docprompt_spark import cff, fontgen

        data = fontgen.build_type1("AB z")
        m = cff.type1_code_to_name(data)
        assert m[ord("A")] == "uni0041" and m[ord("z")] == "uni007A"

    def test_interp_curves_and_subr_machinery(self):
        """Hand-built charstring with rrcurveto + closepath subr: curve
        flattening matches the shared cubic flattener; callsubr works."""
        from docprompt_spark import cff

        # subr 0: closepath return
        subrs = {0: bytes([9, 11])}
        from docprompt_spark.fontgen import _t1_num

        code = (
            _t1_num(0) + _t1_num(600) + bytes([13])  # hsbw
            + _t1_num(100) + _t1_num(100) + bytes([21])  # rmoveto
            + _t1_num(50) + _t1_num(0) + _t1_num(50) + _t1_num(50)
            + _t1_num(0) + _t1_num(50) + bytes([8])  # rrcurveto
            + _t1_num(0) + bytes([10])  # callsubr 0
            + bytes([14])  # endchar
        )
        it = cff._Type1Interp(subrs)
        it.run(code)
        assert it.width == 600
        want = [(100.0, 100.0)] + cff._flatten_cubic(
            (100.0, 100.0), (150.0, 100.0), (200.0, 150.0), (200.0, 200.0)
        )
        assert it.contours == [want]

    def test_pdf_embed_renders_same_ink_as_cff(self):
        from docprompt_spark import pdfparse, pdfwrite

        pages = [{
            "width": 612.0, "height": 792.0, "images": [],
            "text_ops": [{"font": "F1", "size": 12.0, "x": 72.0, "y": 700.0,
                          "segments": ["Type one"], "mode": "Tm"}],
        }]
        pdf_t1 = pdfwrite.write_pdf(pages, font_format="type1")
        pdf_cff = pdfwrite.write_pdf(pages, font_format="cff")
        assert b"/FontFile " in pdf_t1 and b"Length2" in pdf_t1
        pool_t1 = pdfparse.PdfFile(pdf_t1).glyph_outline_pool()
        pool_cff = pdfparse.PdfFile(pdf_cff).glyph_outline_pool()
        assert set(pool_t1) == set(pool_cff)
        for ch in pool_cff:
            assert pool_t1[ch][0] == pool_cff[ch][0]
            assert [
                [(float(x), float(y)) for x, y in c] for c in pool_t1[ch][1]
            ] == [
                [(float(x), float(y)) for x, y in c] for c in pool_cff[ch][1]
            ]
