"""Blend modes (PDF 32000 §11.3.5) via ExtGState /BM: the separable gray
modes (Multiply, Screen) real producers emit for highlights and watermark
bars. Composite over the opaque page backdrop is (1-a)·B + a·Blend(B,S)
(§11.3.6 with backdrop alpha 1); Normal's Blend(B,S)=S recovers the
existing constant-alpha source-over. The reference renders these through
pdfium's transparency engine; here writer/parser/rasterizer share ONE
fixed-order float expression so generator ground truth and parsed renders
are bit-exact."""

import numpy as np

from docprompt_spark import corpus, pdfparse, pdfwrite, rasterize


def _render(vectors):
    return rasterize.render_page(
        [], [], corpus.PAGE_W, corpus.PAGE_H, vectors=vectors
    )


def test_blend_math_multiply_screen():
    canvas = np.full((4, 4), 200, dtype=np.uint8)
    sq = [[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]]
    m = canvas.copy()
    rasterize.fill_contours(m, sq, value=100, blend="Multiply")
    assert int(m[0, 0]) == round(200 * 100 / 255.0)  # 78
    s = canvas.copy()
    rasterize.fill_contours(s, sq, value=100, blend="Screen")
    assert int(s[0, 0]) == round(255 - (255 - 200) * (255 - 100) / 255.0)
    # composed with constant alpha: (1-a)B + a*Blend(B,S)
    ma = canvas.copy()
    rasterize.fill_contours(ma, sq, value=100, alpha=0.5, blend="Multiply")
    assert int(ma[0, 0]) == round(0.5 * 200 + 0.5 * (200 * 100 / 255.0))


def _pages(vecs):
    return [
        {
            "width": 612.0,
            "height": 792.0,
            "images": [],
            "vectors": vecs,
            "text_ops": [
                {
                    "font": "F1",
                    "size": 12,
                    "x": 72,
                    "y": 720,
                    "mode": "Tm",
                    "segments": ["blend"],
                }
            ],
        }
    ]


def test_writer_parser_raster_loop_bit_exact():
    vecs_w = [
        {"path": [("m", 72, 700), ("l", 540, 700)], "paint": "S", "gray": 0.0, "lw": 3.0},
        {"path": [("re", 400, 694, 90, 12)], "paint": "f", "gray": 0.5,
         "alpha": 0.5, "blend": "Multiply"},
        {"path": [("re", 100, 694, 90, 12)], "paint": "f", "gray": 0.5,
         "blend": "Screen"},
    ]
    gt = [
        {"contours": [[(72, 700), (540, 700)]], "closed": [False],
         "paint": "stroke", "gray": 0, "lw": 3.0},
        {"contours": [[(400, 694), (490, 694), (490, 706), (400, 706)]],
         "closed": [True], "paint": "fill", "gray": 128, "lw": 0.0,
         "alpha": 0.5, "blend": "Multiply"},
        {"contours": [[(100, 694), (190, 694), (190, 706), (100, 706)]],
         "closed": [True], "paint": "fill", "gray": 128, "lw": 0.0,
         "blend": "Screen"},
    ]
    pdf = pdfwrite.write_pdf(_pages(vecs_w), doc_title="bm")
    page = pdfparse.PdfFile(pdf).extract_page(0, with_image_data=True)
    pv = page["vectors"]
    assert [(v.get("alpha"), v.get("blend")) for v in pv] == [
        (None, None), (0.5, "Multiply"), (None, "Screen")
    ]
    a, b = _render(gt), _render(pv)
    assert (a == b).all()
    # blend is load-bearing where ink overlaps: Normal differs
    gt_norm = [dict(v) for v in gt]
    for v in gt_norm:
        v.pop("blend", None)
    assert not (_render(gt_norm) == a).all()


def test_bm_array_form_and_q_restore():
    """/BM array-of-names (PDF 1.3 fallback) parses; q/Q restores the
    blend mode like any other gstate parameter."""
    vecs_w = [
        {"path": [("re", 100, 100, 50, 50)], "paint": "f", "gray": 0.3,
         "blend": "Multiply"},
        # second entry has NO gstate — the writer wraps each op in q..Q,
        # so the Multiply must not leak onto it
        {"path": [("re", 200, 100, 50, 50)], "paint": "f", "gray": 0.3},
    ]
    pdf = pdfwrite.write_pdf(_pages(vecs_w), doc_title="bmq")
    # rewrite the /BM name form into the array form on the wire
    pdf2 = pdf.replace(b"/BM /Multiply", b"/BM [/Multiply]")
    for blob in (pdf, pdf2):
        pv = pdfparse.PdfFile(blob).extract_page(0, with_image_data=True)[
            "vectors"
        ]
        assert pv[0].get("blend") == "Multiply"
        assert pv[1].get("blend") is None


def test_corpus_blend_slice_parity():
    """Every blend-slice decoration key ((k&96)==32, bar dropped onto the
    header rule) renders bit-exactly from the parsed document and differs
    from a Normal-mode render."""
    ks = [k for k in range(256) if (k & 2) and (k & 96) == 32]
    assert len(ks) >= 16
    for k in ks[:4]:
        vw, vgt = corpus._page_vectors(k)
        assert any(v.get("blend") in ("Multiply", "Screen") for v in vgt)
        pdf = pdfwrite.write_pdf(_pages(vw), doc_title=f"bm{k}")
        pv = pdfparse.PdfFile(pdf).extract_page(0, with_image_data=True)[
            "vectors"
        ]
        a = _render(vgt)
        assert (a == _render(pv)).all(), k
        gt2 = [dict(v) for v in vgt]
        for v in gt2:
            v.pop("blend", None)
        assert not (_render(gt2) == a).all(), k
