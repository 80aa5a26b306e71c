"""Radial (Type 3) shadings (PDF 32000 §8.7.4.3.4): the seal/button/
vignette gradient — `q re W n /ShN sh Q` over a /ShadingType 3 dict with
two circles and an exponential (Type 2) function. The corpus rotates both
the concentric form (r0=0, the common vignette) and an eccentric form
(offset outer center, r0>0) so the general quadratic root of
|p - c(s)| = r(s) is exercised, not just the |p-c|/r shortcut."""

import hashlib

import numpy as np

from docprompt_spark import corpus, fontgen, kernels, pdfparse, rasterize


def _parse(pdf: bytes) -> pdfparse.PdfFile:
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(pdf))


def test_concentric_solver_matches_distance_formula():
    canvas = np.full((40, 40), 255, dtype=np.uint8)
    sq = [[(0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (0.0, 40.0)]]
    rasterize._shade_radial(
        canvas, sq, (20.0, 20.0, 0.0), (20.0, 20.0, 16.0), 0.2, 0.95, 1.0
    )
    for yy, xx in ((20, 20), (20, 35), (5, 5), (20, 28)):
        d = ((xx + 0.5 - 20.0) ** 2 + (yy + 0.5 - 20.0) ** 2) ** 0.5
        s = min(1.0, d / 16.0)
        v = 0.2 + s * (0.95 - 0.2)
        assert canvas[yy, xx] == int(round(v * 255.0))


def test_eccentric_family_leaves_cone_exterior_unpainted():
    # circles: c0=(10,20) r0=2, c1=(30,20) r1=4 — dr < |dc|, so valid
    # circles sweep a narrow cone around the axis; points beyond the
    # tangent cone (discriminant < 0) stay background, while on-axis
    # points both behind c0 and past c1 are covered by /Extend
    canvas = np.full((40, 60), 255, dtype=np.uint8)
    sq = [[(0.0, 0.0), (60.0, 0.0), (60.0, 40.0), (0.0, 40.0)]]
    rasterize._shade_radial(
        canvas, sq, (10.0, 20.0, 2.0), (30.0, 20.0, 4.0), 0.0, 0.5, 1.0
    )
    assert canvas[0, 10] == 255  # far off-axis: disc < 0, unpainted
    # near c0's center: the LARGEST s circle through p=(10.5,20.5) has
    # s=(14+sqrt(14^2+396*3.5))/396 ≈ 0.1358 -> round(0.5*s*255) = 17
    assert canvas[20, 10] == 17
    assert canvas[20, 55] == 128  # past c1: s clamps to 1 -> c1 color
    assert canvas[20, 0] == 0  # behind c0 (r(s) still >= 0): s clamps to 0


def test_corpus_rotates_both_radial_forms_and_parses_equal():
    found = {"concentric": 0, "eccentric": 0}
    for idx in range(32):
        d = corpus.gen_doc(idx, 42, skew_every=0)
        _did, pages = corpus._gen_doc_pages(idx, 42, 0)
        pf = _parse(d["pdf"])
        for p, (page_w, _w, _i) in enumerate(pages):
            want = [v for v in page_w["vectors_gt"] if v["paint"] == "shade3"]
            if not want:
                continue
            got = [
                v
                for v in pf.extract_page(p)["vectors"]
                if v["paint"] == "shade3"
            ]
            assert len(got) == len(want)
            for a, b in zip(got, want):
                assert a["coords"] == b["coords"]
                assert (a["c0"], a["c1"], a["n"]) == (b["c0"], b["c1"], b["n"])
                r0 = b["coords"][0][2]
                found["eccentric" if r0 > 0 else "concentric"] += 1
    assert found["concentric"] > 0 and found["eccentric"] > 0


def test_radial_page_raster_parity():
    # parse-side render == generator-GT render on a page carrying a badge
    for idx in range(16):
        d = corpus.gen_doc(idx, 42, skew_every=0)
        _did, pages = corpus._gen_doc_pages(idx, 42, 0)
        pf = _parse(d["pdf"])
        glyphs = pf.glyph_outline_pool()
        for p, (page_w, words_gt, imgs_gt) in enumerate(pages):
            if not any(v["paint"] == "shade3" for v in page_w["vectors_gt"]):
                continue
            pg = pf.extract_page(p, with_image_data=True)
            from docprompt_spark import multimodal

            imgs = []
            for im in pg["images"]:
                px = multimodal.decode_image(
                    bytes(im["payload"]), im["px_w"], im["px_h"],
                    im["codec"], palette=im.get("palette"),
                )
                alpha = None
                if im.get("smask_payload") is not None:
                    alpha = multimodal.decode_image(
                        bytes(im["smask_payload"]), im["smask_w"],
                        im["smask_h"], im["smask_codec"],
                    )
                imgs.append(
                    {"bbox": im["bbox"], "pixels": px,
                     "stencil": multimodal.is_stencil(im["codec"]),
                     "alpha": alpha}
                )
            wds = rasterize.layout_words(
                kernels.build_page_layout(pg["words"])
            )
            canvas = rasterize.render_page(
                wds, imgs, pg["width"], pg["height"], glyphs=glyphs,
                vectors=pg.get("vectors"),
            )
            wds_gt = rasterize.layout_words(
                kernels.build_page_layout(words_gt)
            )
            gly = fontgen.glyph_pool(
                {ch for w in wds_gt for ch in w["text"]}
                | {chr(c) for c in range(32, 127)}
            )
            gt_ims = [
                {
                    "bbox": g2["bbox"],
                    "pixels": np.frombuffer(
                        w2["samples"], np.uint8
                    ).reshape(w2["height"], w2["width"]),
                    "stencil": bool(g2.get("stencil")),
                    "alpha": (
                        np.frombuffer(
                            g2["alpha_samples"], np.uint8
                        ).reshape(g2["alpha_h"], g2["alpha_w"])
                        if g2.get("alpha_samples")
                        else None
                    ),
                }
                for w2, g2 in zip(page_w["images"], imgs_gt)
            ]
            gt_canvas = rasterize.render_page(
                wds_gt, gt_ims, glyphs=gly, vectors=page_w["vectors_gt"]
            )
            assert (
                hashlib.md5(canvas.tobytes()).hexdigest()
                == hashlib.md5(gt_canvas.tobytes()).hexdigest()
            )
            return
    raise AssertionError("no radial-badge page found")
