"""/SMask soft-mask alpha (PDF 32000 §11.6.5.2): an image XObject's dict
references a second gray8 image whose samples are per-pixel alpha; the
renderer source-over blends src*a + dst*(1-a). The transparent-logo /
watermark form real producers emit. Reference parity: pdfium composites
soft masks natively inside FPDF_RenderPageBitmap.

The mask legally differs in resolution from its parent (corpus uses a
fixed 16x8 plane against 16/24/32 x 8/12/16 parents), so the renderer
resamples alpha independently, nearest-neighbor, same integer index math
as the pixels.
"""

import hashlib
import zlib

import numpy as np

from docprompt_spark import corpus, multimodal, pdfparse, rasterize


def _parse(pdf: bytes) -> pdfparse.PdfFile:
    return pdfparse.PdfFile(pdfparse.unwrap_pdf_bytes(pdf))


def test_blend_math_round_half_up():
    canvas = np.full((4, 4), 200, dtype=np.uint8)
    pixels = np.full((2, 2), 40, dtype=np.uint8)
    alpha = np.array([[0, 255], [128, 17]], dtype=np.uint8)
    rasterize._paint_image(canvas, pixels, (0, 0, 2, 2), alpha=alpha)
    # (src*a + dst*(255-a) + 127) // 255, element-wise
    assert canvas[0, 0] == 200  # a=0: backdrop
    assert canvas[0, 1] == 40  # a=255: source
    assert canvas[1, 0] == (40 * 128 + 200 * 127 + 127) // 255  # 120
    assert canvas[1, 1] == (40 * 17 + 200 * 238 + 127) // 255
    assert (canvas[2:, :] == 200).all() and (canvas[:, 2:] == 200).all()


def test_alpha_resampled_with_own_dims():
    # 1x2 alpha over a 4x4 rect: left half transparent, right half opaque
    canvas = np.full((4, 4), 100, dtype=np.uint8)
    pixels = np.zeros((4, 4), dtype=np.uint8)
    alpha = np.array([[0, 255]], dtype=np.uint8)
    rasterize._paint_image(canvas, pixels, (0, 0, 4, 4), alpha=alpha)
    assert (canvas[:, :2] == 100).all() and (canvas[:, 2:] == 0).all()


def test_writer_parser_smask_roundtrip():
    found = 0
    for idx in range(16):
        d = corpus.gen_doc(idx, seed=11, skew_every=0)
        _did, pages = corpus._gen_doc_pages(idx, 11, 0)
        pf = _parse(d["pdf"])
        for p, (page_w, _wgt, _igt) in enumerate(pages):
            want = {
                hashlib.md5(w["data"]).hexdigest(): w["smask"]
                for w in page_w["images"]
                if w.get("smask")
            }
            if not want:
                continue
            got = {
                im["media_ref"]: im
                for im in pf.extract_page(p, with_image_data=True)["images"]
                if im.get("smask_payload") is not None
            }
            assert set(got) == set(want)
            for ref, sm in want.items():
                im = got[ref]
                assert (im["smask_w"], im["smask_h"]) == (sm["w"], sm["h"])
                assert im["smask_codec"] == "flate-gray8"
                assert zlib.decompress(bytes(im["smask_payload"])) == sm["alpha"]
                # parent codec tag carries the ;smk flag (histogram proof)
                assert ";smk" in im["codec"]
                # decoded alpha plane == authored bytes
                a = multimodal.decode_image(
                    bytes(im["smask_payload"]), im["smask_w"], im["smask_h"],
                    im["smask_codec"],
                )
                assert a.tobytes() == sm["alpha"]
                found += 1
    assert found >= 3  # corpus rotation actually produces soft masks


def test_corpus_never_masks_inline_or_stencil():
    for idx in range(24):
        _did, pages = corpus._gen_doc_pages(idx, 11, 0)
        for page_w, _wgt, _igt in pages:
            for w in page_w["images"]:
                if w.get("smask"):
                    assert not w["inline"] and not w["imagemask"]


def test_alpha_changes_the_raster():
    # find a golden page with a soft-masked image; rendering with alpha
    # stripped must change the digest (blend is live, not a no-op)
    from docprompt_spark import fontgen

    for doc_id, pn, layout, imgs, vecs in corpus.golden_page_layouts(
        16, seed=11, skew_every=0, with_vectors=True
    ):
        if not any(im.get("alpha_samples") for im in imgs):
            continue
        images = [
            {
                "bbox": im["bbox"],
                "pixels": np.frombuffer(im["samples"], np.uint8).reshape(
                    im["px_h"], im["px_w"]
                ),
                "stencil": bool(im.get("stencil")),
                "alpha": (
                    np.frombuffer(im["alpha_samples"], np.uint8).reshape(
                        im["alpha_h"], im["alpha_w"]
                    )
                    if im.get("alpha_samples")
                    else None
                ),
            }
            for im in imgs
        ]
        wds = rasterize.layout_words(layout)
        glyphs = fontgen.glyph_pool(
            {ch for w in wds for ch in w["text"]}
            | {chr(c) for c in range(32, 127)}
        )
        with_a = rasterize.render_page(wds, images, glyphs=glyphs, vectors=vecs)
        for im in images:
            im["alpha"] = None
        without = rasterize.render_page(wds, images, glyphs=glyphs, vectors=vecs)
        assert with_a.tobytes() != without.tobytes()
        return
    raise AssertionError("no soft-masked golden page found in media corpus")
