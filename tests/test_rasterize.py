"""Page rasterization (D7) + bbox masking (D12) — docprompt_spark.rasterize.

Reference behavior: pdfium render at scale=dpi/72 (_pdfium.py:126-135) and
mask_image_from_bboxes rect fills (rasterize.py:232-266). Pixel-level
equality with pdfium is out of scope (no font rasterizer); what IS checked:
deterministic geometry, image compositing of real decoded pixels, and
end-to-end parse→render parity with generator ground truth (the
media_page_rasters / media_masked_rasters oracles, auto-covered by
test_oracle_parity).
"""

import hashlib

import numpy as np

from docprompt_spark import rasterize


W = {"text": "hello", "bbox": (0.1, 0.1, 0.5, 0.15)}


def test_canvas_dims_follow_dpi_scale():
    arr = rasterize.render_page([], [], 612.0, 792.0, dpi=72)
    assert arr.shape == (792, 612)
    arr = rasterize.render_page([], [], 612.0, 792.0, dpi=36)
    assert arr.shape == (396, 306)
    assert (arr == 255).all()  # empty page is white


def test_word_paints_glyph_cells():
    arr = rasterize.render_page([W], [], 100.0, 100.0, dpi=72)
    x0, y0, x1, y1 = rasterize.rect_px(W["bbox"], 100, 100)
    region = arr[y0:y1, x0:x1]
    assert (region < 255).all()  # fully painted
    # distinct chars -> distinct cell intensities ('h' vs 'e')
    assert len(np.unique(region)) == len(set("hello"))
    # outside the bbox stays white
    assert arr[0, 0] == 255 and (arr[y1 + 1 :, :] == 255).all()


def test_render_is_deterministic():
    imgs = [
        {"bbox": (0.2, 0.3, 0.6, 0.7), "pixels": np.arange(64, dtype=np.uint8).reshape(8, 8)}
    ]
    a = rasterize.render_page([W], imgs, 200.0, 200.0)
    b = rasterize.render_page([W], imgs, 200.0, 200.0)
    assert hashlib.md5(a.tobytes()).hexdigest() == hashlib.md5(b.tobytes()).hexdigest()


def test_image_composites_nearest_neighbor():
    px = np.array([[0, 100], [200, 250]], dtype=np.uint8)
    imgs = [{"bbox": (0.0, 0.0, 1.0, 1.0), "pixels": px}]
    arr = rasterize.render_page([], imgs, 72.0, 72.0, dpi=72)  # 72x72
    # quadrants replicate the 2x2 source exactly
    assert arr[0, 0] == 0 and arr[0, 71] == 100
    assert arr[71, 0] == 200 and arr[71, 71] == 250
    assert arr[35, 35] == 0 and arr[36, 36] == 250


def test_text_paints_over_images():
    px = np.full((4, 4), 7, np.uint8)
    imgs = [{"bbox": (0.0, 0.0, 1.0, 1.0), "pixels": px}]
    arr = rasterize.render_page([W], imgs, 100.0, 100.0, dpi=72)
    x0, y0, x1, y1 = rasterize.rect_px(W["bbox"], 100, 100)
    assert (arr[y0:y1, x0:x1] != 7).all()


def test_mask_fills_rects_and_preserves_rest():
    arr = rasterize.render_page([W], [], 100.0, 100.0, dpi=72)
    masked = rasterize.mask_bboxes(arr, [W["bbox"]], value=0)
    x0, y0, x1, y1 = rasterize.rect_px(W["bbox"], 100, 100)
    assert (masked[y0:y1, x0:x1] == 0).all()
    masked[y0:y1, x0:x1] = arr[y0:y1, x0:x1]
    assert (masked == arr).all()  # nothing else changed
    assert arr[y0, x0] != 0  # original untouched (copy semantics)


def test_rect_px_clamps_out_of_range():
    assert rasterize.rect_px((-0.5, -0.1, 1.5, 2.0), 100, 50) == (0, 0, 100, 50)
    x0, y0, x1, y1 = rasterize.rect_px((0.999, 0.999, 1.0, 1.0), 100, 50)
    assert x1 <= 100 and y1 <= 50 and x1 > x0 and y1 > y0


def test_degenerate_word_and_empty_image_are_noops():
    arr = rasterize.render_page(
        [{"text": "", "bbox": (0.1, 0.1, 0.1, 0.2)}],
        [{"bbox": (0.5, 0.5, 0.5, 0.5), "pixels": np.zeros((0, 0), np.uint8)}],
        100.0,
        100.0,
    )
    assert (arr == 255).all()


def test_parser_payload_plumbing_roundtrips():
    """extract_pages(with_image_data=True) carries payload/codec/px dims the
    renderer needs; the default path stays byte-free."""
    from docprompt_spark import multimodal
    from docprompt_spark.corpus import gen_doc
    from docprompt_spark import pdfparse

    doc = next(
        d for i in range(40)
        if (d := gen_doc(i, seed=11, skew_every=0)) and any(
            True for p in pdfparse.extract_pages(d["pdf"]) if p["images"]
        )
    )
    pages = pdfparse.extract_pages(doc["pdf"], with_image_data=True)
    im = next(im for p in pages for im in p["images"])
    assert set(im) >= {"media_ref", "bbox", "payload", "px_w", "px_h", "codec"}
    px = multimodal.decode_image(
        bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
    )
    assert px.shape == (im["px_h"], im["px_w"])
    plain = pdfparse.extract_pages(doc["pdf"])
    assert all("payload" not in i for p in plain for i in p["images"])
