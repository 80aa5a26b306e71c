"""CIE-based CalGray / CalRGB colorspaces (PDF 32000 §8.6.5.2-3): the
pre-ICC archival form (PDF/A-1-era producers). Like pdfium's practical
handling, a conforming reader may render them through the corresponding
device space — component semantics honored, CIE TRANSFORMS out of scope
(declared at multimodal._cs_device_name). The load-bearing proof is tag +
pixel identity: a [/CalGray <<…>>] image must classify and decode exactly
like its /DeviceGray twin."""

from docprompt_spark import corpus, multimodal, pdfparse, pdfwrite


def test_cs_device_name_maps_cal_families():
    ident = lambda x: x
    assert multimodal._cs_device_name(["CalGray", {}], ident) == "DeviceGray"
    assert multimodal._cs_device_name(["CalRGB", {}], ident) == "DeviceRGB"
    # Lab stays unmapped (CIE transform would be required)
    assert multimodal._cs_device_name(["Lab", {}], ident) == ""


def _pages(cal):
    img = {
        "data": bytes(range(64)), "filter": None, "samples": bytes(range(64)),
        "width": 8, "height": 8, "bpc": 8, "decode_parms": None,
        "colorspace": "DeviceGray", "palette": None, "decode": None,
        "imagemask": False, "smask": None, "icc": False, "cal": cal,
        "x": 100.0, "y": 300.0, "w": 96.0, "h": 96.0, "inline": False,
    }
    return [
        {
            "width": 612.0, "height": 792.0, "vectors": [],
            "images": [img],
            "text_ops": [
                {"font": "F1", "size": 12, "x": 72, "y": 700,
                 "mode": "Tm", "segments": ["cal test"]},
            ],
        }
    ]


def test_calgray_image_decodes_like_devicegray():
    outs = {}
    for cal in (False, True):
        pdf = pdfwrite.write_pdf(_pages(cal), doc_title="cal")
        pf = pdfparse.PdfFile(pdf)
        page = pf.extract_page(0, with_image_data=True)
        (im,) = page["images"]
        px = multimodal.decode_image(
            bytes(im["payload"]), im["px_w"], im["px_h"], im["codec"]
        )
        outs[cal] = (im["codec"], im["media_ref"], px.tobytes())
    assert outs[False] == outs[True]
    # and the Cal form is actually on the wire
    pdf = pdfwrite.write_pdf(_pages(True), doc_title="cal2")
    assert b"/CalGray" in pdf


def test_corpus_cal_slice_media_invariant():
    """Default-corpus Cal-wrapped figures keep media_ref + codec ground
    truth identical to the generator's (the GT formula never looks at the
    wrapper — writer_entry_codec proves the classifier agrees)."""
    found = 0
    for idx in range(0, 40):
        doc = corpus.gen_doc(idx, seed=42)
        pdf = pdfparse.unwrap_pdf_bytes(bytes(doc["pdf"]))
        if b"/CalGray" not in pdf and b"/CalRGB" not in pdf:
            continue
        found += 1
        from tests.test_pdf_roundtrip import spans_from_pdf

        assert spans_from_pdf(doc["pdf"]) == doc["spans"], idx
    assert found >= 2
