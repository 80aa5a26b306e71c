"""D6 recompression — the reference's ghostscript analog from scratch.

Reference: `_exec/ghostscript.py:15-88` (pdfwrite + DCTEncode/FlateEncode
image filters, JPEGQ=95), `utils/compressor.py:7-14`, and the
bytes-per-page > 2 MB trigger at `tasks/ocr/gcp.py:504-506`. The contract
under test: the rewritten document parses to the exact same span sequence
(modulo media_ref, which hashes the payload bytes recompression rewrites),
images decodable, size reduced where there is anything to reduce."""

import numpy as np
import pytest

from docprompt_spark import kernels, pdfparse, recompress
from docprompt_spark.corpus import gen_doc


def _span_seq(pdf_bytes):
    prs = []
    for p in pdfparse.extract_pages(pdf_bytes):
        lay = kernels.build_page_layout(p["words"])
        prs.append(
            {
                "page_number": p["page_number"],
                "page_text": lay["page_text"],
                "spans": kernels.assemble_page_spans(lay, p["images"]),
            }
        )
    return [
        (s["kind"], s["text"], s["offset"])
        for s in kernels.assemble_doc_spans(prs)
    ]


@pytest.mark.parametrize("mode", ["jpeg", "lossless"])
@pytest.mark.parametrize("idx", [0, 1, 2, 3])
def test_span_sequence_survives_recompression(idx, mode):
    d = gen_doc(idx, seed=42)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    rc = recompress.recompress_pdf(raw, mode)
    assert _span_seq(rc) == _span_seq(raw)


@pytest.mark.parametrize(
    "envelope", ["xrefstream", "encrypted", "ccitt", "inline", "lzw"]
)
def test_all_envelopes_recompress(envelope):
    d = gen_doc(1, seed=42, envelope=envelope)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    rc = recompress.recompress_pdf(raw, "lossless")
    assert _span_seq(rc) == _span_seq(raw)
    # output is always classic-xref, unencrypted
    assert b"/Encrypt" not in rc.rsplit(b"trailer", 1)[-1]
    assert b"\nxref\n" in rc


def test_raw_image_shrinks_and_becomes_dct():
    """A document whose images are stored as RAW gray8 samples must get
    materially smaller in jpeg mode, and its image XObjects must carry
    /DCTDecode afterwards — the filter ghostscript's
    -dGrayImageFilter=/DCTEncode applies."""
    from docprompt_spark import pdfwrite

    # smooth gradient: compresses well under DCT, poorly raw
    yy, xx = np.mgrid[0:96, 0:128]
    px = ((xx + yy) % 256).astype(np.uint8)
    page = {
        "width": 612.0,
        "height": 792.0,
        "text_ops": [
            {"font": "F1", "size": 12.0, "x": 72.0, "y": 700.0,
             "mode": "Tm", "segments": ["hello"]}
        ],
        "images": [
            {"data": px.tobytes(), "filter": None, "samples": px.tobytes(),
             "width": 128, "height": 96, "bpc": 8, "decode_parms": None,
             "colorspace": "DeviceGray", "decode": None, "imagemask": False,
             "x": 100.0, "y": 300.0, "w": 128.0, "h": 96.0}
        ],
    }
    pdf = pdfwrite.write_pdf([page], doc_title="d-raw")
    rc = recompress.recompress_pdf(pdf, "jpeg")
    assert len(rc) < len(pdf) * 0.6
    assert b"/DCTDecode" in rc
    # and the recompressed image decodes to (near-)identical pixels
    pf = pdfparse.PdfFile(rc)
    got = pf.extract_page(0, with_image_data=True)
    assert len(got["images"]) == 1
    # lossless mode is exact
    rcl = recompress.recompress_pdf(pdf, "lossless")
    pfl = pdfparse.PdfFile(rcl)
    from docprompt_spark import multimodal

    page0 = pfl.resolve(pfl.page_refs[0])
    res = pfl._inherited(page0, "Resources")
    xobjs = pfl.resolve(res.get("XObject", {}))
    xo = pfl.resolve(next(iter(xobjs.values())))
    codec = multimodal._codec_of(xo.dict, pfl.resolve, xo.raw)
    out = multimodal.decode_image(xo.raw, 128, 96, codec)
    assert np.array_equal(out, px)


def test_trigger_threshold_matches_reference_semantics():
    d = gen_doc(0, seed=42)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    out, did = recompress.maybe_recompress(d["pdf"])
    assert not did and out == raw  # small doc: untouched, unwrapped
    out, did = recompress.maybe_recompress(d["pdf"], threshold=16)
    assert did and out != raw
    assert _span_seq(out) == _span_seq(raw)


def test_recompress_is_deterministic():
    d = gen_doc(5, seed=42)
    raw = pdfparse.unwrap_pdf_bytes(d["pdf"])
    assert recompress.recompress_pdf(raw, "jpeg") == recompress.recompress_pdf(
        raw, "jpeg"
    )


def test_bad_mode_raises():
    with pytest.raises(ValueError):
        recompress.recompress_pdf(b"%PDF-", "zip")
